#!/usr/bin/env python
"""MEASURED per-tile-step cost split of the megakernel (VERDICT r3 item 4).

Runs the headline backtrace ensemble (bench.py's 65k-ray production shape,
chunked engine) through four kernel variants that cut successive blocks at
trace time (SceneConsts.profile, set via MEGA_PROFILE — one variant per
PROCESS because the jit cache keys on config statics, not env):

  rhs    — 6-RHS DP5 step + controller + float-float commit only
  coarse — + the 4-point coarse event scan (always-on part of the gate)
  scan   — + the gated 50-point fine pass (fires on ~2.5% of tile-steps)
  full   — + the event block (bisection root, filters, records) = production

The per-variant ns/tile-step then attributes the production step cost:
rhs = integration arithmetic, coarse-rhs = coarse scan, scan-coarse = gated
fine pass, full-scan = event block.  Step trajectories diverge slightly
across variants (no recorded crossings => no crossing commits), so the
attribution unit is ns per EXECUTED tile-step, not per ray.

Usage:
  python scripts/probe_step_split.py          # run all 4 (subprocesses),
                                              # write STEP_SPLIT_r05.json
  MEGA_PROFILE=rhs python scripts/probe_step_split.py --one   # one variant

bench.py embeds STEP_SPLIT_r05.json (if present) in its JSON output next to
vpu_peak_frac, so the measured split lands in BENCH_r{N}.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "STEP_SPLIT_r05.json")
VARIANTS = ["rhs", "coarse", "scan", "full"]


def run_one():
    import numpy as np
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
    from adiabatic_raytracer_tpu.ops.geometry import cart_to_sph, celerity_from_cart

    prof = os.environ.get("MEGA_PROFILE", "full")
    B = int(os.environ.get("BENCH_RAYS", "65536"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32")

    rng = np.random.default_rng(0)
    r = rng.uniform(14.0, 24.0, B)
    th = np.arccos(rng.uniform(-0.95, 0.95, B))
    ph = rng.uniform(-np.pi, np.pi, B)
    x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                  r * np.cos(th)], axis=1)
    v = rng.normal(size=(B, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    erg = np.full(B, 1e-5 * (1 + 0.5 * (220.0 / 2.99792e5) ** 2))
    x, v, erg = jnp.asarray(x), jnp.asarray(v), jnp.asarray(erg)

    k0n = k_norm_cart(x, v, 0.0, erg, sc, sc.mass_ns, is_photon=True,
                      ax_fix=True)
    w0 = celerity_from_cart(x, k0n, sc.mass_ns_eff) / erg[:, None]
    u0 = jnp.concatenate([cart_to_sph(x), w0, (-erg)[:, None]], axis=1)
    lnt0 = jnp.full(B, cfg.ln_t_start)
    lnt1 = jnp.full(B, float(np.log(0.1)))

    fmega = jax.jit(lambda u, xc: mk.integrate_mega_chunked(
        u, lnt0, lnt1, erg, xc, sc, cfg, chunk_iters=64, stage_floor=2048))

    def step(eps):
        out = fmega(u0.at[:, 0].add(eps), x)
        return out[0], out[2]  # uf, steps

    uf, steps = step(0.0)
    _ = np.asarray(uf)
    dts = []
    for i in range(max(reps, 2)):
        t0 = time.perf_counter()
        uf, steps = step(1e-7 * (i + 1))
        _ = np.asarray(uf)
        dts.append(time.perf_counter() - t0)
    dt = float(np.min(dts))
    total_steps = float(np.asarray(steps).sum())
    print(json.dumps({
        "profile": prof, "wall_s": round(dt, 4),
        "lane_steps": int(total_steps),
        "ns_per_lane_step": round(dt / total_steps * 1e9, 2),
    }))


def run_all():
    rows = {}
    for prof in VARIANTS:
        env = dict(os.environ, MEGA_PROFILE=prof)
        p = subprocess.run([sys.executable, os.path.abspath(__file__), "--one"],
                           env=env, capture_output=True, text=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not line:
            print(p.stdout[-2000:])
            print(p.stderr[-2000:])
            raise SystemExit(f"variant {prof} failed")
        rows[prof] = json.loads(line[-1])
        print(prof, rows[prof], flush=True)

    ns = {k: rows[k]["ns_per_lane_step"] for k in VARIANTS}
    split = {
        "metric": "megakernel_step_cost_split",
        "batch": int(os.environ.get("BENCH_RAYS", "65536")),
        "ns_per_lane_step": ns,
        # Attribution of the production step cost (fractions of `full`).
        # rhs/coarse run IDENTICAL trajectories (nothing recorded in either),
        # so their delta is clean.  The standalone `scan` variant is NOT
        # production-representative: with no crossing commits, lanes linger
        # near the conversion surface and the tile-level gate over-fires
        # (measured 74 ns/step > full's 64), so the fine scan and the event
        # block are reported as one combined slice (full - coarse).
        "frac_rhs_integration": round(ns["rhs"] / ns["full"], 3),
        "frac_coarse_scan": round((ns["coarse"] - ns["rhs"]) / ns["full"], 3),
        "frac_fine_scan_plus_event": round(
            (ns["full"] - ns["coarse"]) / ns["full"], 3),
        "scan_variant_ns_unrepresentative": ns["scan"],
        "walls_s": {k: rows[k]["wall_s"] for k in VARIANTS},
        "lane_steps": {k: rows[k]["lane_steps"] for k in VARIANTS},
    }
    with open(OUT, "w") as f:
        json.dump(split, f, indent=1)
    print(json.dumps(split))


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one()
    else:
        run_all()
