#!/usr/bin/env python
"""Kernel-vs-host tree-engine production census — a pinned regression artifact.

Runs BOTH forward-tree engines (ops/treekernel.py in-kernel vs ops/tree.py
host work-queue) on the SAME 2048-event batch at the reference's production
cutoffs (probCutoff 1e-10, numCutoff 50, MCNodes 10, maxNodes 100,
runner_example.sh:4) with the SAME per-event keys, and emits one JSON line of
equivalence statistics:

  * counters_bitwise_pct — % of events whose (count, count_main, info,
    n_alloc) ALL match bitwise (the accepted equivalence class is the
    in-kernel-restart draw-flip: a ~1-ulp child birth-state difference can
    flip a |uniform - p| ~ 1e-6 MC draw, changing that event's chain —
    ops/treekernel.py module docstring);
  * info_match_pct — % matching on the stop code alone;
  * finals_per_event mean for each engine (must agree to ~1%);
  * weight_sum per engine (final-node weight totals; conservation ties these
    to the prob_cutoff contract), and the info histograms.

Usage:
  python scripts/census_kernel_host.py            # print the census JSON
  python scripts/census_kernel_host.py --check    # compare against the
      committed snapshot (CENSUS_r04.json at the repo root) and exit nonzero
      on drift beyond the draw-flip class:
        counters_bitwise_pct within 1.0, info_match_pct within 0.5,
        finals mean ratio within 1%, weight sums within 0.5%.

The soak harness (scripts/soak_tpu.py) runs the --check mode as its final
step when the snapshot exists.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig  # noqa: E402
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius  # noqa: E402
from adiabatic_raytracer_tpu.ops import sampler, tree  # noqa: E402
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart  # noqa: E402

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
E = int(os.environ.get("CENSUS_EVENTS", "2048"))
SNAP = os.path.join(os.path.dirname(__file__), os.pardir, "CENSUS_r04.json")


def _sample_events(n):
    maxR = float(conversion_surface_radius(SC.mass_a, SC.theta_m, SC.omega_pul,
                                           SC.b0, SC.r_ns))
    n_grid = sampler.default_n_grid(maxR)
    key = jax.random.PRNGKey(1769)
    xs, vs, es = [], [], []
    got = 0
    while got < n:
        key, sub = jax.random.split(key)
        res = sampler.sample_batch(sub, 8192, maxR, SC, SC.mass_ns,
                                   n_grid=n_grid)
        ok = np.nonzero(np.asarray(res.success))[0]
        xs.append(np.asarray(res.xpos[ok]))
        vs.append(np.asarray(res.v_loc[ok]))
        es.append(np.asarray(res.erg_inf[ok]))
        got += len(ok)
    x = jnp.asarray(np.concatenate(xs)[:n])
    v = jnp.asarray(np.concatenate(vs)[:n])
    e = jnp.asarray(np.concatenate(es)[:n])
    k_init = k_norm_cart(x, v, 0.0, e, SC, SC.mass_ns, is_photon=True,
                         ax_fix=True)
    return x, k_init, e


def _finals_stats(tr):
    pl = tr.pools
    fin = np.asarray(pl.is_final) & (np.asarray(pl.status) == 2)
    w = np.asarray(pl.weight)
    return fin.sum(axis=1), (w * fin).sum()


def main():
    check = "--check" in sys.argv
    tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10,
                      max_nodes=100)
    lnt_end = float(np.log(1.0 / SC.omega_pul))
    x, k_init, erg = _sample_events(E)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(3), i))(
        jnp.arange(E))

    base = dict(rtol=1e-7, atol=1e-6, compute_dtype="f32", engine="mega",
                in_kernel_prob=1)
    cfg_k = NumericsConfig(**base, tree_engine="kernel", tree_kernel_chunk=128)
    cfg_h = NumericsConfig(**base, tree_engine="queue", tree_window=128,
                           tree_k=1)

    out = {}
    for nm, cfg in (("kernel", cfg_k), ("host", cfg_h)):
        tr = jax.jit(lambda ks, x_, k_, e_, _c=cfg: tree.forward_tree(
            ks, x_, k_, e_, SC, _c, tcfg, lnt_end=lnt_end))(keys, x, k_init, erg)
        out[nm] = dict(
            count=np.asarray(tr.count), count_main=np.asarray(tr.count_main),
            info=np.asarray(tr.info), n_alloc=np.asarray(tr.n_alloc),
        )
        out[nm]["fin_counts"], out[nm]["w_sum"] = _finals_stats(tr)
        del tr

    k, h = out["kernel"], out["host"]
    all_match = np.ones(E, bool)
    for f in ("count", "count_main", "info", "n_alloc"):
        all_match &= k[f] == h[f]
    iv, ic = np.unique(np.abs(k["info"]), return_counts=True)
    census = {
        "metric": "tree_engine_census",
        "events": E,
        "counters_bitwise_pct": round(100.0 * all_match.mean(), 2),
        "info_match_pct": round(100.0 * (k["info"] == h["info"]).mean(), 2),
        "finals_mean_kernel": round(float(k["fin_counts"].mean()), 4),
        "finals_mean_host": round(float(h["fin_counts"].mean()), 4),
        "weight_sum_kernel": round(float(k["w_sum"]), 3),
        "weight_sum_host": round(float(h["w_sum"]), 3),
        "info_hist_kernel": {int(a): int(b) for a, b in zip(iv, ic)},
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(census))

    if check:
        if not os.path.exists(SNAP):
            print("no committed snapshot (CENSUS_r04.json) — writing one")
            with open(SNAP, "w") as f:
                json.dump(census, f, indent=1)
            return 0
        with open(SNAP) as f:
            ref = json.load(f)
        errs = []
        if abs(census["counters_bitwise_pct"]
               - ref["counters_bitwise_pct"]) > 1.0:
            errs.append("counters_bitwise_pct drifted")
        if abs(census["info_match_pct"] - ref["info_match_pct"]) > 0.5:
            errs.append("info_match_pct drifted")
        for eng in ("kernel", "host"):
            if abs(census[f"finals_mean_{eng}"] / ref[f"finals_mean_{eng}"]
                   - 1.0) > 0.01:
                errs.append(f"finals_mean_{eng} drifted")
            if abs(census[f"weight_sum_{eng}"] / ref[f"weight_sum_{eng}"]
                   - 1.0) > 0.005:
                errs.append(f"weight_sum_{eng} drifted")
        if errs:
            print("CENSUS DRIFT: " + "; ".join(errs), file=sys.stderr)
            return 1
        print("census matches the committed snapshot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
