"""Measure the headroom of overlapping the backtrace and tree phases across
batches (VERDICT r4 item 6).

The item's premise: at deep cutoffs the per-batch wall is tree (~77 ms) +
backtrace (~50 ms) "serialized", so launching batch i+1's backtrace while
batch i's tree runs should hide the smaller phase.  But on a single TPU core
two XLA programs never execute concurrently, and the driver's per-batch
pipeline (kinematics -> backtrace -> forward tree -> pack,
driver._build_pipeline) is already ONE jitted program — the tree-kernel
relaunch pyramid is lax.while_loop, fully traced.  Splitting the program can
therefore only reclaim time the device spends IDLE between programs (host
glue the depth-2 pipelined loop failed to hide).

So measure exactly that: device-saturated throughput (N pipeline dispatches
enqueued back-to-back with the sampler's device work, one sync at the end —
the device never waits for the host) vs the production driver.run wall at
the same shapes.  The idle fraction IS the ceiling of any split-and-overlap
restructuring.

Writes OVERLAP_r05.json.  Run on the axon TPU; ~5 min.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "OVERLAP_r05.json")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from adiabatic_raytracer_tpu import driver
    from adiabatic_raytracer_tpu.config import (NumericsConfig, Scene,
                                                TreeConfig)
    from adiabatic_raytracer_tpu.models.magnetosphere import (
        conversion_surface_radius)
    from adiabatic_raytracer_tpu.ops import sampler

    E = int(os.environ.get("PROBE_BATCH", "2048"))
    NB = int(os.environ.get("PROBE_BATCHES", "8"))
    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32",
                         engine="mega", tree_engine="kernel",
                         tree_kernel_chunk=64, tree_window=128,
                         scan_gate_check=0)
    tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10,
                      max_nodes=100)  # deep production cutoffs

    maxR = float(conversion_surface_radius(sc.mass_a, sc.theta_m,
                                           sc.omega_pul, sc.b0, sc.r_ns))
    lnt_end = float(np.log(1.0 / float(sc.omega_pul)))
    n_grid = sampler.default_n_grid(maxR)

    sample_jit = driver._build_sampler(sc, cfg, maxR, n_grid,
                                       tcfg.n_max_sample, True, cap=E)
    pipeline_jit = driver._build_pipeline(sc, cfg, tcfg, maxR, lnt_end, 0)

    # --- collect NB real sampled batches (host, untimed) ---
    key = jax.random.PRNGKey(1769)
    batches = []
    sb = 1 << 14
    pending = []
    draws = succ = 0
    while len(batches) < NB:
        key, bk = jax.random.split(key)
        pk = np.asarray(sample_jit(bk, sb))
        n_succ = int(pk[-1, 0])
        draws += sb
        succ += n_succ
        pending.append(pk[:n_succ, 1:])
        if sum(p.shape[0] for p in pending) >= E:
            samp = np.concatenate(pending, axis=0)[:E].astype(np.float64)
            batches.append(samp)
            pending = [np.concatenate(pending, axis=0)[E:]]
    # the driver's steady-state oversample width at this scene's yield
    # (driver.run sample_dispatch: sb = next_pow2(E / succ_rate * 1.5))
    p_succ = max(succ / draws, 0.02)
    sb_prod = 1 << max(int(E / p_succ * 1.5) - 1, 7).bit_length()
    keys = [driver._keys_for(jax.random.PRNGKey(7), jnp.arange(E) + i * E)
            for i in range(NB)]
    dev = [(k, jnp.asarray(s[:, 0:3]), jnp.asarray(s[:, 3:6]),
            jnp.asarray(s[:, 6])) for k, s in zip(keys, batches)]

    def sync(x):
        np.asarray(x[0][:1])  # block_until_ready does not sync on axon

    # warm-compile both programs
    combo, _, _ = pipeline_jit(*dev[0])
    sync(combo)
    sync(sample_jit(jax.random.PRNGKey(3), sb_prod))

    # --- pure-device times by MARGINAL slope: wall(K2 calls) - wall(K1
    # calls) over (K2-K1) cancels the fixed per-batch dispatch/tunnel
    # latency that a single back-to-back loop folds into every call (the
    # first corrected run measured sampler 148 ms + pipeline 76 ms > the
    # 148 ms production wall — impossible device-serial, so fixed latency
    # was riding on the measurements) ---
    def timed(fn, ks, reps=3):
        slopes = []
        for _ in range(reps):
            walls = []
            for k in ks:
                t0 = time.perf_counter()
                outs = [fn(i) for i in range(k)]
                sync(outs[-1])
                walls.append(time.perf_counter() - t0)
            slopes.append((walls[-1] - walls[0]) / (ks[-1] - ks[0]))
        slopes.sort()
        return slopes[len(slopes) // 2]

    t_pipe_dev = timed(lambda i: pipeline_jit(*dev[i % NB])[0], [2, NB + 2])
    t_samp_dev = timed(
        lambda i: sample_jit(jax.random.fold_in(key, i), sb_prod),
        [2, 20])

    # --- production wall at the same shapes (driver.run, depth-2 loop) ---
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="probe_overlap_")
    try:
        driver.run(sc, cfg, tcfg, 1 + E, seed=1769, save_mode=0,
                   dir_tag=tmp, event_batch=E, verbose=False)  # warm
        t0 = time.perf_counter()
        out = driver.run(sc, cfg, tcfg, 1 + NB * E, seed=1769, save_mode=0,
                         dir_tag=tmp, event_batch=E, verbose=False)
        t_prod = (time.perf_counter() - t0) / NB
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    stats = out[2]

    device_busy = (t_pipe_dev + t_samp_dev) / t_prod
    result = {
        "metric": "overlap_headroom_deep",
        "event_batch": E, "batches": NB,
        "sampler_success_rate": round(p_succ, 4),
        "sampler_oversample_width": int(sb_prod),
        "t_pipeline_device_ms": round(t_pipe_dev * 1e3, 1),
        "t_sampler_device_ms": round(t_samp_dev * 1e3, 1),
        "t_production_wall_ms_per_batch": round(t_prod * 1e3, 1),
        "device_busy_frac": round(device_busy, 3),
        "idle_frac_ceiling_for_split_overlap": round(
            max(1.0 - device_busy, 0.0), 3),
        "stats_t_sample": round(stats.t_sample, 3),
        "stats_t_pipeline": round(stats.t_pipeline, 3),
        "stats_t_fetch": round(stats.t_fetch, 3),
        "stats_t_rows": round(stats.t_rows, 3),
        # host-blocked dispatch segments (driver RunStats.t_issue/t_sampd):
        # arg upload + dispatch RPC over the tunnel — the candidate home of
        # the idle fraction above
        "stats_t_issue": round(stats.t_issue, 3),
        "stats_t_sampd": round(stats.t_sampd, 3),
        # measured conclusion (two sessions: busy 0.666 / 0.475, t_issue +
        # t_sampd ~4 ms/batch both): the idle fraction is NOT host-blocked
        # dispatch and NOT device-serialized phases — it is per-dispatch
        # tunnel latency (probe_fetch2: ~31 ms base RPC) paid between the
        # device draining its queue and the next program arriving.
        # Splitting the one jitted pipeline into backtrace + tree programs
        # DOUBLES the dispatches that pay that latency — a structural loss,
        # not an overlap win.  The lever that attacks the same idle is
        # keeping the device queue non-empty: pipeline_depth > 2.
        "conclusion": "split-overlap non-lever: idle is per-dispatch tunnel "
                      "latency, not phase serialization; splitting adds "
                      "dispatches. Counter-lever: deeper pipelining.",
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
