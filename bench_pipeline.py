#!/usr/bin/env python
"""End-to-end production-pipeline benchmark: events/s through driver.run.

Times the COMPLETE per-event pipeline of the reference's main_runner_tree
(MainRunner.jl:450-747): conversion-surface sampling -> launch kinematics ->
axion backtrace -> forward branching tree -> row assembly -> npy write, at
the reference's default cutoffs.  This is the number that describes the
product (bench.py's rays/s describes the raw integration kernel).

vs_baseline compares against an estimated single-core Julia throughput of
~3 events/s: one event costs one sampler scan plus O(10) propagate calls
(backtrace + tree nodes, MainRunner.jl:581-664) at the ~50 rays/s single-ray
estimate documented in bench.py, i.e. ~0.3 s/event.  No published reference
numbers exist (BASELINE.md).

Environment knobs: BENCH_EVENTS (default 4096), BENCH_EVENT_BATCH (default
2048 on TPU / 512 on CPU), BENCH_TREE_WINDOW (default: driver auto — 128
when the batch is bigger; the streaming window refills finished events'
lanes from the batch instead of draining the batch at ~1-event occupancy;
v5e deep-cutoff sweep in cli.py), BENCH_SEED (default 1769),
BENCH_PIPE_ENGINE / BENCH_COMPUTE_DTYPE
(default: megakernel + f32 physics on TPU, pool + f64 on CPU), BENCH_DEEP=1
(run at the reference's production cutoffs — probCutoff 1e-10, numCutoff 50,
MCNodes 10, maxNodes 100, runner_example.sh:4 — instead of the defaults).
"""

import json
import os
import shutil
import sys
import tempfile
import time


JULIA_CPU_EVENTS_PER_SEC = 3.0  # documented estimate, see module docstring


def main():
    import jax

    jax.config.update("jax_enable_x64", True)

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
    from adiabatic_raytracer_tpu.driver import run

    n_events = int(os.environ.get("BENCH_EVENTS", "4096"))
    platform = jax.devices()[0].platform
    event_batch = int(os.environ.get(
        "BENCH_EVENT_BATCH", "2048" if platform != "cpu" else "512"))
    tree_window = int(os.environ.get(
        "BENCH_TREE_WINDOW", "128" if event_batch > 128 else "0"))
    seed = int(os.environ.get("BENCH_SEED", "1769"))
    compute_dtype = os.environ.get(
        "BENCH_COMPUTE_DTYPE", "state" if platform == "cpu" else "f32")
    engine = os.environ.get(
        "BENCH_PIPE_ENGINE", "pool" if platform == "cpu" else "mega")

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(rtol=1e-7, atol=1e-6,  # interp: package default (gated 50)
                         compute_dtype=compute_dtype, engine=engine,
                         mc_chain=int(os.environ.get("BENCH_MC_CHAIN", "0")),
                         mc_chain_gate=int(os.environ.get("BENCH_CHAIN_GATE", "4")),
                         in_kernel_prob=int(os.environ.get("BENCH_IKP", "1")),
                         tree_k=int(os.environ.get("BENCH_TREE_K", "0")),
                         tree_queue_width=int(os.environ.get("BENCH_TREE_W", "0")),
                         tree_window=tree_window,
                         # forward-tree engine A/B: "kernel" (whole trees
                         # inside one Pallas launch, ops/treekernel.py — the
                         # TPU production default) vs "queue" (host
                         # work-queue engine)
                         tree_engine=os.environ.get(
                             "BENCH_TREE_ENGINE",
                             "queue" if platform == "cpu" else "kernel"),
                         tree_kernel_chunk=int(
                             os.environ.get("BENCH_TK_CHUNK", "64")),
                         tree_kernel_finals=int(
                             os.environ.get("BENCH_TK_FINALS", "64")),
                         backtrace_chunk=int(os.environ.get("BENCH_BT_CHUNK", "0")),
                         # kernel-cost attribution knob (see bench.py)
                         **({"interp_coarse": int(os.environ["BENCH_COARSE"])}
                            if os.environ.get("BENCH_COARSE") else {}))
    deep = os.environ.get("BENCH_DEEP", "") == "1"
    if deep:  # the reference's production scale (runner_example.sh:4)
        tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10,
                          max_nodes=100)
    else:
        tcfg = TreeConfig()  # reference default cutoffs

    # batches must all have the same shape or the pipeline recompiles
    n_events = ((n_events + event_batch - 1) // event_batch) * event_batch

    depth = int(os.environ.get("BENCH_DEPTH", "0"))  # 0 = driver auto

    tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        # warmup: compile sampler + pipeline at the production batch shape
        run(sc, cfg, tcfg, 1 + event_batch, seed=seed, save_mode=0,
            dir_tag=tmp, event_batch=event_batch, verbose=False,
            pipeline_depth=depth)

        # BENCH_REPEATS > 1 records session variance (the shared-tunnel
        # spread is 5-15%; round-to-round comparisons need median + spread,
        # not single samples — VERDICT r4 item 8)
        repeats = max(1, int(os.environ.get("BENCH_REPEATS", "1")))
        dts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = run(sc, cfg, tcfg, 1 + n_events, seed=seed, save_mode=0,
                      dir_tag=tmp, event_batch=event_batch, verbose=False,
                      pipeline_depth=depth)
            dts.append(time.perf_counter() - t0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert out is not None
    rows, _, stats = out
    dts.sort()
    dt = dts[len(dts) // 2] if repeats > 2 else dts[0]  # median (or best-of<=2)
    events_per_sec = n_events / dt
    print(json.dumps({
        "metric": ("pipeline_deep_events_per_sec_per_chip" if deep
                   else "pipeline_events_per_sec_per_chip"),
        "value": round(events_per_sec, 2),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / JULIA_CPU_EVENTS_PER_SEC, 2),
        "repeats": repeats,
        "ev_per_sec_runs": [round(n_events / d, 1) for d in dts],
        "ev_per_sec_best": round(n_events / dts[0], 1),
        "ev_per_sec_worst": round(n_events / dts[-1], 1),
        "events": n_events,
        "event_batch": event_batch,
        "tree_window": tree_window,
        "finals": int(stats.finals),
        "nodes": int(stats.tot_nodes),
        "tree_iters": int(stats.tree_iters),
        "nodes_per_sec": round(stats.tot_nodes / dt, 1),
        "rows": int(rows.shape[0]),
        "wall_s": round(dt, 3),
        "t_sample": round(stats.t_sample, 3),
        "t_pipeline": round(stats.t_pipeline, 3),
        "t_fetch": round(stats.t_fetch, 3),
        "t_rows": round(stats.t_rows, 3),
        "engine": engine,
        "compute_dtype": compute_dtype,
        "pipeline_depth": depth,
        "platform": platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
