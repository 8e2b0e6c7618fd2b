"""Sweep driver pipeline_depth on the live TPU (follow-up to the round-5
overlap finding, OVERLAP_r05.json: the 33-52% device-idle fraction is
per-dispatch tunnel latency, so the lever is keeping the device queue
non-empty — depth > 2 — not splitting the pipeline program).

pipeline_depth only changes the HOST assembly loop (driver.run), not the
jitted programs, so one process sweeps every depth after a single compile.

Writes DEPTH_r05.json.  Run on the axon TPU; ~8 min (one compile) + ~1 min.
Usage: PROBE_EVENTS=16384 python scripts/probe_depth.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "DEPTH_r05.json")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)

    from adiabatic_raytracer_tpu import driver
    from adiabatic_raytracer_tpu.config import (NumericsConfig, Scene,
                                                TreeConfig)

    n_events = int(os.environ.get("PROBE_EVENTS", "16384"))
    E = int(os.environ.get("PROBE_BATCH", "2048"))
    reps = int(os.environ.get("PROBE_REPS", "3"))
    depths = [int(d) for d in
              os.environ.get("PROBE_DEPTHS", "1,2,3,4").split(",")]
    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32",
                         engine="mega", tree_engine="kernel",
                         scan_gate_check=0)
    tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10,
                      max_nodes=100)  # deep production cutoffs

    tmp = tempfile.mkdtemp(prefix="probe_depth_")
    rows = {}
    try:
        # one warm run compiles sampler + pipeline for every depth
        driver.run(sc, cfg, tcfg, 1 + E, seed=1769, save_mode=0,
                   dir_tag=tmp, event_batch=E, verbose=False)
        for d in depths:
            dts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                driver.run(sc, cfg, tcfg, 1 + n_events, seed=1769,
                           save_mode=0, dir_tag=tmp, event_batch=E,
                           verbose=False, pipeline_depth=d)
                dts.append(time.perf_counter() - t0)
            dts.sort()
            rows[d] = {
                "ev_per_sec_median": round(n_events / dts[len(dts) // 2], 1),
                "ev_per_sec_runs": [round(n_events / t, 1) for t in dts],
            }
            print(d, rows[d], flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    best = max(rows, key=lambda d: rows[d]["ev_per_sec_median"])
    result = {"metric": "pipeline_depth_sweep_deep", "events": n_events,
              "event_batch": E, "reps": reps, "best_depth": best,
              "depths": {str(d): rows[d] for d in rows}}
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
