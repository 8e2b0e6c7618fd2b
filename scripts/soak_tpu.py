#!/usr/bin/env python
"""Production-scale TPU soak: long run + kill/resume + combine + invariants.

Exercises what the 14-minute CPU suite cannot (VERDICT r2 item 8): a
production-sized saveMode-1 run on the real chip with --checkpoint, a
mid-run SIGKILL followed by --resume, a two-shard combine, and golden
invariants on the merged npy:

  * every weight finite, > 0; prob columns in [0, 1]
  * sln_prob normalized by f_inx and by the combine's n_runs divide
  * event numbering within [1, Nts-1]; species in {0, 1}
  * the resumed shard reaches completion (checkpoint cleared, npy written)

Usage: python scripts/soak_tpu.py [Nts_per_shard]   (default 5001)
Writes everything under /tmp/soak_tpu (wiped first); prints one JSON line.
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import time

NTS = int(sys.argv[1]) if len(sys.argv) > 1 else 5001
DIR = "/tmp/soak_tpu"
ARGS = ["--MassA", "1e-5", "--B0", "1e14", "--ThetaM", "0.2",
        "--Nts", str(NTS), "--probCutoff", "1e-10", "--numCutoff", "50",
        "--MCNodes", "10", "--maxNodes", "100", "--saveMode", "1",
        "--dir_tag", DIR, "--event_batch", "512"]


def cli(*extra, check=True):
    cmd = [sys.executable, "-m", "adiabatic_raytracer_tpu"] + ARGS + list(extra)
    p = subprocess.run(cmd, capture_output=True, text=True)
    if check and p.returncode != 0:
        print(p.stdout[-3000:])
        print(p.stderr[-3000:])
        raise SystemExit(f"CLI failed: {extra}")
    return p


def main():
    shutil.rmtree(DIR, ignore_errors=True)
    t0 = time.time()

    # shard 0: straight run with checkpointing on
    cli("--seed", "101", "--ftag", "soak_0", "--checkpoint")
    t_shard0 = time.time() - t0

    # shard 1: start, SIGKILL mid-run, resume from the checkpoint
    cmd = [sys.executable, "-m", "adiabatic_raytracer_tpu"] + ARGS + [
        "--seed", "202", "--ftag", "soak_1", "--checkpoint"]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
    # kill only once the first checkpoint lands: each CLI run is a fresh
    # process paying the full ~2-4 min server-side TPU compile before its
    # first batch assembles, so a fixed fraction of t_shard0 can fire too
    # early (measured: it did)
    ckdir = os.path.join(DIR, "npy")
    ck = []
    deadline = time.time() + max(120.0, 2.0 * t_shard0)
    while time.time() < deadline and proc.poll() is None:
        ck = [f for f in os.listdir(ckdir) if f.startswith(".ckpt_")
              and f.endswith("soak_1.npy.json")]
        if ck:
            break
        time.sleep(2.0)
    assert ck, "no checkpoint written before the kill deadline"
    assert proc.poll() is None, "shard 1 finished before it could be killed"
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    cli("--seed", "202", "--ftag", "soak_1", "--checkpoint", "--resume")

    # combine the two shards (Julia semantics: col 8 / n_runs, shards deleted)
    cli("--run_RT", "0", "--run_Combine", "1", "--side_runs", "2",
        "--ftag", "soak_")

    import numpy as np
    merged = [f for f in os.listdir(DIR) if f.endswith(".npy")]
    assert len(merged) == 1, merged
    d = np.load(os.path.join(DIR, merged[0]))
    assert d.ndim == 2 and d.shape[1] == 29, d.shape
    assert np.all(np.isfinite(d)), "non-finite values in merged rows"
    ev = d[:, 0]
    assert ev.min() >= 1 and ev.max() <= NTS - 1, (ev.min(), ev.max())
    assert set(np.unique(d[:, 1])) <= {0.0, 1.0}
    w = d[:, 8]
    assert np.all(w > 0) and np.all(w <= 1.0 + 1e-9), (w.min(), w.max())
    for col in (22, 23, 24):  # prob, prob_conv, prob_conv0 (-1 = root flag)
        v = d[:, col]
        assert np.all((v <= 1.0 + 1e-9) & (v >= -1.0 - 1e-9)), col
    # no stale checkpoints after successful completion
    leftover = [f for f in os.listdir(os.path.join(DIR, "npy"))
                if f.startswith(".ckpt_")]
    assert not leftover, leftover

    # kernel-vs-host census drift gate (VERDICT r3 item 5): compares the
    # committed CENSUS_r04.json snapshot; fails the soak beyond the accepted
    # draw-flip equivalence class
    census_ok = None
    snap = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                        "CENSUS_r04.json")
    if os.path.exists(snap):
        p = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "census_kernel_host.py"), "--check"],
            capture_output=True, text=True)
        census_ok = p.returncode == 0
        if not census_ok:
            print(p.stdout[-2000:])
            print(p.stderr[-2000:])
            raise SystemExit("census drift (see CENSUS_r04.json)")

    print(json.dumps({
        "metric": "soak_tpu",
        "nts_per_shard": NTS,
        "rows_merged": int(d.shape[0]),
        "events_seen": int(np.unique(ev).size),
        "wall_s": round(time.time() - t0, 1),
        "census_ok": census_ok,
        "ok": True,
    }))


if __name__ == "__main__":
    main()
