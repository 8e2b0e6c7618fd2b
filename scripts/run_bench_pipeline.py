"""Pin the end-to-end pipeline claims with session-variance bars (VERDICT r4
item 8): run bench_pipeline.py with BENCH_REPEATS>=3 for BOTH cutoff sets
(reference defaults + deep production, runner_example.sh:4) and commit the
medians + spreads as ONE artifact, BENCH_PIPELINE_r05.json.

Each cutoff set runs in its own subprocess (same discipline as
run_bench_configs.py).  Optional BENCH_DEPTH / BENCH_EVENTS pass through.

Usage:  python scripts/run_bench_pipeline.py          # ~10 min on axon
        BENCH_DEPTH=3 python scripts/run_bench_pipeline.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
OUT = os.path.join(REPO, "BENCH_PIPELINE_r05.json")


def main():
    repeats = os.environ.get("BENCH_REPEATS", "3")
    rows = {}
    for name, deep in (("default", "0"), ("deep", "1")):
        env = dict(os.environ, BENCH_REPEATS=repeats, BENCH_DEEP=deep)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_pipeline.py")],
            env=env, capture_output=True, text=True, timeout=3600)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not lines:
            print(p.stdout[-2000:])
            print(p.stderr[-2000:])
            raise SystemExit(f"cutoff set {name} failed")
        rows[name] = json.loads(lines[-1])
        print(name, rows[name], flush=True)
    with open(OUT, "w") as f:
        json.dump({"metric": "pipeline_median_with_spread",
                   "repeats_per_set": int(repeats), "sets": rows}, f,
                  indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
