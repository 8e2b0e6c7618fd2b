"""Run the BASELINE.md benchmark-config suite on the live TPU and commit the
results as ONE artifact (VERDICT r4 item 5): configs 2/3/4/5 via
bench_configs.py (config 1 is bench.py itself — recorded per round by the
driver as BENCH_r{N}.json).

Each config runs in its own subprocess (clean compile cache attribution,
same discipline as probe_step_split.py).  Writes BENCH_CONFIGS_r05.json.

Usage:  python scripts/run_bench_configs.py          # ~15 min on axon
        BENCH_CONFIGS_ONLY=3 python scripts/run_bench_configs.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
OUT = os.path.join(REPO, "BENCH_CONFIGS_r05.json")
CONFIGS = [2, 3, 4, 5]


def main():
    only = os.environ.get("BENCH_CONFIGS_ONLY")
    configs = [int(only)] if only else CONFIGS
    rows = {}
    prior = {}
    if os.path.exists(OUT):  # partial reruns keep earlier configs
        with open(OUT) as f:
            prior = {int(k): v for k, v in json.load(f).get(
                "configs", {}).items()}
    for c in configs:
        env = dict(os.environ, BENCH_CONFIG=str(c))
        p = subprocess.run([sys.executable,
                            os.path.join(REPO, "bench_configs.py")],
                           env=env, capture_output=True, text=True,
                           timeout=3600)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not lines:
            print(p.stdout[-2000:])
            print(p.stderr[-2000:])
            raise SystemExit(f"config {c} failed")
        rows[c] = json.loads(lines[-1])
        print(c, rows[c], flush=True)
    merged = dict(prior)
    merged.update(rows)
    with open(OUT, "w") as f:
        json.dump({"metric": "baseline_md_config_suite",
                   "configs": {str(k): merged[k] for k in sorted(merged)}},
                  f, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
