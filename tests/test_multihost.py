"""Two-process jax.distributed smoke test (CPU, DCN via gloo).

The multi-host analogue of the reference's SLURM fan-out
(runner_GR_tasks.sh:1-28): two OS processes, one virtual CPU device each,
form a global mesh through parallel.mesh.init_distributed and run a
shard_map + psum reduction.  Asserts the global mesh forms (2 processes,
2 global devices) and the psum'd total matches the single-process value.
"""

import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_psum(tmp_path):
    port = _free_port()
    nprocs = 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(HERE)] + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = []
    outs = []
    for pid in range(nprocs):
        out = tmp_path / f"worker_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(port), str(nprocs), str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    for out in outs:
        res = json.loads(out.read_text())
        assert res["process_count"] == 2
        assert res["global_devices"] == 2
        assert res["all_equal"]
        assert res["psum_total"] == res["expected"]
