#!/usr/bin/env python
"""Can the in-kernel tree engine run inside a collective-free shard_map?

Round-3 left the kernel engine single-device-only with the note "mesh x
Pallas is unvalidated — interpret-mode shard_map deadlocks on the psum
rendezvous".  The driver's shard path (parallel.mesh.shard_over_events)
contains NO collectives, so this probes exactly that composition on the
virtual CPU mesh: shard_map(forward_tree_kernel-under-jit) over 2 devices
in Pallas interpret mode, vs the single-device kernel run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_ENABLE_X64"] = "true"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))

from test_treekernel import _events, _cfg, SC, TCFG, KEY  # noqa: E402

from adiabatic_raytracer_tpu.ops import tree  # noqa: E402
from adiabatic_raytracer_tpu.parallel.mesh import make_mesh, shard_over_events  # noqa: E402


def main():
    x, k_init, erg = _events(4)
    cfg = _cfg(tree_engine="kernel")
    keys = jax.vmap(lambda e: jax.random.fold_in(KEY, e))(jnp.arange(4))

    def fn(keys, x, k, e):
        tr = tree.forward_tree(keys, x, k, e, SC, cfg, TCFG, lnt_end=0.0)
        return tr.count, tr.count_main, tr.info, tr.tot_prob, tr.pools.weight

    with pltpu.force_tpu_interpret_mode():
        single = jax.jit(fn)(keys, x, k_init, erg)
        single = jax.tree.map(np.asarray, single)
        print("single-device kernel run:",
              single[0].tolist(), single[2].tolist())

        mesh = make_mesh(2)
        sharded = jax.jit(shard_over_events(mesh, fn))(keys, x, k_init, erg)
        sharded = jax.tree.map(np.asarray, sharded)
        print("2-device shard_map run:  ",
              sharded[0].tolist(), sharded[2].tolist())

    for a, b, nm in zip(single, sharded,
                        ("count", "count_main", "info", "tot_prob", "w")):
        np.testing.assert_array_equal(a, b, err_msg=nm)
    print("OK: shard_map(kernel engine) == single device, bitwise")


if __name__ == "__main__":
    main()
