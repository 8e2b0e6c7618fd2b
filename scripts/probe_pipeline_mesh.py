#!/usr/bin/env python
"""Bisect the mesh+kernel zeroed-backtrace-weight bug: run the driver's
_build_pipeline output with mesh_devices 1 vs 2 and dump bt fields."""
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
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               os.pardir, ".jax_cache")))

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from test_treekernel import _events, SC
from adiabatic_raytracer_tpu.config import NumericsConfig, TreeConfig
from adiabatic_raytracer_tpu import driver

cfg = NumericsConfig(engine="mega", compute_dtype="f32", tree_engine="kernel",
                     interp_points=8, interp_coarse=0, max_crossings=8,
                     max_steps=2000, in_kernel_prob=1)
tcfg = TreeConfig(num_cutoff=3, mc_nodes=0, max_nodes=10)

x, k_init, erg = _events(4)
# v_loc stand-in: the sampled local velocity; reuse k direction scaled
v = np.asarray(k_init) / np.linalg.norm(np.asarray(k_init), axis=1,
                                        keepdims=True) * 1e-3
v = jnp.asarray(v)
keys = jax.vmap(lambda e: jax.random.fold_in(jax.random.PRNGKey(7), e))(
    jnp.arange(4))

with pltpu.force_tpu_interpret_mode():
    for nd in (1, 2):
        pipe = driver._build_pipeline(SC, cfg, tcfg, 30.0, 0.0, nd)
        combo, bt, tr = pipe(keys, x, v, erg)
        print(f"nd={nd} prob0={np.asarray(bt.prob0)} "
              f"weight={np.asarray(bt.weight)} "
              f"sbw={np.asarray(bt.samp_back_weight)} "
              f"n_cross={np.asarray(bt.n_cross)}")
        ev = np.asarray(combo)[-4:, :8]
        print("  ev_pack tail cols0-7:\n", ev)
