#!/usr/bin/env python
"""Minimal repro: does _prob_batch (get_prob_nonad) zero out under shard_map?"""
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

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))

import jax.numpy as jnp

from test_treekernel import _events, SC
from adiabatic_raytracer_tpu.ops.tree import _prob_batch, _negate_b
from adiabatic_raytracer_tpu.parallel.mesh import make_mesh, shard_over_events

x, k_init, erg = _events(4)
sc_b = _negate_b(SC)

def fn(x, k, e):
    p, pn = _prob_batch(x, -k, e, sc_b, "f32")
    return p, pn

single = jax.tree.map(np.asarray, jax.jit(fn)(x, k_init, erg))
mesh = make_mesh(2)
sharded = jax.tree.map(np.asarray,
                       jax.jit(shard_over_events(mesh, fn))(x, k_init, erg))
print("single:", single[0], single[1])
print("sharded:", sharded[0], sharded[1])
