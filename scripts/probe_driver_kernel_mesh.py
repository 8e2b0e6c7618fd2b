#!/usr/bin/env python
"""Reproduce the driver mesh+kernel row mismatch with full row dumps."""
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from jax.experimental.pallas import tpu as pltpu

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.driver import run

sc = Scene(theta_m=0.2)
cfg = NumericsConfig(engine="mega", compute_dtype="f32", tree_engine="kernel",
                     interp_points=8, interp_coarse=0, max_crossings=8,
                     max_steps=2000, in_kernel_prob=1)
tcfg = TreeConfig(num_cutoff=3, mc_nodes=0, max_nodes=10)
rows = []
with pltpu.force_tpu_interpret_mode():
    for nd in (1, 2):
        out = run(sc, cfg, tcfg, 3, seed=4242, save_mode=1, verbose=False,
                  dir_tag=f"/tmp/kmesh{nd}", event_batch=2, mesh_devices=nd)
        rows.append(out[0])

np.set_printoptions(precision=6, linewidth=200, suppress=False)
for nd, r in zip((1, 2), rows):
    print(f"--- nd={nd} shape={r.shape}")
    print(r)
