"""Per-event work distribution of the in-kernel tree engine (TPU).

Fetches the kernel's per-lane total-step diagnostic and models the
compaction-relaunch ceiling: ideal packed time vs measured lockstep time.
"""
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
from adiabatic_raytracer_tpu.ops.treekernel import (
    A_ITERS, A_STEPTOT, forward_tree_kernel)

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
S = int(os.environ.get("S", "2048"))
maxR = float(conversion_surface_radius(SC.mass_a, SC.theta_m, SC.omega_pul,
                                       SC.b0, SC.r_ns))
n_grid = sampler.default_n_grid(maxR)
key = jax.random.PRNGKey(1769)
xs, vs, es = [], [], []
got = 0
while got < S:
    key, sub = jax.random.split(key)
    res = sampler.sample_batch(sub, 8192, maxR, SC, SC.mass_ns, n_grid=n_grid)
    ok = np.nonzero(np.asarray(res.success))[0]
    xs.append(np.asarray(res.xpos[ok]))
    vs.append(np.asarray(res.v_loc[ok]))
    es.append(np.asarray(res.erg_inf[ok]))
    got += len(ok)
x = jnp.asarray(np.concatenate(xs)[:S])
v = jnp.asarray(np.concatenate(vs)[:S])
e = jnp.asarray(np.array(np.concatenate(es)[:S]))
k_init = k_norm_cart(x, v, 0.0, e, SC, SC.mass_ns, is_photon=True, ax_fix=True)

tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10,
                  max_nodes=100)
LNT_END = float(np.log(1.0 / SC.omega_pul))
keysS = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(3), i))(
    jnp.arange(S))
cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32", engine="mega")

f = jax.jit(lambda ks, x, k, e: forward_tree_kernel(
    ks, x, k, e, SC, cfg, tcfg, lnt_end=LNT_END, debug_aux=True))
t0 = time.perf_counter()
aux = np.asarray(f(keysS, x, k_init, e))
print(f"compile+first: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
aux = np.asarray(f(keysS, x, k_init, e))
wall = time.perf_counter() - t0

steps = aux[:, A_STEPTOT]
iters = aux[:, A_ITERS]
tile_iters = iters.reshape(-1, 128)[:, 0]
total_tile_steps = tile_iters.sum()
per_step_us = wall * 1e6 / total_tile_steps
q = lambda a, p: np.percentile(a, p)
print(f"wall {wall*1e3:.0f} ms; tile trips {tile_iters.astype(int).tolist()}")
print(f"per-tile-step cost {per_step_us:.2f} us")
print(f"per-event steps: p50 {q(steps,50):.0f} p90 {q(steps,90):.0f} "
      f"p99 {q(steps,99):.0f} max {steps.max():.0f} sum {steps.sum():.0f}")
ideal = steps.sum() / 128 * per_step_us / 1e3
tail = steps.max() * per_step_us / 1e3
print(f"modeled: perfectly-packed {ideal:.0f} ms, single-event tail "
      f"{tail:.0f} ms -> compaction ceiling ~{max(ideal, tail):.0f} ms")
# occupancy of the current (no-compaction) launch
occ = steps.sum() / (total_tile_steps * 128)
print(f"lockstep occupancy {occ:.3f}")
