"""Where does the kernel-tree pipeline lose time? Phase dissection on TPU.

Times, on one production 2048-event batch: the full jitted pipeline (queue
vs kernel engines), the forward tree alone, and kinematics+backtrace alone.
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
from adiabatic_raytracer_tpu.driver import _build_pipeline, _keys_for
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler, tree
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
S = 2048
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
e = jnp.asarray(np.concatenate(es)[:S])

tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10,
                  max_nodes=100)
LNT_END = float(np.log(1.0 / SC.omega_pul))
keysS = _keys_for(jax.random.PRNGKey(3), jnp.arange(S))
base = dict(rtol=1e-7, atol=1e-6, compute_dtype="f32", engine="mega",
            tree_window=128)
cfg_q = NumericsConfig(**base)
cfg_k = NumericsConfig(**base, tree_engine="kernel", tree_kernel_chunk=128)

k_init = k_norm_cart(x, v, 0.0, e, SC, SC.mass_ns, is_photon=True,
                     ax_fix=True)


def timeit(name, f, *a, reps=3):
    out = f(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {sorted(ts)[len(ts)//2]*1e3:7.0f} ms  "
          f"{[f'{t*1e3:.0f}' for t in ts]}", flush=True)
    return out


for nm, c in (("queue", cfg_q), ("kernel", cfg_k)):
    pipe = _build_pipeline(SC, c, tcfg, maxR, LNT_END, 0)
    timeit(f"pipeline[{nm}]", pipe, keysS, x, v, e)
    ft = jax.jit(lambda ks, x, k, e, _c=c: tree.forward_tree(
        ks, x, k, e, SC, _c, tcfg, lnt_end=LNT_END))
    timeit(f"tree[{nm}]", ft, keysS, x, k_init, e)

bt = jax.jit(lambda x, k, e: tree.backtrace(x, k, e, SC, cfg_q, tcfg,
                                            lnt_end=LNT_END))
timeit("backtrace", bt, x, k_init, e)
