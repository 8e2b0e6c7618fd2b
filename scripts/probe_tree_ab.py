"""Interleaved within-process A/B of forward-tree engine variants on TPU.

Variants: batch vs streaming window, queue compaction auto vs off.
Interleaves reps (A B C D x3) so tunnel drift hits all arms equally."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler, tree
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
S, WIN = 2048, 512
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
k_init = k_norm_cart(x, v, 0.0, e, SC, SC.mass_ns, is_photon=True, ax_fix=True)

tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10, max_nodes=100)
LNT_END = float(np.log(1.0 / SC.omega_pul))
keysS = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(3), i))(
    jnp.arange(S))

base = dict(rtol=1e-7, atol=1e-6, compute_dtype="f32", engine="mega")
VARIANTS = {
    "batch_Wauto": NumericsConfig(**base),
    "batch_Woff": NumericsConfig(**base, tree_queue_width=10**6),
    "stream_Wauto": NumericsConfig(**base, tree_window=WIN),
    "stream_Woff": NumericsConfig(**base, tree_window=WIN,
                                  tree_queue_width=10**6),
}
fns = {n: jax.jit(lambda ks, x, k, e, _c=c: tree.forward_tree(
    ks, x, k, e, SC, _c, tcfg, lnt_end=LNT_END)) for n, c in VARIANTS.items()}


def sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0])


def run_once(name):
    f = fns[name]
    if name.startswith("batch"):
        t0 = time.perf_counter()
        outs = []
        for i in range(S // WIN):
            sl = slice(i * WIN, (i + 1) * WIN)
            outs.append(f(keysS[sl], x[sl], k_init[sl], e[sl]))
        sync(outs[-1])
        return time.perf_counter() - t0, outs[0]
    t0 = time.perf_counter()
    out = f(keysS, x, k_init, e)
    sync(out)
    return time.perf_counter() - t0, out


# warm/compile every variant first
for n in VARIANTS:
    t, _ = run_once(n)
    print(f"compile+first {n}: {t:.2f}s", flush=True)

times = {n: [] for n in VARIANTS}
for rep in range(4):
    for n in VARIANTS:
        t, _ = run_once(n)
        times[n].append(t)
for n, ts in times.items():
    ms = sorted(t * 1e3 for t in ts)
    print(f"{n:14s} median {ms[len(ms)//2]:6.0f} ms   all {[f'{t:.0f}' for t in ms]}")
