"""TPU A/B: in-kernel tree engine vs the production streaming-window engine.

One production-shaped batch (S events, deep runner_example.sh cutoffs unless
DEEP=0).  Interleaved reps; also cross-checks per-event counters between the
engines (expected equal up to marginal-draw flips).

Knobs: S (default 2048), DEEP (default 1), CHUNKS (comma list of
tree_kernel_chunk values to test, default "0,256").
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
from adiabatic_raytracer_tpu.ops import sampler, tree
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart

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
e = jnp.asarray(np.concatenate(es)[:S])
k_init = k_norm_cart(x, v, 0.0, e, SC, SC.mass_ns, is_photon=True, ax_fix=True)

if os.environ.get("DEEP", "1") == "1":
    tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10,
                      max_nodes=100)
else:
    tcfg = TreeConfig()
LNT_END = float(np.log(1.0 / SC.omega_pul))
keysS = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(3), i))(
    jnp.arange(S))

base = dict(rtol=1e-7, atol=1e-6, compute_dtype="f32", engine="mega")
VARIANTS = {
    "stream128": NumericsConfig(**base, tree_window=min(128, S)),
}
for ch in os.environ.get("CHUNKS", "0,256").split(","):
    if ch:
        VARIANTS[f"kernel_ch{ch}"] = NumericsConfig(
            **base, tree_engine="kernel", tree_kernel_chunk=int(ch))
# in-kernel refill engine variants: REFILLS = comma list of tree_refill
# values (1 = auto 1024-event partitions), RK = refill boundary period
for rf in os.environ.get("REFILLS", "").split(","):
    if rf:
        VARIANTS[f"refill_{rf}_k{os.environ.get('RK', '8')}"] = \
            NumericsConfig(**base, tree_engine="kernel", tree_refill=int(rf),
                           tree_refill_k=int(os.environ.get("RK", "8")))

fns = {n: jax.jit(lambda ks, x, k, e, _c=c: tree.forward_tree(
    ks, x, k, e, SC, _c, tcfg, lnt_end=LNT_END)) for n, c in VARIANTS.items()}


def run_once(name):
    t0 = time.perf_counter()
    out = fns[name](keysS, x, k_init, e)
    np.asarray(out.count)  # real fetch: block_until_ready lies on axon
    return time.perf_counter() - t0, out


outs = {}
for n in VARIANTS:
    t, o = run_once(n)
    outs[n] = o
    print(f"compile+first {n}: {t:.2f}s", flush=True)

times = {n: [] for n in VARIANTS}
for rep in range(4):
    for n in VARIANTS:
        t, _ = run_once(n)
        times[n].append(t)
for n, ts in times.items():
    ms = sorted(t * 1e3 for t in ts)
    print(f"{n:14s} median {ms[len(ms)//2]:6.0f} ms   all {[f'{t:.0f}' for t in ms]}")

ref = outs["stream128"]
for n, o in outs.items():
    if n == "stream128":
        continue
    eqc = np.mean(np.asarray(o.count) == np.asarray(ref.count))
    eqm = np.mean(np.asarray(o.count_main) == np.asarray(ref.count_main))
    eqi = np.mean(np.asarray(o.info) == np.asarray(ref.info))
    # replay fraction proxy: events whose final count exceeds the kernel's
    # NF=8 capacity (the merged info no longer carries the sentinel)
    repl = np.mean(np.asarray(ref.count_main) > 8)
    print(f"{n}: count match {eqc:.4f}  count_main {eqm:.4f}  info {eqi:.4f}"
          f"  (host replays ~{repl:.4f})")
    print(f"  finals/event kern {np.asarray(o.count_main).mean():.3f}"
          f" vs stream {np.asarray(ref.count_main).mean():.3f};"
          f" nodes/event {np.asarray(o.count).mean():.3f}"
          f" vs {np.asarray(ref.count).mean():.3f}")
