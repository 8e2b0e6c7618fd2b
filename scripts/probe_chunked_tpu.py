"""TPU A/B: chunked-compaction megakernel vs single launch, headline config."""
import os
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
from adiabatic_raytracer_tpu.ops import megakernel as mk
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
from adiabatic_raytracer_tpu.ops.geometry import cart_to_sph, celerity_from_cart

B = int(os.environ.get("B", "65536"))
sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32")
rng = np.random.default_rng(0)
r = rng.uniform(14.0, 24.0, B)
th = np.arccos(rng.uniform(-0.95, 0.95, B))
ph = rng.uniform(-np.pi, np.pi, B)
x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
              r * np.cos(th)], axis=1)
v = rng.normal(size=(B, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
erg = np.full(B, 1e-5 * (1 + 0.5 * (220.0 / 2.99792e5) ** 2))
x = jnp.asarray(x); v = jnp.asarray(v); erg = jnp.asarray(erg)
k0n = k_norm_cart(x, v, 0.0, erg, sc, sc.mass_ns, is_photon=True, ax_fix=True)
w0 = celerity_from_cart(x, k0n, sc.mass_ns_eff) / erg[:, None]
u0 = jnp.concatenate([cart_to_sph(x), w0, (-erg)[:, None]], axis=1)
lnt0 = jnp.full(B, cfg.ln_t_start)
lnt1 = jnp.full(B, float(np.log(0.1)))


def timeit(f, label):
    out = f(0.0)
    _ = np.asarray(out[0])
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = f(1e-7 * (i + 1))
        _ = np.asarray(out[0])
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    code = np.asarray(out[3])
    ncr = np.asarray(out[4])
    print(f"{label}: {dt:.3f}s = {B/dt:,.0f} rays/s  "
          f"codes {{1: {(code==1).sum()}, 2: {(code==2).sum()}, "
          f"3: {(code==3).sum()}}} cross_frac {(ncr>0).mean():.3f}")
    return out, dt


run_single = os.environ.get("SINGLE", "1") == "1"
single_f = jax.jit(lambda e: mk.integrate_mega(
    u0.at[:, 0].add(e), lnt0, lnt1, erg, x, sc, cfg))
s_out, s_dt = timeit(single_f, "single   ") if run_single else (None, 1.601)

for chunk in [int(c) for c in os.environ.get("CHUNKS", "256").split(",")]:
    f = jax.jit(lambda e, c=chunk: mk.integrate_mega_chunked(
        u0.at[:, 0].add(e), lnt0, lnt1, erg, x, sc, cfg, chunk_iters=c,
        stage_shrink=int(os.environ.get("SHRINK", "4")),
        stage_chunk_growth=int(os.environ.get("GROWTH", "4"))))
    c_out, c_dt = timeit(f, f"chunk={chunk:4d}")
    print(f"   -> speedup {s_dt/c_dt:.2f}x")
