"""Smoke: chunked-compaction megakernel vs single launch (CPU interpret)."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
from adiabatic_raytracer_tpu.ops import megakernel as mk
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
from adiabatic_raytracer_tpu.ops.geometry import cart_to_sph, celerity_from_cart

sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
cfg = NumericsConfig(interp_points=8, compute_dtype="f32", max_steps=3000)
B = 256
rng = np.random.default_rng(3)
r = rng.uniform(14.0, 24.0, B)
th = np.arccos(rng.uniform(-0.9, 0.9, B))
ph = rng.uniform(-np.pi, np.pi, B)
x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
              r * np.cos(th)], axis=1)
v = rng.normal(size=(B, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
erg = np.full(B, 1e-5 * (1 + 0.5 * (220 / 2.99792e5) ** 2))
t_end = 1e-3

x = jnp.asarray(x); v = jnp.asarray(v); erg = jnp.asarray(erg)
k0n = k_norm_cart(x, v, 0.0, erg, sc, sc.mass_ns, is_photon=True, ax_fix=True)
w0 = celerity_from_cart(x, k0n, sc.mass_ns_eff) / erg[:, None]
u0 = jnp.concatenate([cart_to_sph(x), w0, (-erg)[:, None]], axis=1)
lnt0 = jnp.full(B, cfg.ln_t_start)
lnt1 = jnp.full(B, float(np.log(t_end)))

with pltpu.force_tpu_interpret_mode():
    single = mk.integrate_mega(u0, lnt0, lnt1, erg, x, sc, cfg)
    chunked = mk.integrate_mega_chunked(u0, lnt0, lnt1, erg, x, sc, cfg,
                                        chunk_iters=75)

names = ["uf", "lntf", "steps", "code", "ncross", "cru", "crlnt", "save_mid",
         "pcx", "nodes", "is_ph", "nfine"]
for n, a, b in zip(names, single, chunked):
    a = np.asarray(a); b = np.asarray(b)
    if n in ("code", "ncross", "is_ph"):
        neq = int((a != b).sum())
        print(f"{n}: mismatches {neq}")
        assert neq == 0, (n, np.nonzero(a != b))
    elif n in ("steps", "nfine", "nodes"):
        print(f"{n}: max |diff| {np.abs(a - b).max()}")
    else:
        d = np.abs(a - b)
        s = np.abs(a) + 1e-12
        print(f"{n}: max rel diff {(d / s).max():.3e}  max abs {d.max():.3e}")
steps_s = np.asarray(single[2])
print("steps p50/p99/max:", np.percentile(steps_s, [50, 99, 100]))
print("OK")
