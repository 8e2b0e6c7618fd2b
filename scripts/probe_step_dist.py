import os
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
from adiabatic_raytracer_tpu.ops import megakernel as mk
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
from adiabatic_raytracer_tpu.ops.geometry import cart_to_sph, celerity_from_cart

B = 65536
sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32")
rng = np.random.default_rng(0)
r = rng.uniform(14.0, 24.0, B)
th = np.arccos(rng.uniform(-0.95, 0.95, B))
ph = rng.uniform(-np.pi, np.pi, B)
x = np.stack([r*np.sin(th)*np.cos(ph), r*np.sin(th)*np.sin(ph), r*np.cos(th)], axis=1)
v = rng.normal(size=(B, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
erg = np.full(B, 1e-5*(1+0.5*(220.0/2.99792e5)**2))
x = jnp.asarray(x); v = jnp.asarray(v); erg = jnp.asarray(erg)
k0n = k_norm_cart(x, v, 0.0, erg, sc, sc.mass_ns, is_photon=True, ax_fix=True)
w0 = celerity_from_cart(x, k0n, sc.mass_ns_eff) / erg[:, None]
u0 = jnp.concatenate([cart_to_sph(x), w0, (-erg)[:, None]], axis=1)
lnt0 = jnp.full(B, cfg.ln_t_start)
lnt1 = jnp.full(B, float(np.log(0.1)))
out = jax.jit(lambda u: mk.integrate_mega(u, lnt0, lnt1, erg, x, sc, cfg))(u0)
steps = np.asarray(out[2]).astype(np.int64)
code = np.asarray(out[3])
print("max_steps cfg:", cfg.max_steps)
print("pcts:", {p: int(np.percentile(steps, p)) for p in (50, 75, 90, 95, 99, 99.9, 100)})
print("mean:", steps.mean())
print("code hist:", {int(c): int((code == c).sum()) for c in np.unique(code)})
tiles = steps.reshape(-1, 128)
cur = tiles.max(axis=1).sum() * 128
print("current hw lane-steps:", cur, "useful:", steps.sum(), "eff:", steps.sum()/cur)
# chunked model: perfect compaction, tiles of 128, cost = sum over chunks of ceil(n_active/128)*128*min(chunk, remaining-max... )
for chunk in (32, 64, 96, 128, 192, 256, 384):
    rem = steps.copy()
    cost = 0
    launches = 0
    while (rem > 0).any():
        act = rem[rem > 0]
        # sort so tiles group similar? compaction keeps arrival order; tile cost = min(chunk, tile max)
        ntiles = int(np.ceil(len(act)/128))
        pad = np.zeros(ntiles*128, dtype=np.int64); pad[:len(act)] = np.sort(act)[::-1]
        tilemax = pad.reshape(-1, 128).max(axis=1)
        cost += np.minimum(tilemax, chunk).sum() * 128
        launches += 1
        rem = rem - chunk
        rem[rem < 0] = 0
    print(f"chunk={chunk}: hw lane-steps {cost} ({cur/cost:.2f}x fewer), launches {launches}")
