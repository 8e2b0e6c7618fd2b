"""In-kernel conversion probability (_prob_nd) vs the host chain.

The megakernel's _prob_nd must reproduce tree._prob_batch (-> get_prob_nonad
-> conversion_prob) at crossing-like states: same ksphere = w*erg scale, same
w_erg = |e7|/sqrt(1-rs/r), t = 0, full-mass metric.  f32 nondimensionalized
kernel vs f64 host — expect ~1e-6 relative, assert well inside the 1e-4
parity contract.
"""

import numpy as np

import jax.numpy as jnp


def _states(B=256, seed=3):
    from adiabatic_raytracer_tpu.config import Scene
    from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
    from adiabatic_raytracer_tpu.ops.geometry import (
        cart_to_sph, celerity_from_cart)

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.3, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    rng = np.random.default_rng(seed)
    r = rng.uniform(12.0, 30.0, B)
    th = np.arccos(rng.uniform(-0.95, 0.95, B))
    ph = rng.uniform(-np.pi, np.pi, B)
    x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                  r * np.cos(th)], axis=1)
    v = rng.normal(size=(B, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    erg = 1e-5 * (1.0 + rng.uniform(0.0, 0.3, B))
    dw = -rng.uniform(0.9, 1.1, B)

    kn = k_norm_cart(jnp.asarray(x), jnp.asarray(v), 0.0, jnp.asarray(erg),
                     sc, sc.mass_ns, is_photon=True, ax_fix=True)
    x_sph = cart_to_sph(jnp.asarray(x))
    w = celerity_from_cart(jnp.asarray(x), kn, sc.mass_ns_eff) / erg[:, None]
    e7 = erg * dw
    return sc, np.asarray(x_sph), np.asarray(w), e7, erg, x


def test_prob_nd_matches_host_chain():
    from adiabatic_raytracer_tpu.config import NumericsConfig
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.geometry import celerity_to_cart_vel
    from adiabatic_raytracer_tpu.ops.tree import _prob_batch

    sc, x_sph, w, e7, erg, x_cart = _states()
    cfg = NumericsConfig(compute_dtype="f32")
    C = mk.SceneConsts(sc, cfg)
    assert C.can_prob

    f32 = np.float32
    u = tuple(jnp.asarray(a.astype(f32)) for a in
              (x_sph[:, 0], x_sph[:, 1], x_sph[:, 2],
               w[:, 0], w[:, 1], w[:, 2], e7))
    p_kernel = np.asarray(mk._prob_nd(C, u, jnp.asarray(erg.astype(f32))))

    # host chain exactly as the tree engine builds it from a PropagateResult
    kc = celerity_to_cart_vel(jnp.asarray(x_sph), jnp.asarray(w * erg[:, None]),
                              sc.mass_ns_eff)
    erg_eff = np.abs(e7)
    p_host, _ = _prob_batch(jnp.asarray(x_cart), jnp.asarray(kc),
                            jnp.asarray(erg_eff), sc, "state")
    p_host = np.asarray(p_host)

    # the host chain goes through sin(arccos(ct)) and NaNs when rounding
    # pushes |ct| past 1 at synthetic near-parallel states; the kernel uses
    # sqrt(max(1-ct^2, 0)) and stays finite — compare on host-finite lanes
    fin = np.isfinite(p_host)
    assert fin.mean() > 0.9
    assert np.all(np.isfinite(p_kernel))
    rel = (np.abs(p_kernel - p_host) /
           np.maximum(np.abs(p_host), 1e-30))[fin]
    assert np.median(rel) < 1e-5, np.median(rel)
    assert np.quantile(rel, 0.99) < 5e-4, np.quantile(rel, 0.99)
