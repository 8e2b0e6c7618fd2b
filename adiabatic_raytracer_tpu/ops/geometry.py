"""Coordinate and momentum transforms: Cartesian <-> spherical, celerity.

These mirror the inline transform blocks of `propagate`
(RayTracer.jl:196-216, 404-416) and `k_sphere` (983-1008).

State conventions (as in the reference):
  * x_sph = [r, theta, phi] with r in km
  * "celerity" momenta w = (p_r, p_theta, p_phi) (covariant, lower index),
    built from a Cartesian direction vector by
        v_pl = (dr/dt, r dtheta/dt, r sin(theta) dphi/dt)
        w    = (v_r / sqrt(A), v_th * r, v_ph * r sin th) / A,  A = 1 - r_s/r
  * the integrator state stores w / erg_inf (order-1 values).
"""

from __future__ import annotations

import jax.numpy as jnp

from adiabatic_raytracer_tpu.models.metric import lapse_A, metric_inverse


def cart_to_sph(x):
    """(..., 3) Cartesian -> [r, theta, phi]."""
    r = jnp.sqrt(jnp.sum(x * x, axis=-1))
    theta = jnp.arccos(x[..., 2] / r)
    phi = jnp.arctan2(x[..., 1], x[..., 0])
    return jnp.stack([r, theta, phi], axis=-1)


def sph_to_cart(x_sph):
    r, theta, phi = x_sph[..., 0], x_sph[..., 1], x_sph[..., 2]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * ct], axis=-1)


def cart_vel_to_sph(x_cart, v_cart):
    """Cartesian velocity -> (dr/dt, r dth/dt, r sth dph/dt) (RayTracer.jl:205-206)."""
    r = jnp.sqrt(jnp.sum(x_cart * x_cart, axis=-1))
    sin_theta = jnp.sqrt(jnp.clip(1.0 - (x_cart[..., 2] / r) ** 2, 1e-30, None))
    dr_dt = jnp.sum(x_cart * v_cart, axis=-1) / r
    v_th = (x_cart[..., 2] * dr_dt - r * v_cart[..., 2]) / (r * sin_theta)
    v_ph = (-x_cart[..., 1] * v_cart[..., 0] + x_cart[..., 0] * v_cart[..., 1]) / (r * sin_theta)
    return jnp.stack([dr_dt, v_th, v_ph], axis=-1)


def celerity_from_cart(x_cart, v_cart, mass_ns):
    """Cartesian direction -> covariant celerity w (RayTracer.jl:209-211).

    Units: [eV, eV km, eV km] when v_cart carries an energy scale; the overall
    scale is arbitrary for direction vectors (later normalized on-shell).
    """
    x_sph = cart_to_sph(x_cart)
    r = x_sph[..., 0]
    sin_theta = jnp.sin(x_sph[..., 1])
    v_pl = cart_vel_to_sph(x_cart, v_cart)
    a = lapse_A(r, mass_ns)
    w = jnp.stack(
        [
            v_pl[..., 0] / jnp.sqrt(a),
            v_pl[..., 1] * r,
            v_pl[..., 2] * (r * sin_theta),
        ],
        axis=-1,
    ) / a[..., None]
    return w


def celerity_to_cart_vel(x_sph, w, mass_ns, a=None):
    """Covariant celerity w -> Cartesian proper velocity (RayTracer.jl:406-416).

    v_pl = [w_r sqrt(A), w_th / r, w_ph / (r sth)] * A, then rotated to
    Cartesian.  The caller multiplies in the energy scale (erg) as needed.
    Pass `a` to override the lapse (e.g. interior-scaled, RayTracer.jl:398-406).
    """
    r, theta, phi = x_sph[..., 0], x_sph[..., 1], x_sph[..., 2]
    if a is None:
        a = lapse_A(r, mass_ns)
    v_r = w[..., 0] * jnp.sqrt(a) * a
    v_th = w[..., 1] / r * a
    v_ph = w[..., 2] / (r * jnp.sin(theta)) * a
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    v_tmp = st * v_r + ct * v_th
    vx = cp * v_tmp - sp * v_ph
    vy = sp * v_tmp + cp * v_ph
    vz = ct * v_r - st * v_th
    return jnp.stack([vx, vy, vz], axis=-1)


def spatial_dot(x_sph, a, b, mass_ns):
    """Covariant 3-dot sum_i g^{ii} a_i b_i (spatial_dot, RayTracer.jl:973-981)."""
    g_tt, g_rr, g_thth, g_pp = metric_inverse(x_sph, mass_ns)
    return g_rr * a[..., 0] * b[..., 0] + g_thth * a[..., 1] * b[..., 1] + g_pp * a[..., 2] * b[..., 2]


def spatial_norm(x_sph, a, mass_ns):
    return jnp.sqrt(spatial_dot(x_sph, a, a, mass_ns))
