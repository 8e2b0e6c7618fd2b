"""Pallas TPU kernels for hot grid evaluations.

First kernel: the conversion-surface sampler's dense line scan
(ops/sampler.py) — evaluating the thick-surface level-crossing condition at
[B, N] points along B sampling lines.  Per point this is ~60 elementwise ops
(dipole trig, metric, celerity transform, axion-shell normalization, k_par,
Hamiltonian); fusing them into one VMEM-resident kernel removes per-op
dispatch and HBM round-trips for the largest regular workload in the
pipeline.

The math mirrors ops/sampler.py:_line_condition exactly (RayTracer.jl:
1547-1583) in a vectorized, inverse-trig-free form: at t=0 the dipole's
azimuthal trig comes directly from Cartesian ratios, so the whole kernel is
mul/add/sqrt/div — ops that are exact on the TPU VPU in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adiabatic_raytracer_tpu.config import Scene
from adiabatic_raytracer_tpu.constants import (
    C_KM,
    G_NEW,
    GAUSS_TO_EV2,
    HBAR,
    INV_ALPHA,
    M_E_EV,
    SQRT_4PI_ALPHA,
)


def _condition_block(px, py, pz, vlx, vly, vlz, erg_inf, cm, sm, omega_pul,
                     b0, r_ns, mass_ns, mass_a, isotropic: bool):
    """Vectorized thick-surface condition at Cartesian points [T, L].

    Every input point array is [T, L]; per-line parameters are broadcast
    [T, 1].  Pure elementwise math (VPU)."""
    rr = jnp.sqrt(px * px + py * py + pz * pz)
    cz = pz / rr
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cz * cz, 1e-30, None))
    rs0 = 2.0 * G_NEW * mass_ns / C_KM**2
    aa = jnp.where(rr < r_ns, 1.0, 1.0 - rs0 / rr)

    # celerity of the local-velocity direction (RayTracer.jl:1563-1566)
    dr_dt = (px * vlx + py * vly + pz * vlz) / rr
    v_th = (pz * dr_dt - rr * vlz) / (rr * sin_theta)
    v_ph = (-py * vlx + px * vly) / (rr * sin_theta)
    w_r = dr_dt / jnp.sqrt(aa) / aa
    w_t = v_th * rr / aa
    w_p = v_ph * (rr * sin_theta) / aa

    # inverse metric (models/metric.py; exterior only relevant: crossings with
    # r<r_ns are filtered later, and the interior continuation matches at r_ns)
    inside = rr <= r_ns
    rs = jnp.where(inside, rs0 * (rr / r_ns) ** 3, rs0)
    one_m = 1.0 - rs / rr
    g_tt = jnp.where(inside,
                     -4.0 / (3.0 * jnp.sqrt(jnp.clip(1.0 - rs / r_ns, 1e-30, None))
                             - jnp.sqrt(jnp.clip(1.0 - rr**2 * rs / r_ns**3, 1e-30, None))) ** 2,
                     -1.0 / one_m)
    g_rr = jnp.where(inside, 1.0 - rr**2 * rs / r_ns**3, one_m)
    g_thth = 1.0 / rr**2
    g_pp = 1.0 / (rr * sin_theta) ** 2

    wsq = g_rr * w_r**2 + g_thth * w_t**2 + g_pp * w_p**2
    nrm = jnp.sqrt((-(erg_inf**2) * g_tt - mass_a**2) / wsq)
    w_r = w_r * nrm
    w_t = w_t * nrm
    w_p = w_p * nrm

    # GJ dipole field at the point (models/magnetosphere.py:dipole_sph).
    # t = 0 in the sampler (RayTracer.jl:1550), so psi = phi and its trig
    # comes straight from the Cartesian ratios — no inverse trig needed
    # (atan2/arccos do not lower in Pallas TPU anyway).
    bnorm = b0 * (r_ns / rr) ** 3 / 2.0
    ct, st = cz, sin_theta
    cp = px / (rr * st)
    sp = py / (rr * st)
    br = 2.0 * bnorm * (cm * ct + sm * st * cp)
    btheta = bnorm * (cm * st - sm * ct * cp)
    bphi = bnorm * sm * sp
    bz = br * ct - btheta * st
    nelec = jnp.abs(2.0 * omega_pul * bz) / SQRT_4PI_ALPHA * GAUSS_TO_EV2 * HBAR
    wp = jnp.sqrt(4.0 * jnp.pi * nelec / INV_ALPHA / M_E_EV)

    if isotropic:
        kp = jnp.zeros_like(wp)
    else:
        bl_r = br / jnp.sqrt(g_rr)
        bl_t = btheta / jnp.sqrt(g_thth)
        bl_p = bphi / jnp.sqrt(g_pp)
        bmag = jnp.sqrt(g_rr * bl_r**2 + g_thth * bl_t**2 + g_pp * bl_p**2)
        kp = (g_rr * w_r * bl_r + g_thth * w_t * bl_t + g_pp * w_p * bl_p) / bmag

    ksqr = g_tt * erg_inf**2 + g_rr * w_r**2 + g_thth * w_t**2 + g_pp * w_p**2
    e2 = erg_inf**2 / g_rr
    return 0.5 * (ksqr + wp**2 * (e2 - kp**2) / e2) / erg_inf**2


def _kernel(par_ref, s_ref, out_ref, *, scene, iso):
    # per-line params packed on the lane axis (first 10 lanes of a 128 block):
    # [x0(3), vvec(3), vloc(3), erg]
    cm, sm, omega_pul, b0, r_ns, mass_ns, mass_a = scene
    s = s_ref[0:1, :]                          # [1, L]
    p = lambda c: par_ref[:, c][:, None]       # [T, 1]
    px = p(0) + s * p(3)
    py = p(1) + s * p(4)
    pz = p(2) + s * p(5)
    out_ref[:, :] = _condition_block(
        px, py, pz, p(6), p(7), p(8), p(9),
        cm, sm, omega_pul, b0, r_ns, mass_ns, mass_a, iso,
    )


def line_scan_pallas(x0, vvec, vloc, erg_inf, s_grid, sc: Scene, mass_ns,
                     *, tile_b: int = 8, tile_n: int = 512):
    """Evaluate the sampling-line condition on a [B, N] grid with one fused
    Pallas kernel.  f32 throughout.  B must be a multiple of tile_b and
    len(s_grid) a multiple of tile_n (pad at the call site).

    Per-line parameters are packed into a lane-aligned [B, 128] block (Mosaic
    rejects 3-wide lane dimensions); the s grid rides a [8, N] broadcast."""
    B = x0.shape[0]
    N = s_grid.shape[0]
    assert B % tile_b == 0 and N % tile_n == 0, (B, N)
    f32 = jnp.float32
    params = jnp.zeros((B, 128), f32)
    params = params.at[:, 0:3].set(x0.astype(f32))
    params = params.at[:, 3:6].set(vvec.astype(f32))
    params = params.at[:, 6:9].set(vloc.astype(f32))
    params = params.at[:, 9].set(erg_inf.astype(f32))
    s_block = jnp.broadcast_to(s_grid.astype(f32)[None, :], (8, N))
    import math

    scene = tuple(float(v) for v in (math.cos(float(sc.theta_m)),
                                     math.sin(float(sc.theta_m)),
                                     sc.omega_pul, sc.b0, sc.r_ns,
                                     mass_ns, sc.mass_a))
    kernel = functools.partial(_kernel, scene=scene, iso=sc.isotropic)
    # trace the kernel with x64 disabled: under jax_enable_x64 weak python
    # scalars can materialize as f64 literals, and Mosaic cannot legalize the
    # resulting f64->f32 truncf inside the kernel
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, N), f32),
            grid=(B // tile_b, N // tile_n),
            in_specs=[
                pl.BlockSpec((tile_b, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, tile_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )(params, s_block)
