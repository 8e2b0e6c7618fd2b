"""Pallas megakernel: the entire adaptive DP5 integrator inside one TPU kernel.

The XLA pool integrator's per-iteration latency is dispatch-bound (~1 ms for
B <= 8k), and its lockstep spans the whole batch.  This kernel keeps a tile of
8x128 = 1024 rays resident in VMEM and runs the full adaptive loop on-core:

  * per-iteration cost is pure VPU arithmetic (~8 kflops/ray/step);
  * lockstep shrinks from the whole batch to one tile (straggler waste is
    bounded per 1024 rays, and tiles run independently across the grid);
  * physics gradients are ONE reverse-mode `jax.vjp` pass of a block-wise
    nondimensionalized Hamiltonian (B/|b0|, k/mass_a — O(1) intermediates
    make f32 reverse-mode exact; raw scales lose ~5 digits), f32 on the VPU (no trig: the dipole
    azimuthal factors come from Cartesian ratios and the rotation phase
    cos/sin(omega*t) from the same Cody–Waite pattern would be needed only
    for t-dependence; here the *time* dependence enters via psi = phi -
    omega*t, handled with the precise polynomial sin/cos on scalars-free
    block math below).

Precision: state (u, lnt) is float-float (two f32 words, ~1e-14 effective) so
13-decade log-time steps accumulate; the RHS is evaluated at the hi word
(f32-grid trajectories — per-step rounding ~1 ulp, far inside the 1e-4 parity
contract, cf. tests/test_precision.py).

Scope (stage 1): photon rays, event detection with a single recorded crossing
(the forward-tree production mode), NS-surface kill, stall cut, endpoint +
step counts + crossing state outputs.  The trajectory save grid is handled by
the caller from the endpoint (ntimes=3 production contract keeps start/end).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
from adiabatic_raytracer_tpu.constants import (
    C_KM,
    G_NEW,
    GAUSS_TO_EV2,
    HBAR,
    INV_ALPHA,
    M_E_EV,
    SQRT_4PI_ALPHA,
)

# DP5 tableau (ops/integrator.py)
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0)
_A = (
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
)
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84)
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40)
_E = tuple(b5 - b4 for b5, b4 in zip(_B5 + (0.0,), _B4))

# Cody–Waite f32 sin/cos for the rotation phase (utils/precise.py pattern,
# inlined so only mul/add/select lower into the kernel)
_PI = math.pi


def _split3(v, bits=11):
    def trunc(x):
        if x == 0.0:
            return 0.0
        e = math.floor(math.log2(abs(x)))
        q = 2.0 ** (e - bits + 1)
        return math.floor(x / q) * q

    hi = trunc(v)
    mid = trunc(v - hi)
    return float(hi), float(mid), float(v - hi - mid)


_PI_HI, _PI_MID, _PI_LO = _split3(_PI)

def _fit_trig():
    import numpy as _np

    n = 2000
    x = _np.pi / 2 * _np.cos(_np.linspace(0, _np.pi, n))
    z = x**2
    A = _np.vander(z, 6, increasing=True)
    sin_c = _np.linalg.lstsq(A, _np.sin(x) / _np.where(_np.abs(x) < 1e-9, 1, x),
                             rcond=None)[0]
    cos_c = _np.linalg.lstsq(_np.vander(z, 7, increasing=True), _np.cos(x),
                             rcond=None)[0]
    return tuple(float(v) for v in sin_c), tuple(float(v) for v in cos_c)


_SIN_C, _COS_C = _fit_trig()


def _sincos(x):
    n = jnp.round(x * (1.0 / _PI))
    r = ((x - n * _PI_HI) - n * _PI_MID) - n * _PI_LO
    odd = jnp.mod(n, 2.0) > 0.5
    z = r * r
    s = _SIN_C[-1]
    for c in _SIN_C[-2::-1]:
        s = s * z + c
    s = s * r
    cc = _COS_C[-1]
    for c in _COS_C[-2::-1]:
        cc = cc * z + c
    return jnp.where(odd, -s, s), jnp.where(odd, -cc, cc)


def _sincos_gate(x):
    """Gate-precision sincos (~2e-4 on |n*pi| reductions up to O(10^2)):
    single-constant pi range reduction + degree-7/6 Taylor.  Used ONLY for
    the coarse event-scan gate's interior condition samples — the gate
    fires on sign flips and |g| < scan_gate_theta (0.08 with a measured 2x
    margin), four orders above this error, and every committed crossing is
    re-bracketed by the precise 50-point fine scan.  ~Half the ops of the
    Cody-Waite _sincos."""
    n = jnp.round(x * (1.0 / _PI))
    r = x - n * _PI
    odd = jnp.mod(n, 2.0) > 0.5
    z = r * r
    s = r * (1.0 + z * (-1.0 / 6.0 + z * (1.0 / 120.0 - z * (1.0 / 5040.0))))
    cc = 1.0 + z * (-0.5 + z * (1.0 / 24.0 - z * (1.0 / 720.0)))
    return jnp.where(odd, -s, s), jnp.where(odd, -cc, cc)


def _exp32_gate(x):
    """Gate-precision exp (~1e-4 relative): same bitcast 2^n scaling as
    _exp32 with a degree-4 Taylor on the reduced argument."""
    ln2 = math.log(2.0)
    n = jnp.round(x * (1.0 / ln2))
    r = x - n * ln2
    out = 1.0 + r * (1.0 + r * (0.5 + r * (1 / 6 + r / 24)))
    ni = jnp.clip(n, -126.0, 127.0).astype(jnp.int32)
    two_n = lax.bitcast_convert_type(((ni + 127) << 23).astype(jnp.int32),
                                     jnp.float32)
    return jnp.where(x < -87.0, 0.0, out * two_n)


def _exp32(x):
    ln2 = math.log(2.0)
    h, m, l = _split3(ln2)
    n = jnp.round(x * (1.0 / ln2))
    r = ((x - n * h) - n * m) - n * l
    # exp(r) for |r| <= ln2/2: degree-7 Taylor is ~1e-8 accurate here
    out = 1.0 + r * (1.0 + r * (0.5 + r * (1 / 6 + r * (1 / 24 + r * (1 / 120 + r * (1 / 720 + r / 5040))))))
    ni = jnp.clip(n, -126.0, 127.0).astype(jnp.int32)
    two_n = lax.bitcast_convert_type(((ni + 127) << 23).astype(jnp.int32), jnp.float32)
    return jnp.where(x < -87.0, 0.0, out * two_n)


def _ff_add(hi, lo, d):
    """(hi, lo) + d with error compensation (TwoSum)."""
    s = hi + d
    bb = s - hi
    err = (hi - (s - bb)) + (d - bb)
    lo2 = lo + err
    # renormalize
    hi2 = s + lo2
    lo3 = lo2 - (hi2 - s)
    return hi2, lo3


def can_prob(sc: Scene) -> bool:
    """In-kernel conversion probability covers the production configuration
    only: anisotropic Melrose dispersion, no boundary layer, curved space.
    (Propagation itself — the RHS and the crossing condition — DOES cover
    bndry_lyr > 0 in-kernel, see _bndry_t; only the probability kernel and
    therefore the in-kernel tree engine fall back to the host chain.)"""
    return (bool(sc.melrose) and not bool(sc.isotropic)
            and not bool(sc.flat) and float(sc.bndry_lyr) <= 0)


class SceneConsts:
    """Static f32 scalars baked into the kernel."""

    def __init__(self, sc: Scene, cfg: NumericsConfig):
        self.cm = math.cos(float(sc.theta_m))
        self.sm = math.sin(float(sc.theta_m))
        self.omega = float(sc.omega_pul)
        self.b0 = float(sc.b0)
        self.r_ns = float(sc.r_ns)
        self.mass_ns = float(sc.mass_ns_eff)
        self.mass_a = float(sc.mass_a)
        self.rs0 = 2.0 * G_NEW * self.mass_ns / C_KM**2
        self.isotropic = bool(sc.isotropic)
        self.rtol = float(cfg.rtol)
        self.atol = float(cfg.atol)
        self.dt_min = float(cfg.dt_min)
        self.safety = float(cfg.safety)
        self.min_fac = float(cfg.min_dt_factor)
        self.max_fac = float(cfg.max_dt_factor)
        # Lund/Hairer PI stabilization (dopri5.f): 0 = plain I controller
        self.pi_beta = float(cfg.pi_beta)
        self.expo1 = 0.2 - 0.75 * self.pi_beta
        self.max_steps = int(cfg.max_steps)
        self.it_cap = int(cfg.max_steps)  # per-LAUNCH cap (chunked resume)
        self.interp = int(cfg.interp_points)
        self.interp_coarse = int(cfg.interp_coarse)
        self.gate_theta = float(cfg.scan_gate_theta)
        # f32 root refinement: the bracket starts at tau-width 1/interp, so
        # (24 - log2(interp)) halvings reach 2^-24 = the f32 ulp of tau —
        # more iterations cannot move the result
        self.bisect = int(min(cfg.bisect_iters,
                              24 - int(math.log2(max(cfg.interp_points, 1)))))
        self.stall_window = int(cfg.stall_window)
        self.stall_min = float(cfg.stall_min_progress)
        # Bench-only cost-attribution knob (scripts/probe_step_split.py):
        # "full" (production) | "scan" (no event block) | "coarse" (coarse
        # scan only, no fine pass/event block) | "rhs" (no condition evals at
        # all).  Trace-time switch, read from the environment because the
        # kernel cache keys on config statics, not env — the probe runs ONE
        # variant per process.  Never set in production.
        self.profile = os.environ.get("MEGA_PROFILE", "full")
        self.species = "photon"  # overridden by integrate_mega
        # Nondimensionalization for the reverse-mode RHS (see _rhs): B in
        # units of |b0|, momenta/energies in units of mass_a, H in units of
        # mass_a^2.  wp2_scale = wp^2/(mass_a^2 |b_z/b0|) is O(10), so every
        # intermediate of the scaled Hamiltonian is O(1) and a single f32
        # vjp reproduces the f64 forward-mode gradients to ~2e-7 median
        # (raw-scale f32 reverse-mode is ~1e-2 — B-scale cancellation).
        self.b0_sign = 1.0 if self.b0 >= 0 else -1.0
        self.wp2_scale = (
            4.0 * math.pi / (INV_ALPHA * M_E_EV)
            * (2.0 * abs(self.omega * self.b0) / SQRT_4PI_ALPHA
               * GAUSS_TO_EV2 * HBAR)
            / self.mass_a**2
        )
        # --- in-kernel conversion probability (_prob_nd) constants ---
        # The conversion chain always uses the FULL NS mass for the metric
        # (get_Prob_nonAD closes over the global Mass_NS; Cristoffel computes
        # GM from Mass_NS regardless of `flat`, RayTracer.jl:512).
        self.mass_ns_full = float(sc.mass_ns)
        self.rs0_full = 2.0 * G_NEW * self.mass_ns_full / C_KM**2
        self.gm_full = G_NEW * self.mass_ns_full / C_KM**2
        self.ax_g = float(sc.ax_g)
        b_s = abs(self.b0) * GAUSS_TO_EV2  # B scale in eV^2
        # P = prob_scale * prefactor * bmag_t^2 / (|vhat.gradE|_t * vloc),
        # everything else nondimensionalized by mass_a / |b0|
        self.prob_scale = (
            (math.pi / 2.0) * (self.ax_g * 1e-9 * b_s) ** 2
            / (self.mass_a * C_KM * HBAR)
        )
        self.can_prob = can_prob(sc)
        # --- boundary-layer plasma addition (RayTracer.jl:1155-1162) ---
        # pole_val = omega_p at bz = b0, i.e. mass_a * sqrt(wp2_scale); kept
        # in mass_a units like everything in the nondimensionalized kernel.
        # rmax is the aligned-dipole conversion-surface radius.  Trace-time
        # static: bndry_lyr <= 0 compiles the term away entirely.
        self.bndry_lyr = float(sc.bndry_lyr)
        self.has_bndry = self.bndry_lyr > 0.0
        self.bndry_pole_t = math.sqrt(self.wp2_scale)
        self.bndry_rmax = self.r_ns * self.bndry_pole_t ** (2.0 / 3.0)
        # RHS gradient mode: "hand" (analytic adjoint exploiting the dipole/
        # metric algebra, _grad_h_hand) or "vjp" (one reverse-mode pass of
        # _hamiltonian_nd).  Env override for one-process A/B probes, like
        # MEGA_PROFILE.
        self.rhs_mode = os.environ.get("MEGA_RHS", str(cfg.rhs_mode))
        self.cond_mode = os.environ.get("MEGA_COND",
                                        str(getattr(cfg, "cond_mode", "fast")))
        self.gate_trig = os.environ.get(
            "MEGA_GATE_TRIG", str(getattr(cfg, "gate_trig", "native")))


def _metric(C, r, sin_th, rs0=None):
    inside = r <= C.r_ns
    if rs0 is None:
        rs0 = C.rs0
    rs = jnp.where(inside, rs0 * (r / C.r_ns) ** 3, rs0)
    one_m = 1.0 - rs / r
    g_tt = jnp.where(
        inside,
        -4.0 / (3.0 * jnp.sqrt(jnp.clip(1.0 - rs / C.r_ns, 1e-30, None))
                - jnp.sqrt(jnp.clip(1.0 - r**2 * rs / C.r_ns**3, 1e-30, None))) ** 2,
        -1.0 / one_m,
    )
    g_rr = jnp.where(inside, 1.0 - r**2 * rs / C.r_ns**3, one_m)
    return g_tt, g_rr, 1.0 / r**2, 1.0 / (r * sin_th) ** 2


def _dipole_unit(C, r, cz, sin_th, cphi, sphi, time, sincos=_sincos):
    """GJ dipole orthonormal components in units of |b0| (sign carried via
    b0_sign); the rotation by omega*t uses cos/sin(psi) = cos/sin(phi -
    omega t) via angle addition.  Shared by the unscaled field (_dipole, used
    by the crossing condition) and the nondimensionalized Hamiltonian
    (_hamiltonian_nd) so the dynamics and the event scan cannot drift."""
    swt, cwt = sincos(C.omega * time)
    cp = cphi * cwt + sphi * swt      # cos(phi - wt)
    sp = sphi * cwt - cphi * swt      # sin(phi - wt)
    bnorm = C.b0_sign * (C.r_ns / r) ** 3 * 0.5
    br = 2.0 * bnorm * (C.cm * cz + C.sm * sin_th * cp)
    btheta = bnorm * (C.cm * sin_th - C.sm * cz * cp)
    bphi = bnorm * C.sm * sp
    return br, btheta, bphi


def _dipole(C, r, cz, sin_th, cphi, sphi, time):
    """GJ dipole in physical units (Gauss): |b0| x _dipole_unit."""
    a = abs(C.b0)
    br, btheta, bphi = _dipole_unit(C, r, cz, sin_th, cphi, sphi, time)
    return a * br, a * btheta, a * bphi


def _bndry_t(C, r, exp=_exp32):
    """Boundary-layer omega_p addition in mass_a units
    (models/magnetosphere._bndry_lyr_term, RayTracer.jl:1155-1162).  The
    reference applies the term for r >= r_NS and then zeroes the whole wp at
    r <= r_NS (zero_in), so the net support is r > r_NS.  AD through _exp32
    is exact: the bitcast 2^n factor is constant w.r.t. the input (round has
    zero gradient) and the polynomial differentiates to itself."""
    term = C.bndry_pole_t * (C.r_ns / r) ** 1.5 * exp(
        -(r - C.bndry_rmax * C.bndry_lyr) / (0.1 * C.bndry_rmax))
    return jnp.where(r > C.r_ns, term, 0.0)


def _omega_p(C, br, btheta, cz, sin_th, r, zero_in=True):
    bz = br * cz - btheta * sin_th
    nelec = jnp.abs(2.0 * C.omega * bz) / SQRT_4PI_ALPHA * GAUSS_TO_EV2 * HBAR
    wp = jnp.sqrt(4.0 * jnp.pi * nelec / INV_ALPHA / M_E_EV)
    if zero_in:
        wp = jnp.where(r <= C.r_ns, 0.0, wp)
    return wp


def _hamiltonian_nd(C, x1, x2, x3, kt1, kt2, kt3, time, ergt):
    """Nondimensionalized Melrose Hamiltonian: inputs kt = k/mass_a,
    ergt = erg/mass_a; B internally in units of |b0|; returns H/mass_a^2.
    Value-identical (up to rounding) to the canonical unscaled form
    (ops/dispersion.py:hamiltonian_photon, RayTracer.jl:550-551); every
    intermediate is O(1), which is what makes the single-vjp reverse-mode
    f32 gradient in _rhs accurate (raw-scale f32 reverse-mode loses ~5
    digits through the B-field chain)."""
    r = jnp.maximum(x1, C.r_ns)
    s_th, c_th = _sincos(x2)
    s_ph, c_ph = _sincos(x3)
    g_tt, g_rr, g_thth, g_pp = _metric(C, r, s_th)
    br, btheta, bphi = _dipole_unit(C, r, c_th, s_th, c_ph, s_ph, time)
    bz = br * c_th - btheta * s_th
    wp2t = C.wp2_scale * jnp.abs(bz)
    wp2t = jnp.where(r <= C.r_ns, 0.0, wp2t)
    ksqr = g_tt * ergt**2 + g_rr * kt1**2 + g_thth * kt2**2 + g_pp * kt3**2
    if C.isotropic:
        return 0.5 * (ksqr + wp2t)
    bl_r = br / jnp.sqrt(g_rr)
    bl_t = btheta / jnp.sqrt(g_thth)
    bl_p = bphi / jnp.sqrt(g_pp)
    bmag = jnp.sqrt(g_rr * bl_r**2 + g_thth * bl_t**2 + g_pp * bl_p**2)
    kp = (g_rr * kt1 * bl_r + g_thth * kt2 * bl_t + g_pp * kt3 * bl_p) / bmag
    e2 = ergt**2 / g_rr
    return 0.5 * (ksqr + wp2t * (e2 - kp**2) / e2)


def _ham_axion_nd(C, x1, x2, x3, kt1, kt2, kt3, ergt):
    """Axion Hamiltonian in the same H/mass_a^2 units as _hamiltonian_nd."""
    s_th, _ = _sincos(x2)
    g_tt, g_rr, g_thth, g_pp = _metric(C, x1, s_th)
    return 0.5 * (g_tt * ergt**2 + g_rr * kt1**2 + g_thth * kt2**2
                  + g_pp * kt3**2)


def _ham_bndry_diff_nd(C, x1, x2, x3, kt1, kt2, kt3, time, ergt):
    """H_full - H_no-bndry of the nondim photon Hamiltonian when the
    boundary layer is on: the wp^2 excess 0.5*(2*wp*bt + bt^2) times the
    Melrose anisotropy factor (e2 - kp^2)/e2.  bt itself is
    time-independent; the time dependence enters via wp(t) and kp(t) (the
    rotating dipole), so the RHS's boundary-layer time-derivative quirk
    (RayTracer.jl:84-88, ops/propagate.py:151-154) reduces to one scalar jvp
    of this function.  Only compiled when C.has_bndry."""
    r = jnp.maximum(x1, C.r_ns)
    s_th, c_th = _sincos(x2)
    s_ph, c_ph = _sincos(x3)
    _, g_rr, g_thth, g_pp = _metric(C, r, s_th)
    br, btheta, bphi = _dipole_unit(C, r, c_th, s_th, c_ph, s_ph, time)
    bz = br * c_th - btheta * s_th
    wp2t = C.wp2_scale * jnp.abs(bz)
    wpt = jnp.sqrt(jnp.where(r <= C.r_ns, 0.0, wp2t))
    bt = _bndry_t(C, r)
    dwp2 = 2.0 * wpt * bt + bt * bt
    if C.isotropic:
        return 0.5 * dwp2
    bl_r = br / jnp.sqrt(g_rr)
    bl_t = btheta / jnp.sqrt(g_thth)
    bl_p = bphi / jnp.sqrt(g_pp)
    bmag = jnp.sqrt(g_rr * bl_r**2 + g_thth * bl_t**2 + g_pp * bl_p**2)
    kp = (g_rr * kt1 * bl_r + g_thth * kt2 * bl_t + g_pp * kt3 * bl_p) / bmag
    e2 = ergt**2 / g_rr
    return 0.5 * dwp2 * (e2 - kp**2) / e2


def _condition_canonical(C, u, lnt):
    """Thick-surface crossing condition, canonical form — the literal
    transcription of ops/propagate.py:crossing_condition (RayTracer.jl:
    262-296): renormalize the momenta onto the axion shell, then evaluate
    the Melrose photon Hamiltonian, normalized by omega^2.  Kept as the
    equivalence oracle for the strength-reduced production form below
    (tests/test_megakernel.py::test_condition_fast_matches_canonical)."""
    x1, x2, x3, w1, w2, w3, e7 = u
    t = _exp32(lnt)
    r = x1
    s_th, c_th = _sincos(x2)
    g_tt, g_rr, g_thth, g_pp = _metric(C, r, s_th)
    wsq = g_rr * w1**2 + g_thth * w2**2 + g_pp * w3**2
    nrm = jnp.sqrt((-(e7**2) * g_tt - C.mass_a**2) / wsq)
    ww1, ww2, ww3 = w1 * nrm, w2 * nrm, w3 * nrm
    s_ph, c_ph = _sincos(x3)
    br, btheta, bphi = _dipole(C, r, c_th, s_th, c_ph, s_ph, t)
    wp = _omega_p(C, br, btheta, c_th, s_th, r)
    if C.has_bndry:
        # crossing condition includes the boundary-layer wp addition
        # (RayTracer.jl:262-296 via GJ_Model_ωp_vecSPH; physical units here)
        wp = wp + C.mass_a * _bndry_t(C, r)
    if C.isotropic:
        kp = jnp.zeros_like(wp)
    else:
        bl_r = br / jnp.sqrt(g_rr)
        bl_t = btheta / jnp.sqrt(g_thth)
        bl_p = bphi / jnp.sqrt(g_pp)
        bmag = jnp.sqrt(g_rr * bl_r**2 + g_thth * bl_t**2 + g_pp * bl_p**2)
        kp = (g_rr * ww1 * bl_r + g_thth * ww2 * bl_t + g_pp * ww3 * bl_p) / bmag
    ksqr = g_tt * e7**2 + g_rr * ww1**2 + g_thth * ww2**2 + g_pp * ww3**2
    e2 = e7**2 / g_rr
    return 0.5 * (ksqr + wp**2 * (e2 - kp**2) / e2) / e7**2


def _condition(C, u, lnt, approx=False):
    """Thick-surface crossing condition (ops/propagate.py:crossing_condition,
    RayTracer.jl:262-296), strength-reduced.

    After the axion-shell renormalization, the renormalized 4-k-square is
    IDENTICALLY -mass_a^2 — that is the equation the renormalization factor
    solves — so the canonical
        g = 0.5*(ksqr + wp^2*(e2 - kp^2)/e2)/e7^2
    collapses to
        g = 0.5*mass_a^2*(wp2t*(1 - kp^2/e2) - 1)/e7^2,
    with wp2t = (wp/mass_a)^2 = C.wp2_scale*|bz| on the UNIT dipole (the
    b0 scale cancels inside kp^2 = nrm^2*n_w^2*g_rr/(bm2*e7^2) because
    n_w^2/bm2 is scale-invariant), and sqrt(g_thth) = 1/r,
    sqrt(g_pp) = 1/(r*|sin th|) read off the diagonal metric directly.
    Value-identical to the canonical form up to f32 rounding (pinned by
    test_condition_fast_matches_canonical); removes 4 sqrts, a divide and
    ~10 multiplies from an evaluation the always-on coarse gate pays
    interp_coarse times per step (30.4% of step cost, STEP_SPLIT_r05.json).
    MEGA_COND=canonical restores the old form for one-process A/B probes.

    approx=True swaps the transcendentals for their gate-precision halves
    (_sincos_gate/_exp32_gate, ~2e-4) — used ONLY for the coarse gate's
    interior samples, where the error budget is scan_gate_theta's measured
    2x margin and every committed crossing is re-bracketed by the precise
    fine scan."""
    if getattr(C, "cond_mode", "fast") != "fast":
        return _condition_canonical(C, u, lnt)
    sincos = _sincos_gate if approx else _sincos
    exp = _exp32_gate if approx else _exp32
    x1, x2, x3, w1, w2, w3, e7 = u
    t = exp(lnt)
    r = x1
    s_th, c_th = sincos(x2)
    s_ph, c_ph = sincos(x3)
    g_tt, g_rr, g_thth, g_pp = _metric(C, r, s_th)
    br, btheta, bphi = _dipole_unit(C, r, c_th, s_th, c_ph, s_ph, t,
                                    sincos=sincos)
    bz = br * c_th - btheta * s_th
    wp2t = C.wp2_scale * jnp.abs(bz)
    wp2t = jnp.where(r <= C.r_ns, 0.0, wp2t)
    if C.has_bndry:
        # boundary-layer wp addition, in mass_a units like wp2t
        wp2t = (jnp.sqrt(wp2t) + _bndry_t(C, r, exp=exp)) ** 2
    e72 = e7 * e7
    inv_e72 = 1.0 / e72
    if C.isotropic:
        mel = 1.0
    else:
        wsq = g_rr * w1**2 + g_thth * w2**2 + g_pp * w3**2
        nrm2 = (-e72 * g_tt - C.mass_a**2) / wsq
        inv_r = 1.0 / r
        # n_w on the unit dipole; |sin| because sqrt(g_pp) is positive while
        # 1/(r*sin th) is signed — kp^2 must match the canonical bl_p form
        n_w = (jnp.sqrt(g_rr) * w1 * br + inv_r * w2 * btheta
               + inv_r / jnp.abs(s_th) * w3 * bphi)
        bm2 = br * br + btheta * btheta + bphi * bphi
        kp2_over_e2 = nrm2 * n_w * n_w * g_rr * inv_e72 / bm2
        mel = 1.0 - kp2_over_e2
    return (0.5 * C.mass_a**2) * (wp2t * mel - 1.0) * inv_e72


def _prob_nd(C, u, erg):
    """In-kernel conversion probability p = 1 - exp(-P_nonAD) at a crossing
    state (get_Prob_nonAD -> conversion_prob; MainRunner.jl:67-124,
    RayTracer.jl:1405-1473), nondimensionalized like the RHS: B in |b0|
    units, momenta/energies in mass_a units — every intermediate O(1) so the
    f32 reverse-mode vjps are accurate (~1e-6 rel vs the f64 host path).

    Semantics match the host chain exactly (tree._prob_batch):
      * ksphere = w * erg (the state's celerity times the event energy —
        NOT |e7|; the host records kc with the erg scale),
      * w_erg = erg_ax = |e7| / sqrt(1 - rs_full/r)  (MainRunner.jl:114),
      * t = 0 (the reference evaluates P at zero rotation phase),
      * full NS mass in the metric and Christoffels,
      * the probability uses dmu_E WITHOUT the v-group Christoffel term2
        (dmu_E_2 feeds only the unused cos_w_2 outputs) — so only three
        gradient pulls are needed: grad(wp), grad(|B|), grad(k.B^i).
    Requires C.can_prob (aniso Melrose, bndry_lyr<=0, curved).
    Returns p clamped to [0, 1]."""
    x1, x2, x3, w1, w2, w3, e7 = u
    r = x1
    s_th, c_th = _sincos(x2)
    s_ph, c_ph = _sincos(x3)
    g_tt, g_rr, g_thth, g_pp = _metric(C, r, s_th, rs0=C.rs0_full)
    inv_ma = 1.0 / C.mass_a
    kt1 = w1 * (erg * inv_ma)
    kt2 = w2 * (erg * inv_ma)
    kt3 = w3 * (erg * inv_ma)
    wt = jnp.abs(e7) * inv_ma / jnp.sqrt(
        jnp.maximum(1.0 - C.rs0_full / r, 1e-10))

    def f_wp(a1, a2, a3):
        s_t, c_t = _sincos(a2)
        s_p, c_p = _sincos(a3)
        br, bth, _ = _dipole_unit(C, a1, c_t, s_t, c_p, s_p, 0.0)
        bz = br * c_t - bth * s_t
        wp2t = C.wp2_scale * jnp.abs(bz)
        return jnp.sqrt(jnp.where(a1 <= C.r_ns, 0.0, wp2t))

    def f_bmag(a1, a2, a3):
        s_t, c_t = _sincos(a2)
        s_p, c_p = _sincos(a3)
        br, bth, bph = _dipole_unit(C, a1, c_t, s_t, c_p, s_p, 0.0)
        return jnp.sqrt(br * br + bth * bth + bph * bph)

    def f_kb(a1, a2, a3):
        # sum_i k_i B^i with B^i = b_(i) sqrt(g^ii) (contravariant; the
        # reference's GJ_Model_Sphereical return_comp=1..3 w/o the eV^2
        # factor, absorbed into prob_scale)
        s_t, c_t = _sincos(a2)
        s_p, c_p = _sincos(a3)
        br, bth, bph = _dipole_unit(C, a1, c_t, s_t, c_p, s_p, 0.0)
        _, grr, gthth, gpp = _metric(C, a1, s_t, rs0=C.rs0_full)
        return (kt1 * br * jnp.sqrt(grr) + kt2 * bth * jnp.sqrt(gthth)
                + kt3 * bph * jnp.sqrt(gpp))

    wp, vjp_wp = jax.vjp(f_wp, x1, x2, x3)
    dmu_wp = vjp_wp(jnp.ones_like(wp))
    bmag, vjp_b = jax.vjp(f_bmag, x1, x2, x3)
    dmu_b = vjp_b(jnp.ones_like(bmag))
    kb, vjp_kb = jax.vjp(f_kb, x1, x2, x3)
    term1 = vjp_kb(jnp.ones_like(kb))

    br0, bth0, bph0 = _dipole_unit(C, r, c_th, s_th, c_ph, s_ph, 0.0)
    bup1 = br0 * jnp.sqrt(g_rr)     # g^ii B_i (contravariant, b0 units)
    bup2 = bth0 * jnp.sqrt(g_thth)
    bup3 = bph0 * jnp.sqrt(g_pp)

    gm = C.gm_full
    cot = c_th / s_th
    g_rrr = -gm / (r * (r - 2.0 * gm))
    g_rtt = -(r - 2.0 * gm)
    g_rpp = -(r - 2.0 * gm) * s_th * s_th
    g_trt = 1.0 / r
    g_prp = 1.0 / r
    g_ptp = cot
    g_ttr = 1.0 / r
    # (G_tpp, G_ppr, G_ppt of the reference feed only the dropped term2)

    kmag = jnp.sqrt(g_rr * kt1**2 + g_thth * kt2**2 + g_pp * kt3**2)
    ct = kb / (kmag * bmag)
    st2 = jnp.maximum(1.0 - ct * ct, 0.0)
    # Christoffel correction of grad(ctheta_B) (RayTracer.jl:1437-1439)
    t2b_r = kt1 * bup1 * g_rrr + kt2 * g_trt * bup2 + kt3 * g_prp * bup3
    t2b_t = kt1 * bup2 * g_rtt + kt3 * g_ptp * bup3 + kt2 * bup1 * g_ttr
    t2b_p = (kt1 * bup3 * g_rpp + kt2 * (-s_th * c_th) * bup3
             + kt3 * (1.0 / r) * bup1 + kt3 * cot * bup2)
    dmu_ct = tuple(
        (t1 + t2) / (kmag * bmag) - ct * db / bmag
        for t1, t2, db in zip(term1, (t2b_r, t2b_t, t2b_p), dmu_b))

    wp2 = wp * wp
    wt2 = wt * wt
    pre_f = wp / jnp.abs(wt2 * wt2 * wt
                         + ct * ct * wt * (wp2 * wp2 - 2.0 * wp2 * wt2))
    dmu_e = tuple(
        pre_f * (wt2 * wt2 * st2 * dw
                 - wt2 * ct * wp * (wt2 - wp2) * dc)
        for dw, dc in zip(dmu_wp, dmu_ct))
    vhat_grad_e = (g_rr * kt1 * dmu_e[0] + g_thth * kt2 * dmu_e[1]
                   + g_pp * kt3 * dmu_e[2]) / kmag
    vloc = jnp.sqrt(jnp.maximum(wt2 - 1.0, 1e-12)) / wt
    prefactor = wt2 * wt2 * st2 / (
        ct * ct * wp2 * (wp2 - 2.0 * wt2) + wt2 * wt2)
    p_nonad = C.prob_scale * prefactor * bmag * bmag / (
        jnp.abs(vhat_grad_e) * vloc)
    return jnp.clip(1.0 - _exp32(-p_nonad), 0.0, 1.0)


def _grad_h_hand(C, x1, x2, x3, kt1, kt2, kt3, time, ergt_ph, ergt_ax,
                 photon):
    """Hand adjoint of the nondimensionalized Hamiltonians: returns
    (dH~/dx(3), dH~/dk~(3), dH~/dt) in the same nondim units as the vjp of
    _hamiltonian_nd/_ham_axion_nd in _rhs, but with the chain rule applied
    by hand so the algebraic structure AD cannot see is exploited:

      * every dipole component scales r^-3, so d(b_i)/dr = -3 b_i/r and
        d(bmag^2)/dr = -6 bmag^2/r — no field re-evaluation;
      * dM_r/dtheta = -M_t and dM_t/dtheta = M_r (the dipole angular
        factors rotate into each other), so db_r/dth = -2 b_th,
        db_th/dth = b_r/2, and the phi/time derivatives reduce to b_phi
        and omega*sin/cos products already in registers;
      * bmag^2 = br^2 + bth^2 + bph^2 exactly (the g_ii/sqrt(g_ii) factors
        cancel), so kp needs ONE reciprocal instead of three divides and
        a sqrt;
      * all three k-gradients of the Melrose term share one factor
        lam = wp2 * A * n / (ergt^2 * bmag^2).

    The photon branch is exterior-only (its r is clamped to >= r_NS and the
    frozen zone x1 <= 1.01 r_NS zeroes the output below that); the axion
    branch needs the interior-continuation metric, which is covered exactly
    by one scalar jvp through _metric (gradients of a 4-tuple of r-only
    functions).  The boundary-layer time-derivative quirk (RayTracer.jl:
    84-88) is folded in analytically when C.has_bndry.

    Validated against the pool's f64 make_rhs by
    tests/test_megakernel.py::test_rhs_{hand,reverse_mode}_matches_pool_f64."""
    z32 = jnp.zeros_like(x1)
    s_th, c_th = _sincos(x2)

    # ---- axion branch (metric-only; zero time/phi gradients) ----
    if C.species != "photon":
        (_, grr_a, gthth_a, gpp_a), (dgtt, dgrr, dgthth, dgpp) = jax.jvp(
            lambda rr: _metric(C, rr, s_th), (x1,), (jnp.ones_like(x1),))
        ax_k = (grr_a * kt1, gthth_a * kt2, gpp_a * kt3)
        ax_r = 0.5 * (dgtt * ergt_ax**2 + dgrr * kt1**2 + dgthth * kt2**2
                      + dgpp * kt3**2)
        ax_th = -gpp_a * (c_th / s_th) * kt3**2  # 0.5 * dg_pp/dth * kt3^2
        if C.species == "axion":
            return ((ax_r, ax_th, z32), ax_k, z32)

    # ---- photon branch (exterior metric at r >= r_NS) ----
    s_ph, c_ph = _sincos(x3)
    r = jnp.maximum(x1, C.r_ns)
    inv_r = 1.0 / r
    A = 1.0 - C.rs0 * inv_r                 # = g_rr (exterior)
    inv_A = 1.0 / A
    inv_s = 1.0 / s_th
    inv_r2 = inv_r * inv_r
    g_pp = inv_r2 * inv_s * inv_s
    dA_dr = C.rs0 * inv_r2
    E = 1.0 / (ergt_ph * ergt_ph)

    swt, cwt = _sincos(C.omega * time)
    cp = c_ph * cwt + s_ph * swt            # cos(phi - omega t)
    sp = s_ph * cwt - c_ph * swt            # sin(phi - omega t)
    bnorm = C.b0_sign * 0.5 * (C.r_ns * inv_r) ** 3
    m_r = C.cm * c_th + C.sm * s_th * cp
    m_t = C.cm * s_th - C.sm * c_th * cp
    br = 2.0 * bnorm * m_r
    bth = bnorm * m_t
    bph = bnorm * C.sm * sp
    bz = br * c_th - bth * s_th
    sgn_bz = jnp.sign(bz)
    wp2 = C.wp2_scale * jnp.abs(bz)

    # dksqr/d* (ksqr = -ergt^2/A + A kt1^2 + kt2^2/r^2 + g_pp kt3^2)
    dksqr_r = (ergt_ph**2 * inv_A * inv_A + kt1**2) * dA_dr \
        - 2.0 * inv_r2 * inv_r * (kt2**2 + inv_s * inv_s * kt3**2)
    dinv_s = -inv_s * inv_s * c_th          # d(1/sin)/dth
    dksqr_th = 2.0 * inv_r2 * inv_s * dinv_s * kt3**2

    if C.isotropic:
        # H = 0.5 (ksqr + wp2): no Melrose anisotropy chain at all
        dbz_r = -3.0 * bz * inv_r
        dbz_th = -3.0 * bth * c_th - 1.5 * br * s_th
        dbz_ph = -3.0 * s_th * c_th * bph
        dbz_t = 3.0 * bnorm * C.sm * s_th * c_th * C.omega * sp
        w_fac = C.wp2_scale * sgn_bz
        ph_r = 0.5 * (dksqr_r + w_fac * dbz_r)
        ph_th = 0.5 * (dksqr_th + w_fac * dbz_th)
        ph_ph = 0.5 * w_fac * dbz_ph
        ph_k = (A * kt1, inv_r2 * kt2, g_pp * kt3)
        ph_t = 0.5 * w_fac * dbz_t
        if C.has_bndry:
            wpt = jnp.sqrt(jnp.maximum(wp2, 1e-30))
            bt = _bndry_t(C, r)
            ph_t = ph_t + 0.5 * (bt / wpt) * w_fac * dbz_t
    else:
        sqA = jnp.sqrt(A)
        q1 = sqA * kt1
        q2 = inv_r * kt2
        q3 = inv_r * inv_s * kt3
        n = q1 * br + q2 * bth + q3 * bph
        bm2 = br * br + bth * bth + bph * bph
        inv_bm2 = 1.0 / bm2
        kp2 = n * n * inv_bm2
        F = 1.0 - kp2 * A * E
        lam = wp2 * A * E * n * inv_bm2     # shared k-gradient factor
        ph_k = (A * kt1 - lam * sqA * br,
                inv_r2 * kt2 - lam * inv_r * bth,
                g_pp * kt3 - lam * inv_r * inv_s * bph)

        w_fac = C.wp2_scale * sgn_bz        # dwp2 = w_fac * dbz
        aE = A * E

        # --- r ---
        dn_r = (0.5 * dA_dr / sqA) * kt1 * br - 3.0 * inv_r * n \
            - inv_r * (q2 * bth + q3 * bph)
        dkp2_r = inv_bm2 * 2.0 * n * dn_r + 6.0 * kp2 * inv_r
        dwp2_r = -3.0 * wp2 * inv_r
        dF_r = -E * (dkp2_r * A + kp2 * dA_dr)
        ph_r = 0.5 * (dksqr_r + dwp2_r * F + wp2 * dF_r)

        # --- theta ---
        dbr_th = -2.0 * bth
        dbth_th = 0.5 * br
        dbz_th = -3.0 * bth * c_th - 1.5 * br * s_th
        dq3_th = inv_r * kt3 * dinv_s
        dn_th = q1 * dbr_th + q2 * dbth_th + dq3_th * bph
        dbm2_th = -3.0 * br * bth
        dkp2_th = inv_bm2 * (2.0 * n * dn_th - kp2 * dbm2_th)
        ph_th = 0.5 * (dksqr_th + w_fac * dbz_th * F - wp2 * aE * dkp2_th)

        # --- phi ---
        dbr_ph = -2.0 * s_th * bph
        dbth_ph = c_th * bph
        dbph_ph = bnorm * C.sm * cp
        dbz_ph = -3.0 * s_th * c_th * bph
        dn_ph = q1 * dbr_ph + q2 * dbth_ph + q3 * dbph_ph
        dbm2_ph = 2.0 * (br * dbr_ph + bth * dbth_ph + bph * dbph_ph)
        dkp2_ph = inv_bm2 * (2.0 * n * dn_ph - kp2 * dbm2_ph)
        ph_ph = 0.5 * (w_fac * dbz_ph * F - wp2 * aE * dkp2_ph)

        # --- time (rotating dipole: cp' = omega sp, sp' = -omega cp) ---
        bs = bnorm * C.sm
        wsp = C.omega * sp
        dbr_t = 2.0 * bs * s_th * wsp
        dbth_t = -bs * c_th * wsp
        dbph_t = -bs * C.omega * cp
        dbz_t = 3.0 * bs * s_th * c_th * wsp
        dn_t = q1 * dbr_t + q2 * dbth_t + q3 * dbph_t
        dbm2_t = 2.0 * (br * dbr_t + bth * dbth_t + bph * dbph_t)
        dkp2_t = inv_bm2 * (2.0 * n * dn_t - kp2 * dbm2_t)
        dwp2_t = w_fac * dbz_t
        ph_t = 0.5 * (dwp2_t * F - wp2 * aE * dkp2_t)
        if C.has_bndry:
            # boundary-layer excess 0.5*(2 wpt bt + bt^2)*F enters the TIME
            # derivative only (the spatial quirk): d/dt = 0.5*((bt/wpt)*
            # dwp2_t*F + (2 wpt bt + bt^2)*dF_t), bt time-independent
            wpt = jnp.sqrt(jnp.maximum(wp2, 1e-30))
            bt = _bndry_t(C, r)
            dwp2b = 2.0 * wpt * bt + bt * bt
            dF_t = -aE * dkp2_t
            ph_t = ph_t + 0.5 * ((bt / wpt) * dwp2_t * F + dwp2b * dF_t)

    # photon spatial gradients are gated at the r-clamp (d max(x1,r_NS)/dx1)
    live = x1 > C.r_ns
    ph_r = jnp.where(live, ph_r, 0.0)
    if C.species == "photon":
        return ((ph_r, ph_th, ph_ph), ph_k, ph_t)
    w = jnp.where
    return ((w(photon, ph_r, ax_r), w(photon, ph_th, ax_th),
             w(photon, ph_ph, z32)),
            tuple(w(photon, p, a) for p, a in zip(ph_k, ax_k)),
            w(photon, ph_t, z32))


def _rhs(C, u, lnt, erg, is_ph):
    """Mixed-species Hamilton equations via ONE reverse-mode vjp of the
    nondimensionalized Hamiltonian (ops/propagate.py:make_rhs).  All 7
    gradients (x, k, t) come out of a single backward pass that shares the
    primal chain — ~4x fewer flops than the previous 7 directional jvp
    passes.  Raw-scale f32 reverse-mode loses ~5 digits through the B-field
    chain; with B/|b0|, k/mass_a, H/mass_a^2 scaling every intermediate is
    O(1) and the result matches the f64 forward reference to ~2e-7 median.
    is_ph: f32 mask (1 photon / 0 axion)."""
    x1, x2, x3, w1, w2, w3, e7 = u
    t = _exp32(lnt)
    time = t  # time0 = 0
    inv_ma = 1.0 / C.mass_a
    kt1 = w1 * (erg * inv_ma)
    kt2 = w2 * (erg * inv_ma)
    kt3 = w3 * (erg * inv_ma)
    r = jnp.maximum(x1, C.r_ns)
    s_th, _ = _sincos(x2)
    _, g_rr, _, _ = _metric(C, r, s_th)
    photon = is_ph > 0.5
    ergt_ph = -e7 * inv_ma
    ergt_ax = erg * inv_ma

    if getattr(C, "rhs_mode", "vjp") == "hand":
        gx, gk, gt = _grad_h_hand(C, x1, x2, x3, kt1, kt2, kt3, time,
                                  ergt_ph, ergt_ax, photon)
        ma2 = C.mass_a * C.mass_a
        dh_x = tuple(gi * ma2 for gi in gx)
        dh_k = tuple(gi * C.mass_a for gi in gk)
        dh_t = gt * ma2
        denom = jnp.where(photon, -e7, erg)
        fac = C_KM * t * g_rr / denom
        du_x = tuple(d * fac for d in dh_k)
        du_w = tuple(-d * fac / erg for d in dh_x)
        du_e7 = jnp.where(photon, dh_t * t * g_rr / (-e7), 0.0)
        frozen = (x1 <= C.r_ns * 1.01) & photon
        z = jnp.where
        return tuple(z(frozen, 0.0, d) for d in (du_x + du_w + (du_e7,)))

    if C.species == "photon":
        def h7(a1, a2, a3, b1, b2, b3, tt):
            return _hamiltonian_nd(C, a1, a2, a3, b1, b2, b3, tt, ergt_ph)
    elif C.species == "axion":
        def h7(a1, a2, a3, b1, b2, b3, tt):
            return _ham_axion_nd(C, a1, a2, a3, b1, b2, b3, ergt_ax)
    else:
        def h7(a1, a2, a3, b1, b2, b3, tt):
            hp = _hamiltonian_nd(C, a1, a2, a3, b1, b2, b3, tt, ergt_ph)
            ha = _ham_axion_nd(C, a1, a2, a3, b1, b2, b3, ergt_ax)
            return jnp.where(photon, hp, ha)

    out, vjp_fn = jax.vjp(h7, x1, x2, x3, kt1, kt2, kt3, time)
    g = vjp_fn(jnp.ones_like(out))
    ma2 = C.mass_a * C.mass_a
    dh_x = tuple(gi * ma2 for gi in g[0:3])       # dH/dx  = ma^2 dH~/dx
    dh_k = tuple(gi * C.mass_a for gi in g[3:6])  # dH/dk  = ma   dH~/dk~
    dh_t = g[6] * ma2                             # dH/dt  = ma^2 dH~/dt
    if C.has_bndry and C.species != "axion":
        # Boundary-layer quirk (RayTracer.jl:84-88 via ops/propagate.py
        # make_rhs): the photon's SPATIAL gradients exclude the bndry wp
        # term while its TIME derivative includes it — so h7 above stays
        # bndry-free and the time derivative gains one scalar jvp of the
        # Hamiltonian excess.  dh_t only feeds du_e7, which is already
        # masked to photon lanes below.
        def hdiff(tt):
            return _ham_bndry_diff_nd(C, x1, x2, x3, kt1, kt2, kt3, tt,
                                      ergt_ph)

        dh_t = dh_t + jax.jvp(hdiff, (time,),
                              (jnp.ones_like(time),))[1] * ma2

    denom = jnp.where(photon, -e7, erg)
    fac = C_KM * t * g_rr / denom
    du_x = tuple(d * fac for d in dh_k)
    du_w = tuple(-d * fac / erg for d in dh_x)
    du_e7 = jnp.where(photon, dh_t * t * g_rr / (-e7), 0.0)
    frozen = (x1 <= C.r_ns * 1.01) & photon
    z = jnp.where
    return tuple(z(frozen, 0.0, d) for d in (du_x + du_w + (du_e7,)))


def _hermite(u0, u1, f0, f1, h, tau):
    t2 = tau * tau
    t3 = t2 * tau
    return tuple(
        (2 * t3 - 3 * t2 + 1) * a + (t3 - 2 * t2 + tau) * h * fa
        + (-2 * t3 + 3 * t2) * b + (t3 - t2) * h * fb
        for a, b, fa, fb in zip(u0, u1, f0, f1)
    )


def _mega_kernel(uin_ref, aux_ref, uni_ref, uout_ref, lnt_ref, diag_ref,
                 cross_ref, save_ref, pcx_ref, *, C: SceneConsts,
                 max_crossings: int, with_prob: bool = False,
                 with_chain: bool = False):
    """One tile of rays, full adaptive integration.

    Layouts put the 128-lane axis last and the component index on the middle
    (sublane-packed) axis:
    uin/uout: [T, 8, 128]  (7 state comps + pad)
    aux:      [T, 8, 128]  (lnt0, lnt1, erg, x0_cart(3), is_photon,
              chain_cap)
    uni:      [T, n_slots, 128]  (pre-drawn MC uniforms, one per crossing
              slot, from fold_in(event_key, node_index) — the chain draw
              stream is exactly the host tree engine's)
    lnt:      [T, 2, 128]  (final lnt hi/lo)
    diag:     [T, 8, 128]  (steps, done-code, n_cross, g-at-end,
              chain_nodes, final is_photon, pad)
    cross:    [T, 8*n_slots, 128]  (per slot: crossing u(7) + lnt_c)
    save:     [T, 8, 128]  (mid-trajectory state: u(7) + pad; the ntimes=3
              save-grid midpoint, Hermite-interpolated in-kernel)
    pcx:      [T, n_slots, 128]  (per slot: in-kernel conversion probability
              at the recorded crossing; zeros unless with_prob)

    with_chain: lanes whose aux chain_cap c > 0 run the pure-MC tree chain
    IN-KERNEL (MainRunner.jl:281-293 collapsed): at a recorded crossing the
    conversion probability is evaluated in-kernel, the child species is drawn
    from the pre-supplied uniform for that node index, the momenta are
    renormalized onto the axion shell with the event energy (the host
    relaunch's k_norm_Cart ax_fix semantics, RayTracer.jl:664-668), and
    integration continues — until the ray exits, a rare-fail crossing is hit,
    or c crossings have been recorded (the last child is then left pending
    for the host).  Requires with_prob.
    """
    n_slots = max_crossings
    u = tuple(uin_ref[:, i, :] for i in range(7))
    u_lo = tuple(uin_ref[:, 8 + i, :] for i in range(7))
    lnt = aux_ref[:, 0, :]
    lnt_lo = aux_ref[:, 8, :]
    lnt1 = aux_ref[:, 1, :]
    erg = aux_ref[:, 2, :]
    x0c = tuple(aux_ref[:, 3 + i, :] for i in range(3))
    is_ph0 = aux_ref[:, 6, :]
    chain_cap = aux_ref[:, 7, :] if with_chain else None
    # resume rows (all-zero on a fresh launch; see integrate_mega's resume
    # kwarg): carried dt, absolute step/crossing counters, the ORIGINAL
    # trajectory's save-grid midpoint, and an explicit done flag
    dt_in = aux_ref[:, 9, :]
    steps0 = aux_ref[:, 10, :]
    ncross0 = aux_ref[:, 11, :]
    lnt_mid = aux_ref[:, 12, :]
    done0 = aux_ref[:, 13, :]
    errold0 = aux_ref[:, 14, :]   # PI controller memory (chunked resume)
    use_pi = C.pi_beta != 0.0

    # Tile-level skip for the chunked-compaction wrapper: when EVERY lane in
    # the tile carries the explicit done flag (only integrate_mega_chunked
    # sets it; all other callers pass zeros) the tile's outputs are never
    # read back — skip init, loop, and finalize entirely and leave the
    # output blocks unwritten (the wrapper masks them out).
    tile_run = jnp.min(done0) < 0.5

    is_ph = is_ph0

    prof = getattr(C, "profile", "full")
    if prof != "full":
        assert not with_chain and not with_prob, \
            "MEGA_PROFILE variants are bench-only (no chain/prob)"

    def _init(_):
        f0 = _rhs(C, u, lnt, erg, is_ph)
        g0 = (_condition(C, u, lnt) if prof != "rhs"
              else jnp.zeros_like(lnt))

        # initial dt (Hairer-lite, cf. integrator._initial_dt)
        def nrm(vs, us):
            acc = 0.0
            for v, uu in zip(vs, us):
                sc_ = C.atol + C.rtol * jnp.abs(uu)
                acc = acc + (v / sc_) ** 2
            return jnp.sqrt(acc / 7.0)

        d0 = nrm(u, u)
        d1 = nrm(f0, u)
        dt = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
        dt = jnp.minimum(dt, 0.1 * jnp.maximum(lnt1 - lnt, 1e-30))
        # resumed lanes carry their controller dt across the launch boundary
        return f0, g0, jnp.where(dt_in > 0, dt_in, dt)

    def _skip_init(_):
        z = jnp.zeros_like(lnt)
        return tuple(z for _ in range(7)), z, z

    f0, g0, dt = lax.cond(tile_run, _init, _skip_init, 0)

    # carried masks are f32 (Mosaic cannot yield i1 vectors from scf.while)
    done = jnp.where((lnt1 <= lnt) | (done0 > 0.5), 1.0, 0.0)
    steps = steps0
    n_cross = ncross0
    # crossing records live in the OUTPUT REFS (VMEM), written in place at
    # record time — carrying n_slots x 9 vectors through the scf.while blew
    # vector-register pressure into spills at n_slots >= 8 (the chain/
    # backtrace configurations)
    zrow = jnp.zeros_like(lnt)

    @pl.when(tile_run)
    def _zero_records():
        for slot in range(n_slots):
            for i in range(8):
                cross_ref[:, 8 * slot + i, :] = zrow
            pcx_ref[:, slot, :] = zrow
        diag_ref[:, 6, :] = zrow  # fine-scan (gated) step counter, bumped in-loop
    save_mid = tuple(jnp.zeros_like(lnt) for _ in range(7))
    code = jnp.zeros_like(lnt)  # 1=end 2=ns 3=cross 4=maxed 5=stalled
    lnt_ck = lnt
    # chain-only mutable state: species, segment start point, per-segment
    # crossing count, restart count.  Carried through the while loop ONLY in
    # chain mode — without chains they are loop-invariant (is_ph, x0c) or
    # equal to n_cross (seg_cross), and six extra carried vectors measurably
    # slow every step
    seg_cross = jnp.zeros_like(lnt)   # crossings since current segment start
    nodes_used = jnp.zeros_like(lnt)  # in-kernel chain restarts

    def cond_fn(carry):
        done_f = carry[0]
        it = carry[-1]
        return jnp.logical_and(jnp.min(done_f) < 0.5, it < C.it_cap)

    is_ph_const = is_ph
    x0c_const = (x0c[0], x0c[1], x0c[2])

    def body(carry):
        it = carry[-1]
        if use_pi:
            errold = carry[-2]
            core = carry[:-2]
        else:
            errold = None
            core = carry[:-1]
        if with_chain:
            (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, n_cross,
             save_mid, code, lnt_ck, is_ph, x0c, seg_cross,
             nodes_used) = core
        else:
            (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, n_cross,
             save_mid, code, lnt_ck) = core
            is_ph = is_ph_const
            x0c = x0c_const
            seg_cross = n_cross   # no chain restarts: segment == launch
        done = done_f > 0.5
        active = jnp.logical_not(done)
        h = jnp.clip(lnt1 - lnt, 0.0, None)
        h = jnp.minimum(dt, h)

        ks = [f0]
        for i in range(5):
            ui = tuple(
                uu + h * sum(a * kk[j] for a, kk in zip(_A[i], ks))
                for j, uu in enumerate(u)
            )
            ks.append(_rhs(C, ui, lnt + _C[i + 1] * h, erg, is_ph))
        u_new = tuple(
            uu + h * sum(b * kk[j] for b, kk in zip(_B5, ks))
            for j, uu in enumerate(u)
        )
        f_new = _rhs(C, u_new, lnt + h, erg, is_ph)
        ks7 = ks + [f_new]
        err_acc = 0.0
        for j in range(7):
            e = h * sum(ei * kk[j] for ei, kk in zip(_E, ks7))
            sc_ = C.atol + C.rtol * jnp.maximum(jnp.abs(u[j]), jnp.abs(u_new[j]))
            err_acc = err_acc + (e / sc_) ** 2
        enorm = jnp.sqrt(err_acc / 7.0)
        forced = dt <= C.dt_min * 1.0000001
        accept = ((enorm <= 1.0) | forced) & active & (h > 0)

        en_safe = jnp.where(enorm > 0, enorm, 1e-10)
        if use_pi:
            # predictive controller: boost by the last accepted step's error;
            # never grow the step right after a rejection
            fac = C.safety * en_safe ** -C.expo1 * errold ** C.pi_beta
            fac = jnp.clip(fac, C.min_fac, C.max_fac)
            fac = jnp.where(accept, fac, jnp.minimum(fac, 1.0))
        else:
            fac = C.safety * en_safe ** -0.2
            fac = jnp.clip(fac, C.min_fac, C.max_fac)
        dt_next = jnp.where(active, jnp.maximum(dt * fac, C.dt_min), dt)
        if use_pi:
            errold = jnp.where(accept, jnp.maximum(enorm, 1e-4), errold)

        g_new = (_condition(C, u_new, lnt + h) if prof != "rhs"
                 else jnp.zeros_like(lnt))

        # --- event scan on the Hermite interpolant ---
        # Two-phase gated scan: reference event-scan density
        # (interp_points=50, RayTracer.jl:357-358) without paying ~50
        # condition evaluations on every step.  A coarse interp_coarse-point
        # pass always runs, tracking sign flips AND the minimum |g| over its
        # samples; the full fine pass runs under a tile-level scf.if only
        # when some accepted lane either bracketed a flip (the fine pass
        # re-brackets it at 1/K resolution) or dipped below gate_theta —
        # |g| is the normalized photon Hamiltonian H/omega^2, O(0.5) away
        # from the conversion surface, so a small coarse sample flags a
        # possible tangent double crossing hiding between coarse points
        # (exactly what the dense reference scan exists to catch).
        # Validated against the plain K=50 scan by the crossing census
        # (bench_census.py: missed_vs_plain50 == 0 at theta=0.08).
        K = C.interp
        Kc = C.interp_coarse if 0 < C.interp_coarse < C.interp else 0

        gate_approx = getattr(C, "gate_trig", "native") == "native"

        def _scan(Kn, want_gmin, approx=False):
            flip_found = jnp.zeros_like(done)
            tau_lo = jnp.zeros_like(lnt)
            tau_hi = jnp.zeros_like(lnt)
            g_prev = g0
            tau_prev = jnp.zeros_like(lnt)
            gmin = jnp.abs(g0) if want_gmin else None
            for j in range(1, Kn + 1):
                tau_j = j / Kn
                if j < Kn:
                    u_j = _hermite(u, u_new, f0, f_new, h, tau_j)
                    g_j = _condition(C, u_j, lnt + tau_j * h, approx=approx)
                else:
                    g_j = g_new
                flip = (jnp.sign(g_prev) * jnp.sign(g_j) < 0) & ~flip_found
                tau_lo = jnp.where(flip, tau_prev, tau_lo)
                tau_hi = jnp.where(flip, tau_j, tau_hi)
                flip_found = flip_found | flip
                if want_gmin:
                    gmin = jnp.minimum(gmin, jnp.abs(g_j))
                g_prev = g_j
                tau_prev = jnp.full_like(lnt, tau_j)
            return flip_found, tau_lo, tau_hi, gmin

        if prof == "rhs":
            # attribution variant: no condition evaluations, no scan — the
            # 6-RHS DP5 step + controller + commit only
            flip_found = jnp.zeros_like(done)
            tau_lo = jnp.zeros_like(lnt)
            tau_hi = jnp.zeros_like(lnt)
        elif prof == "coarse":
            # attribution variant: coarse pass only; results kept LIVE via a
            # 1e-30-scaled diag write (constant-zero flip_found would let
            # XLA dead-code-eliminate the whole scan), event block off
            flip_c, tlo_c, thi_c, gmin = _scan(Kc or 4, True,
                                               approx=gate_approx)
            diag_ref[:, 6, :] = diag_ref[:, 6, :] + 1e-30 * (
                gmin + tlo_c + thi_c + jnp.where(flip_c, 1.0, 0.0))
            flip_found = jnp.zeros_like(done)
            tau_lo = jnp.zeros_like(lnt)
            tau_hi = jnp.zeros_like(lnt)
        elif Kc:
            # coarse GATE pass: gate-precision transcendentals (~2e-4 error
            # vs the 0.08 gate theta with 2x measured margin); any committed
            # crossing is re-bracketed by the precise fine scan below
            flip_c, tlo_c, thi_c, gmin = _scan(Kc, True, approx=gate_approx)
            sus = accept & (flip_c | (gmin < C.gate_theta))
            any_sus = jnp.max(jnp.where(sus, 1.0, 0.0)) > 0.5

            def _fine_scan(_):
                diag_ref[:, 6, :] = diag_ref[:, 6, :] + 1.0
                ff, tl, th_, _ = _scan(K, False)
                return jnp.where(ff, 1.0, 0.0), tl, th_

            def _keep_coarse(_):
                return jnp.where(flip_c, 1.0, 0.0), tlo_c, thi_c

            ff_f, tau_lo, tau_hi = lax.cond(any_sus, _fine_scan,
                                            _keep_coarse, 0)
            flip_found = ff_f > 0.5
            if prof == "scan":
                # attribution variant: full gated scan runs (kept live via
                # diag), event block off
                diag_ref[:, 6, :] = diag_ref[:, 6, :] + 1e-30 * (
                    ff_f + tau_lo + tau_hi)
                flip_found = jnp.zeros_like(done) > 0.5
        else:
            flip_found, tau_lo, tau_hi, _ = _scan(K, False)
            if prof == "scan":
                diag_ref[:, 6, :] = diag_ref[:, 6, :] + 1e-30 * (
                    tau_lo + tau_hi + jnp.where(flip_found, 1.0, 0.0))
                flip_found = jnp.zeros_like(done) > 0.5
        flip_found = flip_found & accept

        # Event block — tile-level skip: most steps bracket no crossing in
        # the WHOLE tile (~75% at production crossing rates), yet the masked
        # refinement was costing C.bisect condition+Hermite evaluations per
        # step plus the root-state filters and per-slot record writes.  One
        # scf.if on "any lane flipped" skips all of it; inside the branch
        # lanes stay masked exactly as before and a no-flip lane's bracket
        # is [0, 0] either way, so the result is bit-identical to the
        # unconditional code.  (Masks yield as f32: Mosaic rejects i1
        # vector yields.)
        any_flip = jnp.max(jnp.where(flip_found, 1.0, 0.0)) > 0.5
        zero = jnp.zeros_like(lnt)

        def _event_blk(_):
            t_lo, t_hi = tau_lo, tau_hi
            g_lo = _condition(C, _hermite(u, u_new, f0, f_new, h, t_lo),
                              lnt + t_lo * h)
            for _ in range(C.bisect):
                t_mid = 0.5 * (t_lo + t_hi)
                g_mid = _condition(C, _hermite(u, u_new, f0, f_new, h, t_mid),
                                   lnt + t_mid * h)
                left = jnp.sign(g_mid) == jnp.sign(g_lo)
                t_lo = jnp.where(left, t_mid, t_lo)
                g_lo = jnp.where(left, g_mid, g_lo)
                t_hi = jnp.where(left, t_hi, t_mid)
            tau_s = 0.5 * (t_lo + t_hi)
            u_s = _hermite(u, u_new, f0, f_new, h, tau_s)
            lnt_s = lnt + tau_s * h
            # acceptance filters: start-dup (factor 1.0001 per |cart comp|)
            # and r < 1.01 r_ns (ops/integrator.py:_process_events)
            r_s = u_s[0]
            sth, cth = _sincos(u_s[1])
            sph, cph = _sincos(u_s[2])
            pc = (r_s * sth * cph, r_s * sth * sph, r_s * cth)
            sfac = 1.0001
            within = jnp.ones_like(done)
            for p, p0 in zip(pc, x0c):
                within = within & (jnp.abs(p) < jnp.abs(p0) * sfac) \
                    & (jnp.abs(p) > jnp.abs(p0) / sfac)
            # first crossing of the current SEGMENT (== launch for non-chain
            # lanes; chain restarts reset the segment)
            start_dup = within & (seg_cross < 0.5)
            rec = flip_found & ~start_dup & (r_s >= C.r_ns * 1.01) \
                & (n_cross < max_crossings)

            # Record sub-block, gated on "any lane actually RECORDS": the
            # conversion-probability evaluation (3 vjps) and the per-slot
            # ref writes cost ~a full step-equivalent, but most bracketed
            # steps are rejected by the filters — an event block runs on
            # ~25% of tile-steps while records are ~1 per lane per launch.
            any_rec_in = jnp.max(jnp.where(rec, 1.0, 0.0)) > 0.5

            def _record_blk(_):
                p_s = _prob_nd(C, u_s, erg) if with_prob else zero
                for slot in range(n_slots):
                    hit = rec & (jnp.abs(n_cross - slot) < 0.5)
                    for i in range(7):
                        cross_ref[:, 8 * slot + i, :] = jnp.where(
                            hit, u_s[i], cross_ref[:, 8 * slot + i, :])
                    cross_ref[:, 8 * slot + 7, :] = jnp.where(
                        hit, lnt_s, cross_ref[:, 8 * slot + 7, :])
                    if with_prob:
                        pcx_ref[:, slot, :] = jnp.where(
                            hit, p_s, pcx_ref[:, slot, :])
                return p_s

            p_s = lax.cond(any_rec_in, _record_blk, lambda _: zero, 0)

            # rare-fail guard at the crossing (MainRunner.jl:213-224):
            # any Cartesian proper-velocity component > 1.  Transform as the
            # host does (celerity_to_cart_vel, exterior lapse, mass_eff).
            if with_chain:
                a_l = 1.0 - C.rs0 / jnp.maximum(r_s, 0.5 * C.r_ns)
                v_r = u_s[3] * erg * jnp.sqrt(jnp.maximum(a_l, 1e-6)) * a_l
                v_t = u_s[4] * erg / r_s * a_l
                v_p = u_s[5] * erg / (r_s * sth) * a_l
                v_tmp = sth * v_r + cth * v_t
                vx = cph * v_tmp - sph * v_p
                vy = sph * v_tmp + cph * v_p
                vz = cth * v_r - sth * v_t
                rare_s = ((jnp.abs(vx) > 1.0) | (jnp.abs(vy) > 1.0)
                          | (jnp.abs(vz) > 1.0))
            else:
                rare_s = jnp.zeros_like(done) > 0.5
            return (jnp.where(rec, 1.0, 0.0), u_s, lnt_s,
                    p_s, jnp.where(rare_s, 1.0, 0.0), pc)

        def _no_event(_):
            return (zero, u, lnt, zero, zero,
                    (x0c[0], x0c[1], x0c[2]))

        (rec_f, u_star, lnt_star, p_star,
         rare_f, pc_star) = lax.cond(any_flip, _event_blk, _no_event, 0)
        record = rec_f > 0.5
        n_cross2 = n_cross + rec_f

        if with_chain:
            # Chain continuation: past crossing j (0-indexed) iff j+1 <
            # chain_cap; the host caps chain_cap at min(n_slots, node
            # budget) so a continuing segment always has a free slot.
            is_chain = chain_cap > 0.5
            chain_go = (record & is_chain & (rare_f < 0.5)
                        & (n_cross2 < chain_cap - 0.5))
            term_cross = record & ~chain_go & (
                is_chain | (n_cross2 >= max_crossings))
        else:
            chain_go = jnp.zeros_like(done)
            term_cross = record & (n_cross2 >= max_crossings)

        # Multi-crossing mode: a recorded, non-terminal crossing restarts the
        # ray from the root's POST side (tau_hi keeps the new sign by
        # bisection construction) instead of the step end, so a step that
        # bracketed two crossings finds the second one on the next step —
        # matching the pool's max_roots_per_step semantics
        # (ops/integrator.py:250).  The extra RHS + condition eval is paid
        # only on steps where some lane actually recorded a crossing.
        if n_slots > 1:
            cont_cross = record & jnp.logical_not(term_cross) \
                & jnp.logical_not(chain_go)
            any_rec = jnp.max(jnp.where(cont_cross, 1.0, 0.0)) > 0.5

            def _restart(_):
                uh = _hermite(u, u_new, f0, f_new, h, tau_hi)
                lh = lnt + tau_hi * h
                return uh, lh, _rhs(C, uh, lh, erg, is_ph), _condition(C, uh, lh)

            u_hi, lnt_hi, f_hi, g_hi = lax.cond(
                any_rec, _restart, lambda _: (u, lnt, f0, g0), 0)
        else:
            cont_cross = jnp.zeros_like(done)

        # --- in-kernel MC chain restart ---
        if with_chain:
            any_chain = jnp.max(jnp.where(chain_go, 1.0, 0.0)) > 0.5

            def _chain_restart(_):
                # child relaunch semantics (propagate_mega's k_norm_Cart with
                # ax_fix=True, full NS mass): renormalize the crossing
                # momenta onto the axion shell at the EVENT energy
                r_s = jnp.maximum(u_star[0], C.r_ns)
                s_t, _c_t = _sincos(u_star[1])
                g_tt_f, g_rr_f, g_thth_f, g_pp_f = _metric(
                    C, r_s, s_t, rs0=C.rs0_full)
                wsq = (g_rr_f * u_star[3] ** 2 + g_thth_f * u_star[4] ** 2
                       + g_pp_f * u_star[5] ** 2)
                et = erg * (1.0 / C.mass_a)
                nrm = jnp.sqrt(jnp.maximum(
                    (-g_tt_f * et * et - 1.0) / (et * et * wsq), 0.0))
                u_c = (u_star[0], u_star[1], u_star[2], u_star[3] * nrm,
                       u_star[4] * nrm, u_star[5] * nrm, u_star[6])
                # MC draw: uniform for THIS node index, pre-drawn per slot
                # (slot = n_cross before this crossing's increment); read
                # LAZILY from the input ref so the uniforms are not live
                # vectors across the whole while loop
                u_draw = jnp.zeros_like(done_f)
                for slot in range(n_slots):
                    u_draw = jnp.where(jnp.abs(n_cross - slot) < 0.5,
                                       uni_ref[:, slot, :], u_draw)
                convert = u_draw < p_star
                ph_c = jnp.where(chain_go & convert, 1.0 - is_ph, is_ph)
                f_c = _rhs(C, u_c, lnt_star, erg, ph_c)
                g_c = _condition(C, u_c, lnt_star)
                return u_c, ph_c, f_c, g_c

            u_ch, is_ph_ch, f_ch, g_ch = lax.cond(
                any_chain, _chain_restart,
                lambda _: (u, is_ph, f0, g0), 0)
            is_ph = jnp.where(chain_go, is_ph_ch, is_ph)
            x0c = tuple(jnp.where(chain_go, p, x) for p, x in zip(pc_star, x0c))
            seg_cross = jnp.where(chain_go, 0.0, seg_cross + rec_f)
            nodes_used = nodes_used + jnp.where(chain_go, 1.0, 0.0)

        # ntimes=3 mid-point save (Hermite at the save-grid midpoint)
        in_step_mid = accept & (lnt < lnt_mid) & (lnt + h >= lnt_mid)
        tau_mid_s = jnp.where(h > 0, (lnt_mid - lnt) / jnp.where(h > 0, h, 1.0), 0.0)
        u_mid_s = _hermite(u, u_new, f0, f_new, h, tau_mid_s)
        save_mid = tuple(jnp.where(in_step_mid, um, sm)
                         for um, sm in zip(u_mid_s, save_mid))

        # commit accepted state (float-float accumulation)
        u2 = []
        u_lo2 = []
        for j in range(7):
            d = u_new[j] - u[j]
            hi, lo = _ff_add(u[j], u_lo[j], jnp.where(accept, d, 0.0))
            # terminate-at-crossing / restart-at-crossing overrides
            hi = jnp.where(term_cross, u_star[j], hi)
            if n_slots > 1:
                hi = jnp.where(cont_cross, u_hi[j], hi)
            if with_chain:
                hi = jnp.where(chain_go, u_ch[j], hi)
            lo = jnp.where(term_cross | cont_cross | chain_go, 0.0, lo)
            u2.append(hi)
            u_lo2.append(lo)
        u2 = tuple(u2)
        u_lo2 = tuple(u_lo2)
        lnt2, lnt_lo2 = _ff_add(lnt, lnt_lo, jnp.where(accept, h, 0.0))
        lnt2 = jnp.where(term_cross, lnt_star, lnt2)
        if n_slots > 1:
            lnt2 = jnp.where(cont_cross, lnt_hi, lnt2)
        if with_chain:
            lnt2 = jnp.where(chain_go, lnt_star, lnt2)
        lnt_lo2 = jnp.where(term_cross | cont_cross | chain_go, 0.0, lnt_lo2)

        f02 = tuple(jnp.where(accept, fn, ff) for fn, ff in zip(f_new, f0))
        g02 = jnp.where(accept, g_new, g0)
        if n_slots > 1:
            f02 = tuple(jnp.where(cont_cross, fh, ff)
                        for fh, ff in zip(f_hi, f02))
            g02 = jnp.where(cont_cross, g_hi, g02)
        if with_chain:
            f02 = tuple(jnp.where(chain_go, fc, ff)
                        for fc, ff in zip(f_ch, f02))
            g02 = jnp.where(chain_go, g_ch, g02)

        steps2 = steps + jnp.where(active, 1.0, 0.0)

        ns_hit = accept & (is_ph > 0.5) & (u2[0] < C.r_ns * 1.01) & ~done
        reached = accept & (lnt2 >= lnt1 - 1e-6) & ~done
        maxed = (steps2 >= C.max_steps) & ~done
        at_win = (jnp.mod(steps2, C.stall_window) < 0.5) & (steps2 > 0.5)
        stalled = at_win & ~done & (lnt2 - lnt_ck < C.stall_min)
        lnt_ck2 = jnp.where(at_win, lnt2, lnt_ck)

        code2 = code
        for flag, val in ((term_cross, 3.0), (ns_hit, 2.0), (reached, 1.0),
                          (maxed, 4.0), (stalled, 5.0)):
            code2 = jnp.where(flag & (code2 < 0.5), val, code2)
        done2 = done | term_cross | ns_hit | reached | maxed | stalled
        done2_f = jnp.where(done2, 1.0, 0.0)

        ret = (done2_f, u2, u_lo2, lnt2, lnt_lo2, dt_next, f02, g02, steps2,
               n_cross2, save_mid, code2, lnt_ck2)
        if with_chain:
            ret = ret + (is_ph, x0c, seg_cross, nodes_used)
        if use_pi:
            ret = ret + (errold,)
        return ret + (it + 1,)

    carry = (done, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, n_cross,
             save_mid, code, lnt_ck)
    if with_chain:
        carry = carry + (is_ph, x0c_const, seg_cross, nodes_used)
    if use_pi:
        # resumed lanes carry the controller memory across the launch
        # boundary; fresh lanes start at Hairer's facold floor
        carry = carry + (jnp.where(errold0 > 0, errold0, 1e-4),)
    carry = carry + (jnp.zeros((), jnp.int32),)
    out = lax.while_loop(cond_fn, body, carry)
    errold_out = out[-2] if use_pi else jnp.zeros_like(lnt)
    out = out[:-2] if use_pi else out[:-1]
    if with_chain:
        (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, n_cross,
         save_mid, code, lnt_ck, is_ph, x0c, seg_cross,
         nodes_used) = out
    else:
        (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, n_cross,
         save_mid, code, lnt_ck) = out
        is_ph = is_ph_const
        nodes_used = jnp.zeros_like(lnt)

    @pl.when(tile_run)
    def _finalize():
        zc = jnp.zeros_like(u[0])
        for i in range(7):
            # hi and lo words separately (rows 8-14 feed the chunked resume)
            uout_ref[:, i, :] = u[i]
            uout_ref[:, 8 + i, :] = u_lo[i]
        uout_ref[:, 7, :] = zc
        uout_ref[:, 15, :] = zc
        lnt_ref[:, 0, :] = lnt
        lnt_ref[:, 1, :] = lnt_lo
        diag_ref[:, 0, :] = steps
        diag_ref[:, 1, :] = code
        diag_ref[:, 2, :] = n_cross
        diag_ref[:, 3, :] = g0
        diag_ref[:, 4, :] = nodes_used
        diag_ref[:, 5, :] = is_ph
        # diag[6] = fine-scan step count (written in-loop)
        diag_ref[:, 7, :] = dt           # controller dt (chunked resume)
        diag_ref[:, 8, :] = done_f       # done flag (chunked resume)
        diag_ref[:, 9, :] = errold_out   # PI controller memory (resume)
        for i in range(10, 16):
            diag_ref[:, i, :] = zc
        # cross_ref / pcx_ref were written in place at record time
        for i in range(7):
            save_ref[:, i, :] = save_mid[i]
        save_ref[:, 7, :] = zc


def integrate_mega(u0, lnt0, lnt1, erg, x0_cart, sc: Scene, cfg: NumericsConfig,
                   *, max_crossings: int = 1, tile_rows: int = 1,
                   is_photon=None, species: str = "photon",
                   with_prob: bool = False, chain_cap=None, uniforms=None,
                   it_cap=None, resume=None, return_resume: bool = False):
    """Run the megakernel over a [B, 7] state batch (B a multiple of
    128*tile_rows).  Returns (u_final [B,7], lnt_final [B], steps [B],
    code [B], n_cross [B], cross_u [B, n_slots, 7], cross_lnt [B, n_slots],
    save_mid [B, 7], pcx [B, n_slots], chain_nodes [B], is_ph_out [B],
    n_fine_scans [B] — tile-steps on which the gated fine event scan ran).
    species: 'photon' | 'axion' | 'mixed' (static).  with_prob: evaluate the
    conversion probability in-kernel at each recorded crossing (requires
    SceneConsts.can_prob).  chain_cap [B] (f32; 0 = off) + uniforms
    [B, max_crossings] enable the in-kernel MC chain (implies with_prob).

    it_cap / resume / return_resume serve integrate_mega_chunked: it_cap
    bounds the PER-LAUNCH iteration count (codes still key off the absolute
    step counter); resume is the dict a previous return_resume=True call
    produced (float-float low words, controller dt, absolute step/crossing
    counters, the original save-grid midpoint, per-lane done flags); chain
    mode cannot be resumed (the segment-start point x0c is not carried)."""
    B = u0.shape[0]
    L = 128
    assert B % (L * tile_rows) == 0, B
    R = B // L
    f32 = jnp.float32
    n_slots = max_crossings
    with_chain = chain_cap is not None
    assert not (with_chain and resume is not None), \
        "in-kernel chains cannot resume across launches"

    def to_rl(x):
        return x.astype(f32).reshape(R, L)

    if is_photon is None:
        is_ph = jnp.ones(B)
    else:
        is_ph = jnp.where(is_photon, 1.0, 0.0)
    zero = jnp.zeros((R, L), f32)
    if resume is None:
        u_lo_rows = [zero] * 7
        res_rows = [zero, zero, zero, zero,
                    to_rl(0.5 * (lnt0 + lnt1)), zero, zero]
    else:
        u_lo_rows = [to_rl(resume["u_lo"][:, i]) for i in range(7)]
        res_rows = [to_rl(resume["lnt_lo"]), to_rl(resume["dt"]),
                    to_rl(resume["steps"]), to_rl(resume["n_cross"]),
                    to_rl(resume["lnt_mid"]), to_rl(resume["done"]),
                    to_rl(resume["errold"]) if "errold" in resume else zero]
    uin = jnp.stack([to_rl(u0[:, i]) for i in range(7)] + [zero]
                    + u_lo_rows + [zero], axis=1)                # [R, 16, L]
    aux = jnp.stack([to_rl(lnt0), to_rl(lnt1), to_rl(erg),
                     to_rl(x0_cart[:, 0]), to_rl(x0_cart[:, 1]),
                     to_rl(x0_cart[:, 2]), to_rl(is_ph),
                     to_rl(chain_cap) if with_chain else zero]
                    + res_rows + [zero], axis=1)                 # [R, 16, L]
    if with_chain:
        uni = jnp.stack([to_rl(uniforms[:, s]) for s in range(n_slots)],
                        axis=1)                                  # [R, S, L]
    else:
        uni = jnp.zeros((R, n_slots, L), f32)

    C = SceneConsts(sc, cfg)
    C.species = species
    if it_cap is not None:
        C.it_cap = int(it_cap)
    if not C.can_prob:
        with_prob = False
        with_chain = False
    with_prob = with_prob or with_chain
    kernel = functools.partial(_mega_kernel, C=C, max_crossings=max_crossings,
                               with_prob=with_prob, with_chain=with_chain)
    grid = (R // tile_rows,)
    bs = lambda d: pl.BlockSpec((tile_rows, d, L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        uout, lntout, diag, cross, save, pcx = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((R, 16, L), f32),
                jax.ShapeDtypeStruct((R, 2, L), f32),
                jax.ShapeDtypeStruct((R, 16, L), f32),
                jax.ShapeDtypeStruct((R, 8 * n_slots, L), f32),
                jax.ShapeDtypeStruct((R, 8, L), f32),
                jax.ShapeDtypeStruct((R, n_slots, L), f32),
            ),
            grid=grid,
            in_specs=[bs(16), bs(16), bs(n_slots)],
            out_specs=(bs(16), bs(2), bs(16), bs(8 * n_slots), bs(8),
                       bs(n_slots)),
        )(uin, aux, uni)
    # hi + lo: the same f32 add the kernel's finalize used to do in-core
    uf = jnp.stack([(uout[:, i, :] + uout[:, 8 + i, :]).reshape(B)
                    for i in range(7)], axis=1)
    lntf = (lntout[:, 0, :] + lntout[:, 1, :]).reshape(B)
    dg = lambda i: diag[:, i, :].reshape(B)
    cru = jnp.stack([
        jnp.stack([cross[:, 8 * slot + i, :].reshape(B) for i in range(7)], axis=1)
        for slot in range(n_slots)
    ], axis=1)                                                    # [B, n_slots, 7]
    crlnt = jnp.stack([cross[:, 8 * slot + 7, :].reshape(B)
                       for slot in range(n_slots)], axis=1)       # [B, n_slots]
    save_mid = jnp.stack([save[:, i, :].reshape(B) for i in range(7)], axis=1)
    pcx_out = jnp.stack([pcx[:, slot, :].reshape(B)
                         for slot in range(n_slots)], axis=1)     # [B, n_slots]
    ret = (uf, lntf, dg(0), dg(1), dg(2), cru, crlnt, save_mid, pcx_out,
           dg(4), dg(5), dg(6))
    if return_resume:
        ret = ret + (dict(
            u_hi=jnp.stack([uout[:, i, :].reshape(B) for i in range(7)],
                           axis=1),
            u_lo=jnp.stack([uout[:, 8 + i, :].reshape(B) for i in range(7)],
                           axis=1),
            lnt_hi=lntout[:, 0, :].reshape(B),
            lnt_lo=lntout[:, 1, :].reshape(B),
            dt=dg(7), done=dg(8), errold=dg(9)),)
    return ret


def integrate_mega_chunked(u0, lnt0, lnt1, erg, x0_cart, sc: Scene,
                           cfg: NumericsConfig, *, chunk_iters: int = 64,
                           max_crossings: int = 1, tile_rows: int = 1,
                           is_photon=None, species: str = "photon",
                           with_prob: bool = False, stage_shrink: int = 4,
                           stage_floor: int = 2048,
                           stage_chunk_growth: int = 4):
    """Chunked megakernel with staged on-device straggler compaction.

    Per-ray step counts are heavy-tailed (p50 ~ 87, p99.9 ~ 1.9k at the
    headline configuration), and a 128-lane tile runs until its SLOWEST lane
    finishes — measured lockstep efficiency ~9.5% for a single launch over
    65k production rays.  This wrapper relaunches the kernel in
    chunk_iters-iteration slices and compacts survivors into geometrically
    shrinking buffers (a "pyramid"): each stage holds a static-size buffer,
    relaunches (no data movement between launches; all-done tiles skip via
    the kernel's tile_run gate) until the active count drops to the next
    stage's size, flushes results to pool-order output buffers, then sorts
    actives-first and slices.  Sorting/gathering only at the ~log(B) stage
    boundaries matters: a per-launch argsort+gather of a 65k-row carry costs
    ~10 ms on a v5e — at ~31 launches that overhead capped the every-launch
    variant at ~1.9x, while the pyramid models at ~6x (scripts/
    probe_chunked_tpu.py).  Everything stays on-device — no host syncs.

    Results match a single launch up to controller noise at launch
    boundaries: dt, float-float hi/lo state, and the absolute step/crossing
    counters are carried exactly, but f0/g0 are recomputed from the
    committed hi word (a ~1-ulp perturbation of the carried values), and
    the stall detector's progress reference resets each launch (stall cuts
    can only fire later than single-launch).  Measured against the f64 pool
    oracle the endpoint-error distribution is unchanged (median/p90
    identical to the single launch).  Same return tuple as integrate_mega.
    Chain mode is not supported (segment-start state is not carried across
    launches)."""
    B = u0.shape[0]
    S = max_crossings
    f32 = jnp.float32
    if is_photon is None:
        is_ph0 = jnp.ones(B, f32)
    else:
        is_ph0 = jnp.where(is_photon, 1.0, 0.0).astype(f32)
    lnt0f = lnt0.astype(f32)
    lnt1f = lnt1.astype(f32)
    st = dict(
        idx=jnp.arange(B, dtype=jnp.int32),
        u=u0.astype(f32), u_lo=jnp.zeros((B, 7), f32),
        lnt=lnt0f, lnt_lo=jnp.zeros(B, f32),
        lnt1=lnt1f, erg=erg.astype(f32), x0=x0_cart.astype(f32),
        is_ph=is_ph0, dt=jnp.zeros(B, f32), steps=jnp.zeros(B, f32),
        ncr=jnp.zeros(B, f32),
        done=jnp.where(lnt1f <= lnt0f, 1.0, 0.0).astype(f32),
        code=jnp.zeros(B, f32),
        lnt_mid=(0.5 * (lnt0f + lnt1f)).astype(f32),
        cru=jnp.zeros((B, S, 7), f32), crlnt=jnp.zeros((B, S), f32),
        pcx=jnp.zeros((B, S), f32), save=jnp.zeros((B, 7), f32),
        nfine=jnp.zeros(B, f32), errold=jnp.zeros(B, f32),
    )
    # pool-order accumulators, filled by the stage flushes
    acc = {k: jnp.zeros_like(v) for k, v in st.items() if k != "idx"}

    def launch(st, it_cap=None):
        """One bounded launch + in-place merge (no sorting)."""
        act = st["done"] < 0.5
        resume = dict(u_lo=st["u_lo"], lnt_lo=st["lnt_lo"], dt=st["dt"],
                      steps=st["steps"], n_cross=st["ncr"],
                      lnt_mid=st["lnt_mid"], done=st["done"],
                      errold=st["errold"])
        (_uf, _lntf, n_steps, code, ncr, cru, crlnt, save_mid, pcx,
         _nodes, _isph, nfine, res) = integrate_mega(
            st["u"], st["lnt"], st["lnt1"], st["erg"], st["x0"], sc, cfg,
            max_crossings=S, tile_rows=tile_rows,
            is_photon=st["is_ph"] > 0.5, species=species,
            with_prob=with_prob,
            it_cap=chunk_iters if it_cap is None else it_cap,
            resume=resume, return_resume=True)
        # merge: skipped tiles' outputs are unwritten garbage, and done
        # lanes inside running tiles echo their inputs — mask on pre-launch
        # activity either way
        m1 = lambda new, old: jnp.where(act, new, old)
        m2 = lambda new, old: jnp.where(act[:, None], new, old)
        # crossing slots recorded THIS launch: ncr_in <= slot < ncr_out
        slots = jnp.arange(S, dtype=f32)[None, :]
        took = (act[:, None] & (slots > st["ncr"][:, None] - 0.5)
                & (slots < ncr[:, None] - 0.5))
        return dict(
            idx=st["idx"],
            u=m2(res["u_hi"], st["u"]), u_lo=m2(res["u_lo"], st["u_lo"]),
            lnt=m1(res["lnt_hi"], st["lnt"]),
            lnt_lo=m1(res["lnt_lo"], st["lnt_lo"]),
            lnt1=st["lnt1"], erg=st["erg"], x0=st["x0"], is_ph=st["is_ph"],
            dt=m1(res["dt"], st["dt"]), steps=m1(n_steps, st["steps"]),
            ncr=m1(ncr, st["ncr"]), done=m1(res["done"], st["done"]),
            code=m1(code, st["code"]), lnt_mid=st["lnt_mid"],
            cru=jnp.where(took[:, :, None], cru, st["cru"]),
            crlnt=jnp.where(took, crlnt, st["crlnt"]),
            pcx=jnp.where(took, pcx, st["pcx"]),
            # the save-grid midpoint is spanned by exactly one launch; a
            # written row has r > 0 (the kernel zero-fills unwritten rows)
            save=jnp.where((act & (save_mid[:, 0] != 0))[:, None],
                           save_mid, st["save"]),
            nfine=st["nfine"] + jnp.where(act, nfine, 0.0),
            errold=m1(res["errold"], st["errold"]),
        )

    def flush(acc, st):
        idx = st["idx"]
        return {k: acc[k].at[idx].set(st[k]) for k in acc}

    # stage plan: B -> B/shrink -> ... -> floor (all multiples of 128)
    floor = max(min(stage_floor, B), 128)
    sizes = []
    n = B
    while n > floor:
        n = max(((n // stage_shrink) // 128) * 128, floor)
        sizes.append(n)

    # Per-stage chunk: later stages hold few tiles, so per-launch fixed
    # cost dominates lane-waste — grow the iteration budget geometrically
    # (modeled ~2.2x over a constant chunk; scripts/probe_chunked_tpu.py).
    chunk = int(chunk_iters)
    for target in sizes:
        # launch until the active population fits the next stage
        def stage_cond(s, t=target):
            alive = s["done"] < 0.5
            return jnp.any(alive) & (jnp.sum(alive) > t)

        st = lax.while_loop(stage_cond,
                            functools.partial(launch, it_cap=chunk), st)
        acc = flush(acc, st)
        # compact: actives first (stable partition).  Sorting the actives by
        # steps-so-far (straggler grouping) was A/B-measured a NON-lever:
        # 611 vs 578 ms at the headline config — steps-so-far does not
        # predict steps-remaining here.
        order = jnp.argsort(st["done"], stable=True)
        st = {k: v[order][:target] for k, v in st.items()}
        chunk = min(chunk * max(int(stage_chunk_growth), 1),
                    int(cfg.max_steps))

    st = lax.while_loop(lambda s: jnp.any(s["done"] < 0.5),
                        functools.partial(launch, it_cap=chunk), st)
    acc = flush(acc, st)

    uf = acc["u"] + acc["u_lo"]
    lntf = acc["lnt"] + acc["lnt_lo"]
    return (uf, lntf, acc["steps"], acc["code"], acc["ncr"], acc["cru"],
            acc["crlnt"], acc["save"], acc["pcx"], jnp.zeros(B, f32),
            acc["is_ph"], acc["nfine"])


def flops_per_step(sc: Scene, cfg: NumericsConfig, species="photon"):
    """Analytic per-lane flop model of one attempted megakernel step,
    derived from XLA's own cost analysis of the kernel's building blocks
    (the pure jnp functions _rhs and _condition, lowered for CPU).

    Structure per attempted step (see _mega_kernel.body):
      6 x _rhs (stages 2-6 + f_new; f0 reused)
      (interp_points - 1) x (_condition + 7-comp Hermite) interior scan
      + 1 endpoint _condition
      + controller / error-norm / float-float commit (counted via _hermite
        cost x 2 as a structural estimate)
    The event block (bisection + records) is EXCLUDED — it runs under a
    tile-level scf.if on a minority of steps; its cost shows up as the gap
    between modeled and measured throughput.  Returns flops per lane-step.
    """
    import jax

    C = SceneConsts(sc, cfg)
    C.species = species

    def cost(f, *args):
        c = jax.jit(f, backend="cpu").lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))

    z = jnp.zeros((128,), jnp.float32)
    u7 = (z + 15.0, z + 1.0, z + 0.5, z + 0.3, z + 0.2, z + 0.1, z - 1e-5)
    rhs_f = cost(lambda u, lnt: _rhs(C, u, lnt, z + 1e-5, z + 1.0), u7, z - 5.0)
    cond_f = cost(lambda u, lnt: _condition(C, u, lnt), u7, z - 5.0)
    herm_f = cost(
        lambda a, b, fa, fb: _hermite(a, b, fa, fb, z + 0.1, z + 0.5),
        u7, u7, u7, u7)
    per_lane = 128.0
    rhs = rhs_f / per_lane
    cond = cond_f / per_lane
    herm = herm_f / per_lane
    # With the gated two-phase scan only the coarse pass runs on every
    # step; the fine pass is a tile-gated minority cost (reported by the
    # bench as gate_frac) and, like the event block, is excluded here.
    k = max(int(cfg.interp_points), 1)
    if 0 < int(cfg.interp_coarse) < k:
        k = int(cfg.interp_coarse)
    return 6.0 * rhs + (k - 1) * (cond + herm) + cond + 2.0 * herm


# Estimated VPU f32 peak of one v5e chip: 8x128 lanes x 4 ALUs x ~1.5 GHz
# x 2 (FMA) ~ 12.3 TFLOP/s.  Elementwise-heavy code cannot reach the FMA
# peak, but the constant gives a consistent utilization denominator.
VPU_PEAK_F32 = 12.3e12


def propagate_mega(x0_cart, k0_cart, sc: Scene, cfg: NumericsConfig, *, erg,
                   delta_w, lnt0, lnt1, is_photon, max_crossings: int = 1,
                   species: str = "mixed", tile_rows: int = 1,
                   with_prob: bool = False, chain_cap=None, uniforms=None,
                   chunk_iters=None):
    """PropagateResult-compatible wrapper around the megakernel
    (drop-in for ops/propagate.propagate on TPU; f32 throughout with
    float-float state inside the kernel).

    Pads the batch to a multiple of 128 internally.  The ntimes=3 trajectory
    contract maps to (launch point, in-kernel Hermite midpoint, endpoint)."""
    from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
    from adiabatic_raytracer_tpu.ops.geometry import (
        cart_to_sph, celerity_from_cart, celerity_to_cart_vel, sph_to_cart)
    from adiabatic_raytracer_tpu.ops.propagate import PropagateResult, lapse_interior

    B = x0_cart.shape[0]
    Bp = ((B + 127) // 128) * 128
    mass_eff = sc.mass_ns_eff

    k0n = k_norm_cart(x0_cart, k0_cart, 0.0, erg, sc, sc.mass_ns,
                      is_photon=True, ax_fix=True)
    x_sph0 = cart_to_sph(x0_cart)
    w0 = celerity_from_cart(x0_cart, k0n, mass_eff) / erg[:, None]
    u0 = jnp.concatenate([x_sph0, w0, (erg * delta_w)[:, None]], axis=1)

    def pad(a, fill=0.0):
        if Bp == B:
            return a
        padding = [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, padding, constant_values=fill)

    lnt0p = pad(lnt0)
    with_chain = chain_cap is not None and can_prob(sc)
    with_prob = (with_prob and can_prob(sc)) or with_chain
    if chunk_iters and not with_chain:
        # staged straggler compaction (long heavy-tailed launches, e.g. the
        # production backtrace); chain mode cannot resume across launches
        out = integrate_mega_chunked(
            pad(u0, 1.0), lnt0p, pad(lnt1, -1e30), pad(erg, 1.0),
            pad(x0_cart, 1e30), sc, cfg, chunk_iters=int(chunk_iters),
            max_crossings=max_crossings, tile_rows=tile_rows,
            is_photon=pad(jnp.where(is_photon, 1.0, 0.0)) > 0.5,
            species=species, with_prob=with_prob)
    else:
        out = integrate_mega(
            pad(u0, 1.0), lnt0p, pad(lnt1, -1e30), pad(erg, 1.0),
            pad(x0_cart, 1e30),
            sc, cfg, max_crossings=max_crossings, tile_rows=tile_rows,
            is_photon=pad(jnp.where(is_photon, 1.0, 0.0)) > 0.5,
            species=species, with_prob=with_prob,
            chain_cap=pad(chain_cap) if with_chain else None,
            uniforms=pad(uniforms) if with_chain else None)
    (uf, lntf, steps, code, n_cross, cru, crlnt, save_mid, pcx,
     chain_nodes, is_ph_out, _n_fine) = [o[:B] for o in out]

    dtype = x0_cart.dtype
    uf = uf.astype(dtype)
    save_mid = save_mid.astype(dtype)

    def state_to_cart(uu):
        x_sph = uu[:, 0:3]
        w = uu[:, 3:6] * erg[:, None]
        a = lapse_interior(x_sph[:, 0], mass_eff, sc.r_ns)
        return sph_to_cart(x_sph), celerity_to_cart_vel(x_sph, w, mass_eff, a=a)

    # ntimes = 3 trajectory: launch, midpoint, endpoint
    x_end, v_end = state_to_cart(uf)
    # a zero midpoint means the ray never spanned it (terminated early) —
    # fall back to the endpoint, matching the pool's past-end fill
    mid_valid = jnp.abs(save_mid[:, 0]) > 0
    save_mid = jnp.where(mid_valid[:, None], save_mid, uf)
    x_mid, v_mid = state_to_cart(save_mid)
    v_start = celerity_to_cart_vel(
        x_sph0, w0 * erg[:, None], mass_eff,
        a=lapse_interior(x_sph0[..., 0], mass_eff, sc.r_ns))
    traj = jnp.stack([x0_cart, x_mid, x_end], axis=1)
    mom = jnp.stack([v_start, v_mid, v_end], axis=1)
    erg_out = jnp.stack([erg * delta_w, save_mid[:, 6], uf[:, 6]], axis=1)

    cru = cru.astype(dtype)
    cross_sph = cru[..., 0:3]
    xc = sph_to_cart(cross_sph)
    kc = celerity_to_cart_vel(cross_sph, cru[..., 3:6] * erg[:, None, None],
                              mass_eff)
    tc = jnp.exp(crlnt.astype(dtype))
    dwc = cru[..., 6] / erg[:, None]

    frac = jnp.linspace(0.0, 1.0, 3)
    save_lnt = lnt0[:, None] + (lnt1 - lnt0)[:, None] * frac[None, :]
    return PropagateResult(
        traj=traj, mom=mom, erg=erg_out,
        fail=jnp.where(uf[:, 0] <= sc.r_ns * 1.01, 0.0, 1.0),
        cut_short=code == 3.0,
        xc=xc, kc=kc, tc=tc, dwc=dwc,
        n_cross=n_cross.astype(jnp.int32),
        times=save_lnt,
        final_lnt=lntf.astype(dtype),
        ns_hit=code == 2.0,
        maxed=(code == 4.0) | (code == 5.0),
        steps=steps.astype(jnp.int32),
        pcx=pcx.astype(dtype) if with_prob else None,
        chain_nodes=chain_nodes.astype(jnp.int32) if with_chain else None,
        final_is_ph=(is_ph_out > 0.5) if with_chain else None,
    )
