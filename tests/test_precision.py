"""Mixed-precision validation: f64 state + f32 physics vs full f64.

The TPU production path evaluates fields/Hamiltonians in f32 (TPU
transcendentals are f32-grade even under emulated f64) while integrating in
f64.  The parity contract is trajectory endpoints < 1e-4 relative error
(BASELINE.md); the mixed scheme must stay far inside that."""

import jax
import jax.numpy as jnp
import numpy as np

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
from adiabatic_raytracer_tpu.ops.propagate import propagate


def _run(compute_dtype):
    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(interp_points=8, compute_dtype=compute_dtype)
    B = 8
    rng = np.random.default_rng(5)
    r = rng.uniform(14.0, 24.0, B)
    th = np.arccos(rng.uniform(-0.9, 0.9, B))
    ph = rng.uniform(-np.pi, np.pi, B)
    x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                  r * np.cos(th)], axis=1)
    # outward-escaping rays: near-bound orbits in strong gravity are chaotic
    # (exponential sensitivity), where endpoint parity is meaningless for ANY
    # integrator; the contract is validated on well-conditioned trajectories.
    v = x / np.linalg.norm(x, axis=1, keepdims=True) + 0.2 * rng.normal(size=(B, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    erg = np.full(B, 1.0000005e-5)
    res = propagate(
        jnp.asarray(x), jnp.asarray(v), sc, cfg,
        erg=jnp.asarray(erg),
        delta_w=-jnp.ones(B),
        lnt0=jnp.full(B, cfg.ln_t_start),
        lnt1=jnp.full(B, float(np.log(3e-3))),
        is_photon=jnp.ones(B, bool),
        max_crossings=jnp.ones(B, jnp.int32),
        species="photon",
    )
    return np.asarray(res.traj[:, -1, :]), np.asarray(res.n_cross)


def test_mixed_precision_endpoints():
    end64, nc64 = _run("state")
    end32, nc32 = _run("f32")
    # same crossing topology
    np.testing.assert_array_equal(nc64, nc32)
    rel = np.linalg.norm(end32 - end64, axis=1) / np.linalg.norm(end64, axis=1)
    # median is the method-fidelity number; the max allows for the mild
    # trajectory-sensitivity amplification of slow (erg ~ m_a) rays with
    # radial turning points, which affects individual endpoints but not the
    # statistical MC observables.
    assert np.median(rel) < 5e-5, rel
    assert np.max(rel) < 1e-3, rel


def test_event_kinematics_f32_path_finite_and_close():
    """The f32 kinematics path must assemble sln_prob in f64: its magnitude
    is ~1e39 (MainRunner.jl:552-558 unit factors), beyond f32 max, so an
    all-f32 product overflows to inf (caught on TPU by bench_overshoot's
    sum_pps = inf; regression-pinned here on CPU)."""
    from adiabatic_raytracer_tpu.config import TreeConfig
    from adiabatic_raytracer_tpu.driver import _event_kinematics
    from adiabatic_raytracer_tpu.models.magnetosphere import (
        conversion_surface_radius)
    from adiabatic_raytracer_tpu.ops import sampler

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    maxR = float(conversion_surface_radius(sc.mass_a, sc.theta_m,
                                           sc.omega_pul, sc.b0, sc.r_ns))
    res = sampler.sample_batch(jax.random.PRNGKey(2), 64, maxR, sc,
                               sc.mass_ns,
                               n_grid=sampler.default_n_grid(maxR,
                                                             scan_per_step=8))
    ok = np.asarray(res.success)
    x = jnp.asarray(np.asarray(res.xpos)[ok])
    v = jnp.asarray(np.asarray(res.v_loc)[ok])
    e = jnp.asarray(np.asarray(res.erg_inf)[ok])
    assert x.shape[0] >= 2
    tcfg = TreeConfig()
    k64, s64, c64, j64 = _event_kinematics(x, v, e, maxR, sc, tcfg, "state")
    k32, s32, c32, j32 = _event_kinematics(x, v, e, maxR, sc, tcfg, "f32")
    s32, s64 = np.asarray(s32), np.asarray(s64)
    assert np.all(np.isfinite(s32)), s32
    assert s64.max() > 1e38  # the column really is beyond f32 range
    np.testing.assert_allclose(s32, s64, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(c32), np.asarray(c64), rtol=1e-4,
                               atol=1e-7)
