"""Conversion-surface sampler tests (vs RayTracer.jl:1480-1653)."""

import jax
import jax.numpy as jnp
import numpy as np

from adiabatic_raytracer_tpu.config import Scene
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler


SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.4, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)


def _setup():
    maxR = float(conversion_surface_radius(SC.mass_a, SC.theta_m, SC.omega_pul,
                                           SC.b0, SC.r_ns))
    n_grid = sampler.default_n_grid(maxR, scan_per_step=8)
    return maxR, n_grid


def test_batch_sampling():
    maxR, n_grid = _setup()
    res = sampler.sample_batch(jax.random.PRNGKey(0), 64, maxR, SC, SC.mass_ns,
                               n_grid=n_grid)
    succ = np.asarray(res.success)
    assert succ.sum() > 5, f"too few successes: {succ.sum()}"
    assert succ.sum() < 64  # rejection must happen too (n_max=6 draw)
    # successful samples lie between the star and the sampling sphere
    r = np.linalg.norm(np.asarray(res.xpos)[succ], axis=1)
    assert np.all(r > SC.r_ns) and np.all(r < 1.2 * maxR)
    assert np.all(np.asarray(res.weight)[succ] >= 1)


def test_crossing_on_surface():
    """Selected crossings are roots of the line condition."""
    maxR, n_grid = _setup()
    res = sampler.sample_batch(jax.random.PRNGKey(1), 32, maxR, SC, SC.mass_ns,
                               n_grid=n_grid)
    succ = np.asarray(res.success)
    idx = np.nonzero(succ)[0]
    for i in idx[:5]:
        g = sampler._line_condition(
            jnp.asarray(res.xpos[i]),
            jnp.asarray(res.v_loc[i]) / jnp.linalg.norm(res.v_loc[i]),
            res.erg_inf[i], SC, SC.mass_ns, True,
        )
        assert abs(float(g)) < 1e-6, float(g)


def test_erg_inf_value():
    maxR, n_grid = _setup()
    res = sampler.sample_batch(jax.random.PRNGKey(2), 8, maxR, SC, SC.mass_ns,
                               n_grid=n_grid)
    # v_infty ~ 220 km/s => erg_inf = m_a (1 + v^2/2c^2) to excellent accuracy
    want = SC.mass_a * (1 + (220.0 / 2.99792e5) ** 2 / 2)
    np.testing.assert_allclose(np.asarray(res.erg_inf), want, rtol=1e-9)


def test_deterministic_given_key():
    maxR, n_grid = _setup()
    r1 = sampler.sample_batch(jax.random.PRNGKey(3), 8, maxR, SC, SC.mass_ns,
                              n_grid=n_grid)
    r2 = sampler.sample_batch(jax.random.PRNGKey(3), 8, maxR, SC, SC.mass_ns,
                              n_grid=n_grid)
    np.testing.assert_array_equal(np.asarray(r1.xpos), np.asarray(r2.xpos))
