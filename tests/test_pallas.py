"""Pallas line-scan kernel vs the reference jnp implementation.

Runs in interpreter mode on CPU (pallas TPU lowering is exercised on the real
chip by bench/driver paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adiabatic_raytracer_tpu.config import Scene
from adiabatic_raytracer_tpu.ops import sampler
from adiabatic_raytracer_tpu.ops import pallas_kernels as pk


def test_line_scan_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    sc = Scene(mass_a=1e-5, theta_m=0.4, omega_pul=1.0, b0=1e14, r_ns=10.0,
               mass_ns=1.0)
    B, N = 8, 512
    rng = np.random.default_rng(0)
    # sampling-line geometry as the sampler builds it
    vvec = rng.normal(size=(B, 3))
    vvec /= np.linalg.norm(vvec, axis=1, keepdims=True)
    x0 = rng.normal(size=(B, 3)) * 5.0 - vvec * 27.0
    vloc = rng.normal(size=(B, 3))
    vloc /= np.linalg.norm(vloc, axis=1, keepdims=True)
    erg = np.full(B, 1.0000005e-5)
    s_grid = np.linspace(0.0, 55.0, N)

    with pltpu.force_tpu_interpret_mode():
        got = pk.line_scan_pallas(jnp.asarray(x0), jnp.asarray(vvec),
                                  jnp.asarray(vloc), jnp.asarray(erg),
                                  jnp.asarray(s_grid), sc, sc.mass_ns)

    # reference: the sampler's scalar condition vmapped over the same grid
    want = np.zeros((B, N))
    for b in range(B):
        pts = x0[b][None, :] + s_grid[:, None] * vvec[b][None, :]
        want[b] = np.asarray(jax.vmap(
            lambda p: sampler._line_condition(p, jnp.asarray(vloc[b]),
                                              erg[b], sc, sc.mass_ns, True)
        )(jnp.asarray(pts)))

    got = np.asarray(got, np.float64)
    # f32 kernel vs f64 reference: f32-noise-level agreement relative to the
    # condition magnitude (it reaches ~500 deep inside the star, where
    # crossings are filtered out anyway)
    rel = np.abs(got - want) / (1.0 + np.abs(want))
    assert np.max(rel) < 1e-4, np.max(rel)
    # sign structure identical away from roots => same crossing detection
    mask = np.abs(want) > 1e-3
    np.testing.assert_array_equal(np.sign(got[mask]), np.sign(want[mask]))


def test_sample_batch_pallas_engine_matches_xla():
    """The production sampler path (line_engine='pallas',
    driver._build_sampler on TPU) draws the same events as the XLA path:
    identical RNG stream, same crossing selection; positions agree to the
    f32 root-refinement level."""
    from jax.experimental.pallas import tpu as pltpu

    sc = Scene(mass_a=1e-5, theta_m=0.2, omega_pul=1.0, b0=1e14, r_ns=10.0,
               mass_ns=1.0)
    key = jax.random.PRNGKey(42)
    kw = dict(n_grid=768, n_max=6, compute_dtype="f32")
    ref = sampler.sample_batch(key, 16, 25.0, sc, sc.mass_ns,
                               line_engine="xla", **kw)
    with pltpu.force_tpu_interpret_mode():
        got = sampler.sample_batch(key, 16, 25.0, sc, sc.mass_ns,
                                   line_engine="pallas", **kw)
    s_ref = np.asarray(ref.success)
    s_got = np.asarray(got.success)
    np.testing.assert_array_equal(s_ref, s_got)
    np.testing.assert_array_equal(np.asarray(ref.weight), np.asarray(got.weight))
    ok = s_ref
    np.testing.assert_allclose(np.asarray(got.xpos)[ok], np.asarray(ref.xpos)[ok],
                               rtol=0, atol=2e-3)  # f32 grid-scan root noise (km)
    # geometry draws are bit-identical (same key stream)
    np.testing.assert_array_equal(np.asarray(ref.v_ifty), np.asarray(got.v_ifty))
