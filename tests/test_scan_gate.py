"""Per-scene auto-validation of the gated two-phase event scan.

The gate frontier (interp_coarse=4 / scan_gate_theta=0.08) was census-
validated on the production-default scene only; driver.scan_gate_census_check
re-validates it per scene against the reference's plain dense-scan contract
(RayTracer.jl:357-358) and driver.run() falls back to the plain scan on any
mismatch.  These tests pin the guard's wiring on CPU; the live-TPU validation
(default scene + a mass_a x B0 parameter scan) is scripts/probe_scan_gate.py
-> SCAN_GATE_r05.json.
"""

import numpy as np

from adiabatic_raytracer_tpu import driver
from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius


def _scene_inputs(sc):
    maxR = float(conversion_surface_radius(sc.mass_a, sc.theta_m, sc.omega_pul,
                                           sc.b0, sc.r_ns, sc.bndry_lyr))
    lnt_end = float(np.log(1.0 / float(sc.omega_pul)))
    return maxR, lnt_end


def test_guard_inactive_off_mega():
    """Gate guard is a no-op (scan_gate='off') when the engine is not mega,
    when the check is disabled, or when the gate itself is inactive."""
    sc = Scene()
    maxR, lnt_end = _scene_inputs(sc)
    for cfg in (
        NumericsConfig(engine="pool"),                       # not mega
        NumericsConfig(engine="mega", scan_gate_check=0),    # check disabled
        NumericsConfig(engine="mega", interp_coarse=0),      # gate inactive
    ):
        stats = driver.RunStats()
        out = driver._apply_scan_gate_guard(sc, cfg, maxR, lnt_end, stats)
        assert out is cfg
        assert stats.scan_gate == "off"


def test_guard_ladder_wiring(monkeypatch):
    """The guard's escalation ladder: census clean -> keep the gate; default
    gate misses but the widened (coarse x2, theta x2) notch is clean -> run
    widened; both miss -> plain dense scan.  All recorded in RunStats."""
    sc = Scene()
    maxR, lnt_end = _scene_inputs(sc)
    cfg = NumericsConfig(engine="mega", compute_dtype="f32")
    assert 0 < cfg.interp_coarse < cfg.interp_points  # gate active by default

    # both notches miss -> plain fallback
    monkeypatch.setattr(driver, "_scan_gate_check_cached",
                        lambda *a, **k: (False, 3, 64))
    stats = driver.RunStats()
    out = driver._apply_scan_gate_guard(sc, cfg, maxR, lnt_end, stats)
    assert stats.scan_gate == "fallback_plain"
    assert out.interp_coarse == 0                     # plain dense scan

    # default misses, widened notch clean -> widened gate
    monkeypatch.setattr(
        driver, "_scan_gate_check_cached",
        lambda _sc, c, *a, **k: (c.interp_coarse > cfg.interp_coarse, 1, 64))
    stats = driver.RunStats()
    out = driver._apply_scan_gate_guard(sc, cfg, maxR, lnt_end, stats)
    assert stats.scan_gate == "widened"
    assert out.interp_coarse == 2 * cfg.interp_coarse
    assert float(out.scan_gate_theta) == 2.0 * float(cfg.scan_gate_theta)

    # census clean -> unchanged
    monkeypatch.setattr(driver, "_scan_gate_check_cached",
                        lambda *a, **k: (True, 0, 64))
    stats = driver.RunStats()
    out = driver._apply_scan_gate_guard(sc, cfg, maxR, lnt_end, stats)
    assert stats.scan_gate == "ok"
    assert out is cfg

    # zero-yield ensemble -> unchecked, gate kept (run() fails loudly on a
    # genuinely unsampleable scene)
    monkeypatch.setattr(driver, "_scan_gate_check_cached",
                        lambda *a, **k: (True, 0, 0))
    stats = driver.RunStats()
    out = driver._apply_scan_gate_guard(sc, cfg, maxR, lnt_end, stats)
    assert stats.scan_gate == "unchecked"
    assert out is cfg


def test_census_check_clean_on_default_scene_interpret():
    """The real check (gated vs plain megakernel backtrace census) runs end
    to end in interpret mode and reports a clean census on a small default-
    family scene.  Small caps keep the interpreted kernel fast; the gate is
    still exercised (interp_coarse=4 < interp_points=8)."""
    from jax.experimental.pallas import tpu as pltpu

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.4, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    maxR, lnt_end = _scene_inputs(sc)
    cfg = NumericsConfig(engine="mega", compute_dtype="f32", interp_points=8,
                         max_crossings=8, max_steps=2000)
    with pltpu.force_tpu_interpret_mode():
        ok, bad, n = driver.scan_gate_census_check(sc, cfg, maxR, lnt_end,
                                                   n_events=3)
    assert n == 3
    assert ok, f"{bad}/{n} events mismatched gated vs plain scan"
