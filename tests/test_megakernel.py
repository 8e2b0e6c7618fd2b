"""Megakernel vs the standard pool integrator (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_megakernel_matches_pool():
    from jax.experimental.pallas import tpu as pltpu

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
    from adiabatic_raytracer_tpu.ops.geometry import cart_to_sph, celerity_from_cart
    from adiabatic_raytracer_tpu.ops.propagate import propagate

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(interp_points=8, compute_dtype="f32", max_steps=3000)
    B = 128
    rng = np.random.default_rng(0)
    r = rng.uniform(14.0, 24.0, B)
    th = np.arccos(rng.uniform(-0.9, 0.9, B))
    ph = rng.uniform(-np.pi, np.pi, B)
    x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                  r * np.cos(th)], axis=1)
    v = rng.normal(size=(B, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    erg = np.full(B, 1e-5 * (1 + 0.5 * (220 / 2.99792e5) ** 2))
    t_end = 1e-3

    ref = propagate(jnp.asarray(x), jnp.asarray(v), sc, cfg,
                    erg=jnp.asarray(erg), delta_w=-jnp.ones(B),
                    lnt0=jnp.full(B, cfg.ln_t_start),
                    lnt1=jnp.full(B, float(np.log(t_end))),
                    is_photon=jnp.ones(B, bool),
                    max_crossings=jnp.ones(B, jnp.int32), species="photon")

    k0n = k_norm_cart(jnp.asarray(x), jnp.asarray(v), 0.0, jnp.asarray(erg),
                      sc, sc.mass_ns, is_photon=True, ax_fix=True)
    w0 = celerity_from_cart(jnp.asarray(x), k0n, sc.mass_ns_eff) / jnp.asarray(erg)[:, None]
    u0 = jnp.concatenate([cart_to_sph(jnp.asarray(x)), w0,
                          (-jnp.asarray(erg))[:, None]], axis=1)
    with pltpu.force_tpu_interpret_mode():
        (uf, lntf, steps, code, ncross, cru, crlnt, save_mid,
         *_extras) = mk.integrate_mega(
            u0, jnp.full(B, cfg.ln_t_start), jnp.full(B, float(np.log(t_end))),
            jnp.asarray(erg), jnp.asarray(x), sc, cfg, tile_rows=1)

    # identical crossing topology
    np.testing.assert_array_equal(np.asarray(ref.n_cross),
                                  np.asarray(ncross).astype(int))
    # step counts within a few percent (f32 vs mixed-state controller noise)
    s_ref = np.asarray(ref.steps)
    s_mega = np.asarray(steps)
    assert np.mean(np.abs(s_mega - s_ref)) < 0.1 * s_ref.mean()
    # endpoints: f32 state vs f64 state, well under the 1e-4 contract on
    # end-reached rays
    ok = np.asarray(code) == 1.0
    assert ok.sum() > B // 2
    r_ref = np.linalg.norm(np.asarray(ref.traj[:, -1, :]), axis=1)
    rel = np.abs(np.asarray(uf[:, 0]) - r_ref) / r_ref
    assert np.median(rel[ok]) < 5e-5, np.median(rel[ok])
    assert np.max(rel[ok]) < 1e-3, np.max(rel[ok])
    # crossing positions agree where both found one
    both = (np.asarray(ref.n_cross) >= 1)
    rc_ref = np.linalg.norm(np.asarray(ref.xc[:, 0, :]), axis=1)
    rel_c = np.abs(np.asarray(cru[:, 0, 0]) - rc_ref) / np.maximum(rc_ref, 1.0)
    assert np.median(rel_c[both]) < 1e-4


def test_chunked_matches_single_launch():
    """integrate_mega_chunked (staged compaction pyramid, small stages so
    the sort/slice/flush machinery is exercised) vs one unbounded launch:
    identical exit codes, crossing topology, and crossing/midpoint records;
    endpoints agree up to controller noise at the launch boundaries (dt and
    float-float state are carried exactly; f0/g0 recompute is a ~1-ulp
    perturbation, amplified only on chaotic step-capped lanes)."""
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

    x = jnp.asarray(x)
    erg = jnp.asarray(erg)
    k0n = k_norm_cart(x, jnp.asarray(v), 0.0, erg, sc, sc.mass_ns,
                      is_photon=True, ax_fix=True)
    w0 = celerity_from_cart(x, k0n, sc.mass_ns_eff) / erg[:, None]
    u0 = jnp.concatenate([cart_to_sph(x), w0, (-erg)[:, None]], axis=1)
    lnt0 = jnp.full(B, cfg.ln_t_start)
    # lane 0: already done at entry (lnt1 <= lnt0) — must pass through
    lnt1 = jnp.full(B, float(np.log(1e-3))).at[0].set(cfg.ln_t_start - 1.0)

    with pltpu.force_tpu_interpret_mode():
        s = mk.integrate_mega(u0, lnt0, lnt1, erg, x, sc, cfg)
        c = mk.integrate_mega_chunked(u0, lnt0, lnt1, erg, x, sc, cfg,
                                      chunk_iters=75, stage_shrink=2,
                                      stage_floor=128)

    np.testing.assert_array_equal(np.asarray(s[3]), np.asarray(c[3]))  # code
    np.testing.assert_array_equal(np.asarray(s[4]), np.asarray(c[4]))  # n_cross
    for i in (5, 6, 7, 8):  # cross_u, cross_lnt, save_mid, pcx: bit-exact
        np.testing.assert_array_equal(np.asarray(s[i]), np.asarray(c[i]))
    # the done-at-entry lane echoes its input state in both engines
    np.testing.assert_allclose(np.asarray(c[0][0]),
                               np.asarray(u0[0]).astype(np.float32), rtol=1e-6)
    # endpoint positions on end-reached lanes: boundary-noise level
    code = np.asarray(s[3])
    ok = code == 1.0
    rel = np.abs(np.asarray(s[0][:, :3]) - np.asarray(c[0][:, :3])) \
        / (np.abs(np.asarray(s[0][:, :3])) + 1e-12)
    assert np.median(rel[ok]) < 1e-6, np.median(rel[ok])
    assert rel[ok].max() < 1e-2, rel[ok].max()


def test_propagate_mega_backtrace_matches_pool():
    """Axion backtrace mode: multi-crossing collection via propagate_mega
    (interpreter) vs the pool propagate."""
    from jax.experimental.pallas import tpu as pltpu

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.propagate import propagate

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=-1e14,
               r_ns=10.0, mass_ns=1.0)  # backtrace: B flipped
    cfg = NumericsConfig(interp_points=8, compute_dtype="f32", max_steps=3000,
                         max_crossings=8)
    B = 32
    rng = np.random.default_rng(4)
    r = rng.uniform(14.0, 22.0, B)
    th = np.arccos(rng.uniform(-0.9, 0.9, B))
    ph = rng.uniform(-np.pi, np.pi, B)
    x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                  r * np.cos(th)], axis=1)
    v = -rng.normal(size=(B, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    erg = np.full(B, 1e-5 * (1 + 0.5 * (220 / 2.99792e5) ** 2))
    args = dict(erg=jnp.asarray(erg), delta_w=-jnp.ones(B),
                lnt0=jnp.full(B, cfg.ln_t_start),
                lnt1=jnp.full(B, float(np.log(1e-2))),
                is_photon=jnp.zeros(B, bool))
    ref = propagate(jnp.asarray(x), jnp.asarray(v), sc, cfg, species="axion",
                    max_crossings=jnp.full(B, 8, jnp.int32), **args)
    with pltpu.force_tpu_interpret_mode():
        got = mk.propagate_mega(jnp.asarray(x), jnp.asarray(v), sc, cfg,
                                max_crossings=8, species="axion", **args)
    np.testing.assert_array_equal(np.asarray(ref.n_cross), np.asarray(got.n_cross))
    # crossing radii agree slot by slot where present
    nc = np.asarray(ref.n_cross)
    for b in range(B):
        for s in range(int(nc[b])):
            rr = np.linalg.norm(np.asarray(ref.xc[b, s]))
            rg = np.linalg.norm(np.asarray(got.xc[b, s]))
            assert abs(rg - rr) / rr < 1e-3, (b, s, rr, rg)
    # axions are never NS-killed
    assert not np.any(np.asarray(got.ns_hit))


def test_mega_multi_crossing_dense():
    """Crossing-dense grazing geometry (up to 5 crossings per ray, steps that
    can bracket two roots): the megakernel's restart-at-crossing must collect
    the same crossings as the pool's max_roots_per_step scan
    (ops/integrator.py:250)."""
    from jax.experimental.pallas import tpu as pltpu

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.propagate import propagate

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.4, omega_pul=1.0, b0=-1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(interp_points=8, compute_dtype="f32", max_steps=3000,
                         max_crossings=8)
    # grazing launches close to the star found to yield 2-5 crossings
    B = 16
    rng = np.random.default_rng(11)
    r = rng.uniform(11.0, 18.0, 64)
    th = np.arccos(rng.uniform(-0.9, 0.9, 64))
    ph = rng.uniform(-np.pi, np.pi, 64)
    x_all = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                      r * np.cos(th)], axis=1)
    v_all = x_all / np.linalg.norm(x_all, axis=1, keepdims=True) * 0.3 \
        + 0.7 * rng.normal(size=(64, 3))
    x, v = x_all[:B], v_all[:B]
    erg = np.full(B, 1e-5 * (1 + 0.5 * (220 / 2.99792e5) ** 2))
    args = dict(erg=jnp.asarray(erg), delta_w=-jnp.ones(B),
                lnt0=jnp.full(B, cfg.ln_t_start), lnt1=jnp.zeros(B),
                is_photon=jnp.zeros(B, bool))
    ref = propagate(jnp.asarray(x), jnp.asarray(v), sc, cfg, species="axion",
                    max_crossings=jnp.full(B, 8, jnp.int32), **args)
    with pltpu.force_tpu_interpret_mode():
        got = mk.propagate_mega(jnp.asarray(x), jnp.asarray(v), sc, cfg,
                                max_crossings=8, species="axion", **args)
    nc_ref = np.asarray(ref.n_cross)
    nc_got = np.asarray(got.n_cross)
    assert nc_ref.max() >= 2  # the construction exercises multi-crossing steps
    np.testing.assert_array_equal(nc_ref, nc_got)
    for b in range(B):
        for s in range(int(nc_ref[b])):
            rr = np.linalg.norm(np.asarray(ref.xc[b, s]))
            rg = np.linalg.norm(np.asarray(got.xc[b, s]))
            assert abs(rg - rr) / rr < 1e-3, (b, s, rr, rg)


def test_rhs_reverse_mode_matches_pool_f64():
    """The megakernel's ONE-vjp reverse-mode RHS over the nondimensionalized
    Hamiltonian (B/|b0|, k/mass_a — O(1) intermediates) matches the XLA
    pool's f64 RHS (ops/propagate.make_rhs) to f32 accuracy at production
    scales.  Raw-scale f32 reverse-mode loses ~5 digits here, so this test
    guards the scaling."""
    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.propagate import make_rhs

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig()
    C = mk.SceneConsts(sc, cfg)
    C.species = "mixed"

    rng = np.random.default_rng(3)
    N = 256
    r = rng.uniform(11.5, 40.0, N)          # > 1.01 rNS (no frozen zone)
    th = rng.uniform(0.1, np.pi - 0.1, N)
    ph = rng.uniform(-np.pi, np.pi, N)
    w = rng.normal(size=(3, N))             # celerity/erg, O(1)
    w /= np.linalg.norm(w, axis=0, keepdims=True)
    erg = np.full(N, 1e-5)
    e7 = -erg                                # delta_w = -1
    t = rng.uniform(1e-6, 0.5, N)
    lnt = np.log(t)
    is_ph = (np.arange(N) % 2 == 0)

    u7 = (r, th, ph, w[0], w[1], w[2], e7)
    got = mk._rhs(C, tuple(jnp.asarray(v, jnp.float32) for v in u7),
                  jnp.asarray(lnt, jnp.float32), jnp.asarray(erg, jnp.float32),
                  jnp.asarray(is_ph, jnp.float32))
    got = np.stack([np.asarray(g, np.float64) for g in got], axis=1)  # [N, 7]

    rhs = make_rhs(sc, sc.mass_ns_eff, 0.0, "mixed", "state")
    u_vec = jnp.asarray(np.stack(u7, axis=1))            # [N, 7] f64
    ref = jax.vmap(lambda u, l, e, p: rhs(u, l, {"erg": e, "is_photon": p}))(
        u_vec, jnp.asarray(lnt), jnp.asarray(erg), jnp.asarray(is_ph))
    ref = np.asarray(ref)

    for i in range(7):
        scale = np.abs(ref[:, i]).max()
        if scale == 0.0:
            assert np.abs(got[:, i]).max() == 0.0
            continue
        err = np.abs(got[:, i] - ref[:, i]) / (np.abs(ref[:, i]) + 1e-12 * scale)
        m = np.abs(ref[:, i]) > 1e-6 * scale
        assert np.median(err[m]) < 5e-6, (i, np.median(err[m]))
        assert err[m].max() < 5e-3, (i, err[m].max())


def test_gated_scan_matches_plain():
    """Two-phase gated event scan == plain dense scan, bit-exactly.

    The production default runs the reference's 50-point scan density
    (RayTracer.jl:357-358) behind a coarse-pass gate (config.interp_coarse /
    scan_gate_theta); this pins that the gate changes nothing: crossing
    topology, crossing states and endpoints are identical to the ungated
    scan on a mixed ensemble.  The large-ensemble version of this check is
    bench_census.py (gated-50 vs plain-50 on 64k production backtraces)."""
    from jax.experimental.pallas import tpu as pltpu

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
    from adiabatic_raytracer_tpu.ops.geometry import cart_to_sph, celerity_from_cart

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0)
    B = 128
    rng = np.random.default_rng(0)
    r = rng.uniform(14.0, 24.0, B)
    th = np.arccos(rng.uniform(-0.9, 0.9, B))
    ph = rng.uniform(-np.pi, np.pi, B)
    x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                  r * np.cos(th)], axis=1)
    v = rng.normal(size=(B, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    erg = np.full(B, 1e-5 * (1 + 0.5 * (220 / 2.99792e5) ** 2))
    t_end = 1e-3
    k0n = k_norm_cart(jnp.asarray(x), jnp.asarray(v), 0.0, jnp.asarray(erg),
                      sc, sc.mass_ns, is_photon=True, ax_fix=True)
    w0 = celerity_from_cart(jnp.asarray(x), k0n, sc.mass_ns_eff) \
        / jnp.asarray(erg)[:, None]
    u0 = jnp.concatenate([cart_to_sph(jnp.asarray(x)), w0,
                          (-jnp.asarray(erg))[:, None]], axis=1)

    outs = {}
    # interp 16/coarse 4 keeps the interpret-mode runtime test-sized while
    # exercising both branches of the gate (31 gated tile-steps measured)
    for name, coarse in [("gated", 4), ("plain", 0)]:
        cfg = NumericsConfig(interp_points=16, interp_coarse=coarse,
                             compute_dtype="f32", max_steps=3000)
        with pltpu.force_tpu_interpret_mode():
            outs[name] = mk.integrate_mega(
                u0, jnp.full(B, cfg.ln_t_start),
                jnp.full(B, float(np.log(t_end))),
                jnp.asarray(erg), jnp.asarray(x), sc, cfg)
    g, p = outs["gated"], outs["plain"]
    np.testing.assert_array_equal(np.asarray(g[4]), np.asarray(p[4]))  # n_cross
    np.testing.assert_array_equal(np.asarray(g[5]), np.asarray(p[5]))  # cross_u
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(p[0]))  # u_final
    assert float(np.asarray(g[11]).max()) > 0          # the gate did fire
    assert float(np.asarray(p[11]).max()) == 0.0       # plain never gates


def test_bndry_lyr_rhs_matches_pool_f64():
    """Boundary-layer scene (bndry_lyr > 0) on the megakernel RHS: the
    in-kernel time-derivative quirk (_ham_bndry_diff_nd jvp — spatial
    gradients exclude the bndry wp term, the time derivative includes it;
    RayTracer.jl:84-88) matches the pool's f64 make_rhs, and the term is
    live (du_e7 differs from the bndry-free scene).  Guards the round-4
    hole where the megakernel silently integrated the wrong Hamiltonian
    under --bndry_lyr."""
    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.propagate import make_rhs

    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
               r_ns=10.0, mass_ns=1.0, bndry_lyr=0.5)
    C = mk.SceneConsts(sc, NumericsConfig())
    C.species = "mixed"
    assert C.has_bndry

    rng = np.random.default_rng(3)
    N = 256
    # sample where the exponential boundary layer is live: around
    # rmax*bndry_lyr +/- 3 decay lengths (decay length = 0.1*rmax)
    center = C.bndry_rmax * C.bndry_lyr
    r = rng.uniform(max(11.5, center - 0.3 * C.bndry_rmax),
                    center + 0.3 * C.bndry_rmax, N)
    th = rng.uniform(0.1, np.pi - 0.1, N)
    ph = rng.uniform(-np.pi, np.pi, N)
    w = rng.normal(size=(3, N))
    w /= np.linalg.norm(w, axis=0, keepdims=True)
    erg = np.full(N, 1e-5)
    lnt = np.log(rng.uniform(1e-6, 0.5, N))
    is_ph = (np.arange(N) % 2 == 0)
    u7 = (r, th, ph, w[0], w[1], w[2], -erg)

    got = mk._rhs(C, tuple(jnp.asarray(v, jnp.float32) for v in u7),
                  jnp.asarray(lnt, jnp.float32), jnp.asarray(erg, jnp.float32),
                  jnp.asarray(is_ph, jnp.float32))
    got = np.stack([np.asarray(g, np.float64) for g in got], axis=1)

    rhs = make_rhs(sc, sc.mass_ns_eff, 0.0, "mixed", "state")
    u_vec = jnp.asarray(np.stack(u7, axis=1))
    ref = np.asarray(jax.vmap(
        lambda u, l, e, p: rhs(u, l, {"erg": e, "is_photon": p}))(
        u_vec, jnp.asarray(lnt), jnp.asarray(erg), jnp.asarray(is_ph)))
    for i in range(7):
        scale = np.abs(ref[:, i]).max()
        err = np.abs(got[:, i] - ref[:, i]) / (np.abs(ref[:, i]) + 1e-12 * scale)
        m = np.abs(ref[:, i]) > 1e-6 * scale
        assert np.median(err[m]) < 5e-6, (i, np.median(err[m]))
        assert err[m].max() < 5e-3, (i, err[m].max())

    # the quirk is LIVE: du_e7 (the only photon component the bndry term
    # feeds) differs materially from the bndry-free scene
    sc0 = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
                r_ns=10.0, mass_ns=1.0)
    rhs0 = make_rhs(sc0, sc0.mass_ns_eff, 0.0, "mixed", "state")
    ref0 = np.asarray(jax.vmap(
        lambda u, l, e, p: rhs0(u, l, {"erg": e, "is_photon": p}))(
        u_vec, jnp.asarray(lnt), jnp.asarray(erg), jnp.asarray(is_ph)))
    d = np.abs(ref[:, 6] - ref0[:, 6]) / (np.abs(ref[:, 6]) + 1e-300)
    assert np.median(d[is_ph]) > 0.01


def test_bndry_lyr_backtrace_matches_pool():
    """Boundary-layer scene end-to-end on the megakernel (interpret mode):
    the axion backtrace finds the SAME crossings of the bndry-augmented
    condition as the pool engine (RayTracer.jl:262-296 + 1155-1162), and
    the crossing topology differs from the bndry-free scene — i.e. the
    in-kernel _bndry_t term is both correct and live."""
    from jax.experimental.pallas import tpu as pltpu

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.propagate import propagate

    mk_sc = dict(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0,
                 b0=-1e14, r_ns=10.0, mass_ns=1.0)  # backtrace: B flipped
    sc = Scene(**mk_sc, bndry_lyr=0.5)
    sc0 = Scene(**mk_sc)
    cfg = NumericsConfig(interp_points=8, compute_dtype="f32", max_steps=3000,
                         max_crossings=8)
    B = 16
    # seed chosen tangency-free: every lane's consecutive crossings are well
    # separated (min rel gap 0.82), so the interp-8 scan is unambiguous in
    # both engines (seed 7 had a marginal tangent pair at the bndry shell)
    rng = np.random.default_rng(8)
    r = rng.uniform(16.0, 24.0, B)  # outside the bndry shell (~12.5 km here)
    th = np.arccos(rng.uniform(-0.9, 0.9, B))
    ph = rng.uniform(-np.pi, np.pi, B)
    x = np.stack([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                  r * np.cos(th)], axis=1)
    v = -x / np.linalg.norm(x, axis=1, keepdims=True) \
        + 0.3 * rng.normal(size=(B, 3))  # inbound: pierce the bndry shell
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    erg = np.full(B, 1e-5 * (1 + 0.5 * (220 / 2.99792e5) ** 2))
    args = dict(erg=jnp.asarray(erg), delta_w=-jnp.ones(B),
                lnt0=jnp.full(B, cfg.ln_t_start),
                lnt1=jnp.full(B, float(np.log(1e-2))),
                is_photon=jnp.zeros(B, bool))
    ref = propagate(jnp.asarray(x), jnp.asarray(v), sc, cfg, species="axion",
                    max_crossings=jnp.full(B, 8, jnp.int32), **args)
    ref0 = propagate(jnp.asarray(x), jnp.asarray(v), sc0, cfg, species="axion",
                     max_crossings=jnp.full(B, 8, jnp.int32), **args)
    with pltpu.force_tpu_interpret_mode():
        got = mk.propagate_mega(jnp.asarray(x), jnp.asarray(v), sc, cfg,
                                max_crossings=8, species="axion", **args)
    np.testing.assert_array_equal(np.asarray(ref.n_cross),
                                  np.asarray(got.n_cross))
    nc = np.asarray(ref.n_cross)
    assert nc.max() >= 1
    # the bndry term creates crossings the bndry-free scene does not have
    assert np.asarray(ref.n_cross).sum() != np.asarray(ref0.n_cross).sum()
    # bndry-shell crossings sit on a shallow exponential plateau of the
    # condition, so f32 root noise maps to larger position error than the
    # steep GJ-only crossings (1e-3 there): allow 1% worst-case, 0.1% median
    rels = []
    for b in range(B):
        for s in range(int(nc[b])):
            rr = np.linalg.norm(np.asarray(ref.xc[b, s]))
            rg = np.linalg.norm(np.asarray(got.xc[b, s]))
            rels.append(abs(rg - rr) / rr)
            assert rels[-1] < 1e-2, (b, s, rr, rg)
    assert np.median(rels) < 1e-3, np.median(rels)


def test_rhs_hand_adjoint_matches_pool_f64():
    """The analytic hand-adjoint RHS (megakernel._grad_h_hand,
    cfg.rhs_mode="hand") matches the pool's f64 make_rhs to the same
    accuracy as the vjp mode, across aniso/iso/bndry scenes and the
    interior-continuation metric branch (axion lanes below r_NS, covered
    by the scalar jvp through _metric)."""
    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk
    from adiabatic_raytracer_tpu.ops.propagate import make_rhs

    base = dict(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0,
                b0=1e14, r_ns=10.0, mass_ns=1.0)
    scenes = {
        "aniso": Scene(**base),
        "iso": Scene(**base, isotropic=True),
        "bndry": Scene(**base, bndry_lyr=0.5),
        "backtrace": Scene(**{**base, "b0": -1e14}),
    }
    rng = np.random.default_rng(3)
    N = 256
    r = rng.uniform(6.0, 40.0, N)  # includes interior (axion lanes only)
    th = rng.uniform(0.1, np.pi - 0.1, N)
    ph = rng.uniform(-np.pi, np.pi, N)
    w = rng.normal(size=(3, N))
    w /= np.linalg.norm(w, axis=0, keepdims=True)
    erg = np.full(N, 1e-5)
    lnt = np.log(rng.uniform(1e-6, 0.5, N))
    is_ph = (np.arange(N) % 2 == 0) & (r > 11.5)
    u7 = (r, th, ph, w[0], w[1], w[2], -erg)
    a32 = lambda v: jnp.asarray(v, jnp.float32)

    for name, sc in scenes.items():
        Ch = mk.SceneConsts(sc, NumericsConfig(rhs_mode="hand"))  # the default
        Cv = mk.SceneConsts(sc, NumericsConfig(rhs_mode="vjp"))
        Ch.species = Cv.species = "mixed"
        assert Ch.rhs_mode == "hand" and Cv.rhs_mode == "vjp"
        gh = mk._rhs(Ch, tuple(a32(v) for v in u7), a32(lnt), a32(erg),
                     a32(is_ph))
        gv = mk._rhs(Cv, tuple(a32(v) for v in u7), a32(lnt), a32(erg),
                     a32(is_ph))
        gh = np.stack([np.asarray(g, np.float64) for g in gh], axis=1)
        gv = np.stack([np.asarray(g, np.float64) for g in gv], axis=1)
        rhs = make_rhs(sc, sc.mass_ns_eff, 0.0, "mixed", "state")
        u_vec = jnp.asarray(np.stack(u7, axis=1))
        ref = np.asarray(jax.vmap(
            lambda u, l, e, p: rhs(u, l, {"erg": e, "is_photon": p}))(
            u_vec, jnp.asarray(lnt), jnp.asarray(erg), jnp.asarray(is_ph)))
        for i in range(7):
            scale = np.abs(ref[:, i]).max()
            if scale == 0.0:
                assert np.abs(gh[:, i]).max() == 0.0
                continue
            m = np.abs(ref[:, i]) > 1e-6 * scale
            eh = np.abs(gh[:, i] - ref[:, i]) / (np.abs(ref[:, i])
                                                 + 1e-12 * scale)
            ev = np.abs(gv[:, i] - ref[:, i]) / (np.abs(ref[:, i])
                                                 + 1e-12 * scale)
            assert np.median(eh[m]) < 5e-6, (name, i, np.median(eh[m]))
            # no worse than the vjp mode anywhere (both are f32 vs f64;
            # the deep-interior lanes share a known f32 artifact)
            assert eh[m].max() < max(5e-3, 2.0 * ev[m].max()), \
                (name, i, eh[m].max(), ev[m].max())


def test_condition_fast_matches_canonical():
    """The strength-reduced crossing condition (megakernel._condition,
    cond_mode="fast": the axion-shell-renormalized k-square is identically
    -mass_a^2, so g collapses to 0.5*ma^2*(wp2t*(1-kp^2/e2)-1)/e7^2 on the
    unit dipole) is value-identical to the canonical transcription
    (_condition_canonical, RayTracer.jl:262-296) up to f32 rounding, across
    anisotropic / isotropic / boundary-layer scenes, including theta beyond
    pi (the sqrt(g_pp) = 1/(r*|sin th|) sign branch)."""
    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene
    from adiabatic_raytracer_tpu.ops import megakernel as mk

    scenes = {
        "aniso": Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0,
                       b0=1e14, r_ns=10.0, mass_ns=1.0),
        "iso": Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0,
                     b0=1e14, r_ns=10.0, mass_ns=1.0, isotropic=True,
                     melrose=False),
        "bndry": Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0,
                       b0=1e14, r_ns=10.0, mass_ns=1.0, bndry_lyr=0.5),
    }
    rng = np.random.default_rng(11)
    N = 512
    for name, sc in scenes.items():
        C = mk.SceneConsts(sc, NumericsConfig())
        C.species = "mixed"
        assert C.cond_mode == "fast"
        # span the conversion-surface region (near-root states included)
        r = rng.uniform(11.0, 4.0 * C.bndry_rmax, N)
        th = np.concatenate([rng.uniform(0.1, np.pi - 0.1, N // 2),
                             rng.uniform(np.pi + 0.1, 2 * np.pi - 0.1,
                                         N - N // 2)])
        ph = rng.uniform(-np.pi, np.pi, N)
        w = rng.normal(size=(3, N))
        w /= np.linalg.norm(w, axis=0, keepdims=True)
        # |e7| >= mass_a: below the rest mass nrm^2 < 0 and the canonical
        # form NaNs (sqrt of a negative) — unreachable from on-shell states
        e7 = -np.full(N, 1e-5) * rng.uniform(1.0, 1.2, N)
        lnt = np.log(rng.uniform(1e-6, 0.5, N))
        u = tuple(jnp.asarray(v, jnp.float32)
                  for v in (r, th, ph, w[0], w[1], w[2], e7))
        lnt32 = jnp.asarray(lnt, jnp.float32)
        g_fast = np.asarray(mk._condition(C, u, lnt32), np.float64)
        g_can = np.asarray(mk._condition_canonical(C, u, lnt32), np.float64)
        # g is O(0.5) dimensionless; both forms are f32 — rounding-level
        # agreement absolutely, and relatively where g is not near a root
        d = np.abs(g_fast - g_can)
        assert d.max() < 5e-5, (name, d.max())
        m = np.abs(g_can) > 1e-2
        assert (d[m] / np.abs(g_can[m])).max() < 5e-4, \
            (name, (d[m] / np.abs(g_can[m])).max())


def test_gate_precision_transcendentals():
    """_sincos_gate/_exp32_gate (the coarse gate's cheap transcendentals)
    stay within ~1e-3 of numpy over the kernel's live argument ranges —
    four orders inside the scan_gate_theta = 0.08 error budget."""
    from adiabatic_raytracer_tpu.ops import megakernel as mk

    x = np.linspace(-60.0, 60.0, 20001)
    s, c = mk._sincos_gate(jnp.asarray(x, jnp.float32))
    assert np.abs(np.asarray(s, np.float64) - np.sin(x)).max() < 1e-3
    assert np.abs(np.asarray(c, np.float64) - np.cos(x)).max() < 1e-3
    y = np.linspace(-30.0, 3.0, 20001)
    e = mk._exp32_gate(jnp.asarray(y, jnp.float32))
    rel = np.abs(np.asarray(e, np.float64) - np.exp(y)) / np.exp(y)
    assert rel.max() < 1e-3
