"""In-kernel tree engine (ops/treekernel.py) vs the host work-queue engine.

The kernel engine implements the reference's EXACT per-node semantics
(MainRunner.jl:324-348), i.e. the host engine at tree_k=1: identical node
processing order, MC draw stream (fold_in(event_key, node_index)), cutoff
accounting, and finals population.  Trajectory-dependent records agree to
the in-kernel-restart tolerance class (the child relaunch renormalizes in
place vs the host's Cartesian round trip — the same ~1-ulp birth-state
difference as the in-kernel MC chain, tests/test_tree_mega.py)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler, tree
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.4, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
TCFG = TreeConfig(num_cutoff=4, mc_nodes=1, max_nodes=10)
KEY = jax.random.PRNGKey(11)


def _events(n, key=2):
    maxR = float(conversion_surface_radius(SC.mass_a, SC.theta_m, SC.omega_pul,
                                           SC.b0, SC.r_ns))
    n_grid = sampler.default_n_grid(maxR, scan_per_step=8)
    got = {"x": [], "v": [], "e": []}
    k = jax.random.PRNGKey(key)
    while len(got["x"]) < n:
        k, sub = jax.random.split(k)
        res = sampler.sample_batch(sub, 16, maxR, SC, SC.mass_ns, n_grid=n_grid)
        for i in np.nonzero(np.asarray(res.success))[0]:
            got["x"].append(np.asarray(res.xpos[i]))
            got["v"].append(np.asarray(res.v_loc[i]))
            got["e"].append(float(res.erg_inf[i]))
    x = jnp.asarray(np.stack(got["x"][:n]))
    v = jnp.asarray(np.stack(got["v"][:n]))
    e = jnp.asarray(np.array(got["e"][:n]))
    k_init = k_norm_cart(x, v, 0.0, e, SC, SC.mass_ns, is_photon=True,
                         ax_fix=True)
    return x, k_init, e


def _cfg(**kw):
    return NumericsConfig(engine="mega", compute_dtype="f32", interp_points=8,
                          max_crossings=8, max_steps=2000, in_kernel_prob=1,
                          tree_k=1, **kw)


@pytest.fixture(scope="module")
def runs():
    from jax.experimental.pallas import tpu as pltpu

    x, k_init, erg = _events(3)
    with pltpu.force_tpu_interpret_mode():
        host = tree.forward_tree(KEY, x, k_init, erg, SC, _cfg(), TCFG,
                                 lnt_end=0.0)
        kern = tree.forward_tree(KEY, x, k_init, erg, SC,
                                 _cfg(tree_engine="kernel"), TCFG,
                                 lnt_end=0.0)
    return host, kern


def _finals(tr, e):
    """(order -> record) dict of event e's final nodes."""
    pl = tr.pools
    st = np.asarray(pl.status[e])
    fin = np.asarray(pl.is_final[e]) & (st == 2)
    out = {}
    for p in np.nonzero(fin)[0]:
        out[int(pl.order[e, p])] = dict(
            is_ph=bool(pl.is_photon[e, p]), w=float(pl.weight[e, p]),
            prob=float(pl.prob[e, p]), pconv=float(pl.prob_conv[e, p]),
            pconv0=float(pl.prob_conv0[e, p]), t=float(pl.t[e, p]),
            ferg=float(pl.ferg[e, p]),
            fpos=np.asarray(pl.fpos[e, p]), fmom=np.asarray(pl.fmom[e, p]))
    return out


def _assert_matches(tr_a, tr_b, E, rtol=1e-3, pos_rtol=5e-3, t_rtol=None,
                    pos_atol=None):
    """Counters exact; records to rtol (rtol=0 -> bitwise).  t / fpos get
    their own (looser) defaults scaled off rtol unless overridden."""
    if t_rtol is None:
        t_rtol = 5.0 * rtol
    if pos_atol is None:
        pos_atol = 0.0 if pos_rtol == 0.0 else 1e-3
    for name in ("count", "count_main", "info", "n_alloc", "dw_anomalies"):
        np.testing.assert_array_equal(np.asarray(getattr(tr_a, name)),
                                      np.asarray(getattr(tr_b, name)), name)
    np.testing.assert_allclose(np.asarray(tr_a.tot_prob),
                               np.asarray(tr_b.tot_prob), rtol=rtol)
    for e in range(E):
        fa, fb = _finals(tr_a, e), _finals(tr_b, e)
        assert set(fa) == set(fb), (e, sorted(fa), sorted(fb))
        for o, ra in fa.items():
            rb = fb[o]
            assert ra["is_ph"] == rb["is_ph"], (e, o)
            for nm in ("w", "prob", "pconv", "pconv0", "ferg"):
                assert abs(ra[nm] - rb[nm]) <= rtol * max(abs(rb[nm]), 1e-12), \
                    (nm, e, o, ra[nm], rb[nm])
            assert abs(ra["t"] - rb["t"]) <= t_rtol * max(abs(rb["t"]), 1e-12), \
                ("t", e, o)
            if pos_rtol == 0.0:
                np.testing.assert_array_equal(ra["fpos"], rb["fpos"],
                                              err_msg=f"fpos {e} {o}")
            else:
                # VECTOR-relative: an escaped photon's endpoint sits at
                # r ~ 1e5 km after a chaotic-separation-amplified f32
                # trajectory — component-wise rtol on a near-zero component
                # of such a vector measures rounding noise, not agreement
                dn = float(np.linalg.norm(ra["fpos"] - rb["fpos"]))
                assert dn <= pos_rtol * float(np.linalg.norm(rb["fpos"])) \
                    + pos_atol, ("fpos", e, o, dn, ra["fpos"], rb["fpos"])


def test_tree_kernel_matches_host_k1(runs):
    """Per-node parity with the host engine at the production (windowed K=1)
    cutoff semantics: same orders, species, counters, stop codes; records to
    the in-kernel-restart tolerance.  rtol 5e-3: crossing roots are f32-
    bisected in-kernel vs f64 dense-output on the host, and the round-5
    strength-reduced condition (megakernel._condition cond_mode="fast")
    decorrelates the kernel's rounding from the host's canonical op
    structure — near-tangent roots shift by ~1e-4 tau, moving pconv at a
    deep node by ~2e-3 relative (values, orders, species and counters are
    unchanged)."""
    host, kern = runs
    _assert_matches(kern, host, 3, rtol=5e-3)
    # the kernel path must actually have run in-kernel (no replays here:
    # NF = min(8, num_cutoff=4) = 4 >= max finals seen)
    assert int(jnp.sum(kern.count_main)) > 0


def test_tree_kernel_overflow_replays_exactly(runs):
    """tree_kernel_finals=1 forces events with 2+ finals through the host
    replay; the replay is the host engine itself with the same per-event
    keys, so those events' results are EXACTLY the host run's."""
    from jax.experimental.pallas import tpu as pltpu

    host, _ = runs
    x, k_init, erg = _events(3)
    with pltpu.force_tpu_interpret_mode():
        kern1 = tree.forward_tree(KEY, x, k_init, erg, SC,
                                  _cfg(tree_engine="kernel",
                                       tree_kernel_finals=1), TCFG,
                                  lnt_end=0.0)
    _assert_matches(kern1, host, 3)
    # replayed events (count_main == 2 > NF == 1) match the host BITWISE
    cm = np.asarray(host.count_main)
    for e in np.nonzero(cm > 1)[0]:
        fa, fb = _finals(kern1, int(e)), _finals(host, int(e))
        for o in fa:
            np.testing.assert_array_equal(fa[o]["fpos"], fb[o]["fpos"])
            assert fa[o]["w"] == fb[o]["w"]


def test_tree_kernel_chunked_matches_single(runs):
    """Bounded relaunches (state round-trips through the aux/queue blocks)
    reproduce the single-launch tree: identical topology, records to the
    launch-boundary tolerance (f0/g0 recomputed from the committed state,
    as in integrate_mega_chunked)."""
    from jax.experimental.pallas import tpu as pltpu

    _, kern = runs
    x, k_init, erg = _events(3)
    with pltpu.force_tpu_interpret_mode():
        kern_ch = tree.forward_tree(KEY, x, k_init, erg, SC,
                                    _cfg(tree_engine="kernel",
                                         tree_kernel_chunk=150), TCFG,
                                    lnt_end=0.0)
    _assert_matches(kern_ch, kern, 3)


def test_tree_refill_matches_relaunch(monkeypatch):
    """The in-kernel REFILL engine (lanes pull events from an in-kernel
    queue; one-hot MXU gather/scatter) reproduces the relaunch kernel.
    Three layers (fine-scan gate disabled so both engines are per-lane
    independent):

    1. at the production lane width (128), refill is BITWISE == relaunch
       (each lane serves one event: the it=0 fill + post-loop flush path);
    2. TREEK_LANES=2 forces each lane to serve MULTIPLE events (the
       mid-run flush/refill path): counters/topology EXACTLY equal,
       records in the width-rounding class — XLA:CPU compiles width-2
       rows with different FMA contraction than width-128, a ~1-ulp/step
       difference the adaptive controller + crossing refinement amplify
       (measured max 1.6e-3 on pconv; impossible on hardware, where lanes
       are always 128);
    3. the refill BOUNDARY PERIOD is a pure schedule knob: rk=3 vs rk=4
       at the same width is bitwise-identical (an event's trajectory is
       iteration-offset-invariant)."""
    from jax.experimental.pallas import tpu as pltpu

    x, k_init, erg = _events(4)
    cfg_rf = lambda rk: _cfg(tree_engine="kernel", interp_coarse=0,
                             tree_refill=128, tree_refill_k=rk)
    with pltpu.force_tpu_interpret_mode():
        base = tree.forward_tree(KEY, x, k_init, erg, SC,
                                 _cfg(tree_engine="kernel", interp_coarse=0),
                                 TCFG, lnt_end=0.0)
        monkeypatch.setenv("TREEK_LANES", "128")
        rf_wide = tree.forward_tree(KEY, x, k_init, erg, SC, cfg_rf(4), TCFG,
                                    lnt_end=0.0)
        monkeypatch.setenv("TREEK_LANES", "2")
        rf = tree.forward_tree(KEY, x, k_init, erg, SC, cfg_rf(4), TCFG,
                               lnt_end=0.0)
        rf3 = tree.forward_tree(KEY, x, k_init, erg, SC, cfg_rf(3), TCFG,
                                lnt_end=0.0)
    _assert_matches(rf_wide, base, 4, rtol=0.0, pos_rtol=0.0)  # bitwise
    _assert_matches(rf, base, 4, rtol=1e-2, pos_rtol=2e-2)
    _assert_matches(rf3, rf, 4, rtol=0.0, pos_rtol=0.0)        # bitwise
    # multi-refill actually happened: 4 events on 2 lanes
    assert int(jnp.sum(rf.count_main)) == int(jnp.sum(base.count_main)) > 0
