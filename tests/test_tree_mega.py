"""Mega-engine tree paths with in-kernel conversion probability.

Runs the forward tree / backtrace through the Pallas megakernel (interpreter
mode on CPU) with cfg.in_kernel_prob on vs off: the only difference is where
the conversion probability is evaluated (kernel _prob_nd f32 vs host
_prob_batch), so tree topology must be identical and probabilities/weights
must agree to f32-chain accuracy.
"""

import numpy as np

import jax
import jax.numpy as jnp

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler, tree
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.4, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)


def _events(n, key=0):
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


def _cfg(in_kernel_prob, mc_chain=0, mc_chain_slots=8):
    return NumericsConfig(engine="mega", compute_dtype="f32", interp_points=8,
                          max_crossings=8, max_steps=2000,
                          in_kernel_prob=in_kernel_prob, mc_chain=mc_chain,
                          mc_chain_slots=mc_chain_slots, mc_chain_gate=0)


def test_backtrace_mega_in_kernel_prob():
    from jax.experimental.pallas import tpu as pltpu

    x, k_init, erg = _events(3)
    with pltpu.force_tpu_interpret_mode():
        bt_on = tree.backtrace(x, k_init, erg, SC, _cfg(1), TreeConfig(),
                               lnt_end=0.0)
        bt_off = tree.backtrace(x, k_init, erg, SC, _cfg(0), TreeConfig(),
                                lnt_end=0.0)
    np.testing.assert_array_equal(np.asarray(bt_on.n_cross),
                                  np.asarray(bt_off.n_cross))
    v = np.asarray(bt_on.valid)
    pc_on = np.asarray(bt_on.pc)[v]
    pc_off = np.asarray(bt_off.pc)[v]
    np.testing.assert_allclose(pc_on, pc_off, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(bt_on.weight),
                               np.asarray(bt_off.weight), rtol=2e-4)


def test_forward_tree_mega_in_kernel_prob():
    from jax.experimental.pallas import tpu as pltpu

    x, k_init, erg = _events(3)
    tcfg = TreeConfig(num_cutoff=3, mc_nodes=2, max_nodes=6)
    key = jax.random.PRNGKey(5)
    with pltpu.force_tpu_interpret_mode():
        tr_on = tree.forward_tree(key, x, k_init, erg, SC, _cfg(1), tcfg,
                                  lnt_end=0.0)
        tr_off = tree.forward_tree(key, x, k_init, erg, SC, _cfg(0), tcfg,
                                   lnt_end=0.0)
    # identical topology (a draw flip would change these; the probabilities
    # agree to ~1e-6 so a flip at these seeds would indicate a real bug)
    for name in ("count", "count_main", "info", "n_alloc"):
        np.testing.assert_array_equal(np.asarray(getattr(tr_on, name)),
                                      np.asarray(getattr(tr_off, name)), name)
    np.testing.assert_array_equal(np.asarray(tr_on.pools.status),
                                  np.asarray(tr_off.pools.status))
    live = np.asarray(tr_on.pools.status) > 0
    for name in ("weight", "prob", "pcx"):
        a = np.asarray(getattr(tr_on.pools, name))[live]
        b = np.asarray(getattr(tr_off.pools, name))[live]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-12,
                                   err_msg=name)


def test_forward_tree_mc_chain_collapse_equivalence():
    """The in-kernel MC chain (mc_chain=1) must reproduce the single-step
    mega engine's tree: same node counts / stop codes / finals, matching
    weights and per-node records to f32-chain accuracy.  The two paths share
    the same fold_in uniform stream and the same in-kernel probabilities, so
    topology is identical unless a chain restart's renormalization (vs the
    host relaunch round trip) moves a marginal crossing."""
    from jax.experimental.pallas import tpu as pltpu

    x, k_init, erg = _events(4, key=2)
    # small mc_nodes so chains start early; deep max_nodes so chains matter
    tcfg = TreeConfig(num_cutoff=4, mc_nodes=1, max_nodes=10)
    key = jax.random.PRNGKey(11)
    with pltpu.force_tpu_interpret_mode():
        tr_ch = tree.forward_tree(key, x, k_init, erg, SC,
                                  _cfg(1, mc_chain=1), tcfg, lnt_end=0.0)
        tr_ss = tree.forward_tree(key, x, k_init, erg, SC,
                                  _cfg(1, mc_chain=0), tcfg, lnt_end=0.0)
    for name in ("count", "count_main", "info"):
        np.testing.assert_array_equal(np.asarray(getattr(tr_ch, name)),
                                      np.asarray(getattr(tr_ss, name)), name)
    # the chain collapses iterations: strictly fewer with chains present
    assert int(tr_ch.n_iters[0]) <= int(tr_ss.n_iters[0])
    np.testing.assert_allclose(np.asarray(tr_ch.tot_prob),
                               np.asarray(tr_ss.tot_prob), rtol=1e-3)
    # node records: compare per (event, order) since pool slot numbering
    # differs between the paths
    for e in range(x.shape[0]):
        st_ch = np.asarray(tr_ch.pools.status[e])
        st_ss = np.asarray(tr_ss.pools.status[e])
        ord_ch = np.asarray(tr_ch.pools.order[e])
        ord_ss = np.asarray(tr_ss.pools.order[e])
        proc_ch = {int(ord_ch[p]): p for p in np.nonzero(st_ch == 2)[0]}
        proc_ss = {int(ord_ss[p]): p for p in np.nonzero(st_ss == 2)[0]}
        assert set(proc_ch) == set(proc_ss), (e, proc_ch, proc_ss)
        for o, p_ch in proc_ch.items():
            p_ss = proc_ss[o]
            assert bool(tr_ch.pools.is_photon[e, p_ch]) == \
                bool(tr_ss.pools.is_photon[e, p_ss]), (e, o)
            assert bool(tr_ch.pools.is_final[e, p_ch]) == \
                bool(tr_ss.pools.is_final[e, p_ss]), (e, o)
            for name, tol in (("weight", 1e-3), ("prob", 1e-3),
                              ("t", 5e-3), ("ferg", 1e-3)):
                a = float(getattr(tr_ch.pools, name)[e, p_ch])
                b = float(getattr(tr_ss.pools, name)[e, p_ss])
                assert abs(a - b) <= tol * max(abs(b), 1e-12), (name, e, o, a, b)
            fp_ch = np.asarray(tr_ch.pools.fpos[e, p_ch])
            fp_ss = np.asarray(tr_ss.pools.fpos[e, p_ss])
            np.testing.assert_allclose(fp_ch, fp_ss, rtol=5e-3, atol=1e-3)
