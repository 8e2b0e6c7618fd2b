"""End-to-end smoke/regression tests — the npz_example.py harness equivalent
(jonas_test_analyses/npz_example.py): run the full CLI at both saveModes with
a fixed seed and validate the output contracts."""

import os

import numpy as np
import pytest

from adiabatic_raytracer_tpu.analysis import flux, treeio
from adiabatic_raytracer_tpu.cli import main


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("results"))
    args = ["--Nts", "3", "--seed", "1769", "--ThetaM", "0.2", "--event_batch",
            "2", "--platform", "cpu", "--dir_tag", d]
    assert main(args + ["--saveMode", "3", "--ftag", "sm3"]) == 0
    assert main(args + ["--saveMode", "0", "--ftag", "sm0"]) == 0
    return d


def _npy(d, tag):
    import glob

    return glob.glob(os.path.join(d, "npy", f"*_{tag}.npy"))[0]


def test_save_mode0_schema(outputs):
    rows = np.load(_npy(outputs, "sm0"))
    assert rows.ndim == 2 and rows.shape[1] == 13
    assert set(rows[:, 1]).issubset({0.0, 1.0})
    assert np.all(rows[:, 8] > 0)          # weights
    assert np.all(rows[:, 7] > 0)          # sln_prob (normalized by f_inx)
    assert np.all((rows[:, 2] >= 0) & (rows[:, 2] <= np.pi))  # theta_f


def test_save_mode3_schema_and_files(outputs):
    rows = np.load(_npy(outputs, "sm3"))
    assert rows.shape[1] == 29
    info = rows[:, 21].astype(int)
    assert set(np.abs(info)).issubset({1, 2, 3, 4})
    # text outputs parse with the analysis loaders
    ev = treeio.load_event_info(os.path.join(outputs, "event", "event_sm3"))
    fi = treeio.load_final_info(os.path.join(outputs, "event", "final_sm3"))
    assert ev[0].shape[0] == 2  # events
    assert fi[0].shape[0] == rows.shape[0]
    # tree files exist per event and parse
    nodes = treeio.load_tree(os.path.join(outputs, "tree", "tree_sm31"))
    assert nodes[0]["species"] == "axion"  # backtraced parent first
    assert len(nodes) >= 2
    # trajectories are 3 points (ntimes=3, Gen_Samples.jl:164)
    assert len(nodes[1]["x"]) == 3


def test_flux_analysis(outputs):
    r = flux.analyze(_npy(outputs, "sm3"))
    assert r.n_events == 2
    assert r.total_photon_rate > 0
    assert sum(r.stop_reasons.values()) + 0 >= 0


def test_determinism(outputs, tmp_path):
    """Same seed => identical rows (single host)."""
    d2 = str(tmp_path / "rep")
    args = ["--Nts", "3", "--seed", "1769", "--ThetaM", "0.2", "--event_batch",
            "2", "--platform", "cpu", "--dir_tag", d2, "--saveMode", "0",
            "--ftag", "sm0"]
    assert main(args) == 0
    r1 = np.load(_npy(outputs, "sm0"))
    r2 = np.load(_npy(d2, "sm0"))
    np.testing.assert_array_equal(r1, r2)


def test_weight_convergence_on_driver_run(outputs):
    """The tree algorithm's self-validation (SURVEY §4.3, analysis.py:147;
    plotTree.py:162-178): for a full-tree event stopped by prob_cutoff
    (info == 2), the total outgoing weight parsed back from the saveMode-3
    tree file must equal 1 - O(prob_cutoff); MC-truncated events stay <= 1."""
    rows = np.load(_npy(outputs, "sm3"))
    info_by_event = {}
    for r in rows:
        info_by_event[int(r[0])] = int(r[21])
    checked_full = 0
    for en, info in info_by_event.items():
        nodes = treeio.load_tree(os.path.join(outputs, "tree", f"tree_sm3{en}"))
        # skip the backtraced parent axion (nodes[0]); sum the forward tree
        s = treeio.tree_weight_sum(nodes)
        assert 0.0 < s <= 1.0 + 1e-9, (en, s)
        if info == 2:  # prob_cutoff stop in full-tree mode: Sigma w -> 1
            assert s >= 1.0 - 1e-10 - 1e-9, (en, s)
            checked_full += 1
    assert checked_full >= 1  # the fixed seed produces >= 1 full-tree event

    summary = treeio.convergence_summary(
        os.path.join(outputs, "event", "event_sm3"),
        os.path.join(outputs, "event", "final_sm3"))
    assert summary["weight_sum_per_event"] > 0


def test_golden_pinned_rows(tmp_path):
    """Regression anchor with PINNED values (the verify-skill golden): the
    fixed-seed CPU run must reproduce the committed weights — catches silent
    numeric drift that schema/determinism checks cannot.  Re-pin deliberately
    (with a changelog note) if a semantics change is intended."""
    d = str(tmp_path)
    args = ["--Nts", "4", "--seed", "1769", "--ThetaM", "0.2", "--saveMode",
            "1", "--event_batch", "3", "--platform", "cpu", "--dir_tag", d,
            "--ftag", "gold"]
    assert main(args) == 0
    rows = np.load(_npy(d, "gold"))
    # Re-pinned in round 3: the sampler's draw stream moved to per-batch
    # keys (fold_in(batch_key, chunk)) for the async sample-ahead pipeline,
    # which changes the sampled events at a given seed.
    assert rows.shape == (6, 29)
    np.testing.assert_allclose(
        rows[:, 8],
        [1.37646785e-03, 1.04814701e-02, 8.54149604e-05, 6.64345269e-05,
         3.15848565e-07, 7.85425213e-04],
        rtol=1e-6)


def test_pipeline_depth_two_bit_identical(outputs, tmp_path):
    """pipeline_depth=2 (the TPU auto: one extra batch in flight so the
    finals-pack tunnel transfer hides under compute) is schedule-only —
    rows must be bit-identical to the depth-1 run of the same seed."""
    d2 = str(tmp_path / "depth2")
    args = ["--Nts", "3", "--seed", "1769", "--ThetaM", "0.2", "--event_batch",
            "2", "--platform", "cpu", "--dir_tag", d2, "--saveMode", "0",
            "--ftag", "sm0", "--pipeline_depth", "2"]
    assert main(args) == 0
    r1 = np.load(_npy(outputs, "sm0"))
    r2 = np.load(_npy(d2, "sm0"))
    np.testing.assert_array_equal(r1, r2)


def test_flux_branch_histograms(outputs):
    """The sub-branch-count figures (plot/flux.py:54-82): pps-weighted
    per-species histograms of column 20 `c` plus the per-tree counts."""
    r = flux.analyze(_npy(outputs, "sm3"))
    rows = np.load(_npy(outputs, "sm3"))
    c = np.abs(rows[:, 20].astype(int))
    assert r.branch_bins is not None
    np.testing.assert_array_equal(r.branch_bins, np.arange(0, max(c.max(), 2)))
    assert r.branch_photon_hist.shape == (len(r.branch_bins) - 1,)
    # per-species weighted totals reconcile with the raw rows
    pps = rows[:, 8] * rows[:, 7]
    pid = rows[:, 1].astype(int)
    in_range = c < r.branch_bins[-1]
    np.testing.assert_allclose(r.branch_photon_hist.sum(),
                               pps[(pid == 1) & in_range].sum(), rtol=1e-12)
    np.testing.assert_allclose(r.branch_axion_hist.sum(),
                               pps[(pid == 0) & in_range].sum(), rtol=1e-12)
    # one per-tree entry per event (the reference double-counts via its
    # first+last-row trick; ours is exact)
    ev = rows[:, 0].astype(int)
    n_ev_in_range = sum(1 for e in np.unique(ev)
                        if c[ev == e][0] < r.branch_bins[-1])
    assert r.tree_branch_hist.sum() == n_ev_in_range
    # saveMode-0 output has no `c` column: fields stay None
    r0 = flux.analyze(_npy(outputs, "sm0"))
    assert r0.branch_bins is None and r0.tree_branch_hist is None


def test_tree_visualizers(outputs, tmp_path):
    """All three tree views (plotTree.py / plotTree_2.py / plotSingle.py
    equivalents) render the saveMode-3 tree file headlessly and return the
    parsed nodes."""
    from adiabatic_raytracer_tpu.analysis import tree_plot

    p = os.path.join(outputs, "tree", "tree_sm31")
    for fn, name in [(tree_plot.plot_tree, "v1"),
                     (tree_plot.plot_tree_publication, "v2"),
                     (tree_plot.plot_tree_single, "v3")]:
        out = str(tmp_path / f"{name}.png")
        nodes = fn(p, show=False, save=out)
        assert len(nodes) >= 2
        assert os.path.getsize(out) > 0


def test_savemode3_downgrades_kernel_engine(tmp_path):
    """Recorded decision (NumericsConfig.tree_engine docstring): saveMode >= 2
    forces the host queue engine — tree dumps need every node's records,
    which the in-kernel engine never materializes, and a hybrid would re-run
    the host engine on exactly the dumped events.  A tree_engine='kernel'
    request at saveMode 3 must therefore run green, write parseable tree
    files, and produce the queue engine's exact rows."""
    import glob

    from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
    from adiabatic_raytracer_tpu.driver import run

    sc = Scene(theta_m=0.2)
    tcfg = TreeConfig(num_cutoff=3, mc_nodes=2, max_nodes=8)
    rows = {}
    for eng in ("kernel", "queue"):
        cfg = NumericsConfig(interp_points=8, max_crossings=8,
                             tree_engine=eng)
        d = str(tmp_path / eng)
        for sub in ("npy", "event", "tree"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        out = run(sc, cfg, tcfg, 3, seed=4242, save_mode=3, verbose=False,
                  dir_tag=d, file_tag=eng, event_batch=2)
        assert out is not None
        rows[eng] = out[0]
        nodes = treeio.load_tree(glob.glob(os.path.join(d, "tree", "*1"))[0])
        assert len(nodes) >= 2
    np.testing.assert_array_equal(rows["kernel"], rows["queue"])
