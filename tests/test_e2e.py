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
