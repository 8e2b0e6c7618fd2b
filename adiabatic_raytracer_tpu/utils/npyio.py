"""npy output files: parameter-encoded filenames and shard combining.

Replicates the reference's output contract:
  * filename encoding          MainRunner.jl:750-761
  * shard combine + cleanup    Gen_Samples.jl:195-239 (the Julia semantics:
    divide column 8 (1-based) = sln_prob by the number of runs.  The Python
    twin Combine_Files.py divides a different row — documented divergence;
    we follow the Julia version.)
"""

from __future__ import annotations

import os

import numpy as np

from adiabatic_raytracer_tpu.utils.format import julia_str


def tree_filename(dir_tag: str, mass_a, ax_g, theta_m, omega_pul, b0, n_trajs: int,
                  ntimes: int, num_cutoff: int, mc_nodes: int, max_nodes: int,
                  file_tag: str, *, subdir: str = "npy") -> str:
    parts = [
        "tree_",
        "MassAx_", julia_str(float(mass_a)), "_AxionG_", julia_str(float(ax_g)),
        "_ThetaM_", julia_str(float(theta_m)), "_rotPulsar_", julia_str(float(omega_pul)),
        "_B0_", julia_str(float(b0)),
        "_Ax_trajs_", str(int(n_trajs)),
        "_N_Times_", str(int(ntimes)),
        "_num_cutoff_", str(int(num_cutoff)),
        "_MC_nodes_", str(int(mc_nodes)),
        "_max_nodes_", str(int(max_nodes)),
        "_", file_tag, ".npy",
    ]
    name = "".join(parts)
    return os.path.join(dir_tag, subdir, name) if subdir else os.path.join(dir_tag, name)


def save_npy(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        np.lib.format.write_array(f, np.asarray(arr, np.float64), allow_pickle=False)


def combine_files(dir_tag: str, mass_a, ax_g, theta_m, omega_pul, b0, n_trajs: int,
                  ntimes: int, num_cutoff: int, mc_nodes: int, max_nodes: int,
                  file_tag: str, n_runs: int) -> str:
    """Concatenate `n_runs` shard files tagged `<file_tag>0..N-1`, divide the
    sln_prob column by n_runs, write the merged file (no npy/ subdir, matching
    Gen_Samples.jl:223-233) and delete the shards."""
    shards = [
        tree_filename(dir_tag, mass_a, ax_g, theta_m, omega_pul, b0, n_trajs,
                      ntimes, num_cutoff, mc_nodes, max_nodes, f"{file_tag}{i}")
        for i in range(n_runs)
    ]
    hold = np.concatenate([np.load(p) for p in shards], axis=0)
    hold[:, 7] /= n_runs  # Julia column 8 (1-based) = sln_prob
    out = tree_filename(dir_tag, mass_a, ax_g, theta_m, omega_pul, b0,
                        n_trajs * n_runs, ntimes, num_cutoff, mc_nodes, max_nodes,
                        file_tag, subdir="")
    save_npy(out, hold)
    for p in shards:
        os.remove(p)
    return out
