"""3D tree visualization (plot/plotTree.py equivalent, on the current format).

Weight-colored branches, crossing markers, NS sphere — the same figure the
reference's plotTree.py draws, but using analysis/treeio.load_tree which
parses the current saveNode output correctly.
"""

from __future__ import annotations

import numpy as np

from adiabatic_raytracer_tpu.analysis.treeio import load_tree


def plot_tree(path: str, r_ns: float = 10.0, cutoff: float = 1e-7,
              show: bool = True, save: str = None):
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm

    nodes = load_tree(path)
    fig = plt.figure(figsize=(9, 7))
    ax = plt.axes(projection="3d")

    weights = [max(n["weight"], cutoff) for n in nodes]
    lw = np.log10(weights)
    lo, hi = lw.min(), max(lw.max(), lw.min() + 1e-9)

    for n, w in zip(nodes, lw):
        color = cm.viridis((w - lo) / (hi - lo))
        style = "-" if n["species"] == "photon" else "--"
        ax.plot3D(n["x"], n["y"], n["z"], style, color=color, alpha=0.8)
        if n["crossings_x"]:
            ax.scatter(n["crossings_x"], n["crossings_y"], n["crossings_z"],
                       marker="x", color="r", s=18)

    # NS sphere
    u, v = np.mgrid[0:2 * np.pi:24j, 0:np.pi:12j]
    ax.plot_surface(r_ns * np.cos(u) * np.sin(v), r_ns * np.sin(u) * np.sin(v),
                    r_ns * np.cos(v), color="gray", alpha=0.3)
    ax.set_xlabel("x [km]")
    ax.set_ylabel("y [km]")
    ax.set_zlabel("z [km]")
    if save:
        plt.savefig(save, dpi=150, bbox_inches="tight")
    if show:
        plt.show()
    return nodes
