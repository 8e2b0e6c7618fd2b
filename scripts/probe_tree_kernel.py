"""CPU-interpret probe: in-kernel tree engine vs the host work-queue engine.

Usage: python scripts/probe_tree_kernel.py [n_events]
"""
import sys

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler, tree
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.4, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)


def events(n, key=0):
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    x, k_init, erg = events(n, key=2)
    tcfg = TreeConfig(num_cutoff=4, mc_nodes=1, max_nodes=10)
    base = NumericsConfig(engine="mega", compute_dtype="f32", interp_points=8,
                          max_crossings=8, max_steps=2000,
                          in_kernel_prob=1, tree_k=1)
    key = jax.random.PRNGKey(11)
    with pltpu.force_tpu_interpret_mode():
        tr_h = tree.forward_tree(key, x, k_init, erg, SC, base, tcfg,
                                 lnt_end=0.0)
        cfg_k = dataclasses.replace(base, tree_engine="kernel")
        tr_k = tree.forward_tree(key, x, k_init, erg, SC, cfg_k, tcfg,
                                 lnt_end=0.0)

    print("count      host", np.asarray(tr_h.count), " kernel",
          np.asarray(tr_k.count))
    print("count_main host", np.asarray(tr_h.count_main), " kernel",
          np.asarray(tr_k.count_main))
    print("info       host", np.asarray(tr_h.info), " kernel",
          np.asarray(tr_k.info))
    print("n_alloc    host", np.asarray(tr_h.n_alloc), " kernel",
          np.asarray(tr_k.n_alloc))
    print("tot_prob   host", np.asarray(tr_h.tot_prob))
    print("tot_prob   kern", np.asarray(tr_k.tot_prob))
    print("dw_anom    host", np.asarray(tr_h.dw_anomalies), " kernel",
          np.asarray(tr_k.dw_anomalies))

    # per-(event, order) final-node records
    for e in range(n):
        for name, pools in (("host", tr_h.pools), ("kern", tr_k.pools)):
            st = np.asarray(pools.status[e])
            fin = np.asarray(pools.is_final[e]) & (st == 2)
            orders = np.asarray(pools.order[e])[fin]
            w = np.asarray(pools.weight[e])[fin]
            ph = np.asarray(pools.is_photon[e])[fin]
            fe = np.asarray(pools.ferg[e])[fin]
            o = np.argsort(orders)
            print(f"ev{e} {name}: ord={orders[o]} ph={ph[o].astype(int)} "
                  f"w={np.round(w[o], 6)} ferg={np.round(fe[o], 10)}")
        fp_h = np.asarray(tr_h.pools.fpos[e])[
            np.asarray(tr_h.pools.is_final[e])]
        fp_k = np.asarray(tr_k.pools.fpos[e])[
            np.asarray(tr_k.pools.is_final[e])]
        print(f"ev{e} fpos host {np.round(fp_h, 3)}")
        print(f"ev{e} fpos kern {np.round(fp_k, 3)}")


if __name__ == "__main__":
    main()
