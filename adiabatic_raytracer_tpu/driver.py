"""Top-level driver: the TPU-native `main_runner_tree` (MainRunner.jl:355-765).

Per batch of events the pipeline is: conversion-surface sampling -> launch
kinematics and importance weights -> axion backtrace -> forward photon tree ->
row assembly.  Everything up to row assembly runs as jitted, vmapped JAX; row
assembly and file writing are host-side numpy (cold path).

Sampling-attempt accounting reproduces the reference's f_inx bookkeeping
(MainRunner.jl:401,469-477,711-713,749): f_inx = (sampler failures before each
kept success) + (number of final photons), and the sln_prob column of the
output is divided by it at the end.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.constants import C_KM, G_NEW
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler, tree
from adiabatic_raytracer_tpu.ops.conversion import dwp_ds, g_det, jacobian_fv
from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart, k_sphere
from adiabatic_raytracer_tpu.ops.geometry import cart_to_sph
from adiabatic_raytracer_tpu.utils.npyio import save_npy, tree_filename
from adiabatic_raytracer_tpu.utils.textio import EventFiles, TreeFile

N_COLS = {0: 13, 1: 29}


@dataclass
class RunStats:
    seed: int = 0
    events: int = 0
    finals: int = 0
    sample_attempts: int = 0
    f_inx: int = 0
    tot_nodes: int = 0
    info_hist: dict = field(default_factory=dict)
    dw_warnings: int = 0
    wall_time: float = 0.0


def _event_kinematics(xpos, v_loc, erg_inf, maxR, sc: Scene, tcfg: TreeConfig,
                      compute_dtype: str = "state"):
    """Launch momentum and importance weights (MainRunner.jl:498-558).

    compute_dtype="f32": evaluate in f32 with f64 in/outputs (TPU path)."""
    out_dtype = xpos.dtype
    if compute_dtype == "f32":
        from adiabatic_raytracer_tpu.ops.propagate import _cast_tree

        sc = _cast_tree(sc, jnp.float32)
        xpos = xpos.astype(jnp.float32)
        v_loc = v_loc.astype(jnp.float32)
        erg_inf = erg_inf.astype(jnp.float32)
        maxR = jnp.float32(maxR)
    E = xpos.shape[0]
    rmag = jnp.linalg.norm(xpos, axis=1)
    k_init = k_norm_cart(xpos, v_loc, 0.0, erg_inf, sc, sc.mass_ns,
                         is_photon=True, ax_fix=True, flat=sc.flat)
    ksphere = jax.vmap(lambda x, k: k_sphere(x, k, sc.mass_ns, flat=sc.flat))(
        xpos, k_init)
    erg_ax = erg_inf / jnp.sqrt(1.0 - 2.0 * G_NEW * sc.mass_ns / rmag / C_KM**2)
    bundle = jax.vmap(
        lambda x, k, w: dwp_ds(x, k, 0.0, w, sc, sc.mass_ns, flat=sc.flat,
                               bndry_lyr=sc.bndry_lyr)
    )(xpos, ksphere, erg_ax)
    cos_w = bundle[3]
    x_sph = cart_to_sph(xpos)
    jac_gr = jax.vmap(
        lambda x: g_det(x, 0.0, sc, sc.mass_ns, flat=sc.flat, bndry_lyr=sc.bndry_lyr)
    )(x_sph)
    jac_v = jax.vmap(lambda x, v: jacobian_fv(x, v, mass_ns=1.0))(xpos, v_loc)

    dense_extra = 2.0 / jnp.sqrt(jnp.pi) * (1.0 / (220.0 / C_KM)) * jnp.sqrt(
        2.0 * sc.mass_ns * G_NEW / C_KM**2 / rmag)
    redshift = jnp.sqrt(1.0 - 2.0 * G_NEW * sc.mass_ns / rmag / C_KM**2)
    phase_s = dense_extra * (2.0 * jnp.pi * maxR**2) * (sc.rho_dm * 1e9) / sc.mass_a * jac_gr
    sln_prob = (jnp.abs(cos_w) * redshift * phase_s * (1e5**2) * C_KM * 1e5
                * tcfg.n_max_sample)
    return (k_init.astype(out_dtype), sln_prob.astype(out_dtype),
            cos_w.astype(out_dtype), jac_v.astype(out_dtype))


def run(sc: Scene, cfg: NumericsConfig, tcfg: TreeConfig, n_trajs: int, *,
        seed: int = -1, save_mode: int = 0, file_tag: str = "",
        dir_tag: str = "results", event_batch: int = 16,
        fix_time: float = 0.0, ntimes: int = 3,
        verbose: bool = True) -> Optional[tuple]:
    """Run the full pipeline; returns (saveAll rows ndarray, output path, stats).

    Returns None when the conversion surface lies inside the star
    (MainRunner.jl:389-396)."""
    t_run0 = time.time()
    stats = RunStats()
    if seed < 0:
        stats.seed = int(np.random.randint(0, 100000001))
    elif seed == 0:
        stats.seed = int(np.random.SeedSequence().entropy % (2**31))
    else:
        stats.seed = seed
    if verbose:
        print(f"Using seed {stats.seed}")
    key = jax.random.PRNGKey(stats.seed)

    maxR = float(conversion_surface_radius(sc.mass_a, sc.theta_m, sc.omega_pul,
                                           sc.b0, sc.r_ns, t_in=fix_time))
    if maxR < float(sc.r_ns):
        print("Too small Max R.... quitting....")
        return None

    lnt_end = float(np.log(1.0 / float(sc.omega_pul)))
    n_grid = sampler.default_n_grid(maxR)
    n_max = tcfg.n_max_sample

    sample_jit = jax.jit(
        lambda k, b: sampler.sample_batch(k, b, maxR, sc, sc.mass_ns,
                                          n_grid=n_grid, n_max=n_max,
                                          compute_dtype=cfg.compute_dtype),
        static_argnums=1,
    )
    kin_jit = jax.jit(lambda x, v, e: _event_kinematics(x, v, e, maxR, sc, tcfg,
                                                        cfg.compute_dtype))
    bt_jit = jax.jit(lambda x, k, e: tree.backtrace(x, k, e, sc, cfg, tcfg,
                                                    lnt_end=lnt_end))
    fwd_jit = jax.jit(lambda kk, x, k, e: tree.forward_tree(kk, x, k, e, sc, cfg,
                                                            tcfg, lnt_end=lnt_end))

    ev_files = EventFiles(dir_tag, file_tag) if save_mode > 1 else None

    rows: list = []
    event_no = 1
    remaining = n_trajs - 1  # the reference loop runs while photon_trajs < Ntajs
    key_i = 0

    while remaining > 0:
        batch = min(event_batch, remaining)
        # --- sampling with attempt accounting ---
        xs, vs, es, vifs, flags = [], [], [], [], []
        got = 0
        while got < batch:
            key, sub = jax.random.split(key)
            sb = max(2 * (batch - got), 8)
            res = sample_jit(sub, sb)
            succ = np.asarray(res.success)
            flags.append(succ)
            idx = np.nonzero(succ)[0]
            for i in idx:
                if got < batch:
                    xs.append(np.asarray(res.xpos[i]))
                    vs.append(np.asarray(res.v_loc[i]))
                    es.append(float(res.erg_inf[i]))
                    vifs.append(np.asarray(res.v_ifty[i]))
                    got += 1
        flag_stream = np.concatenate(flags)
        kept_pos = np.nonzero(flag_stream)[0][:batch]
        attempts = int(kept_pos[-1]) + 1
        stats.sample_attempts += attempts
        stats.f_inx += attempts - batch  # failures (MainRunner.jl:469,477)

        # integration state stays f64 even when the sampler computed in f32
        xpos = jnp.asarray(np.stack(xs).astype(np.float64))
        v_loc = jnp.asarray(np.stack(vs).astype(np.float64))
        erg_inf = jnp.asarray(np.array(es, np.float64))
        v_ifty = np.stack(vifs).astype(np.float64)

        t_batch0 = time.time()
        k_init, sln_prob, cos_w, jac_v = kin_jit(xpos, v_loc, erg_inf)
        bt = bt_jit(xpos, k_init, erg_inf)
        key, sub = jax.random.split(key)
        tr = fwd_jit(sub, xpos, k_init, erg_inf)
        t_batch = time.time() - t_batch0

        # --- host-side row assembly (MainRunner.jl:670-729) ---
        pools = jax.tree_util.tree_map(np.asarray, tr.pools)
        bt_np = jax.tree_util.tree_map(np.asarray, bt)
        k_init_np = np.asarray(k_init)
        sln_np = np.asarray(sln_prob)
        cosw_np = np.asarray(cos_w)
        xpos_np = np.asarray(xpos)
        count_np = np.asarray(tr.count)
        info_np = np.asarray(tr.info)
        vel_eng = np.sum(v_ifty**2, axis=1) / 2.0

        for e in range(batch):
            tree_f = TreeFile(dir_tag, file_tag, event_no) if save_mode > 2 else None
            if ev_files is not None:
                ev_files.write_event_head(
                    event_no, v_ifty[e], float(sln_np[e]),
                    xpos_np[e], -k_init_np[e], xpos_np[e], k_init_np[e])
            if tree_f is not None:
                nraw = int(bt_np.raw_n_cross[e])
                tree_f.save_node(
                    "axion", float(bt_np.weight[e]), float(bt_np.prob0[e]), 1.0,
                    xc=bt_np.xc[e, :nraw, 0] if nraw else None,
                    yc=bt_np.xc[e, :nraw, 1] if nraw else None,
                    zc=bt_np.xc[e, :nraw, 2] if nraw else None,
                    tc=bt_np.raw_tc[e, :nraw] if nraw else None,
                    traj=bt_np.traj[e], times=bt_np.times[e],
                )

            sbw = float(bt_np.samp_back_weight[e])
            stats.tot_nodes += int(count_np[e])
            stats.info_hist[int(info_np[e])] = stats.info_hist.get(int(info_np[e]), 0) + 1

            order = pools.order[e]
            proc = np.nonzero(pools.status[e] == 2)[0]
            proc = proc[np.argsort(order[proc], kind="stable")]
            for p in proc:
                if tree_f is not None:
                    hasx = bool(pools.has_cross[e, p])
                    tree_f.save_node(
                        "photon" if pools.is_photon[e, p] else "axion",
                        float(pools.weight[e, p]), float(pools.prob[e, p]),
                        float(pools.parent_weight[e, p]),
                        xc=[pools.xc[e, p, 0]] if hasx else None,
                        yc=[pools.xc[e, p, 1]] if hasx else None,
                        zc=[pools.xc[e, p, 2]] if hasx else None,
                        tc=[pools.tcx[e, p]] if hasx else None,
                        traj=pools.traj[e, p], times=pools.times[e, p],
                    )
                if not pools.is_final[e, p]:
                    continue
                fmom = pools.fmom[e, p]
                fpos = pools.fpos[e, p]
                absf = float(np.linalg.norm(fmom))
                absfx = float(np.linalg.norm(fpos))
                phi_f = float(np.arctan2(fmom[1], fmom[0]))
                phi_fx = float(np.arctan2(fpos[1], fpos[0]))
                theta_f = float(np.arccos(fmom[2] / absf))
                theta_fx = float(np.arccos(fpos[2] / absfx))
                species_id = 1 if pools.is_photon[e, p] else 0
                weight = float(pools.weight[e, p]) * sbw  # MainRunner.jl:686
                optical_depth = 0.0
                weight_c = 1.0
                weight_tmp = weight * (weight_c**2 * np.exp(-optical_depth))
                dw_out = float(pools.ferg[e, p]) / float(sc.mass_a) + vel_eng[e]
                dwv = float(pools.dw[e, p])
                if dwv > -0.5 or dwv < -2.0:
                    stats.dw_warnings += 1
                if species_id == 1:
                    stats.f_inx += 1  # MainRunner.jl:711-713
                stats.finals += 1
                if ev_files is not None:
                    ev_files.write_final(event_no, weight, species_id, theta_f,
                                         phi_f, absf, theta_fx, phi_fx, absfx,
                                         float(pools.t[e, p]))
                base = [event_no, species_id, theta_f, phi_f, theta_fx, phi_fx,
                        absfx, float(sln_np[e]), weight_tmp,
                        float(xpos_np[e, 0]), float(xpos_np[e, 1]),
                        float(xpos_np[e, 2]), dw_out]
                if save_mode > 0:
                    base += [weight, optical_depth, weight_c,
                             float(k_init_np[e, 0]), float(k_init_np[e, 1]),
                             float(k_init_np[e, 2]), float(cosw_np[e]),
                             int(count_np[e]), int(info_np[e]),
                             float(pools.prob[e, p]),
                             float(pools.prob_conv[e, p]),
                             float(pools.prob_conv0[e, p]),
                             sbw, absfx, int(bt_np.c_bck[e]),
                             float(bt_np.prob0[e])]
                rows.append(base)

            if ev_files is not None:
                ev_files.write_event_tail(t_batch / batch, int(count_np[e]))
            if tree_f is not None:
                tree_f.close()
            event_no += 1
            stats.events += 1
        remaining -= batch
        key_i += 1

    save_all = np.asarray(rows, np.float64)
    if save_all.size:
        save_all[:, 7] /= float(stats.f_inx) if stats.f_inx else 1.0
    out_path = tree_filename(dir_tag, sc.mass_a, sc.ax_g, sc.theta_m, sc.omega_pul,
                             sc.b0, n_trajs, ntimes, tcfg.num_cutoff,
                             tcfg.mc_nodes, tcfg.max_nodes, file_tag)
    save_npy(out_path, save_all)
    stats.wall_time = time.time() - t_run0
    if verbose:
        print(f"events={stats.events} finals={stats.finals} f_inx={stats.f_inx} "
              f"nodes={stats.tot_nodes} info={stats.info_hist} "
              f"wall={stats.wall_time:.1f}s -> {out_path}")
    return save_all, out_path, stats
