"""Weighted branching-tree Monte-Carlo engine, batched over events.

TPU-native redesign of `get_tree` (MainRunner.jl:126-352).  The reference
explores one dynamically-branching tree at a time with a weight-sorted
worklist.  Here each event owns a *fixed-capacity node pool* (SoA arrays);
every iteration selects, per event, the highest-weight pending node (argmax ==
the reference's sort!-then-pop, MainRunner.jl:342), propagates all selected
nodes as one vmapped batch, and spawns children with masked scatter writes.
Events are masked out as their cutoffs fire; the loop is bounded by
max_nodes + 1 iterations (the reference's `count > max_nodes` stop).

Backtracing (the `splittings_cutoff` mode, MainRunner.jl:307-317 + 581-589)
is a single propagate collecting every crossing followed by a survival
reweighting — implemented separately in `backtrace`.

Stop codes (`info`, MainRunner.jl:324-348): 1 = worklist exhausted,
2 = prob_cutoff, 3 = num_cutoff, 4 = max_nodes; negated if the pure-MC mode
(count > MC_nodes) was entered.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.ops.conversion import get_prob_nonad
from adiabatic_raytracer_tpu.ops.propagate import propagate


def _negate_b(sc: Scene) -> Scene:
    """Backwards-in-time propagation: k -> -k and B -> -B (MainRunner.jl:580-586)."""
    return dataclasses.replace(sc, b0=-sc.b0)


def _prob_batch(pos, k, erg_eff, sc: Scene, compute_dtype: str = "state"):
    """P = 1 - exp(-P_nonAD) at a batch of points (MainRunner.jl:134-137).

    compute_dtype="f32": evaluate in f32 (TPU path; ~1e-7 relative accuracy,
    far inside the 1e-4 parity contract) with f64 in/outputs."""
    out_dtype = jnp.result_type(pos.dtype)
    if compute_dtype == "f32":
        from adiabatic_raytracer_tpu.ops.propagate import _cast_tree

        sc = _cast_tree(sc, jnp.float32)
        pos = pos.astype(jnp.float32)
        k = k.astype(jnp.float32)
        erg_eff = erg_eff.astype(jnp.float32)
    p_nonad = jax.vmap(lambda x, kk, e: get_prob_nonad(x, kk, e, sc))(pos, k, erg_eff)
    p_nonad = p_nonad.astype(out_dtype)
    return 1.0 - jnp.exp(-p_nonad), p_nonad


class BacktraceResult(NamedTuple):
    prob0: Any            # [E] conversion probability at the MC point (nb.prob)
    p_nonad0: Any         # [E] raw P_nonAD at the MC point (Prob_nonAD_0)
    weight: Any           # [E] survival product over backtraced crossings (nb.weight)
    samp_back_weight: Any  # [E] prob0 * weight (MainRunner.jl:630)
    n_cross: Any          # [E] number of (deduped) backtrace crossings
    xc: Any               # [E, MAXC, 3]
    kc: Any               # [E, MAXC, 3]
    tc: Any               # [E, MAXC] re-zeroed at the first conversion (MainRunner.jl:627-629)
    dwc: Any              # [E, MAXC]
    pc: Any               # [E, MAXC] conversion probabilities
    valid: Any            # [E, MAXC] mask
    c_bck: Any            # [E] node count of the backtrace tree (always 1)
    traj: Any             # [E, NS, 3] backtrace trajectory (saveMode 3)
    times: Any            # [E, NS]
    raw_n_cross: Any      # [E] crossings before dedup/fallback (tree dumps)
    raw_tc: Any           # [E, MAXC] raw crossing times (tree dumps)


def backtrace(xpos, k_init, erg_inf, sc: Scene, cfg: NumericsConfig,
              tcfg: TreeConfig, *, lnt_end) -> BacktraceResult:
    """Backtrace the sampled axion to every level crossing it encountered
    (get_tree with -B0, -k, num_cutoff=0, splittings_cutoff=100000;
    MainRunner.jl:581-589)."""
    E = xpos.shape[0]
    sc_b = _negate_b(sc)
    k_back = -k_init

    prob0, p_nonad0 = _prob_batch(xpos, k_back, erg_inf, sc_b, cfg.compute_dtype)

    if cfg.engine == "mega":
        from adiabatic_raytracer_tpu.ops.megakernel import propagate_mega

        res = propagate_mega(
            xpos, k_back, sc_b, cfg,
            erg=erg_inf,
            delta_w=-jnp.ones(E, xpos.dtype),
            lnt0=jnp.full(E, cfg.ln_t_start, xpos.dtype),
            lnt1=jnp.broadcast_to(jnp.asarray(lnt_end, xpos.dtype), (E,)),
            is_photon=jnp.zeros(E, bool),
            max_crossings=cfg.max_crossings,
            species="axion",
        )
    else:
        res = propagate(
            xpos, k_back, sc_b, cfg,
            erg=erg_inf,
            delta_w=-jnp.ones(E, xpos.dtype),
            lnt0=jnp.full(E, cfg.ln_t_start, xpos.dtype),
            lnt1=jnp.broadcast_to(jnp.asarray(lnt_end, xpos.dtype), (E,)),
            is_photon=jnp.zeros(E, bool),
            max_crossings=jnp.full(E, cfg.max_crossings, jnp.int32),
            species="axion",
        )

    MAXC = cfg.max_crossings
    in_count = jnp.arange(MAXC)[None, :] < res.n_cross[:, None]

    # coincident-crossing dedup (MainRunner.jl:227-245): of two consecutive
    # crossings closer than 1e-5, drop the earlier one.
    d = jnp.linalg.norm(res.xc[:, 1:, :] - res.xc[:, :-1, :], axis=-1)
    next_valid = jnp.arange(1, MAXC)[None, :] < res.n_cross[:, None]
    keep_front = jnp.where(next_valid, d > 1e-5, True)
    valid = in_count & jnp.concatenate(
        [keep_front, jnp.ones((E, 1), bool)], axis=1
    )

    erg_eff = erg_inf[:, None] * jnp.abs(res.dwc)
    flat_pos = res.xc.reshape(-1, 3)
    flat_k = res.kc.reshape(-1, 3)
    flat_erg = erg_eff.reshape(-1)
    pc_flat, _ = _prob_batch(flat_pos, flat_k, flat_erg, sc_b, cfg.compute_dtype)
    pc = jnp.where(valid, pc_flat.reshape(E, MAXC), 0.0)

    weight = jnp.prod(jnp.where(valid, 1.0 - pc, 1.0), axis=1)

    # fallback when no crossing was found: the MC point itself is the first
    # conversion (MainRunner.jl:614-624)
    none = res.n_cross == 0
    xc = jnp.where(none[:, None, None], res.xc.at[:, 0, :].set(xpos), res.xc)
    kc = jnp.where(none[:, None, None], res.kc.at[:, 0, :].set(k_back), res.kc)
    tc = jnp.where(none[:, None], res.tc.at[:, 0].set(0.0), res.tc)
    dwc = jnp.where(none[:, None], res.dwc.at[:, 0].set(-1.0), res.dwc)
    pc = jnp.where(none[:, None], pc.at[:, 0].set(prob0), pc)
    valid = jnp.where(none[:, None], jnp.arange(MAXC)[None, :] < 1, valid)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)

    # re-zero time at the last (earliest forward-time) crossing and flip sign
    last_idx = jnp.where(
        n_valid > 0,
        MAXC - 1 - jnp.argmax(valid[:, ::-1], axis=1),
        0,
    )
    t_last = tc[jnp.arange(E), last_idx]
    tc = jnp.where(valid, -(tc - t_last[:, None]), 0.0)

    return BacktraceResult(
        prob0=prob0,
        p_nonad0=p_nonad0,
        weight=weight,
        samp_back_weight=prob0 * weight,
        n_cross=n_valid,
        xc=xc, kc=kc, tc=tc, dwc=dwc, pc=pc, valid=valid,
        c_bck=jnp.ones(E, jnp.int32),
        traj=res.traj,
        times=res.times,
        raw_n_cross=res.n_cross,
        raw_tc=res.tc,
    )


class TreePools(NamedTuple):
    """SoA node pools, [E, P, ...]."""
    pos: Any
    k: Any
    t: Any
    dw: Any
    is_photon: Any
    prob: Any
    weight: Any
    parent_weight: Any
    prob_conv: Any
    prob_conv0: Any
    status: Any        # 0 empty, 1 pending, 2 processed
    is_final: Any
    fpos: Any          # [E, P, 3] trajectory endpoint
    fmom: Any
    ferg: Any          # [E, P] e7 at endpoint
    ftime: Any         # [E, P] final log-time
    traj: Any          # [E, P, NS, 3]
    mom: Any           # [E, P, NS, 3]
    times: Any         # [E, P, NS]
    xc: Any            # [E, P, 3] the (single) crossing of this node
    kc: Any
    tcx: Any
    dwcx: Any
    pcx: Any
    has_cross: Any
    order: Any         # [E, P] processing order (1-based; 0 = unprocessed)


class TreeResult(NamedTuple):
    pools: TreePools
    count: Any        # [E] processed-node count (the reference's `c`)
    count_main: Any   # [E] number of finals
    info: Any         # [E] stop code
    tot_prob: Any     # [E]
    n_alloc: Any      # [E]


def _alloc_pools(E, P, NS, dtype):
    z = lambda *s: jnp.zeros(s, dtype)
    return TreePools(
        pos=z(E, P, 3), k=z(E, P, 3), t=z(E, P), dw=z(E, P),
        is_photon=jnp.zeros((E, P), bool),
        prob=z(E, P), weight=z(E, P), parent_weight=z(E, P),
        prob_conv=z(E, P), prob_conv0=z(E, P),
        status=jnp.zeros((E, P), jnp.int32),
        is_final=jnp.zeros((E, P), bool),
        fpos=z(E, P, 3), fmom=z(E, P, 3), ferg=z(E, P), ftime=z(E, P),
        traj=z(E, P, NS, 3), mom=z(E, P, NS, 3), times=z(E, P, NS),
        xc=z(E, P, 3), kc=z(E, P, 3), tcx=z(E, P), dwcx=z(E, P), pcx=z(E, P),
        has_cross=jnp.zeros((E, P), bool),
        order=jnp.zeros((E, P), jnp.int32),
    )


def forward_tree(key, xpos, k_init, erg_inf, sc: Scene, cfg: NumericsConfig,
                 tcfg: TreeConfig, *, lnt_end) -> TreeResult:
    """Forward branching tree from the MC-selected conversion point
    (get_tree, MainRunner.jl:126-352; parent photon seeded MainRunner.jl:653-664)."""
    E = xpos.shape[0]
    dtype = xpos.dtype
    P = 2 * tcfg.max_nodes + 4
    NS = cfg.n_save
    eidx = jnp.arange(E)

    pools = _alloc_pools(E, P, NS, dtype)
    # seed the parent photon: weight 1, prob from the conversion point
    prob0, _ = _prob_batch(xpos, k_init, erg_inf, sc, cfg.compute_dtype)
    pools = pools._replace(
        pos=pools.pos.at[:, 0, :].set(xpos),
        k=pools.k.at[:, 0, :].set(k_init),
        t=pools.t.at[:, 0].set(0.0),
        dw=pools.dw.at[:, 0].set(-1.0),
        is_photon=pools.is_photon.at[:, 0].set(True),
        prob=pools.prob.at[:, 0].set(prob0),
        weight=pools.weight.at[:, 0].set(1.0),
        parent_weight=pools.parent_weight.at[:, 0].set(1.0),
        prob_conv=pools.prob_conv.at[:, 0].set(-1.0),
        prob_conv0=pools.prob_conv0.at[:, 0].set(-1.0),
        status=pools.status.at[:, 0].set(1),
    )

    dt0_ln = cfg.ln_t_start
    lnt1 = jnp.broadcast_to(jnp.asarray(lnt_end, dtype), (E,))

    class Carry(NamedTuple):
        pools: TreePools
        tot_prob: Any
        count: Any
        count_main: Any
        info: Any
        done: Any
        n_alloc: Any
        it: Any

    carry0 = Carry(
        pools=pools,
        tot_prob=jnp.zeros(E, dtype),
        count=jnp.zeros(E, jnp.int32),
        count_main=jnp.zeros(E, jnp.int32),
        info=jnp.ones(E, jnp.int32),
        done=jnp.zeros(E, bool),
        n_alloc=jnp.ones(E, jnp.int32),
        it=jnp.zeros((), jnp.int32),
    )

    def body(c: Carry) -> Carry:
        pl = c.pools
        pending = pl.status == 1
        has_pending = jnp.any(pending, axis=1)
        active = ~c.done & has_pending
        # highest-weight pending node per event (== sort! + pop, MainRunner.jl:342)
        wmask = jnp.where(pending, pl.weight, -jnp.inf)
        sel = jnp.argmax(wmask, axis=1)

        pos0 = pl.pos[eidx, sel]
        k0 = pl.k[eidx, sel]
        t_node = pl.t[eidx, sel]
        dw_node = pl.dw[eidx, sel]
        is_ph = pl.is_photon[eidx, sel]
        w_node = pl.weight[eidx, sel]
        count_now = c.count + 1  # the reference's `count` during this iteration

        lnt0 = jnp.log(jnp.maximum(t_node, jnp.exp(dt0_ln)))
        if cfg.engine == "mega":
            from adiabatic_raytracer_tpu.ops.megakernel import propagate_mega

            res = propagate_mega(
                pos0, k0, sc, cfg,
                erg=erg_inf,
                delta_w=dw_node,
                lnt0=lnt0,
                lnt1=lnt1,
                is_photon=is_ph,
                max_crossings=1,
                species="mixed",
            )
        else:
            res = propagate(
                pos0, k0, sc, cfg,
                erg=erg_inf,
                delta_w=dw_node,
                lnt0=lnt0,
                lnt1=lnt1,
                is_photon=is_ph,
                max_crossings=jnp.ones(E, jnp.int32),
                species="mixed",
            )

        has_cross = res.n_cross >= 1
        xc = res.xc[:, 0, :]
        kc = res.kc[:, 0, :]
        tcx = res.tc[:, 0]
        dwcx = res.dwc[:, 0]

        # "rare fail" guard (MainRunner.jl:213-224): |velocity component| > 1
        rare_fail = has_cross & jnp.any(jnp.abs(kc) > 1.0, axis=1)
        cross_ok = has_cross & ~rare_fail

        pcx, _ = _prob_batch(xc, kc, erg_inf * jnp.abs(dwcx), sc, cfg.compute_dtype)

        # --- record propagation results on the processed node ---
        upd = active
        pl = pl._replace(
            status=jnp.where(upd[:, None], pl.status.at[eidx, sel].set(2), pl.status),
            fpos=jnp.where(upd[:, None, None],
                           pl.fpos.at[eidx, sel].set(res.traj[:, -1, :]), pl.fpos),
            fmom=jnp.where(upd[:, None, None],
                           pl.fmom.at[eidx, sel].set(res.mom[:, -1, :]), pl.fmom),
            ferg=jnp.where(upd[:, None], pl.ferg.at[eidx, sel].set(res.erg[:, -1]), pl.ferg),
            ftime=jnp.where(upd[:, None], pl.ftime.at[eidx, sel].set(res.final_lnt), pl.ftime),
            traj=jnp.where(upd[:, None, None, None],
                           pl.traj.at[eidx, sel].set(res.traj), pl.traj),
            mom=jnp.where(upd[:, None, None, None],
                          pl.mom.at[eidx, sel].set(res.mom), pl.mom),
            times=jnp.where(upd[:, None, None],
                            pl.times.at[eidx, sel].set(res.times), pl.times),
            xc=jnp.where((upd & cross_ok)[:, None, None],
                         pl.xc.at[eidx, sel].set(xc), pl.xc),
            kc=jnp.where((upd & cross_ok)[:, None, None],
                         pl.kc.at[eidx, sel].set(kc), pl.kc),
            tcx=jnp.where((upd & cross_ok)[:, None], pl.tcx.at[eidx, sel].set(tcx), pl.tcx),
            dwcx=jnp.where((upd & cross_ok)[:, None], pl.dwcx.at[eidx, sel].set(dwcx), pl.dwcx),
            pcx=jnp.where((upd & cross_ok)[:, None], pl.pcx.at[eidx, sel].set(pcx), pl.pcx),
            has_cross=jnp.where(upd[:, None], pl.has_cross.at[eidx, sel].set(cross_ok),
                                pl.has_cross),
            order=jnp.where(upd[:, None], pl.order.at[eidx, sel].set(count_now),
                            pl.order),
        )

        # --- no crossing: final node (MainRunner.jl:200-207) ---
        no_cross = active & ~has_cross
        r_end = jnp.linalg.norm(res.traj[:, -1, :], axis=1)
        final_ok = no_cross & (r_end > sc.r_ns * 1.1)
        pl = pl._replace(
            is_final=jnp.where(no_cross[:, None], pl.is_final.at[eidx, sel].set(final_ok),
                               pl.is_final)
        )
        tot_prob = c.tot_prob + jnp.where(no_cross | (active & rare_fail), w_node, 0.0)
        count_main = c.count_main + no_cross.astype(jnp.int32)

        # --- spawn children (MainRunner.jl:278-305) ---
        spawn = active & cross_ok
        mc_mode = count_now > tcfg.mc_nodes
        subkey = jax.vmap(lambda e: jax.random.fold_in(jax.random.fold_in(key, e), c.it))(eidx)
        r_mc = jax.vmap(lambda k: jax.random.uniform(k, dtype=dtype))(subkey)
        convert_mc = r_mc < pcx

        new_species = ~is_ph
        # child A (always written when spawning): in MC mode the single drawn
        # child; in full-tree mode the converted child.
        a_species = jnp.where(mc_mode, jnp.where(convert_mc, new_species, is_ph),
                              new_species)
        a_prob = jnp.where(mc_mode, jnp.where(convert_mc, pcx, 1.0 - pcx), pcx)
        a_weight = jnp.where(mc_mode, w_node, pcx * w_node)
        a_prob_conv0 = jnp.where(
            mc_mode,
            jnp.where(convert_mc, pcx, pl.prob_conv[eidx, sel]),
            pcx,
        )
        slot_a = c.n_alloc
        write_a = spawn & (slot_a < P)
        sa = jnp.clip(slot_a, 0, P - 1)

        def wr(buf, val, mask, slot):
            if buf.ndim == 3:
                return jnp.where(mask[:, None, None], buf.at[eidx, slot].set(val), buf)
            return jnp.where(mask[:, None], buf.at[eidx, slot].set(val), buf)

        pl = pl._replace(
            pos=wr(pl.pos, xc, write_a, sa),
            k=wr(pl.k, kc, write_a, sa),
            t=wr(pl.t, tcx, write_a, sa),
            dw=wr(pl.dw, dwcx, write_a, sa),
            is_photon=wr(pl.is_photon, a_species, write_a, sa),
            prob=wr(pl.prob, a_prob, write_a, sa),
            weight=wr(pl.weight, a_weight, write_a, sa),
            parent_weight=wr(pl.parent_weight, w_node, write_a, sa),
            prob_conv=wr(pl.prob_conv, pcx, write_a, sa),
            prob_conv0=wr(pl.prob_conv0, a_prob_conv0, write_a, sa),
            status=wr(pl.status, jnp.ones(E, jnp.int32), write_a, sa),
        )

        # child B (full-tree mode only): the surviving parent species
        slot_b = c.n_alloc + 1
        write_b = spawn & ~mc_mode & (slot_b < P)
        sb = jnp.clip(slot_b, 0, P - 1)
        pl = pl._replace(
            pos=wr(pl.pos, xc, write_b, sb),
            k=wr(pl.k, kc, write_b, sb),
            t=wr(pl.t, tcx, write_b, sb),
            dw=wr(pl.dw, dwcx, write_b, sb),
            is_photon=wr(pl.is_photon, is_ph, write_b, sb),
            prob=wr(pl.prob, 1.0 - pcx, write_b, sb),
            weight=wr(pl.weight, (1.0 - pcx) * w_node, write_b, sb),
            parent_weight=wr(pl.parent_weight, w_node, write_b, sb),
            prob_conv=wr(pl.prob_conv, pcx, write_b, sb),
            prob_conv0=wr(pl.prob_conv0, pl.prob_conv[eidx, sel], write_b, sb),
            status=wr(pl.status, jnp.ones(E, jnp.int32), write_b, sb),
        )
        n_alloc = c.n_alloc + write_a.astype(jnp.int32) + write_b.astype(jnp.int32)

        count = jnp.where(active, count_now, c.count)

        # --- cutoffs (MainRunner.jl:324-339) ---
        info = c.info
        done = c.done
        hit2 = active & (tot_prob >= 1.0 - tcfg.prob_cutoff)
        info = jnp.where(hit2 & ~done, 2, info)
        done = done | hit2
        hit3 = active & (count_main >= tcfg.num_cutoff)
        info = jnp.where(hit3 & ~done, 3, info)
        done = done | hit3
        hit4 = active & (count > tcfg.max_nodes)
        info = jnp.where(hit4 & ~done, 4, info)
        done = done | hit4
        done = done | ~has_pending

        return Carry(pools=pl, tot_prob=tot_prob, count=count,
                     count_main=count_main, info=info, done=done,
                     n_alloc=n_alloc, it=c.it + 1)

    def cond(c: Carry):
        return jnp.any(~c.done) & (c.it <= tcfg.max_nodes + 1)

    out = lax.while_loop(cond, body, carry0)

    info = jnp.where(out.count > tcfg.mc_nodes, -jnp.abs(out.info), out.info)
    return TreeResult(pools=out.pools, count=out.count, count_main=out.count_main,
                      info=info, tot_prob=out.tot_prob, n_alloc=out.n_alloc)


def print_tree(result: TreeResult, event: int = 0):
    """Debug dump of one event's tree (printTree, MainRunner.jl:6-15)."""
    import numpy as np

    pl = result.pools
    status = np.asarray(pl.status[event])
    weights = np.asarray(pl.weight[event])
    species = np.asarray(pl.is_photon[event])
    total = 0.0
    print()
    for p in np.nonzero(status > 0)[0]:
        name = "photon" if species[p] else "axion"
        print(f"{name}  {weights[p]}")
        total += float(weights[p])
    print(f"Total weight: {total}")
    print()
