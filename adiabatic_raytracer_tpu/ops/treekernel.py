"""In-kernel branching-tree engine: one Pallas launch runs WHOLE TREES.

The host work-queue engine (ops/tree.forward_tree) is GLUE-bound at the
production cutoffs: scaling the megakernel's per-step cost +/-16% moves
pipeline device time only ~4%, so ~75% of the deep-cutoff device time is the
per-iteration XLA glue (top_k selection, pool gathers, child scatters, cutoff
bookkeeping, window refill) — ~2.4 ms per iteration at the K=1/window-128
optimum, ~300 small dispatches each (docs/DESIGN.md §9).  This engine removes
the per-node round trip entirely: EVERY LANE IS AN EVENT, and the lane runs
its event's complete tree inside the kernel:

  * a per-lane PENDING-NODE QUEUE lives in VMEM scratch (QD slots x 16 rows,
    QD = mc_nodes + 2, the bound on simultaneously-pending nodes: only the
    first mc_nodes processings can net +1 pending; the MC mode after that is
    net 0);
  * a recorded crossing evaluates the conversion probability in-kernel
    (megakernel._prob_nd), PUSHES the children (both in the branching phase,
    the single drawn child in MC mode, MainRunner.jl:278-305), then POPS the
    max-weight pending node (== the reference's sort!-then-pop,
    MainRunner.jl:342; ties break toward the lower pool slot exactly like
    the host engine's top_k) and restarts integration from its birth state
    with a fresh Hairer-lite dt;
  * cutoffs are checked per processed node (info 2/3/4, MainRunner.jl:
    324-339) — the reference's EXACT accounting, same as the host windowed
    K=1 default;
  * final nodes stream to NF output slots indexed by count_main.

MC draws replicate the host engine bit-for-bit: the uniform for node index n
is fold_in(event_key, n), pre-drawn on the host into a [E, max_nodes+1] input
block, and the probabilities are the same _prob_nd values the host engine
uses on the in_kernel_prob path — so tree TOPOLOGY matches the host engine
exactly unless a child relaunch's in-kernel renormalization (vs the host's
Cartesian round trip, a ~1-ulp difference) moves a marginal crossing or
flips a |uniform - p| < 1e-6 draw (the same equivalence class as the
in-kernel MC chain, tests/test_tree_mega.py).

Events that need more than NF finals (possible only when num_cutoff > NF)
stop in-kernel with a sentinel code and are REPLAYED from scratch by the
host engine — deterministic draws make the replay exact — under the same
jit (tree.forward_tree's skip mask), so the fallback costs one empty
while_loop when no event overflows.

Scope: the production pipeline contract (saveMode <= 1): finals pack fields
+ per-event counters.  Tree dumps (saveMode 2/3) keep the host engine, which
records every node.  Requires engine="mega", in_kernel_prob, and a scene
megakernel.can_prob covers.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.ops.megakernel import (
    SceneConsts,
    _A,
    _B5,
    _C,
    _E,
    _condition,
    _exp32,
    _ff_add,
    _hermite,
    _metric,
    _prob_nd,
    _rhs,
    _sincos,
    can_prob,
)

# ---- block-row layouts -----------------------------------------------------
# aux / auxout [T, 32, L]
A_LNT, A_LNTLO, A_DT, A_STEPS, A_LNTCK, A_ISPH, A_DONE, A_INFO = range(8)
A_COUNT, A_CMAIN, A_TOTP, A_ANOM, A_NALLOC = range(8, 13)
A_WCUR, A_PROB, A_PCONV, A_PCONV0, A_TB, A_DW, A_ORD = range(13, 20)
A_X0X, A_X0Y, A_X0Z, A_ITERS, A_ERG, A_LNT1, A_STEPTOT = range(20, 27)
AUX_ROWS = 32
# regs scratch [T, 24, L] (the aux fields touched only at segment ends)
R_COUNT, R_CMAIN, R_TOTP, R_ANOM, R_NALLOC, R_INFO = range(6)
R_WCUR, R_PROB, R_PCONV, R_PCONV0, R_TB, R_DW, R_ORD = range(6, 13)
R_X0X, R_X0Y, R_X0Z, R_STEPTOT = range(13, 17)
# erg / lnt1 live in regs so the step body is reusable by the refill kernel
# (where they change per served event); R_EVID is refill-only (the lane's
# current LOCAL event index, -1 when idle)
R_ERGL, R_LNT1L, R_EVID = range(17, 20)
REG_ROWS = 24
# queue slot rows (16 per slot): u(7), lnt, is_ph, weight, prob, pconv,
# pconv0, dw, pool_slot, status
Q_U0, Q_LNT, Q_ISPH, Q_W, Q_PROB, Q_PCONV, Q_PCONV0, Q_DW, Q_SLOT, Q_ST = (
    0, 7, 8, 9, 10, 11, 12, 13, 14, 15)
# finals slot rows (16 per slot): written, is_final, is_ph, order, weight,
# prob, pconv, pconv0, t_birth, u_end(7)
F_VALID, F_ISFIN, F_ISPH, F_ORD, F_W, F_PROB, F_PCONV, F_PCONV0, F_TB = range(9)
F_U0 = 9

INFO_OVERFLOW = 9.0  # sentinel: needs host replay (finals/queue capacity)

# refill-kernel event TABLE rows [R, 16 + UU, EPART] (per-event init state,
# VMEM-resident; a lane gathers its next event's rows via a one-hot MXU
# matmul when its current tree finishes)
TB_U0 = 0            # u0 (7 rows)
TB_LNT, TB_ERG, TB_LNT1, TB_PROB0, TB_X0X, TB_X0Y, TB_X0Z = range(7, 14)
TB_UNI = 16          # per-node uniforms (UU rows)
# refill-kernel per-EVENT output rows [R, 16 + NF*16, EPART]: 16 counter
# rows then the NF finals slots, scattered (one-hot MXU) at event completion
EV_INFO, EV_COUNT, EV_CMAIN, EV_TOTP, EV_ANOM, EV_NALLOC = range(6)
EV_STEPS, EV_ITERS, EV_DONE = range(6, 9)
EV_CNT_ROWS = 16
EV_FIN = 16


class TreeConsts:
    """Static per-launch tree parameters baked into the kernel."""

    def __init__(self, tcfg: TreeConfig, *, nf: int, qd: int, uu: int,
                 it_cap: int, epart: int = 0, refill_k: int = 8,
                 n_events: int = 0, lanes: int = 128):
        self.mc_nodes = float(tcfg.mc_nodes)
        self.num_cutoff = float(tcfg.num_cutoff)
        self.max_nodes = float(tcfg.max_nodes)
        self.prob_cutoff = float(tcfg.prob_cutoff)
        self.nf = int(nf)
        self.qd = int(qd)
        self.uu = int(uu)
        self.it_cap = int(it_cap)
        # refill-kernel statics: events per tile partition, refill boundary
        # period, total (unpadded) event count, lanes per tile
        self.epart = int(epart)
        self.refill_k = int(refill_k)
        self.n_events = int(n_events)
        self.lanes = int(lanes)


def _hairer_dt(C, u, f0, lnt, lnt1):
    """Fresh initial step exactly as the megakernel's _init / the host
    relaunch compute it (ops/megakernel._mega_kernel._init)."""
    def nrm(vs, us):
        acc = 0.0
        for v, uu in zip(vs, us):
            sc_ = C.atol + C.rtol * jnp.abs(uu)
            acc = acc + (v / sc_) ** 2
        return jnp.sqrt(acc / 7.0)

    d0 = nrm(u, u)
    d1 = nrm(f0, u)
    dt = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    return jnp.minimum(dt, 0.1 * jnp.maximum(lnt1 - lnt, 1e-30))


def _make_step_body(C: SceneConsts, T: TreeConsts, qs_ref, rs_ref, fin_ref,
                    uni_at):
    """Build the per-iteration loop body shared by the relaunch kernel
    (`_tree_kernel`) and the refill kernel (`_tree_kernel_refill`): one
    adaptive DP5 step + gated event scan + event block + segment block.

    carry = (done, u(7), u_lo(7), lnt, lnt_lo, dt, f0, g0, steps, lnt_ck,
    is_ph, it).  Reads erg / lnt1 / x0 from the `rs_ref` register rows
    (written once per launch by `_tree_kernel`, per refill by the refill
    kernel); `uni_at(j)` abstracts the per-node uniform source (input block
    vs refill-gathered scratch)."""
    NF, QD, UU = T.nf, T.qd, T.uu
    K = C.interp
    Kc = C.interp_coarse if 0 < C.interp_coarse < C.interp else 0

    def body(carry):
        (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, lnt_ck,
         is_ph, it) = carry
        zrow = jnp.zeros_like(lnt)
        erg = rs_ref[:, R_ERGL, :]
        lnt1 = rs_ref[:, R_LNT1L, :]
        done_m = done_f > 0.5
        active = jnp.logical_not(done_m)
        x0c = (rs_ref[:, R_X0X, :], rs_ref[:, R_X0Y, :], rs_ref[:, R_X0Z, :])
        h = jnp.clip(lnt1 - lnt, 0.0, None)
        h = jnp.minimum(dt, h)

        # --- one adaptive DP5 step (megakernel._mega_kernel.body) ---
        ks = [f0]
        for i in range(5):
            ui = tuple(
                uu + h * sum(a * kk[j] for a, kk in zip(_A[i], ks))
                for j, uu in enumerate(u)
            )
            ks.append(_rhs(C, ui, lnt + _C[i + 1] * h, erg, is_ph))
        u_new = tuple(
            uu + h * sum(b * kk[j] for b, kk in zip(_B5, ks))
            for j, uu in enumerate(u)
        )
        f_new = _rhs(C, u_new, lnt + h, erg, is_ph)
        ks7 = ks + [f_new]
        err_acc = 0.0
        for j in range(7):
            e = h * sum(ei * kk[j] for ei, kk in zip(_E, ks7))
            sc_ = C.atol + C.rtol * jnp.maximum(jnp.abs(u[j]), jnp.abs(u_new[j]))
            err_acc = err_acc + (e / sc_) ** 2
        enorm = jnp.sqrt(err_acc / 7.0)
        forced = dt <= C.dt_min * 1.0000001
        accept = ((enorm <= 1.0) | forced) & active & (h > 0)
        en_safe = jnp.where(enorm > 0, enorm, 1e-10)
        fac = C.safety * en_safe ** -0.2
        fac = jnp.clip(fac, C.min_fac, C.max_fac)
        dt_next = jnp.where(active, jnp.maximum(dt * fac, C.dt_min), dt)

        g_new = _condition(C, u_new, lnt + h)

        # --- gated two-phase event scan (megakernel, census-validated) ---
        gate_approx = getattr(C, "gate_trig", "native") == "native"

        def _scan(Kn, want_gmin, approx=False):
            flip_found = jnp.zeros_like(done_m)
            tau_lo = jnp.zeros_like(lnt)
            tau_hi = jnp.zeros_like(lnt)
            g_prev = g0
            tau_prev = jnp.zeros_like(lnt)
            gmin = jnp.abs(g0) if want_gmin else None
            for j in range(1, Kn + 1):
                tau_j = j / Kn
                if j < Kn:
                    u_j = _hermite(u, u_new, f0, f_new, h, tau_j)
                    g_j = _condition(C, u_j, lnt + tau_j * h, approx=approx)
                else:
                    g_j = g_new
                flip = (jnp.sign(g_prev) * jnp.sign(g_j) < 0) & ~flip_found
                tau_lo = jnp.where(flip, tau_prev, tau_lo)
                tau_hi = jnp.where(flip, tau_j, tau_hi)
                flip_found = flip_found | flip
                if want_gmin:
                    gmin = jnp.minimum(gmin, jnp.abs(g_j))
                g_prev = g_j
                tau_prev = jnp.full_like(lnt, tau_j)
            return flip_found, tau_lo, tau_hi, gmin

        if Kc:
            # coarse GATE pass at gate-precision transcendentals (see
            # megakernel: every committed crossing is re-bracketed by the
            # precise fine scan)
            flip_c, tlo_c, thi_c, gmin = _scan(Kc, True, approx=gate_approx)
            sus = accept & (flip_c | (gmin < C.gate_theta))
            any_sus = jnp.max(jnp.where(sus, 1.0, 0.0)) > 0.5

            def _fine_scan(_):
                ff, tl, th_, _ = _scan(K, False)
                return jnp.where(ff, 1.0, 0.0), tl, th_

            def _keep_coarse(_):
                return jnp.where(flip_c, 1.0, 0.0), tlo_c, thi_c

            ff_f, tau_lo, tau_hi = lax.cond(any_sus, _fine_scan,
                                            _keep_coarse, 0)
            flip_found = ff_f > 0.5
        else:
            flip_found, tau_lo, tau_hi, _ = _scan(K, False)
        flip_found = flip_found & accept

        # --- event block: bisect the root, filters, prob + rare check ---
        any_flip = jnp.max(jnp.where(flip_found, 1.0, 0.0)) > 0.5
        zero = zrow

        def _event_blk(_):
            t_lo, t_hi = tau_lo, tau_hi
            g_lo = _condition(C, _hermite(u, u_new, f0, f_new, h, t_lo),
                              lnt + t_lo * h)
            for _ in range(C.bisect):
                t_mid = 0.5 * (t_lo + t_hi)
                g_mid = _condition(C, _hermite(u, u_new, f0, f_new, h, t_mid),
                                   lnt + t_mid * h)
                left = jnp.sign(g_mid) == jnp.sign(g_lo)
                t_lo = jnp.where(left, t_mid, t_lo)
                g_lo = jnp.where(left, g_mid, g_lo)
                t_hi = jnp.where(left, t_hi, t_mid)
            tau_s = 0.5 * (t_lo + t_hi)
            u_s = _hermite(u, u_new, f0, f_new, h, tau_s)
            lnt_s = lnt + tau_s * h
            r_s = u_s[0]
            sth, cth = _sincos(u_s[1])
            sph, cph = _sincos(u_s[2])
            pc = (r_s * sth * cph, r_s * sth * sph, r_s * cth)
            sfac = 1.0001
            within = jnp.ones_like(done_m)
            for p, p0 in zip(pc, x0c):
                within = within & (jnp.abs(p) < jnp.abs(p0) * sfac) \
                    & (jnp.abs(p) > jnp.abs(p0) / sfac)
            # a segment ends at its first recorded crossing, so the
            # start-dup filter (seg_cross == 0 always) reduces to `within`
            rec = flip_found & ~within & (r_s >= C.r_ns * 1.01)

            any_rec_in = jnp.max(jnp.where(rec, 1.0, 0.0)) > 0.5

            def _prob_blk(_):
                p_s = _prob_nd(C, u_s, erg)
                # rare-fail guard (MainRunner.jl:213-224): Cartesian proper
                # velocity component > 1 at the crossing
                a_l = 1.0 - C.rs0 / jnp.maximum(r_s, 0.5 * C.r_ns)
                v_r = u_s[3] * erg * jnp.sqrt(jnp.maximum(a_l, 1e-6)) * a_l
                v_t = u_s[4] * erg / r_s * a_l
                v_p = u_s[5] * erg / (r_s * sth) * a_l
                v_tmp = sth * v_r + cth * v_t
                vx = cph * v_tmp - sph * v_p
                vy = sph * v_tmp + cph * v_p
                vz = cth * v_r - sth * v_t
                rare = ((jnp.abs(vx) > 1.0) | (jnp.abs(vy) > 1.0)
                        | (jnp.abs(vz) > 1.0))
                return p_s, jnp.where(rare, 1.0, 0.0)

            p_s, rare_f = lax.cond(any_rec_in, _prob_blk,
                                   lambda _: (zero, zero), 0)
            return (jnp.where(rec, 1.0, 0.0), u_s, lnt_s, p_s, rare_f)

        def _no_event(_):
            return (zero, u, lnt, zero, zero)

        (rec_f, u_star, lnt_star, p_star,
         rare_f) = lax.cond(any_flip, _event_blk, _no_event, 0)
        rec = rec_f > 0.5

        # --- commit the step (float-float); crossings end at the root ---
        u2 = []
        u_lo2 = []
        for j in range(7):
            d = u_new[j] - u[j]
            hi, lo = _ff_add(u[j], u_lo[j], jnp.where(accept, d, 0.0))
            hi = jnp.where(rec, u_star[j], hi)
            lo = jnp.where(rec, 0.0, lo)
            u2.append(hi)
            u_lo2.append(lo)
        u2 = tuple(u2)
        u_lo2 = tuple(u_lo2)
        lnt2, lnt_lo2 = _ff_add(lnt, lnt_lo, jnp.where(accept, h, 0.0))
        lnt2 = jnp.where(rec, lnt_star, lnt2)
        lnt_lo2 = jnp.where(rec, 0.0, lnt_lo2)
        f02 = tuple(jnp.where(accept, fn, ff) for fn, ff in zip(f_new, f0))
        g02 = jnp.where(accept, g_new, g0)
        steps2 = steps + jnp.where(active, 1.0, 0.0)
        # per-event work diagnostic (drives the compaction stage plan)
        rs_ref[:, R_STEPTOT, :] = (rs_ref[:, R_STEPTOT, :]
                                   + jnp.where(active, 1.0, 0.0))

        # --- segment-end flags ---
        ns_hit = accept & (is_ph > 0.5) & (u2[0] < C.r_ns * 1.01) & ~rec
        # `active & (lnt >= lnt1)`: a node born at/after t_end exits
        # immediately (the host propagate returns at launch: no crossing)
        reached = ((accept & (lnt2 >= lnt1 - 1e-6)) | (active & (lnt >= lnt1))) & ~rec
        maxed = (steps2 >= C.max_steps) & active & ~rec
        at_win = (jnp.mod(steps2, C.stall_window) < 0.5) & (steps2 > 0.5)
        stalled = at_win & active & (lnt2 - lnt_ck < C.stall_min) & ~rec
        lnt_ck2 = jnp.where(at_win, lnt2, lnt_ck)
        end_exit = (ns_hit | reached | maxed | stalled) & active
        seg_end = rec | end_exit

        any_end = jnp.max(jnp.where(seg_end, 1.0, 0.0)) > 0.5

        def _segment_blk(_):
            # registers of the node being processed
            count = rs_ref[:, R_COUNT, :]
            cmain = rs_ref[:, R_CMAIN, :]
            totp = rs_ref[:, R_TOTP, :]
            anom = rs_ref[:, R_ANOM, :]
            nall = rs_ref[:, R_NALLOC, :]
            info = rs_ref[:, R_INFO, :]
            w_cur = rs_ref[:, R_WCUR, :]
            prob_cur = rs_ref[:, R_PROB, :]
            pconv_cur = rs_ref[:, R_PCONV, :]
            pconv0_cur = rs_ref[:, R_PCONV0, :]
            tb_cur = rs_ref[:, R_TB, :]
            dw_cur = rs_ref[:, R_DW, :]
            ord_cur = rs_ref[:, R_ORD, :]

            rare = rare_f > 0.5
            end_cross = rec
            spawn = end_cross & ~rare
            totp2 = totp + jnp.where(end_exit | (end_cross & rare),
                                     w_cur, 0.0)

            # --- final record (no-crossing exit; MainRunner.jl:200-207).
            # NESTED GATE: the segment block fires on most tile-steps
            # (any-of-128-lanes), but an actual FINAL is ~100x rarer per
            # lane — and this write loop is NF x 16 masked row writes (800
            # vector ops at the deep NF=50).  Skip it unless some lane
            # records a final this step.  MEASURED WALL-NEUTRAL at the deep
            # 2048-event batch (77 ms with or without both nested gates —
            # the scf.if overhead returns what the skipped writes save);
            # kept for the VMEM write-traffic reduction and the
            # small-NF/default-cutoff shapes.
            final_rec = end_exit & (cmain < NF - 0.5)
            overflow = end_exit & ~(cmain < NF - 0.5)
            final_ok = jnp.where(u2[0] > C.r_ns * 1.1, 1.0, 0.0)
            any_final = jnp.max(jnp.where(final_rec, 1.0, 0.0)) > 0.5

            def _final_blk(_):
                for f in range(NF):
                    hit = final_rec & (jnp.abs(cmain - f) < 0.5)
                    base = 16 * f
                    w_ = lambda row, val: jnp.where(
                        hit, val, fin_ref[:, base + row, :])
                    fin_ref[:, base + F_VALID, :] = jnp.where(
                        hit, 1.0, fin_ref[:, base + F_VALID, :])
                    fin_ref[:, base + F_ISFIN, :] = w_(F_ISFIN, final_ok)
                    fin_ref[:, base + F_ISPH, :] = w_(F_ISPH, is_ph)
                    fin_ref[:, base + F_ORD, :] = w_(F_ORD, ord_cur)
                    fin_ref[:, base + F_W, :] = w_(F_W, w_cur)
                    fin_ref[:, base + F_PROB, :] = w_(F_PROB, prob_cur)
                    fin_ref[:, base + F_PCONV, :] = w_(F_PCONV, pconv_cur)
                    fin_ref[:, base + F_PCONV0, :] = w_(F_PCONV0, pconv0_cur)
                    fin_ref[:, base + F_TB, :] = w_(F_TB, tb_cur)
                    for j in range(7):
                        fin_ref[:, base + F_U0 + j, :] = w_(F_U0 + j, u2[j])
                return 0

            lax.cond(any_final, _final_blk, lambda _: 0, 0)
            cmain2 = cmain + jnp.where(end_exit, 1.0, 0.0)

            # --- spawn children (MainRunner.jl:278-305).  NESTED GATE: the
            # uniform-select chain (UU = max_nodes+1 masked row reads, 104 at
            # deep cutoffs), the child renormalization, and the QD x 16
            # queue-push writes only matter on steps where some lane spawns
            # (a recorded crossing) — a pure-exit segment end skips them.
            mc_mode = ord_cur > T.mc_nodes + 0.5
            push_b = spawn & ~mc_mode
            nall2 = nall + jnp.where(spawn,
                                     jnp.where(mc_mode, 1.0, 2.0), 0.0)
            any_spawn = jnp.max(jnp.where(spawn, 1.0, 0.0)) > 0.5

            def _spawn_blk(_):
                # pre-drawn uniform for THIS node index (fold_in(key, ord))
                u_draw = zrow
                for j in range(UU):
                    u_draw = jnp.where(jnp.abs(ord_cur - (j + 1)) < 0.5,
                                       uni_at(j), u_draw)
                conv = u_draw < p_star
                # child birth state: crossing momenta renormalized onto the
                # axion shell at the event energy (the host relaunch's
                # k_norm_Cart ax_fix semantics; megakernel._chain_restart)
                r_s = jnp.maximum(u_star[0], C.r_ns)
                s_t, _c_t = _sincos(u_star[1])
                g_tt_f, g_rr_f, g_thth_f, g_pp_f = _metric(
                    C, r_s, s_t, rs0=C.rs0_full)
                wsq = (g_rr_f * u_star[3] ** 2 + g_thth_f * u_star[4] ** 2
                       + g_pp_f * u_star[5] ** 2)
                et = erg * (1.0 / C.mass_a)
                nrm = jnp.sqrt(jnp.maximum(
                    (-g_tt_f * et * et - 1.0) / (et * et * wsq), 0.0))
                u_c = (u_star[0], u_star[1], u_star[2], u_star[3] * nrm,
                       u_star[4] * nrm, u_star[5] * nrm, u_star[6])
                dw_child = u_star[6] / erg

                flip_sp = jnp.where(is_ph > 0.5, 0.0, 1.0)
                spA = jnp.where(mc_mode, jnp.where(conv, flip_sp, is_ph),
                                flip_sp)
                wA = jnp.where(mc_mode, w_cur, p_star * w_cur)
                probA = jnp.where(mc_mode,
                                  jnp.where(conv, p_star, 1.0 - p_star),
                                  p_star)
                pconv0A = jnp.where(mc_mode,
                                    jnp.where(conv, p_star, pconv_cur),
                                    p_star)
                wB = (1.0 - p_star) * w_cur
                probB = 1.0 - p_star
                slotA = nall
                slotB = nall + 1.0

                # queue pushes: child A to the first free slot, B the second
                cnt = zrow
                pushedA = jnp.zeros_like(done_m)
                pushedB = jnp.zeros_like(done_m)
                for s in range(QD):
                    base = 16 * s
                    st_s = qs_ref[:, base + Q_ST, :]
                    free = st_s < 0.5
                    f1 = free & (cnt < 0.5) & spawn
                    f2 = free & (jnp.abs(cnt - 1.0) < 0.25) & push_b
                    wr = f1 | f2

                    def qw(row, valA, valB):
                        qs_ref[:, base + row, :] = jnp.where(
                            f1, valA, jnp.where(f2, valB,
                                                qs_ref[:, base + row, :]))

                    for j in range(7):
                        qw(Q_U0 + j, u_c[j], u_c[j])
                    qw(Q_LNT, lnt_star, lnt_star)
                    qw(Q_ISPH, spA, is_ph)
                    qw(Q_W, wA, wB)
                    qw(Q_PROB, probA, probB)
                    qw(Q_PCONV, p_star, p_star)
                    qw(Q_PCONV0, pconv0A, pconv_cur)
                    qw(Q_DW, dw_child, dw_child)
                    qw(Q_SLOT, slotA, slotB)
                    qs_ref[:, base + Q_ST, :] = jnp.where(wr, 1.0, st_s)
                    cnt = cnt + jnp.where(free, 1.0, 0.0)
                    pushedA = pushedA | f1
                    pushedB = pushedB | f2
                failA = spawn & ~pushedA
                failB = push_b & ~pushedB
                return jnp.where(failA | failB, 1.0, 0.0)

            push_fail = lax.cond(any_spawn, _spawn_blk, lambda _: zrow, 0)
            # QD = mc_nodes + 2 bounds the pending count, so a failed push
            # can only mean a user-shrunk queue — flag for host replay
            overflow = overflow | (push_fail > 0.5)

            # --- per-node cutoffs, the reference's order.  Overflow takes
            # PRECEDENCE: an unrecordable final invalidates the kernel
            # result for this event whatever else fired on the same node —
            # the host replay recomputes everything, including the cutoff.
            #
            # prob_cutoff check: the host compares tot_prob >= 1 - 1e-10 in
            # f64; in f32 that bound is unrepresentable (ulp(1.0) = 6e-8),
            # so compare the PENDING-WEIGHT SUM instead — mathematically
            # identical (weights are conserved: 1 - tot_prob == the pending
            # sum) and f32-robust, because near the cutoff the pending
            # weights are tiny and their sum is absolutely accurate.
            pend_w = zrow
            for s in range(QD):
                base = 16 * s
                pend_w = pend_w + jnp.where(
                    qs_ref[:, base + Q_ST, :] > 0.5,
                    qs_ref[:, base + Q_W, :], 0.0)
            hit2 = seg_end & (pend_w <= T.prob_cutoff)
            hit3 = seg_end & (cmain2 >= T.num_cutoff - 0.5)
            hit4 = seg_end & (count > T.max_nodes + 0.5)
            info2 = jnp.where(overflow, INFO_OVERFLOW, info)
            done_now = overflow
            info2 = jnp.where(hit2 & ~done_now, 2.0, info2)
            done_now = done_now | hit2
            info2 = jnp.where(hit3 & ~done_now, 3.0, info2)
            done_now = done_now | hit3
            info2 = jnp.where(hit4 & ~done_now, 4.0, info2)
            done_now = done_now | hit4

            # --- pop the max-weight pending node (ties -> lower pool slot,
            # exactly the host top_k) ---
            want_pop = seg_end & ~done_now
            found = jnp.zeros_like(done_m)
            best_w = jnp.full_like(lnt, -jnp.inf)
            best_slot = jnp.full_like(lnt, 1e9)
            pop_u = [zrow] * 7
            pop_lnt = zrow
            pop_sp = zrow
            pop_w = zrow
            pop_prob = zrow
            pop_pconv = zrow
            pop_pconv0 = zrow
            pop_dw = zrow
            for s in range(QD):
                base = 16 * s
                pend = qs_ref[:, base + Q_ST, :] > 0.5
                w_s = qs_ref[:, base + Q_W, :]
                sl_s = qs_ref[:, base + Q_SLOT, :]
                better = pend & (~found | (w_s > best_w)
                                 | ((w_s == best_w) & (sl_s < best_slot)))
                best_w = jnp.where(better, w_s, best_w)
                best_slot = jnp.where(better, sl_s, best_slot)
                for j in range(7):
                    pop_u[j] = jnp.where(better,
                                         qs_ref[:, base + Q_U0 + j, :],
                                         pop_u[j])
                pop_lnt = jnp.where(better, qs_ref[:, base + Q_LNT, :], pop_lnt)
                pop_sp = jnp.where(better, qs_ref[:, base + Q_ISPH, :], pop_sp)
                pop_w = jnp.where(better, w_s, pop_w)
                pop_prob = jnp.where(better, qs_ref[:, base + Q_PROB, :],
                                     pop_prob)
                pop_pconv = jnp.where(better, qs_ref[:, base + Q_PCONV, :],
                                      pop_pconv)
                pop_pconv0 = jnp.where(better, qs_ref[:, base + Q_PCONV0, :],
                                       pop_pconv0)
                pop_dw = jnp.where(better, qs_ref[:, base + Q_DW, :], pop_dw)
                found = found | pend
            pop = want_pop & found
            empty = want_pop & ~found  # worklist exhausted: info stays 1
            # clear the popped slot
            for s in range(QD):
                base = 16 * s
                pend = qs_ref[:, base + Q_ST, :] > 0.5
                clear = pop & pend & (qs_ref[:, base + Q_SLOT, :] == best_slot)
                qs_ref[:, base + Q_ST, :] = jnp.where(
                    clear, 0.0, qs_ref[:, base + Q_ST, :])

            count2 = count + jnp.where(pop, 1.0, 0.0)
            ord2 = jnp.where(pop, count2, ord_cur)
            dw_bad = pop & ((pop_dw > -0.5) | (pop_dw < -2.0))
            anom2 = anom + jnp.where(dw_bad, 1.0, 0.0)

            # --- restart integration from the popped node ---
            u3 = tuple(jnp.where(pop, pu, uc) for pu, uc in zip(pop_u, u2))
            u_lo3 = tuple(jnp.where(pop, 0.0, ul) for ul in u_lo2)
            lnt3 = jnp.where(pop, pop_lnt, lnt2)
            lnt_lo3 = jnp.where(pop, 0.0, lnt_lo2)
            is_ph3 = jnp.where(pop, pop_sp, is_ph)
            any_pop = jnp.max(jnp.where(pop, 1.0, 0.0)) > 0.5

            def _reinit(_):
                f_p = _rhs(C, u3, lnt3, erg, is_ph3)
                g_p = _condition(C, u3, lnt3)
                dt_p = _hairer_dt(C, u3, f_p, lnt3, lnt1)
                return f_p, g_p, dt_p

            f_p, g_p, dt_p = lax.cond(any_pop, _reinit,
                                      lambda _: (f02, g02, dt_next), 0)
            f03 = tuple(jnp.where(pop, fp, fc) for fp, fc in zip(f_p, f02))
            g03 = jnp.where(pop, g_p, g02)
            dt3 = jnp.where(pop, dt_p, dt_next)
            steps3 = jnp.where(pop, 0.0, steps2)
            lnt_ck3 = jnp.where(pop, lnt3, lnt_ck2)
            # new segment start point (cartesian, for the start-dup filter)
            s_t3, c_t3 = _sincos(u3[1])
            s_p3, c_p3 = _sincos(u3[2])
            x0x = jnp.where(pop, u3[0] * s_t3 * c_p3, x0c[0])
            x0y = jnp.where(pop, u3[0] * s_t3 * s_p3, x0c[1])
            x0z = jnp.where(pop, u3[0] * c_t3, x0c[2])

            done3 = jnp.where(seg_end & (done_now | empty), 1.0, done_f)

            # write back registers (popped lanes get the new node's fields)
            rs_ref[:, R_COUNT, :] = count2
            rs_ref[:, R_CMAIN, :] = cmain2
            rs_ref[:, R_TOTP, :] = totp2
            rs_ref[:, R_ANOM, :] = anom2
            rs_ref[:, R_NALLOC, :] = nall2
            rs_ref[:, R_INFO, :] = info2
            rs_ref[:, R_WCUR, :] = jnp.where(pop, pop_w, w_cur)
            rs_ref[:, R_PROB, :] = jnp.where(pop, pop_prob, prob_cur)
            rs_ref[:, R_PCONV, :] = jnp.where(pop, pop_pconv, pconv_cur)
            rs_ref[:, R_PCONV0, :] = jnp.where(pop, pop_pconv0, pconv0_cur)
            rs_ref[:, R_TB, :] = jnp.where(pop, _exp32(pop_lnt), tb_cur)
            rs_ref[:, R_DW, :] = jnp.where(pop, pop_dw, dw_cur)
            rs_ref[:, R_ORD, :] = ord2
            rs_ref[:, R_X0X, :] = x0x
            rs_ref[:, R_X0Y, :] = x0y
            rs_ref[:, R_X0Z, :] = x0z
            return (done3, u3, u_lo3, lnt3, lnt_lo3, dt3, f03, g03,
                    steps3, lnt_ck3, is_ph3)

        def _no_end(_):
            return (done_f, u2, u_lo2, lnt2, lnt_lo2, dt_next, f02, g02,
                    steps2, lnt_ck2, is_ph)

        (done3, u3, u_lo3, lnt3, lnt_lo3, dt3, f03, g03, steps3, lnt_ck3,
         is_ph3) = lax.cond(any_end, _segment_blk, _no_end, 0)

        return (done3, u3, u_lo3, lnt3, lnt_lo3, dt3, f03, g03, steps3,
                lnt_ck3, is_ph3, it + 1)

    return body


def _tree_kernel(uin_ref, aux_ref, uni_ref, qin_ref,
                 uout_ref, auxout_ref, qout_ref, fin_ref,
                 qs_ref, rs_ref, *, C: SceneConsts, T: TreeConsts):
    """One tile of 128 events, each running its full branching tree."""
    NF, QD, UU = T.nf, T.qd, T.uu

    u = tuple(uin_ref[:, i, :] for i in range(7))
    u_lo = tuple(uin_ref[:, 8 + i, :] for i in range(7))
    lnt = aux_ref[:, A_LNT, :]
    lnt_lo = aux_ref[:, A_LNTLO, :]
    dt_in = aux_ref[:, A_DT, :]
    steps = aux_ref[:, A_STEPS, :]
    lnt_ck0 = aux_ref[:, A_LNTCK, :]
    is_ph = aux_ref[:, A_ISPH, :]
    done0 = aux_ref[:, A_DONE, :]
    erg = aux_ref[:, A_ERG, :]
    lnt1 = aux_ref[:, A_LNT1, :]

    tile_run = jnp.min(done0) < 0.5
    zrow = jnp.zeros_like(lnt)

    @pl.when(tile_run)
    def _load_scratch():
        # queue + segment-end registers persist in VMEM scratch across the
        # while loop (they change only at segment ends; carrying them would
        # blow vector-register pressure)
        for i in range(QD * 16):
            qs_ref[:, i, :] = qin_ref[:, i, :]
        rs_ref[:, R_COUNT, :] = aux_ref[:, A_COUNT, :]
        rs_ref[:, R_CMAIN, :] = aux_ref[:, A_CMAIN, :]
        rs_ref[:, R_TOTP, :] = aux_ref[:, A_TOTP, :]
        rs_ref[:, R_ANOM, :] = aux_ref[:, A_ANOM, :]
        rs_ref[:, R_NALLOC, :] = aux_ref[:, A_NALLOC, :]
        rs_ref[:, R_INFO, :] = aux_ref[:, A_INFO, :]
        rs_ref[:, R_WCUR, :] = aux_ref[:, A_WCUR, :]
        rs_ref[:, R_PROB, :] = aux_ref[:, A_PROB, :]
        rs_ref[:, R_PCONV, :] = aux_ref[:, A_PCONV, :]
        rs_ref[:, R_PCONV0, :] = aux_ref[:, A_PCONV0, :]
        rs_ref[:, R_TB, :] = aux_ref[:, A_TB, :]
        rs_ref[:, R_DW, :] = aux_ref[:, A_DW, :]
        rs_ref[:, R_ORD, :] = aux_ref[:, A_ORD, :]
        rs_ref[:, R_X0X, :] = aux_ref[:, A_X0X, :]
        rs_ref[:, R_X0Y, :] = aux_ref[:, A_X0Y, :]
        rs_ref[:, R_X0Z, :] = aux_ref[:, A_X0Z, :]
        rs_ref[:, R_STEPTOT, :] = aux_ref[:, A_STEPTOT, :]
        rs_ref[:, R_ERGL, :] = aux_ref[:, A_ERG, :]
        rs_ref[:, R_LNT1L, :] = aux_ref[:, A_LNT1, :]
        for i in range(R_EVID, REG_ROWS):
            rs_ref[:, i, :] = zrow
        # finals written-this-launch flags start clear (the relaunch wrapper
        # merges on them)
        for f in range(NF):
            fin_ref[:, 16 * f + F_VALID, :] = zrow

    def _init(_):
        f0 = _rhs(C, u, lnt, erg, is_ph)
        g0 = _condition(C, u, lnt)
        dt = _hairer_dt(C, u, f0, lnt, lnt1)
        return f0, g0, jnp.where(dt_in > 0, dt_in, dt)

    def _skip_init(_):
        z = zrow
        return tuple(z for _ in range(7)), z, z

    f0, g0, dt = lax.cond(tile_run, _init, _skip_init, 0)

    done = jnp.where(done0 > 0.5, 1.0, 0.0)

    def cond_fn(carry):
        return jnp.logical_and(jnp.min(carry[0]) < 0.5, carry[-1] < T.it_cap)

    body = _make_step_body(C, T, qs_ref, rs_ref, fin_ref,
                           lambda j: uni_ref[:, j, :])

    carry = (done, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, lnt_ck0,
             is_ph, jnp.zeros((), jnp.int32))
    out = lax.while_loop(cond_fn, body, carry)
    (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, lnt_ck,
     is_ph, it) = out

    @pl.when(tile_run)
    def _finalize():
        for i in range(7):
            uout_ref[:, i, :] = u[i]
            uout_ref[:, 8 + i, :] = u_lo[i]
        uout_ref[:, 7, :] = zrow
        uout_ref[:, 15, :] = zrow
        auxout_ref[:, A_LNT, :] = lnt
        auxout_ref[:, A_LNTLO, :] = lnt_lo
        auxout_ref[:, A_DT, :] = dt
        auxout_ref[:, A_STEPS, :] = steps
        auxout_ref[:, A_LNTCK, :] = lnt_ck
        auxout_ref[:, A_ISPH, :] = is_ph
        auxout_ref[:, A_DONE, :] = done_f
        auxout_ref[:, A_INFO, :] = rs_ref[:, R_INFO, :]
        auxout_ref[:, A_COUNT, :] = rs_ref[:, R_COUNT, :]
        auxout_ref[:, A_CMAIN, :] = rs_ref[:, R_CMAIN, :]
        auxout_ref[:, A_TOTP, :] = rs_ref[:, R_TOTP, :]
        auxout_ref[:, A_ANOM, :] = rs_ref[:, R_ANOM, :]
        auxout_ref[:, A_NALLOC, :] = rs_ref[:, R_NALLOC, :]
        auxout_ref[:, A_WCUR, :] = rs_ref[:, R_WCUR, :]
        auxout_ref[:, A_PROB, :] = rs_ref[:, R_PROB, :]
        auxout_ref[:, A_PCONV, :] = rs_ref[:, R_PCONV, :]
        auxout_ref[:, A_PCONV0, :] = rs_ref[:, R_PCONV0, :]
        auxout_ref[:, A_TB, :] = rs_ref[:, R_TB, :]
        auxout_ref[:, A_DW, :] = rs_ref[:, R_DW, :]
        auxout_ref[:, A_ORD, :] = rs_ref[:, R_ORD, :]
        auxout_ref[:, A_X0X, :] = rs_ref[:, R_X0X, :]
        auxout_ref[:, A_X0Y, :] = rs_ref[:, R_X0Y, :]
        auxout_ref[:, A_X0Z, :] = rs_ref[:, R_X0Z, :]
        auxout_ref[:, A_ITERS, :] = jnp.zeros_like(lnt) + it.astype(jnp.float32)
        auxout_ref[:, A_ERG, :] = aux_ref[:, A_ERG, :]
        auxout_ref[:, A_LNT1, :] = aux_ref[:, A_LNT1, :]
        auxout_ref[:, A_STEPTOT, :] = rs_ref[:, R_STEPTOT, :]
        for i in range(27, AUX_ROWS):
            auxout_ref[:, i, :] = zrow
        for i in range(QD * 16):
            qout_ref[:, i, :] = qs_ref[:, i, :]


def tree_kernel_launch(uin, aux, uni, qin, sc: Scene, cfg: NumericsConfig,
                       tcfg: TreeConfig, *, nf: int, qd: int, it_cap: int):
    """One pallas_call over [B]-lane blocks (B a multiple of 128).

    uin [B, 16], aux [B, 32], uni [B, UU], qin [B, QD*16] — row layouts at
    the module top.  Returns (uout, auxout, qout, finals[B, NF*16])."""
    B = uin.shape[0]
    L = 128
    assert B % L == 0, B
    R = B // L
    f32 = jnp.float32
    uu = uni.shape[1]
    C = SceneConsts(sc, cfg)
    C.species = "mixed"
    T = TreeConsts(tcfg, nf=nf, qd=qd, uu=uu, it_cap=it_cap)
    kernel = functools.partial(_tree_kernel, C=C, T=T)

    def to_blk(x):
        return x.astype(f32).reshape(R, L, x.shape[1]).transpose(0, 2, 1)

    bs = lambda d: pl.BlockSpec((1, d, L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        uout, auxout, qout, fin = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((R, 16, L), f32),
                jax.ShapeDtypeStruct((R, AUX_ROWS, L), f32),
                jax.ShapeDtypeStruct((R, qd * 16, L), f32),
                jax.ShapeDtypeStruct((R, nf * 16, L), f32),
            ),
            grid=(R,),
            in_specs=[bs(16), bs(AUX_ROWS), bs(uu), bs(qd * 16)],
            out_specs=(bs(16), bs(AUX_ROWS), bs(qd * 16), bs(nf * 16)),
            scratch_shapes=[
                pltpu.VMEM((1, qd * 16, L), f32),
                pltpu.VMEM((1, REG_ROWS, L), f32),
            ],
        )(to_blk(uin), to_blk(aux), to_blk(uni), to_blk(qin))

    def from_blk(x):
        return x.transpose(0, 2, 1).reshape(B, x.shape[1])

    return from_blk(uout), from_blk(auxout), from_blk(qout), from_blk(fin)


def _tree_kernel_refill(tbl_ref, evout_ref, qs_ref, rs_ref, us_ref, fs_ref,
                        *, C: SceneConsts, T: TreeConsts):
    """Refill variant: L lanes serve an EPART-event partition from an
    in-kernel queue.  A lane whose event's tree completes (a) SCATTERS its
    counters + finals to the per-event output columns via a one-hot MXU
    matmul, then (b) GATHERS the next unstarted event's init rows from the
    VMEM-resident table via the transposed one-hot matmul — so intra-tile
    lockstep idling (the relaunch engine's remaining waste, docs/DESIGN.md
    §8) becomes useful work while the queue is non-empty.  Grid tiles run
    sequentially on the TensorCore, so the static per-tile partition needs
    no cross-tile coordination.  Refills happen every `refill_k` iterations
    (a completed lane waits at most refill_k-1 steps), and simultaneous
    completions get distinct queue indices via a triangular-matmul exclusive
    prefix sum over the lane axis."""
    NF, QD, UU = T.nf, T.qd, T.uu
    EP, RK, L = T.epart, T.refill_k, T.lanes
    f32 = jnp.float32
    i32 = jnp.int32
    pid = pl.program_id(0)
    nv = jnp.minimum(jnp.asarray(EP, i32),
                     jnp.asarray(T.n_events, i32) - pid.astype(i32) * EP)
    nvf = nv.astype(f32)
    zrow = jnp.zeros((1, L), f32)

    # prologue: zero the per-event output block AND every scratch ref —
    # VMEM scratch starts UNINITIALIZED (NaN under interpret mode, garbage
    # on hardware) and the one-hot scatter matmuls below rely on 0*x == 0,
    # which NaN breaks for EVERY column of the accumulated output (measured:
    # the it=0 flush, all lanes masked, scattered NaN into all events' rows).
    # Then benign lane state (a lane holds it only until the it=0 refill
    # populates it — u must merely be finite under _rhs so idle-lane
    # arithmetic cannot produce NaNs that the step body would have to mask).
    evout_ref[:] = jnp.zeros_like(evout_ref)
    qs_ref[:] = jnp.zeros_like(qs_ref)
    rs_ref[:] = jnp.zeros_like(rs_ref)
    us_ref[:] = jnp.zeros_like(us_ref)
    fs_ref[:] = jnp.zeros_like(fs_ref)
    rs_ref[:, R_EVID, :] = zrow - 1.0
    rs_ref[:, R_ERGL, :] = zrow + C.mass_a
    rs_ref[:, R_LNT1L, :] = zrow - 1.0
    rs_ref[:, R_X0X, :] = zrow + 3.0 * C.r_ns
    rs_ref[:, R_X0Y, :] = zrow
    rs_ref[:, R_X0Z, :] = zrow

    def _counters(it_val):
        """[EV_CNT_ROWS, L] matrix of the per-lane counter rows to scatter."""
        rows = [
            rs_ref[0, R_INFO, :], rs_ref[0, R_COUNT, :],
            rs_ref[0, R_CMAIN, :], rs_ref[0, R_TOTP, :],
            rs_ref[0, R_ANOM, :], rs_ref[0, R_NALLOC, :],
            rs_ref[0, R_STEPTOT, :],
            jnp.full((L,), 1.0, f32) * it_val.astype(f32),
            jnp.full((L,), 1.0, f32),   # EV_DONE: flushed marker
        ]
        rows += [jnp.zeros((L,), f32)] * (EV_CNT_ROWS - len(rows))
        return jnp.stack(rows, axis=0)

    def _flush(evid, mask_f, it_val):
        """Scatter counters+finals of `mask` lanes to their event columns.

        Values are sanitized on the LANE side before the matmul (masked-out
        lanes and invalid finals slots forced to 0.0): the scatter relies on
        0*x == 0, so a single non-finite value in any lane's registers or
        stale finals rows would poison every event column of the tile."""
        oh2 = (lax.broadcasted_iota(i32, (L, EP), 1).astype(f32)
               == evid[:, None]).astype(f32) * mask_f[:, None]
        keep = mask_f[None, :] > 0.5
        cnt = jnp.where(keep, _counters(it_val), 0.0)
        evout_ref[0, 0:EV_CNT_ROWS, :] = evout_ref[0, 0:EV_CNT_ROWS, :] + \
            jnp.dot(cnt, oh2, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
        # finals rows: additionally zero slots this event never wrote
        # (their rows are the PREVIOUS served event's values)
        fv = []
        for f in range(NF):
            sl = fs_ref[0, 16 * f:16 * (f + 1), :]
            valid = sl[F_VALID:F_VALID + 1, :] > 0.5
            fv.append(jnp.where(jnp.logical_and(keep, valid), sl, 0.0))
        evout_ref[0, EV_FIN:, :] = evout_ref[0, EV_FIN:, :] + \
            jnp.dot(jnp.concatenate(fv, axis=0), oh2,
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)

    step_body = _make_step_body(C, T, qs_ref, rs_ref, fs_ref,
                                lambda j: us_ref[:, j, :])

    def body_rf(carry):
        (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, lnt_ck, is_ph,
         it, qhead) = carry
        awaiting = done_f > 0.5
        at_b = jnp.mod(it, RK) == 0
        do_ref = jnp.logical_and(
            jnp.logical_and(at_b, qhead < nv),
            jnp.max(jnp.where(awaiting, 1.0, 0.0)) > 0.5)

        def _refill(args):
            (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, lnt_ck,
             is_ph, qhead) = args
            evid = rs_ref[0, R_EVID, :]
            aw1 = awaiting[0, :]
            # 1. flush completed events (a lane awaiting with a live evid)
            flh = jnp.where(aw1, 1.0, 0.0) * jnp.where(evid >= 0, 1.0, 0.0)
            _flush(evid, flh, it)
            # 2. distinct queue indices for the refilling lanes
            tri = (lax.broadcasted_iota(i32, (L, L), 0)
                   < lax.broadcasted_iota(i32, (L, L), 1)).astype(f32)
            m = jnp.where(aw1, 1.0, 0.0)
            rank = jnp.dot(m[None, :], tri, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)[0, :]
            new_idx = qhead.astype(f32) + rank
            take1 = aw1 & (new_idx < nvf)
            new_idx = jnp.where(take1, new_idx, -1.0)
            # flushed-but-not-taken lanes must drop their evid or the
            # post-loop flush would double-scatter them
            rs_ref[0, R_EVID, :] = jnp.where(
                take1, new_idx, jnp.where(flh > 0.5, -1.0, evid))
            qhead2 = qhead + jnp.sum(jnp.where(take1, 1.0, 0.0)).astype(i32)
            # 3. gather the new events' init rows (one-hot MXU)
            oh = (lax.broadcasted_iota(i32, (EP, L), 0).astype(f32)
                  == new_idx[None, :]).astype(f32)
            got = jnp.dot(tbl_ref[0, :, :], oh, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
            t2 = take1[None, :]
            row = lambda r: got[r, :][None, :]
            u2 = tuple(jnp.where(t2, row(TB_U0 + j), uj)
                       for j, uj in enumerate(u))
            u_lo2 = tuple(jnp.where(t2, 0.0, ul) for ul in u_lo)
            lnt2 = jnp.where(t2, row(TB_LNT), lnt)
            lnt_lo2 = jnp.where(t2, 0.0, lnt_lo)
            steps2 = jnp.where(t2, 0.0, steps)
            # root stall checkpoint is 0, not lnt0 — the relaunch engine's
            # A_LNTCK launch init (bit-compat with the pinned census)
            lnt_ck2 = jnp.where(t2, 0.0, lnt_ck)
            is_ph2 = jnp.where(t2, 1.0, is_ph)
            done2 = jnp.where(t2, 0.0, done_f)
            # root registers (forward_tree_kernel's launch init)
            wr = lambda r, val: jnp.where(t2, val, rs_ref[:, r, :])
            rs_ref[:, R_COUNT, :] = wr(R_COUNT, 1.0)
            rs_ref[:, R_CMAIN, :] = wr(R_CMAIN, 0.0)
            rs_ref[:, R_TOTP, :] = wr(R_TOTP, 0.0)
            rs_ref[:, R_ANOM, :] = wr(R_ANOM, 0.0)
            rs_ref[:, R_NALLOC, :] = wr(R_NALLOC, 1.0)
            rs_ref[:, R_INFO, :] = wr(R_INFO, 1.0)
            rs_ref[:, R_WCUR, :] = wr(R_WCUR, 1.0)
            rs_ref[:, R_PROB, :] = wr(R_PROB, row(TB_PROB0))
            rs_ref[:, R_PCONV, :] = wr(R_PCONV, -1.0)
            rs_ref[:, R_PCONV0, :] = wr(R_PCONV0, -1.0)
            rs_ref[:, R_TB, :] = wr(R_TB, 0.0)
            rs_ref[:, R_DW, :] = wr(R_DW, -1.0)
            rs_ref[:, R_ORD, :] = wr(R_ORD, 1.0)
            rs_ref[:, R_X0X, :] = wr(R_X0X, row(TB_X0X))
            rs_ref[:, R_X0Y, :] = wr(R_X0Y, row(TB_X0Y))
            rs_ref[:, R_X0Z, :] = wr(R_X0Z, row(TB_X0Z))
            rs_ref[:, R_STEPTOT, :] = wr(R_STEPTOT, 0.0)
            rs_ref[:, R_ERGL, :] = wr(R_ERGL, row(TB_ERG))
            rs_ref[:, R_LNT1L, :] = wr(R_LNT1L, row(TB_LNT1))
            for jq in range(UU):
                us_ref[:, jq, :] = jnp.where(t2, row(TB_UNI + jq),
                                             us_ref[:, jq, :])
            for s_ in range(QD):
                qs_ref[:, 16 * s_ + Q_ST, :] = jnp.where(
                    t2, 0.0, qs_ref[:, 16 * s_ + Q_ST, :])
            for f_ in range(NF):
                fs_ref[:, 16 * f_ + F_VALID, :] = jnp.where(
                    t2, 0.0, fs_ref[:, 16 * f_ + F_VALID, :])
            # fresh integrator state for the refilled lanes (the relaunch
            # engine's _reinit, with the just-written erg / lnt1 rows)
            erg2 = rs_ref[:, R_ERGL, :]
            lnt1_2 = rs_ref[:, R_LNT1L, :]
            f_n = _rhs(C, u2, lnt2, erg2, is_ph2)
            g_n = _condition(C, u2, lnt2)
            dt_n = _hairer_dt(C, u2, f_n, lnt2, lnt1_2)
            f02 = tuple(jnp.where(t2, fn, fo) for fn, fo in zip(f_n, f0))
            g02 = jnp.where(t2, g_n, g0)
            dt2 = jnp.where(t2, dt_n, dt)
            return (done2, u2, u_lo2, lnt2, lnt_lo2, dt2, f02, g02,
                    steps2, lnt_ck2, is_ph2, qhead2)

        (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps, lnt_ck, is_ph,
         qhead) = lax.cond(do_ref, _refill, lambda a: a,
                           (done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0,
                            steps, lnt_ck, is_ph, qhead))
        out = step_body((done_f, u, u_lo, lnt, lnt_lo, dt, f0, g0, steps,
                         lnt_ck, is_ph, it))
        return out + (qhead,)

    def cond_rf(carry):
        done_f, it, qhead = carry[0], carry[-2], carry[-1]
        return jnp.logical_and(
            it < T.it_cap,
            jnp.logical_or(jnp.min(done_f) < 0.5, qhead < nv))

    ub = tuple(zrow + v for v in (3.0 * C.r_ns, 1.0, 1.0, 0.1, 0.1, 0.1,
                                  -C.mass_a))
    carry = (zrow + 1.0, ub, tuple(zrow for _ in range(7)), zrow, zrow,
             zrow + 1e-3, tuple(zrow for _ in range(7)), zrow, zrow, zrow,
             zrow + 1.0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    out = lax.while_loop(cond_rf, body_rf, carry)
    it = out[-2]

    # post-loop flush: the lanes' last events (never refilled out)
    evid = rs_ref[0, R_EVID, :]
    _flush(evid, jnp.where(evid >= 0, 1.0, 0.0), it)


def tree_refill_launch(tbl, sc: Scene, cfg: NumericsConfig, tcfg: TreeConfig,
                       *, nf: int, qd: int, epart: int, refill_k: int,
                       n_events: int, it_cap: int, lanes: int = 128,
                       interpret: bool = False):
    """pallas_call over per-tile event partitions.  tbl [R, 16+UU, EPART]
    (f32, row layout at TB_*); returns evout [R, 16+NF*16, EPART]."""
    R, tblr, ep = tbl.shape
    assert ep == epart
    uu = tblr - TB_UNI
    f32 = jnp.float32
    C = SceneConsts(sc, cfg)
    C.species = "mixed"
    T = TreeConsts(tcfg, nf=nf, qd=qd, uu=uu, it_cap=it_cap, epart=epart,
                   refill_k=refill_k, n_events=n_events, lanes=lanes)
    kernel = functools.partial(_tree_kernel_refill, C=C, T=T)
    evr = EV_FIN + nf * 16
    bs = lambda d: pl.BlockSpec((1, d, epart), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        evout = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, evr, epart), f32),
            grid=(R,),
            in_specs=[bs(tblr)],
            out_specs=bs(evr),
            scratch_shapes=[
                pltpu.VMEM((1, qd * 16, lanes), f32),
                pltpu.VMEM((1, REG_ROWS, lanes), f32),
                pltpu.VMEM((1, uu, lanes), f32),
                pltpu.VMEM((1, nf * 16, lanes), f32),
            ],
            interpret=interpret,
        )(tbl)
    return evout


def _ceil_to(n, m):
    return ((n + m - 1) // m) * m


def forward_tree_kernel(key, xpos, k_init, erg_inf, sc: Scene,
                        cfg: NumericsConfig, tcfg: TreeConfig, *, lnt_end,
                        debug_aux: bool = False):
    """Drop-in for tree.forward_tree on the production (saveMode <= 1)
    contract: runs whole trees in ONE kernel launch per batch, replays the
    rare capacity-overflow events through the host engine (exact — MC draws
    are keyed by (event key, node index)), and merges.

    Returns a TreeResult whose pools hold ONLY the final nodes of
    kernel-completed events (NF slots) concatenated with the host-engine
    pools of replayed events — exactly what compact_finals_global and the
    driver's ev_pack consume.  Tree dumps need the host engine."""
    from adiabatic_raytracer_tpu.ops.dispersion import k_norm_cart
    from adiabatic_raytracer_tpu.ops.geometry import (
        cart_to_sph, celerity_from_cart, celerity_to_cart_vel, sph_to_cart)
    from adiabatic_raytracer_tpu.ops.propagate import lapse_interior
    from adiabatic_raytracer_tpu.ops.tree import (
        TreePools, TreeResult, _prob_batch, forward_tree)

    E = xpos.shape[0]
    dtype = xpos.dtype
    f32 = jnp.float32
    NF = int(min(max(int(cfg.tree_kernel_finals), 1), tcfg.num_cutoff))
    # count_main <= num_cutoff per the reference's per-node check, so when
    # the finals block covers num_cutoff NO event can overflow and the host
    # replay pass is dropped at trace time (it would otherwise cost pools
    # allocation + glue scaling with E even when it runs zero iterations)
    no_replay = NF >= tcfg.num_cutoff
    QD = int(tcfg.mc_nodes + 2)
    UU = _ceil_to(tcfg.max_nodes + 1, 8)
    Bp = _ceil_to(E, 128)

    # per-event keys: same derivation as forward_tree
    key = jnp.asarray(key)
    per_event = key.shape[:1] == (E,) and (key.ndim == 1 or key.shape == (E, 2))
    if per_event and not (E == 2 and key.ndim == 1 and key.dtype == jnp.uint32):
        keys = key
    else:
        keys = jax.vmap(lambda e: jax.random.fold_in(key, e))(jnp.arange(E))

    # root node state (propagate_mega's preamble, so the root segment is
    # bit-identical to the host engine's root launch)
    mass_eff = sc.mass_ns_eff
    k0n = k_norm_cart(xpos, k_init, 0.0, erg_inf, sc, sc.mass_ns,
                      is_photon=True, ax_fix=True)
    x_sph0 = cart_to_sph(xpos)
    w0 = celerity_from_cart(xpos, k0n, mass_eff) / erg_inf[:, None]
    u0 = jnp.concatenate([x_sph0, w0, (erg_inf * -1.0)[:, None]], axis=1)
    prob0, _ = _prob_batch(xpos, k_init, erg_inf, sc, cfg.compute_dtype)
    lnt0 = jnp.log(jnp.maximum(jnp.zeros(E, dtype),
                               jnp.exp(jnp.asarray(cfg.ln_t_start, dtype))))

    def pad(a, fill=0.0):
        if Bp == E:
            return a
        padding = [(0, Bp - E)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, padding, constant_values=fill)

    z = jnp.zeros(Bp, f32)
    uin = jnp.zeros((Bp, 16), f32)
    uin = uin.at[:, 0:7].set(pad(u0).astype(f32))
    aux = jnp.zeros((Bp, AUX_ROWS), f32)
    aux = aux.at[:, A_LNT].set(pad(lnt0).astype(f32))
    aux = aux.at[:, A_ISPH].set(pad(jnp.ones(E)).astype(f32))
    aux = aux.at[:, A_DONE].set(
        jnp.where(jnp.arange(Bp) < E, 0.0, 1.0).astype(f32))
    aux = aux.at[:, A_INFO].set(z + 1.0)
    aux = aux.at[:, A_COUNT].set(z + 1.0)      # root popped at launch
    aux = aux.at[:, A_NALLOC].set(z + 1.0)
    aux = aux.at[:, A_WCUR].set(z + 1.0)
    aux = aux.at[:, A_PROB].set(pad(prob0).astype(f32))
    aux = aux.at[:, A_PCONV].set(z - 1.0)
    aux = aux.at[:, A_PCONV0].set(z - 1.0)
    aux = aux.at[:, A_DW].set(z - 1.0)
    aux = aux.at[:, A_ORD].set(z + 1.0)
    aux = aux.at[:, A_X0X].set(pad(xpos[:, 0]).astype(f32))
    aux = aux.at[:, A_X0Y].set(pad(xpos[:, 1]).astype(f32))
    aux = aux.at[:, A_X0Z].set(pad(xpos[:, 2]).astype(f32))
    aux = aux.at[:, A_ERG].set(pad(erg_inf).astype(f32))
    aux = aux.at[:, A_LNT1].set(z + jnp.asarray(lnt_end, f32))

    # pre-drawn per-node uniforms: fold_in(event_key, node_index), the host
    # engine's exact stream (tree.forward_tree's u32 helper)
    node_ix = jnp.arange(1, UU + 1, dtype=jnp.int32)
    uni_raw = jax.vmap(lambda kk: jax.vmap(
        lambda ix: jax.random.uniform(jax.random.fold_in(kk, ix),
                                      dtype=f32))(node_ix))(keys)
    uni = pad(uni_raw)
    qin = jnp.zeros((Bp, QD * 16), f32)

    it_full = (tcfg.max_nodes + 2) * (int(cfg.max_steps) + 2)
    chunk = int(cfg.tree_kernel_chunk)
    refill = int(getattr(cfg, "tree_refill", 0))
    if os.environ.get("TREEK_REFILL") is not None:
        refill = int(os.environ["TREEK_REFILL"])
    if refill:
        # --- in-kernel refill engine: one launch, lanes pull events from a
        # per-tile queue (docstring of _tree_kernel_refill) ---
        EPc = 1024 if refill == 1 else max(int(refill), 128)
        EP = min(_ceil_to(E, 128), _ceil_to(EPc, 128))
        Bp2 = _ceil_to(E, EP)
        rk = max(int(getattr(cfg, "tree_refill_k", 8)), 1)
        if os.environ.get("TREEK_REFILL_K") is not None:
            rk = int(os.environ["TREEK_REFILL_K"])

        def pad2(a):
            if Bp2 == E:
                return a
            return jnp.pad(a, [(0, Bp2 - E)] + [(0, 0)] * (a.ndim - 1))

        tblr = TB_UNI + UU
        rows = jnp.zeros((Bp2, tblr), f32)
        rows = rows.at[:, TB_U0:TB_U0 + 7].set(pad2(u0).astype(f32))
        rows = rows.at[:, TB_LNT].set(pad2(lnt0).astype(f32))
        rows = rows.at[:, TB_ERG].set(pad2(erg_inf).astype(f32))
        rows = rows.at[:, TB_LNT1].set(
            jnp.zeros(Bp2, f32) + jnp.asarray(lnt_end, f32))
        rows = rows.at[:, TB_PROB0].set(pad2(prob0).astype(f32))
        rows = rows.at[:, TB_X0X].set(pad2(xpos[:, 0]).astype(f32))
        rows = rows.at[:, TB_X0Y].set(pad2(xpos[:, 1]).astype(f32))
        rows = rows.at[:, TB_X0Z].set(pad2(xpos[:, 2]).astype(f32))
        rows = rows.at[:, TB_UNI:].set(pad2(uni_raw).astype(f32))
        tbl = rows.T.reshape(tblr, Bp2 // EP, EP).transpose(1, 0, 2)
        cap = min(it_full * EP, 2**31 - 2)
        lanes = int(os.environ.get("TREEK_LANES", "128"))  # tests: tiny tiles
        ev = tree_refill_launch(tbl, sc, cfg, tcfg, nf=NF, qd=QD, epart=EP,
                                refill_k=rk, n_events=E, it_cap=cap,
                                lanes=lanes)
        ev = ev.transpose(1, 0, 2).reshape(-1, Bp2)[:, :E]
        auxout = jnp.zeros((E, AUX_ROWS), f32)
        auxout = auxout.at[:, A_INFO].set(ev[EV_INFO])
        auxout = auxout.at[:, A_COUNT].set(ev[EV_COUNT])
        auxout = auxout.at[:, A_CMAIN].set(ev[EV_CMAIN])
        auxout = auxout.at[:, A_TOTP].set(ev[EV_TOTP])
        auxout = auxout.at[:, A_ANOM].set(ev[EV_ANOM])
        auxout = auxout.at[:, A_NALLOC].set(ev[EV_NALLOC])
        auxout = auxout.at[:, A_STEPTOT].set(ev[EV_STEPS])
        auxout = auxout.at[:, A_ITERS].set(ev[EV_ITERS])
        auxout = auxout.at[:, A_DONE].set(ev[EV_DONE])
        fin = ev[EV_FIN:].T
    elif chunk <= 0:
        _, auxout, _, fin = tree_kernel_launch(
            uin, aux, uni, qin, sc, cfg, tcfg, nf=NF, qd=QD, it_cap=it_full)
    else:
        # Bounded relaunches with STAGED STRAGGLER COMPACTION (the
        # integrate_mega_chunked pyramid): a 128-event tile runs until its
        # slowest EVENT's whole tree finishes (measured lockstep occupancy
        # 0.184 at the deep production batch), so each stage relaunches in
        # chunk-iteration slices until the active population fits the next
        # (4x smaller) buffer, then sorts actives-first and slices.  A
        # lane's full state — integrator, registers, pending-node queue —
        # round-trips through the aux/queue blocks; finals accumulate on
        # their per-launch written flags; uniforms ride the permutation.
        def launch(st, it_cap):
            # Actives-first repack EVERY launch (round-4 stage-packing
            # lever): a 128-lane tile runs until its slowest ACTIVE lane
            # finishes, so concentrating actives into the leading tiles
            # turns every all-done tail tile into a tile_run skip — a free
            # width shrink at 128-lane granularity, each launch, not just at
            # pyramid stage boundaries.  The argsort+gather costs ~10 ms at
            # 65k lanes (the megakernel's measured boundary) but only ~0.3 ms
            # at the 2048-event tree batch.  Tile composition changes, which
            # can move a tile-level fine-scan gate firing — bit-exact by the
            # census-validated gate margin (same class as the pyramid's
            # stage-boundary repack).
            if os.environ.get("TREEK_PACK", "done") == "work":
                # secondary key: among actives, group heavy chains together
                # (descending accumulated steps) so a tile's lanes finish
                # coherently instead of one long chain holding 127 short ones
                key = (st["aux"][:, A_DONE] * 1e9
                       - st["aux"][:, A_STEPTOT])
            else:
                key = st["aux"][:, A_DONE]
            order = jnp.argsort(key, stable=True)
            st = {k: v[order] for k, v in st.items()}
            act = st["aux"][:, A_DONE] < 0.5
            uo, ao, qo, f = tree_kernel_launch(
                st["uin"], st["aux"], st["uni"], st["qin"], sc, cfg, tcfg,
                nf=NF, qd=QD, it_cap=it_cap)
            m = lambda new, old: jnp.where(act[:, None], new, old)
            B_ = st["uin"].shape[0]
            fr = f.reshape(B_, NF, 16)
            took = act[:, None] & (fr[..., F_VALID] > 0.5)
            fin2 = jnp.where(took[..., None], fr,
                             st["fin"].reshape(B_, NF, 16)).reshape(B_, -1)
            return dict(idx=st["idx"], uni=st["uni"], uin=m(uo, st["uin"]),
                        aux=m(ao, st["aux"]), qin=m(qo, st["qin"]), fin=fin2)

        st = dict(idx=jnp.arange(Bp, dtype=jnp.int32), uin=uin, aux=aux,
                  qin=qin, uni=uni, fin=jnp.zeros((Bp, NF * 16), f32))
        acc_aux = aux
        acc_fin = st["fin"]

        # Stage-pyramid floor: with per-launch actives-first packing the
        # late drain runs all-done tiles as tile_run skips anyway, so the
        # narrowest (128-lane) buffer wins — deep 2048-event sweep (ms):
        # floor 512 / chunk {64,128,256} = 84/83/97, floor 128 = 80/88/95,
        # work-keyed packing 77 (within noise of done-keyed 80).
        floor = max(min(int(os.environ.get("TREEK_FLOOR", "128")), Bp), 128)
        sizes = []
        n = Bp
        while n > floor:
            n = max(((n // 4) // 128) * 128, floor)
            sizes.append(n)

        it_cap = chunk
        for target in sizes:
            def stage_cond(s, t=target):
                alive = s["aux"][:, A_DONE] < 0.5
                return jnp.any(alive) & (jnp.sum(alive) > t)

            st = lax.while_loop(stage_cond,
                                functools.partial(launch, it_cap=it_cap), st)
            idx = st["idx"]
            acc_aux = acc_aux.at[idx].set(st["aux"])
            acc_fin = acc_fin.at[idx].set(st["fin"])
            order = jnp.argsort(st["aux"][:, A_DONE], stable=True)
            st = {k: v[order][:target] for k, v in st.items()}
            it_cap = min(it_cap * 4, it_full)

        st = lax.while_loop(lambda s: jnp.any(s["aux"][:, A_DONE] < 0.5),
                            functools.partial(launch, it_cap=it_cap), st)
        acc_aux = acc_aux.at[st["idx"]].set(st["aux"])
        acc_fin = acc_fin.at[st["idx"]].set(st["fin"])
        auxout, fin = acc_aux, acc_fin

    auxout = auxout[:E]
    fin = fin[:E].reshape(E, NF, 16)
    info_k = auxout[:, A_INFO]
    incomplete = info_k == INFO_OVERFLOW
    complete = ~incomplete

    # --- host replay of overflow events (exact; impossible when the finals
    # block covers num_cutoff — then dropped at trace time entirely) ---
    if not no_replay:
        fb_cfg = dataclasses.replace(cfg, tree_engine="queue", tree_window=0)
        tr_fb = forward_tree(keys, xpos, k_init, erg_inf, sc, fb_cfg, tcfg,
                             lnt_end=lnt_end, skip=complete)

    # --- synthesize the finals-only pools and concat with the replay ---
    NS = cfg.n_save
    ok = complete[:, None] & (fin[..., F_VALID] > 0.5)
    u_end = fin[..., F_U0:F_U0 + 7].astype(dtype)
    x_sph = u_end[..., 0:3]
    w_end = u_end[..., 3:6] * erg_inf[:, None, None]
    a_l = lapse_interior(x_sph[..., 0], mass_eff, sc.r_ns)
    fpos = jnp.where(ok[..., None], sph_to_cart(x_sph), 0.0)
    fmom = jnp.where(ok[..., None],
                     celerity_to_cart_vel(x_sph, w_end, mass_eff, a=a_l), 0.0)
    g = lambda row: jnp.where(ok, fin[..., row].astype(dtype), 0.0)
    z2 = jnp.zeros((E, NF), dtype)
    synth = TreePools(
        pos=jnp.zeros((E, NF, 3), dtype), k=jnp.zeros((E, NF, 3), dtype),
        t=g(F_TB), dw=z2,
        is_photon=fin[..., F_ISPH] > 0.5,
        prob=g(F_PROB), weight=g(F_W), parent_weight=z2,
        prob_conv=g(F_PCONV), prob_conv0=g(F_PCONV0),
        status=jnp.where(ok, 2, 0).astype(jnp.int32),
        is_final=ok & (fin[..., F_ISFIN] > 0.5),
        fpos=fpos, fmom=fmom, ferg=jnp.where(ok, u_end[..., 6], 0.0),
        ftime=z2,
        traj=jnp.zeros((E, NF, NS, 3), dtype),
        mom=jnp.zeros((E, NF, NS, 3), dtype),
        times=jnp.zeros((E, NF, NS), dtype),
        xc=jnp.zeros((E, NF, 3), dtype), kc=jnp.zeros((E, NF, 3), dtype),
        tcx=z2, dwcx=z2, pcx=z2,
        has_cross=jnp.zeros((E, NF), bool),
        order=jnp.where(ok, fin[..., F_ORD], 0).astype(jnp.int32),
    )
    count_k = auxout[:, A_COUNT].astype(jnp.int32)
    info_i = auxout[:, A_INFO].astype(jnp.int32)
    info_i = jnp.where(count_k > tcfg.mc_nodes, -jnp.abs(info_i), info_i)
    iters_k = auxout[:, A_ITERS].astype(jnp.int32)
    if debug_aux:
        return auxout
    if no_replay:
        sel = lambda a_k, a_fb: a_k
        pools = synth
    else:
        sel = lambda a_k, a_fb: jnp.where(incomplete, a_fb, a_k)
        pools = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=1),
                             synth, tr_fb.pools)
    fb = tr_fb if not no_replay else TreeResult(
        pools=None, count=0, count_main=0, info=0, tot_prob=0., n_alloc=0,
        dw_anomalies=0, n_iters=0, done_it=0)
    return TreeResult(
        pools=pools,
        count=sel(count_k, fb.count),
        count_main=sel(auxout[:, A_CMAIN].astype(jnp.int32), fb.count_main),
        info=sel(info_i, fb.info),
        tot_prob=sel(auxout[:, A_TOTP].astype(dtype), fb.tot_prob),
        n_alloc=sel(auxout[:, A_NALLOC].astype(jnp.int32), fb.n_alloc),
        dw_anomalies=sel(auxout[:, A_ANOM].astype(jnp.int32),
                         fb.dw_anomalies),
        # diagnostics: the kernel has no host iterations — report the
        # in-kernel step count (the tile's while-loop trip count)
        n_iters=sel(iters_k, fb.n_iters),
        done_it=sel(iters_k, fb.done_it),
    )
