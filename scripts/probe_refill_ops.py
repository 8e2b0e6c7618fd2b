"""Probe: Mosaic mechanisms needed by the in-kernel tree-refill engine.

The tree kernel's remaining waste is intra-tile lockstep (docs/DESIGN.md §8:
deep tree phase 77 ms vs a 27 ms perfectly-packed floor).  The fix under
test: launch FEWER lanes than events and let a lane, when its event's tree
finishes, pull the next unstarted event from a per-tile queue — all inside
one launch.  That needs three Mosaic mechanisms, probed here in isolation:

  1. one-hot GATHER from a VMEM-resident event table via jnp.dot on the MXU
     (table [ROWS, EPART] @ onehot [EPART, 128] -> [ROWS, 128]), inside an
     scf.if inside the scf.while body;
  2. one-hot SCATTER-ADD into the per-tile output block
     (vals [SROWS, 128] @ onehot [128, EPART] += out [SROWS, EPART]);
  3. lane-rank assignment for simultaneous refills via a triangular-matmul
     exclusive prefix sum over the lane axis, plus a scalar queue-head
     carried through the while loop.

Run: JAX_PLATFORMS=cpu python scripts/probe_refill_ops.py        (interpret)
     python scripts/probe_refill_ops.py --tpu                    (real chip)
"""

import sys
import time

import numpy as np


def main(tpu: bool):
    import jax

    if not tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = 128          # lanes
    EPART = 512      # events per tile
    ROWS = 16        # table rows per event (init state)
    SROWS = 24       # scatter rows per event (counters + finals)
    N_IT = 64        # while-loop iterations
    REFILL_K = 4     # refill boundary period

    f32 = jnp.float32

    def kernel(tbl_ref, out_ref, state_ref):
        # zero output + per-lane state
        out_ref[:] = jnp.zeros_like(out_ref)
        state_ref[:] = jnp.zeros_like(state_ref)
        state_ref[0, 1, :] = jnp.full((L,), -1.0, f32)   # evid = -1
        # strictly-lower-triangular ones for the exclusive lane prefix sum
        tri = (lax.broadcasted_iota(jnp.int32, (L, L), 0)
               < lax.broadcasted_iota(jnp.int32, (L, L), 1)).astype(f32)

        def body(carry):
            it, qhead, work = carry
            # "work" = remaining per-lane iterations on the current event;
            # a lane is awaiting when work == 0
            awaiting = work < 0.5
            at_boundary = jnp.mod(it, REFILL_K) == 0
            can_pull = qhead < EPART
            do_refill = at_boundary & (jnp.max(jnp.where(awaiting, 1.0, 0.0))
                                       > 0.5) & can_pull

            def _refill(args):
                qhead, work = args
                evid_cur = state_ref[0, 1, :]
                # 1. flush: scatter current counters for awaiting lanes with
                #    a live event (one-hot over the event axis)
                flush = awaiting & (evid_cur >= 0)
                oh2 = (lax.broadcasted_iota(jnp.int32, (L, EPART), 1).astype(f32)
                       == jnp.broadcast_to(evid_cur[:, None], (L, EPART)))
                oh2 = oh2.astype(f32) * flush.astype(f32)[:, None]
                vals = jnp.concatenate(
                    [state_ref[0, 2:2 + SROWS - 1, :],
                     jnp.broadcast_to(it.astype(f32), (1, L))], axis=0)
                out_ref[0, :, :] = out_ref[0, :, :] + jnp.dot(
                    vals, oh2, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
                # 2. rank + new index assignment
                m = jnp.where(awaiting, 1.0, 0.0)
                rank = jnp.dot(m[None, :], tri,
                               preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)[0]
                new_idx = qhead.astype(f32) + rank
                take = awaiting & (new_idx < EPART)
                new_idx = jnp.where(take, new_idx, -1.0)
                # 3. gather the new events' init rows from the VMEM table
                oh = (lax.broadcasted_iota(jnp.int32, (EPART, L), 0).astype(f32)
                      == jnp.broadcast_to(new_idx[None, :], (EPART, L)))
                got = jnp.dot(tbl_ref[0, :, :], oh.astype(f32),
                              preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)   # [ROWS, L]
                # per-lane state := gathered init (row0 = work quota)
                work2 = jnp.where(take, got[0, :], work)
                state_ref[0, 1, :] = jnp.where(take, new_idx, evid_cur)
                for r in range(2, 2 + SROWS - 1):
                    state_ref[0, r, :] = jnp.where(
                        take, got[min(r, ROWS - 1), :] * 0.0, state_ref[0, r, :])
                # accumulate a checksum row so the scatter is data-dependent
                state_ref[0, 2, :] = jnp.where(take, got[1, :],
                                               state_ref[0, 2, :])
                qhead2 = qhead + jnp.sum(m * jnp.where(new_idx >= 0, 1.0, 0.0)
                                         ).astype(jnp.int32)
                return qhead2, work2

            qhead, work = lax.cond(do_refill, _refill,
                                   lambda a: a, (qhead, work))
            # "integrate": burn one unit of work, accumulate steps
            active = work > 0.5
            state_ref[0, 3, :] = state_ref[0, 3, :] + jnp.where(
                active, 1.0, 0.0)
            work = jnp.maximum(work - 1.0, 0.0)
            return it + 1, qhead, work

        def cond(carry):
            it, qhead, work = carry
            return jnp.logical_and(
                it < N_IT,
                jnp.logical_or(qhead < EPART, jnp.max(work) > 0.5))

        it0 = jnp.zeros((), jnp.int32)
        it, qhead, work = lax.while_loop(
            cond, body, (it0, jnp.zeros((), jnp.int32), jnp.zeros((L,), f32)))

        # post-loop flush of the lanes' last events
        evid_cur = state_ref[0, 1, :]
        flush = evid_cur >= 0
        oh2 = (lax.broadcasted_iota(jnp.int32, (L, EPART), 1).astype(f32)
               == jnp.broadcast_to(evid_cur[:, None], (L, EPART)))
        oh2 = oh2.astype(f32) * flush.astype(f32)[:, None]
        vals = jnp.concatenate(
            [state_ref[0, 2:2 + SROWS - 1, :],
             jnp.broadcast_to(it.astype(f32), (1, L))], axis=0)
        out_ref[0, :, :] = out_ref[0, :, :] + jnp.dot(
            vals, oh2, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)

    # table: row 0 = per-event work quota (1..4), row 1 = event id + 1000
    rng = np.random.default_rng(0)
    quota = rng.integers(1, 5, EPART).astype(np.float32)
    tbl = np.zeros((ROWS, EPART), np.float32)
    tbl[0] = quota
    tbl[1] = np.arange(EPART) + 1000.0

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, SROWS, EPART), f32),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, ROWS, EPART), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SROWS, EPART), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 2 + SROWS, L), f32)],
        interpret=not tpu,
    )

    t0 = time.time()
    out = np.asarray(fn(jnp.asarray(tbl)[None]))[0]
    dt = time.time() - t0

    # expectations: row 0 (state row 2 = gathered id) per event == id + 1000;
    # row 1 (state row 3 = steps) per event == its quota (work burned fully,
    # given N_IT is generous); every event flushed exactly once
    got_id = out[0]
    got_steps = out[1]
    ok_id = np.allclose(got_id, tbl[1])
    ok_steps = np.allclose(got_steps, quota)
    print(f"platform={'tpu' if tpu else 'cpu-interpret'} wall={dt:.1f}s")
    print(f"gathered-id roundtrip: {'OK' if ok_id else 'FAIL'} "
          f"(max err {np.abs(got_id - tbl[1]).max()})")
    print(f"per-event steps == quota: {'OK' if ok_steps else 'FAIL'} "
          f"(mismatches {int((np.abs(got_steps - quota) > 0).sum())})")
    return 0 if (ok_id and ok_steps) else 1


if __name__ == "__main__":
    sys.exit(main("--tpu" in sys.argv))
