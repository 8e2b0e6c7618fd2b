"""Typed scene / numerics / tree configuration pytrees.

The reference carries state between layers in positional, untyped "Mvars"
lists with *different* layouts for photons and axions (MainRunner.jl:177-186,
RayTracer.jl:76,100).  Here everything is a typed, jit-friendly dataclass
pytree: physical parameters are traced leaves, discrete mode switches are
static metadata so XLA specializes and eliminates dead branches.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls=None):
    """Register a frozen dataclass as a JAX pytree.

    Fields with ``metadata={"static": True}`` become aux data (hashable,
    trigger recompilation when changed); everything else is a traced leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if not f.metadata.get("static")]
        meta_fields = [f.name for f in dataclasses.fields(c) if f.metadata.get("static")]
        jax.tree_util.register_dataclass(c, data_fields, meta_fields)
        return c

    return wrap if cls is None else wrap(cls)


def static_field(default: Any):
    return dataclasses.field(default=default, metadata={"static": True})


@_pytree_dataclass
class Scene:
    """Physical scene: neutron star + axion parameters.

    Mirrors the CLI-visible parameters of the reference
    (Gen_Samples.jl:137-174) plus the hard-coded "fixed parameters" block
    promoted to first-class config.

    Tombstoned fixed-block knobs (Gen_Samples.jl:158-161) — inert in the
    reference and therefore deliberately NOT carried as fields:
      * ``ωProp = "Simple"``  — only value ever passed; no other branch exists.
      * ``CLen_Scale = false`` — conversion-length rescale flag, always off.
      * ``cutT = 10000``       — legacy trajectory cut, unused by the tree path.
      * ``gammaF = [1.0, 1.0]``— threaded through every Mvars list
        (e.g. MainRunner.jl:177) but never read by any physics function.
    """

    mass_a: Any = 1e-5        # axion mass [eV]              (--MassA)
    ax_g: Any = 1e-12         # axion-photon coupling [1/GeV] (--Axg)
    theta_m: Any = 0.0        # misalignment angle [rad]      (--ThetaM)
    omega_pul: Any = 1.0      # NS rotation frequency [1/s]   (--rotW)
    b0: Any = 1e14            # surface B field [Gauss]       (--B0)
    r_ns: Any = 10.0          # NS radius [km]                (--rNS)
    mass_ns: Any = 1.0        # NS mass [Msun]                (--Mass_NS)
    bndry_lyr: Any = -1.0     # boundary-layer index; <=0 disables (--bndry_lyr)
    rho_dm: Any = 0.45        # local DM density [GeV/cm^3]
    v_ns: Any = (0.0, 0.0, 0.0)  # NS velocity [c]            (--vNS_*)
    vmean_ax: Any = 220.0     # asymptotic axion speed scale [km/s]
    # --- static mode switches (XLA-specialized) ---
    flat: bool = static_field(False)        # flat space vs Schwarzschild
    isotropic: bool = static_field(False)   # isotropic plasma dispersion
    melrose: bool = static_field(True)      # Melrose anisotropic form (production mode)

    @property
    def mass_ns_eff(self):
        """NS mass with the `flat` switch applied (RayTracer.jl:187-189)."""
        return 0.0 if self.flat else self.mass_ns


@_pytree_dataclass
class NumericsConfig:
    """Integrator / event-detection numerics.

    Tolerances follow the reference's contract: Vern6 with reltol=1e-7,
    abstol=ode_err (1e-6), dtmin=1e-13 force_dtmin, maxiters=1e5
    (RayTracer.jl:383-384, Gen_Samples.jl:163).
    """

    rtol: Any = 1e-7
    atol: Any = 1e-6          # "ode_err"
    ln_t_start: Any = -30.0   # log-time integration start (MainRunner.jl:411)
    dt_min: Any = 1e-13
    safety: Any = 0.9
    max_dt_factor: Any = 5.0
    min_dt_factor: Any = 0.2
    # Lund/Hairer predictive (PI) step controller stabilization (dopri5.f
    # "beta"): growth = safety * enorm^-(0.2 - 0.75*beta) * errold^beta with
    # errold = max(enorm, 1e-4) from the last ACCEPTED step, growth clamped
    # <= 1 after a rejection.  0 reproduces the plain I controller
    # bit-for-bit.  Both engines (pool + megakernel) honor it.
    # MEASURED at the TPU headline (rtol 1e-7, chunked engine,
    # BENCH_PI_BETA=0.04): steps/ray 117.5 -> 102.8 (-12.5%) but wall-clock
    # a WASH (129.5k rays/s vs 126-136k session variance for beta=0) — the
    # extra carried errold vector costs every lockstep tile-step what the
    # step-count saving returns.  At LOOSE tolerance (rtol 1e-6, CPU
    # interpret smoke) beta=0.04 halves steps (132 -> 73) and eliminates
    # dt_min stall cuts, and endpoint error vs the f64 oracle IMPROVES
    # (median 4.0e-4 -> 2.3e-4).  Default 0 keeps the golden rows and
    # census pins bit-stable; set 0.04 for loose-tolerance workloads.
    pi_beta: Any = 0.0
    # --- static ---
    max_steps: int = static_field(100_000)
    n_save: int = static_field(3)           # "ntimes": saved trajectory points
    # Event-scan density per accepted step.  The reference's
    # ContinuousCallback scans 50 interpolation points (RayTracer.jl:357-358)
    # and the crossing census (bench_census.py) shows no lower density
    # matches: ~4.5% of production-backtrace crossings live in tangent
    # double-crossing pairs inside one scan sub-interval, and the missed
    # count is nearly FLAT in K below 50 — so 50 is the default, not a
    # smaller census-matched value (none exists).
    interp_points: int = static_field(50)
    # Two-phase gated scan (megakernel only): a coarse interp_coarse-point
    # pass runs every step; the full interp_points pass runs under a
    # tile-level scf.if only when some lane bracketed a sign flip or its
    # min |condition| over the coarse samples dipped below scan_gate_theta
    # (the condition is the normalized photon Hamiltonian H/omega^2 —
    # O(0.5) away from the conversion surface — so a dip flags a possible
    # tangent pair between coarse points).  Census-validated against the
    # plain 50-point scan; 0 or >= interp_points disables the gate.
    # Defaults measured on 65k production backtraces (bench_census.py):
    # coarse 4 @ theta 0.08 is census-identical to plain-50 and stays clean
    # up to theta 0.16 (2x trigger margin); coarse 2 and 3 at theta 0.08
    # each MISS 2 crossings — 4 is the safety boundary with margin.
    interp_coarse: int = static_field(4)
    scan_gate_theta: Any = 0.08
    # Per-scene auto-validation of the gate (driver.scan_gate_census_check):
    # the frontier above was census-validated on the production-default
    # scene; other scenes move the resonance geometry.  When > 0 and the
    # gate is active on the mega engine, driver.run() backtraces this many
    # conversion-surface events once per run with the gate AND with the
    # plain dense scan, compares the crossing censuses, and on mismatch
    # WIDENS the gate one notch (coarse x2, theta x2) or falls back to the
    # plain scan (recorded in RunStats.scan_gate).  0 disables the check.
    # MEASURED NECESSARY (SCAN_GATE_r05.json, mass_a x B0 grid, v5e): the
    # default frontier silently misses 1-3/128 events' crossings on the
    # three largest-maxR scenes (mass_a=1e-6 at B0>=1e14 -> plain fallback;
    # mass_a=1e-5 at B0=1e15 -> widened notch is clean).
    scan_gate_check: int = static_field(256)
    bisect_iters: int = static_field(60)    # event root refinement iterations
    max_roots_per_step: int = static_field(3)
    max_crossings: int = static_field(16)   # crossing buffer capacity per ray
    # Stall detector: a ray that advances less than stall_min_progress in
    # log-time over stall_window attempted steps is grinding at dt_min (the
    # reference burns maxiters=1e5 steps on these before giving up,
    # RayTracer.jl:384,386-391); we cut it early and flag it.  In a lockstep
    # pool one grinding ray holds the whole batch hostage, so this is a
    # first-class performance control.  Set stall_window=0 to disable.
    stall_window: int = static_field(1024)
    stall_min_progress: Any = 1e-8
    # Megakernel RHS gradient mode: "hand" (analytic adjoint,
    # megakernel._grad_h_hand — exploits the dipole r^-3 scaling, the
    # M_r/M_t angular rotation and the metric-independence of bmag to cut
    # the division/sqrt count AD cannot remove) or "vjp" (one reverse-mode
    # pass of the nondimensionalized Hamiltonian, the round-2..4 default).
    # Both validated to ~2e-7 median vs the f64 pool RHS
    # (tests/test_megakernel.py).  MEASURED on the 65k production backtrace
    # (scripts/probe_step_split.py, v5e, one process per variant, 2026-08):
    # same-session A/B: RHS-only variant 48.0 -> 31.3 ns/lane-step (1.53x),
    # production step 73.3 -> 56.4 ns (1.30x) — hand is the default.
    # Committed artifacts: STEP_SPLIT_r04 (vjp) full 63.82 ns -> STEP_SPLIT_
    # r05 (hand) full 54.74 ns, RHS share 63.9% -> 56.1%.
    rhs_mode: str = static_field("hand")
    # Crossing-condition form in the megakernel: "fast" (strength-reduced —
    # the axion-shell-renormalized k-square is identically -mass_a^2, so
    # the condition collapses to 0.5*ma^2*(wp2t*(1-kp^2/e2)-1)/e7^2 on the
    # unit dipole, saving 4 sqrts + a divide per evaluation; the always-on
    # coarse gate pays interp_coarse of them per step) or "canonical" (the
    # literal transcription of the reference condition, kept as the
    # equivalence oracle).  Values agree to f32 rounding
    # (test_condition_fast_matches_canonical); MEGA_COND env overrides for
    # one-process A/B probes.
    cond_mode: str = static_field("fast")
    # Transcendental precision of the coarse event-scan GATE's interior
    # condition samples: "precise" (the ~1.5e-7 Cody-Waite forms
    # everywhere, default) or "native" (gate-precision ~2e-4 sincos/exp
    # halves, megakernel._sincos_gate — safe because the gate fires on
    # sign flips and |g| < scan_gate_theta = 0.08 with a measured 2x
    # margin and every committed crossing is re-bracketed by the precise
    # fine scan; census-clean on 65k production backtraces).  MEASURED
    # NON-LEVER for speed (same-session headline A/B, v5e, 2026-08:
    # precise 157.2k rays/s vs native 153.1k — carrying a second sincos
    # code path in the kernel costs more in vector-register pressure than
    # the ~30 saved ops per interior sample return), so precise stays the
    # default; the knob is kept for deeper-poly experiments.
    # MEGA_GATE_TRIG env overrides for one-process A/B probes.
    gate_trig: str = static_field("precise")
    # Propagation engine for the tree/backtrace propagations: "pool" (XLA
    # pool integrator, reference default), "mega" (Pallas megakernel — TPU
    # only; ops/megakernel.py), or "pool_compact" (pool with the backtrace
    # run through host-orchestrated straggler compaction,
    # ops/streaming.CompactedPropagator; single-device driver only).
    engine: str = static_field("pool")
    # Work-queue launch width of the forward tree engine (ops/tree.py):
    # each iteration propagates only the W globally heaviest pending lanes
    # of the [E, K] lane grid (the grid is mostly inert — median pending per
    # event is ~1 — but a lockstep launch pays per 128-lane tile).
    # 0 = auto: 2*E rounded up to a tile, never below 128.  Set to a large
    # value to disable compaction (launch all E*K lanes).
    tree_queue_width: int = static_field(0)
    # Work-queue lanes per event per tree iteration.  0 = auto: 1 under the
    # streaming window (tree_window > 0), else mc_nodes + 2 (the bound on
    # simultaneously-pending nodes).  Cutoffs are checked once per
    # iteration, so a batch may overshoot num_cutoff/max_nodes by up to K-1
    # nodes vs the reference; K=1 is the reference's EXACT per-node cutoff
    # semantics (MainRunner.jl:324-339) — and under the window it is also
    # the measured v5e optimum (deep 8192-event sweep: K=1 7426 ev/s vs
    # K=12 3910; per-iteration glue and launch width scale with window*K,
    # and the window keeps occupancy high without per-event width).  The
    # round-2 "K=1 costs 1.6x" held only for the unwindowed per-batch
    # engine, where K is what keeps the draining batch's tiles full.
    tree_k: int = static_field(0)
    # Streaming active window of the forward tree engine (ops/tree.py):
    # pools hold ALL E events of the batch, but each iteration runs only an
    # N-wide window of not-yet-finished events; a finished event's window
    # lane refills IMMEDIATELY from the batch's unstarted events.  Motivation:
    # the per-batch tail — the median event finishes in 2 iterations while
    # the longest MC chain needs ~35, so ~75% of iterations run at <2%
    # occupancy (measured occupancy integral 0.064 at production cutoffs,
    # E=512).  Windowing keeps per-iteration cost at the N-event level
    # while amortizing the tail over the whole batch.  Per-event results
    # are BITWISE IDENTICAL to the unwindowed engine (MC draws are keyed by
    # (event key, node index); slot allocation is per event) — only the
    # iteration schedule changes.  0 = off (window == E, per-batch engine);
    # driver auto on TPU pairs event_batch=2048 with tree_window=128.
    tree_window: int = static_field(0)
    # Device->host transfer budget for the finals pack: the driver ships the
    # batch's final nodes as ONE globally-compacted array sized
    # finals_cap_per_event * event_batch rows (tree.compact_finals_global).
    # The observed population is ~2-3 finals/event at production cutoffs;
    # raise this if a run aborts with a finals-capacity error.
    finals_cap_per_event: int = static_field(8)
    # Conversion-probability evaluation width per tree iteration: crossings
    # are a small fraction of launched lanes, so P is evaluated on the W2
    # first crossing lanes (index-packed) with a fallback to all lanes on
    # overflow.  0 = auto (tree_queue_width/4, never below 128).
    tree_prob_width: int = static_field(0)
    # Megakernel engine: evaluate the conversion probability IN-KERNEL at
    # each recorded crossing (ops/megakernel._prob_nd) instead of a separate
    # XLA batch after the launch.  Saves one device dispatch (+ its top_k
    # packing) per tree iteration and is required by the in-kernel MC chain
    # collapse.  Automatically off for configurations _prob_nd does not
    # cover (isotropic / boundary-layer / flat scenes) and on the pool
    # engine.  0 disables (host-side _prob_batch everywhere, the pre-round-3
    # behavior).
    in_kernel_prob: int = static_field(1)
    # Megakernel engine: per-launch iteration budget for the BACKTRACE's
    # staged straggler compaction (ops/megakernel.integrate_mega_chunked).
    # The production backtrace integrates every event to t_end with a
    # heavy-tailed step count, so one launch runs each 128-lane tile until
    # its slowest lane finishes; the chunked engine relaunches in bounded
    # slices and compacts survivors into geometrically shrinking buffers.
    # 0 = single launch.  Applies to the mega engine only (the pool path
    # has ops/streaming.CompactedPropagator for the same job).
    # DEFAULT 0: inside the production pipeline the chunked backtrace is a
    # measured NON-lever — the phase alone improves (56.6 -> 49.5 ms at the
    # deep batch shape, scripts/probe_backtrace_chunked.py) but end-to-end
    # it LOSES 10% (BENCH_DEEP 16k events: 5011 ev/s chunk=0 vs 4493
    # chunk=64, identical rows) — the extra relaunch dispatches serialize
    # against the async sample-ahead overlap.  Chunking pays off only for
    # standalone heavy-tailed launches (bench.py headline: 40.8k -> 126k
    # rays/s via integrate_mega_chunked at 65k rays).
    backtrace_chunk: int = static_field(0)
    # Megakernel engine: collapse the pure-MC tree chain INTO the kernel
    # (ops/megakernel with_chain): once an event is in MC mode with a single
    # pending node, the kernel continues through crossings (in-kernel
    # conversion probability + pre-drawn per-node uniforms, species flip,
    # axion-shell renorm) instead of returning to the host after each.
    # MEASURED NON-LEVER, default OFF: a chain lane converts lockstep steps
    # that were SHARED with other events' nodes into exclusive ones (its
    # tile spins for the whole chain), and the iteration count barely drops
    # because pre-MC branching depth dominates — deep pipeline 407 vs 1507
    # ev/s, default cutoffs 1021 vs 2380 (round-3 A/B via BENCH_MC_CHAIN).
    # The machinery is exact w.r.t. the per-node engine and equivalence-
    # tested (tests/test_tree_mega.py); it would pay only with an in-kernel
    # active-lane repack across tiles.  mc_chain_slots bounds the crossings
    # recorded per launch.  Requires in_kernel_prob.
    mc_chain: int = static_field(0)
    mc_chain_slots: int = static_field(8)
    # Endgame gate: a chain lane stretches its LAUNCH to the chain's length
    # (all tiles in lockstep wait on the slowest lane), so collapsing chains
    # while many events still have ordinary work makes every iteration as
    # slow as the deepest chain.  Chains are therefore enabled only once the
    # active-event count drops to <= E / mc_chain_gate (the endgame, where
    # the queue is chain-dominated and iterations would otherwise be mostly
    # idle).  0 = always chain.
    mc_chain_gate: int = static_field(4)
    # Forward-tree engine: "queue" (the host work-queue/streaming-window
    # engine, ops/tree.forward_tree — the general path, required for tree
    # dumps / saveMode >= 2) or "kernel" (ops/treekernel.forward_tree_kernel
    # — whole trees run INSIDE one Pallas launch, each lane an event with a
    # per-lane pending-node queue in VMEM; exact per-node reference cutoff
    # accounting, host-engine uniform stream).  "kernel" requires
    # engine="mega" + in_kernel_prob + a megakernel.can_prob scene and
    # serves the production saveMode<=1 contract (finals pack + counters);
    # anything else silently falls back to "queue".  Events needing more
    # than tree_kernel_finals final nodes are replayed exactly by the host
    # engine under the same jit.
    #
    # saveMode >= 2 DECISION (recorded round 4): the driver downgrades
    # "kernel" to "queue" permanently rather than hybridizing.  Tree dumps
    # need every node's trajectory/crossing records (saveNode,
    # MainRunner.jl:17-65), which the kernel engine deliberately never
    # materializes — that is the source of its speed (VMEM-resident queue,
    # finals-only output).  A hybrid (kernel finals + host re-run of dumped
    # events) would run the host engine on EXACTLY the events being dumped,
    # i.e. all of them at saveMode 3 — the kernel pass would add cost and
    # save none.  Device meshes KEEP the kernel engine (the driver's shard
    # path is collective-free; validated bitwise in tests/test_sharding.py).
    tree_engine: str = static_field("queue")
    # In-kernel finals capacity per event (output-block slots).  Finals are
    # bounded by num_cutoff per the reference's per-node check, so any value
    # >= num_cutoff (the effective NF is min of the two) means overflow is
    # impossible and the host-replay pass is dropped AT TRACE TIME — the
    # fast path.  Smaller values trade VMEM + per-record write cost against
    # the replay pass, whose per-iteration glue scales with the full batch
    # (measured ~2 s for 39 replayed events of a 2048 deep batch — avoid).
    # 64 covers both the default (5) and production (50) cutoff sets.
    tree_kernel_finals: int = static_field(64)
    # Per-launch iteration budget of the in-kernel tree engine.  0 = one
    # launch runs every tree to completion (tile lockstep spans the whole
    # batch tail); > 0 relaunches in bounded slices with all-done tiles
    # skipping via the kernel's tile_run gate (straggler containment like
    # megakernel.integrate_mega_chunked, without the compaction pyramid —
    # the event batch is only ~16 tiles).
    tree_kernel_chunk: int = static_field(0)
    # In-kernel REFILL engine (ops/treekernel._tree_kernel_refill): instead
    # of one-lane-per-event + host relaunch/repack, 128 lanes serve a
    # per-tile event partition from an in-kernel queue — a lane whose tree
    # completes scatters its counters/finals to the per-event output via a
    # one-hot MXU matmul and gathers the next unstarted event's init rows
    # from a VMEM-resident table, so intra-tile lockstep idling (the
    # relaunch engine's remaining waste) becomes useful work.  0 = off
    # (relaunch engine); 1 = auto partition (1024 events/tile); >= 128 =
    # explicit events-per-tile partition.  Takes precedence over
    # tree_kernel_chunk.  Env overrides for sweeps: TREEK_REFILL,
    # TREEK_REFILL_K.
    # MEASURED NON-LEVER on v5e (scripts/probe_treekernel_tpu.py, S=2048
    # deep production cutoffs, 2026-08): refill auto/k4/k8/k32 all 88-90 ms,
    # explicit partition 512 -> 94 ms, 256 -> 118 ms, vs the relaunch
    # engine's 82-87 ms (census class identical, 0.9897 vs 0.9902 bitwise).
    # The per-boundary one-hot gather/scatter matmul block costs ~8% more
    # than the intra-tile idle it recovers at the production tree depth
    # (median event finishes in ~2 nodes, so most refill boundaries move
    # nothing), and the faster hand-adjoint RHS only widens the gap (the
    # refill overhead is MXU-fixed while the idle it reclaims shrank 1.3x).
    # Kept available for deeper-tree workloads (mc_nodes >> 10).
    tree_refill: int = static_field(0)
    # Refill boundary period (iterations between queue pulls): a completed
    # lane idles at most tree_refill_k - 1 steps; smaller values refill
    # sooner but fire the gather/scatter matmul block more often.
    tree_refill_k: int = static_field(8)
    # Physics-evaluation dtype: "state" (follow the state dtype) or "f32".
    # On TPU, f64 is software-emulated and both slow and compile-heavy; the
    # mixed scheme keeps the integration state and step arithmetic in f64
    # while evaluating fields/Hamiltonians in f32 (hardware precision of TPU
    # transcendentals anyway) — endpoint error ~ sqrt(N_steps) * 1e-7 stays
    # far below the 1e-4 parity contract (BASELINE.md).
    compute_dtype: str = static_field("state")


@_pytree_dataclass
class TreeConfig:
    """Monte-Carlo tree engine parameters (Gen_Samples.jl:94-120)."""

    prob_cutoff: Any = 1e-10    # --probCutoff
    # --- static (control loop bounds / buffer sizes) ---
    num_cutoff: int = static_field(5)     # --numCutoff
    mc_nodes: int = static_field(5)       # --MCNodes
    max_nodes: int = static_field(50)     # --maxNodes
    n_max_sample: int = static_field(6)   # n_maxSample (fixed block, Gen_Samples.jl:174)
    # Conversion-surface sampling measure: True = flat disk measure
    # (find_samples_new, production); False = the legacy 1/r measure of
    # find_samples (RayTracer.jl:1656-1799).
    flat_sampling: bool = static_field(True)
    # Resonance-scan resolution of the reference's fixed block
    # (ntimes_ax, Gen_Samples.jl:169); the sampler's dense line grid plays
    # this role (sampler.default_n_grid matches the production Euler+
    # interp_points resolution when this is left at the default).
    ntimes_ax: int = static_field(50000)


def default_ln_t_end(scene: Scene):
    """Upper log-time bound: one rotation period (MainRunner.jl:412)."""
    return jnp.log(1.0 / scene.omega_pul)
