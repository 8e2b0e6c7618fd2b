"""Probe: deep-cutoff time attribution on TPU at E=512.

Times kinematics / backtrace / forward_tree separately (jitted, warm), and
prints the forward tree's per-iteration occupancy profile (done_it) so the
batch-tail waste can be sized against a streaming/tail-harvest design."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.driver import _event_kinematics
from adiabatic_raytracer_tpu.models.magnetosphere import conversion_surface_radius
from adiabatic_raytracer_tpu.ops import sampler, tree

SC = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
E = 512
maxR = float(conversion_surface_radius(SC.mass_a, SC.theta_m, SC.omega_pul,
                                       SC.b0, SC.r_ns))
n_grid = sampler.default_n_grid(maxR)
key = jax.random.PRNGKey(1769)
xs, vs, es = [], [], []
got = 0
while got < E:
    key, sub = jax.random.split(key)
    res = sampler.sample_batch(sub, 4096, maxR, SC, SC.mass_ns, n_grid=n_grid)
    ok = np.nonzero(np.asarray(res.success))[0]
    xs.append(np.asarray(res.xpos[ok]))
    vs.append(np.asarray(res.v_loc[ok]))
    es.append(np.asarray(res.erg_inf[ok]))
    got += len(ok)
x = jnp.asarray(np.concatenate(xs)[:E])
v = jnp.asarray(np.concatenate(vs)[:E])
e = jnp.asarray(np.concatenate(es)[:E])

cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32", engine="mega")
tcfg = TreeConfig(prob_cutoff=1e-10, num_cutoff=50, mc_nodes=10, max_nodes=100)
LNT_END = float(np.log(1.0 / SC.omega_pul))

kin = jax.jit(lambda x, v, e: _event_kinematics(x, v, e, maxR, SC, tcfg,
                                                cfg.compute_dtype))
bt_f = jax.jit(lambda x, k, e: tree.backtrace(x, k, e, SC, cfg, tcfg,
                                              lnt_end=LNT_END))
fw_f = jax.jit(lambda ks, x, k, e: tree.forward_tree(ks, x, k, e, SC, cfg,
                                                     tcfg, lnt_end=LNT_END))
keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(3), i))(
    jnp.arange(E))


def sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0])  # force a real fetch (axon)


def t(f, *a, reps=3):
    out = f(*a)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


tk, (k_init, *_rest) = t(kin, x, v, e)
tb, bt = t(bt_f, x, k_init, e)
tf, tr = t(fw_f, keys, x, k_init, e)
n_iters = int(np.asarray(tr.n_iters)[0])
done_it = np.asarray(tr.done_it)
# occupancy integral: sum over iterations of active-event count
active_per_iter = np.array([(done_it > i).sum() for i in range(n_iters)])
print(f"kinematics: {tk*1e3:.1f} ms")
print(f"backtrace:  {tb*1e3:.1f} ms")
print(f"forward:    {tf*1e3:.1f} ms  n_iters={n_iters} "
      f"({tf/n_iters*1e3:.2f} ms/iter)")
print("done_it percentiles:",
      np.percentile(done_it, [50, 75, 90, 95, 99, 100]).round(1))
print("active events at iter 0,2,4,8,12,16,24,32,...:",
      [int(active_per_iter[i]) for i in
       [0, 2, 4, 8, 12, 16, 24, 32] if i < n_iters],
      "tail:", active_per_iter[-5:].tolist())
occ = active_per_iter.sum() / (n_iters * E)
print(f"occupancy integral: {occ:.3f} "
      f"(perfect-refill iter bound ~= {active_per_iter.sum()/E:.1f} iters "
      f"vs {n_iters})")
