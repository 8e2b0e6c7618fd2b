"""TPU A/B: production backtrace phase, single megakernel launch vs the
staged-compaction chunked engine (propagate_mega chunk_iters)."""
import os
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from adiabatic_raytracer_tpu.config import NumericsConfig, Scene, TreeConfig
from adiabatic_raytracer_tpu.driver import _event_kinematics
from adiabatic_raytracer_tpu.ops import sampler, tree

E = int(os.environ.get("E", "2048"))
sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0, b0=1e14,
           r_ns=10.0, mass_ns=1.0)
cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32", engine="mega",
                     in_kernel_prob=1)
tcfg = TreeConfig()
maxR = float(os.environ.get("MAXR", "40.0"))
lnt_end = float(np.log(1.0 / sc.omega_pul))

# draw real conversion-surface events (oversample, take first E successes)
key = jax.random.PRNGKey(1769)
res = sampler.sample_batch(key, 16 * E, maxR, sc, sc.mass_ns,
                           n_grid=sampler.default_n_grid(maxR),
                           compute_dtype="f32", line_engine="pallas")
ok = np.asarray(res.success)
idx = np.nonzero(ok)[0][:E]
assert len(idx) == E, f"only {len(idx)} successes"
xpos = jnp.asarray(np.asarray(res.xpos)[idx])
v_loc = jnp.asarray(np.asarray(res.v_loc)[idx])
erg_inf = jnp.asarray(np.asarray(res.erg_inf)[idx])
k_init = jax.jit(lambda x, v, e: _event_kinematics(
    x, v, e, maxR, sc, tcfg, "f32"))(xpos, v_loc, erg_inf)[0]


def timeit(f, label):
    out = f(0.0)
    _ = np.asarray(out.n_cross)
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = f(1e-9 * (i + 1))
        _ = np.asarray(out.n_cross)
        dts.append(time.perf_counter() - t0)
    print(f"{label}: {min(dts)*1000:7.1f} ms  "
          f"ncr_mean {np.asarray(out.n_cross).mean():.3f}  "
          f"w_mean {np.asarray(out.weight).mean():.4e}")
    return out


def bt(eps, chunk=None):
    import dataclasses
    c = cfg if chunk is None else dataclasses.replace(cfg, backtrace_chunk=chunk)
    return tree.backtrace(xpos + eps, k_init, erg_inf, sc, c, tcfg,
                          lnt_end=lnt_end)


single = timeit(jax.jit(lambda e: bt(e)), "single ")
for chunk in [int(c) for c in os.environ.get("CHUNKS", "64").split(",")]:
    got = timeit(jax.jit(lambda e, c=chunk: bt(e, c)), f"chunk={chunk:4d}")
    a, b = np.asarray(single.n_cross), np.asarray(got.n_cross)
    print(f"   n_cross mismatches: {(a != b).sum()}/{E}")
