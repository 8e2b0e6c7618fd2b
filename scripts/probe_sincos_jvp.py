#!/usr/bin/env python
"""Quantify the cost of differentiating THROUGH the software _sincos
polynomial in the megakernel RHS (XLA cost model, CPU lowering).

The RHS pulls 7 gradients out of one vjp of the nondimensionalized
Hamiltonian; each Hamiltonian eval calls _sincos three times (x2, x3,
omega*t).  Without a custom derivative JAX linearizes the Cody-Waite
range reduction + minimax polynomials; with a custom_jvp the tangent would be (cos*dx, -sin*dx)
from the already-computed primals.

MEASURED (2026-08, this probe) — NON-LEVER, do not implement:
  _rhs photon = 989 flops/lane, mixed = 1146;
  _sincos forward = 60 flops/lane, full vjp = 75 — the backward through
  the polynomial costs only ~15 flops because XLA's CSE shares the Horner
  z-powers between primal and tangent.  A custom_jvp saves ~12 flops x 3
  call sites = ~36/989 = 3.6% of the RHS slice = ~2% of a kernel step.
  And the kernel runs at 0.93% of VPU peak (BENCH_r03.json) — per-step
  cost is structural (intra-tile lockstep, Mosaic scheduling, selects),
  not arithmetic, so even that 2% would not appear on the wall.
"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from adiabatic_raytracer_tpu.config import Scene, NumericsConfig
from adiabatic_raytracer_tpu.ops import megakernel as mk


def cost(f, *args):
    c = jax.jit(f, backend="cpu").lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0))


def main():
    sc = Scene(mass_a=1e-5, ax_g=1e-12, theta_m=0.2, omega_pul=1.0,
               b0=1e14, r_ns=10.0, mass_ns=1.0)
    cfg = NumericsConfig(rtol=1e-7, atol=1e-6, compute_dtype="f32")
    C = mk.SceneConsts(sc, cfg)
    z = jnp.zeros((128,), jnp.float32)
    u7 = (z + 15.0, z + 1.0, z + 0.5, z + 0.3, z + 0.2, z + 0.1, z - 1e-5)
    for species in ("photon", "mixed"):
        C.species = species
        f = cost(lambda u, lnt: mk._rhs(C, u, lnt, z + 1e-5, z + 1.0),
                 u7, z - 5.0)
        print(f"species={species}: rhs flops/lane = {f / 128.0:.1f}")
    # isolated: vjp of one _sincos
    def sincos_grad(x):
        (s, c), vjp = jax.vjp(mk._sincos, x)
        return vjp((jnp.ones_like(s), jnp.ones_like(c)))[0]
    print(f"_sincos fwd flops/lane = {cost(mk._sincos, z + 0.7) / 128.0:.1f}")
    print(f"_sincos vjp flops/lane = {cost(sincos_grad, z + 0.7) / 128.0:.1f}")


if __name__ == "__main__":
    main()
