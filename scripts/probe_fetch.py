#!/usr/bin/env python
"""Characterize the tunneled device->host link: fetch cost vs payload size,
and whether a fetch of an ALREADY-COMPUTED array overlaps compute that was
enqueued after it (stream-ordering).  Drives the driver's finals-fetch
amortization design (VERDICT r3 item 2: t_fetch is ~35% of pipeline wall).

Questions answered:
  1. latency/bandwidth split: t(bytes) for 4 KB .. 8 MB payloads;
  2. does np.asarray(A) — A computed BEFORE a long kernel K was enqueued —
     return in t(bytes), or only after K finishes (single-stream device)?
  3. does stacking N ~1 MB arrays into one fetch beat N separate fetches?
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def t_fetch(x):
    t0 = time.perf_counter()
    np.asarray(x)
    return time.perf_counter() - t0


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")

    # --- 1. fetch cost vs size ---
    print("\n-- fetch cost vs payload (device idle) --")
    for kb in (4, 64, 256, 1024, 2048, 4096, 8192):
        n = kb * 256  # f32 elements
        x = jnp.ones((n,), jnp.float32) * 2.0
        np.asarray(x)  # settle
        ts = [t_fetch(x + i) for i in range(1, 4)]  # fresh arrays, warm path
        print(f"  {kb:5d} KB: {min(ts)*1e3:7.1f} ms (min of 3)  "
              f"{kb/1024/min(ts):7.1f} MB/s")

    # --- 2. stream ordering: fetch vs enqueued compute ---
    # long_kernel: ~0.5-1 s of matmul chained on device
    @jax.jit
    def long_kernel(a):
        def body(i, a):
            return a @ a * 1e-3 + 1.0
        return jax.lax.fori_loop(0, 400, body, a)

    a = jnp.ones((2048, 2048), jnp.float32) * 1e-3
    r = long_kernel(a)
    np.asarray(r)  # compile + settle
    t0 = time.perf_counter()
    r = long_kernel(a)
    np.asarray(r[0, 0])
    t_k = time.perf_counter() - t0
    print(f"\n-- long kernel wall: {t_k*1e3:.0f} ms --")

    x1mb = jnp.ones((256 * 1024,), jnp.float32) + 1.0
    np.asarray(x1mb[0])  # ensure computed
    t_idle = t_fetch(x1mb)
    r = long_kernel(a)  # enqueue AFTER x1mb is done
    t_busy = t_fetch(x1mb)
    np.asarray(r[0, 0])
    print(f"1MB fetch idle: {t_idle*1e3:.1f} ms   "
          f"while long kernel enqueued: {t_busy*1e3:.1f} ms")
    verdict = ("transfers OVERLAP compute" if t_busy < 0.5 * t_k
               else "transfers SERIALIZE behind enqueued compute")
    print(f"=> {verdict}")

    # --- 3. N separate 1MB fetches vs one stacked N MB fetch ---
    print("\n-- 4 x 1MB separate vs one stacked 4MB --")
    xs = [jnp.ones((256 * 1024,), jnp.float32) + i for i in range(4)]
    for x in xs:
        np.asarray(x[0])
    t0 = time.perf_counter()
    for x in xs:
        np.asarray(x)
    t_sep = time.perf_counter() - t0
    stack = jax.jit(lambda *a: jnp.stack(a))
    s = stack(*xs)
    np.asarray(s[0, 0])
    s = stack(*xs)
    t_stk = t_fetch(s)
    print(f"  separate: {t_sep*1e3:.1f} ms   stacked: {t_stk*1e3:.1f} ms")

    # --- 4. copy_to_host_async then np.asarray after compute ---
    print("\n-- async copy started before long kernel, collected after --")
    x1 = jnp.ones((256 * 1024,), jnp.float32) * 3.0
    np.asarray(x1[0])
    x1.copy_to_host_async()
    r = long_kernel(a)
    t0 = time.perf_counter()
    np.asarray(x1)
    t_async = time.perf_counter() - t0
    tk0 = time.perf_counter()
    np.asarray(r[0, 0])
    t_tail = time.perf_counter() - tk0
    print(f"  collect after async+enqueue: {t_async*1e3:.1f} ms "
          f"(kernel tail then took {t_tail*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
