#!/usr/bin/env python
"""Corrected stream-ordering probe (probe_fetch.py's test 2 hit the cached
host copy of an already-fetched array).  Uses a FRESH 1MB result each time:
dispatch it, host-sleep so the device surely finished it, enqueue a long
kernel, then time np.asarray of the 1MB result.  If the fetch returns in
~50 ms the tunnel serves transfers while compute runs; if it returns in
~kernel-wall the device stream serializes transfers behind enqueued compute.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def long_kernel(a):
    def body(i, a):
        return a @ a * 1e-3 + 1.0
    return jax.lax.fori_loop(0, 2000, body, a)


@jax.jit
def make_pack(seed):
    x = jnp.full((256 * 1024,), seed, jnp.float32)
    return x * 1.0001 + 3.0


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform}")
    a = jnp.ones((2048, 2048), jnp.float32) * 1e-3

    # calibrate the long kernel: dispatch -> tiny fetch
    r = long_kernel(a)
    np.asarray(r[0:1, 0])  # compile
    t0 = time.perf_counter()
    r = long_kernel(a)
    np.asarray(r[0:1, 0])
    t_k = time.perf_counter() - t0
    print(f"long kernel wall (incl 1-elem fetch): {t_k*1e3:.0f} ms")

    # baseline: fresh 1MB pack fetch, idle device
    p = make_pack(1.0)
    time.sleep(0.3)
    t0 = time.perf_counter()
    np.asarray(p)
    t_idle = time.perf_counter() - t0
    print(f"fresh 1MB fetch, idle: {t_idle*1e3:.1f} ms")

    # the real test: fresh pack computed, THEN long kernel enqueued, then fetch
    p = make_pack(2.0)
    time.sleep(0.3)            # device surely finished the pack
    r = long_kernel(a)         # enqueue long compute AFTER the pack
    t0 = time.perf_counter()
    np.asarray(p)
    t_busy = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(r[0:1, 0])
    t_tail = time.perf_counter() - t0
    print(f"fresh 1MB fetch, long kernel enqueued after it: {t_busy*1e3:.1f} ms"
          f" (kernel tail {t_tail*1e3:.0f} ms)")
    if t_busy < 0.5 * t_k:
        print("=> transfers are served WHILE compute runs (fetch can hide "
              "under the next batch)")
    else:
        print("=> transfers SERIALIZE behind enqueued compute (fetch cost is "
              "unavoidable device time; shrink bytes instead)")

    # and: fetch requested while the kernel that PRODUCED the pack's
    # successor is running — i.e. fetch of old result during current compute
    p1 = make_pack(3.0)
    time.sleep(0.3)
    r = long_kernel(a)
    time.sleep(0.05)           # kernel definitely started
    t0 = time.perf_counter()
    np.asarray(p1)
    t_mid = time.perf_counter() - t0
    np.asarray(r[0:1, 0])
    print(f"fresh 1MB fetch mid-kernel: {t_mid*1e3:.1f} ms")


if __name__ == "__main__":
    main()
