"""Probe the axon TPU runtime's host-sync cost model.

Round-3 finding that reshaped the performance work:

  * The FIRST device-to-host transfer in a process (any route: np.asarray,
    device_get, .item(), float(), tolist(), device_put-to-cpu, or lowering
    a program that closes over a device array — lowering fetches consts)
    permanently switches the runtime into a mode where EVERY subsequent
    host<->device synchronization costs ~30 ms.
  * Enqueues stay ~0.03 ms and device compute runs at full speed; the cost
    is per SYNC, not per dispatch.
  * There is no recovery and no alternate transfer route (dlpack is
    unimplemented on this PJRT plugin).

Design consequence: production code minimizes SYNC COUNT per unit work —
one packed readback per tracked chunk, one sync per mapping job, batched
loop-detection readbacks — and never closes over device arrays in jitted
programs (utils/noconsts.py guards that).

Run: python tools/axon_probe.py   (on the axon TPU; ~1 min)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


def main():
    x = jnp.zeros(8)
    triv = jax.jit(lambda x: x + 1)
    timeit("sync before first D2H", lambda: triv(x))

    np.asarray(jax.jit(lambda v: v * 2)(jnp.arange(8.0)))  # poison

    timeit("sync after first D2H", lambda: triv(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(50):
        y = triv(y)
    enq = time.perf_counter() - t0
    jax.block_until_ready(y)
    tot = time.perf_counter() - t0
    print(f"50 chained enqueues: {enq * 1e3:.1f} ms; + one sync: {tot * 1e3:.1f} ms")

    big = jnp.zeros((2048, 2048))
    mm = jax.jit(lambda a: a @ a)
    timeit("2048^3 matmul (incl. sync)", lambda: mm(big))


if __name__ == "__main__":
    main()
