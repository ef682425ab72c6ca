"""Micro-benchmark: fused Pallas FAST+NMS vs the XLA two-step path on the
real TPU, plus numerical parity at KITTI/TUM resolutions (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from orbslam2_tpu.ops import fast as fast_ops
    from orbslam2_tpu.ops.pallas_kernels import fast_score_nms_pallas

    xla = jax.jit(lambda im: fast_ops.nms3x3(fast_ops.fast_score(im)))
    pal = jax.jit(fast_score_nms_pallas)

    for (h, w) in [(480, 640), (376, 1241)]:
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (h // 4 + 2, w // 4 + 2)).astype(np.float32)
        img = np.kron(base, np.ones((4, 4), np.float32))[:h, :w]
        img += rng.uniform(0, 8, (h, w)).astype(np.float32)
        x = jnp.asarray(img)

        a = np.asarray(xla(x))
        b = np.asarray(pal(x))
        n_mismatch = int((np.abs(a - b) > 1e-3).sum())
        print(f"{h}x{w}: keypoints xla={int((a > 0).sum())} "
              f"pallas={int((b > 0).sum())} mismatched_px={n_mismatch}")

        for name, fn in [("xla", xla), ("pallas", pal)]:
            jax.block_until_ready(fn(x))
            t0 = time.perf_counter()
            iters = 50
            for _ in range(iters):
                y = fn(x)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"  {name:7s}: {dt:.3f} ms")


if __name__ == "__main__":
    main()
