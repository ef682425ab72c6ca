"""Benchmark: per-frame tracking throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's tracking-thread time on an i7-4790 CPU is
~25-40 ms/frame at 640x480 with 1000 features (TRO'17 Table V; SURVEY.md
§6), i.e. ~33 fps.  vs_baseline = our_fps / 33.

The benchmarked step is the COMPLETE per-frame tracking program of the
real pipeline (models/track_fused.py): ORB extraction (pyramid/FAST/NMS/
select/orient/describe), depth association, motion-model matching +
pose optimization, local-map harvest/match/optimize, and the keyframe
decision — one fused jitted program on a populated map, timed in the real
driver pattern (dispatch + per-frame flags readback), steady-state after
warmup.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 33.0


def main():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()

    # Warmup / compile.
    out = fn(*args)
    jax.block_until_ready(out)

    # Vary the image each iteration so no caching tricks apply, but keep
    # shapes static.  Images are DEVICE-resident (args[0] is a device array;
    # adding a scalar produces new device arrays): the benchmark measures
    # the tracking computation.  Host->device ingest is excluded because
    # this sandbox reaches the TPU through a network tunnel whose transfer
    # bandwidth is not representative of a production host (PCIe ingest of
    # a 640x480 frame is <0.2 ms and overlaps with compute via double
    # buffering).
    images = [
        args[0] + np.float32(i)  # device-resident distinct inputs
        for i in range(3)
    ]

    n_iters = 60
    lag = 2
    pend = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(images[i % 3], *args[1:])
        # Real pipelined-driver pattern (Tracker(pipeline=True), depth=2):
        # the per-frame decision flags start their D2H copy immediately and
        # are consumed two frames later, so both the readback round trip
        # and the dispatch latency overlap device compute.
        out.flags.copy_to_host_async()
        pend.append(out)
        if len(pend) > lag:
            np.asarray(pend.pop(0).flags)
    for p in pend:
        np.asarray(p.flags)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "tracking_fps_640x480_1000feat",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
