"""Benchmark: per-frame tracking throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's tracking-thread time on an i7-4790 CPU is
~25-40 ms/frame at 640x480 with 1000 features (TRO'17 Table V; SURVEY.md
§6), i.e. ~33 fps.  vs_baseline = our_fps / 33.

The benchmarked step is the COMPLETE per-frame tracking program of the
real pipeline (models/track_fused.py): ORB extraction (pyramid/FAST/NMS/
select/orient/describe), depth association, motion-model matching +
pose optimization, local-map harvest/match/optimize, and the keyframe
decision — run through the CHUNKED production driver (Tracker(chunk=C),
examples/run_dataset.py --chunk): C strictly-serial frames per device
dispatch via lax.scan, map + ctx threaded (donated) between dispatches,
one small flags readback per chunk.  Frames are NEVER batched — the scan
preserves the frame t -> t+1 dependence (SURVEY.md §7's honest-accounting
note); chunking only amortizes host dispatch latency, exactly like the
reference's free-running tracking thread that never waits on a scheduler.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 33.0
CHUNK = 8


def main():
    import jax

    from __graft_entry__ import entry_chunk

    step, args = entry_chunk(CHUNK)
    imgs, deps, m, ctx, fid0, allow = args

    # Three distinct device-resident input stacks so no caching tricks
    # apply while shapes stay static.  Host->device ingest is excluded:
    # this sandbox reaches the TPU through a network tunnel whose transfer
    # bandwidth is not representative of a production host (PCIe ingest of
    # a 640x480 frame is <0.2 ms and overlaps with compute via double
    # buffering).
    img_v = [imgs + np.float32(i) for i in range(3)]
    dep_v = [deps for _ in range(3)]

    # Warmup / compile (donated map: rethread).
    out = step(img_v[0], dep_v[0], m, ctx, fid0, allow)
    m, ctx = out.m, out.next_ctx
    jax.block_until_ready(out.flags)

    n_chunks = 40
    lag = 2
    pend = []
    t0 = time.perf_counter()
    for i in range(n_chunks):
        out = step(img_v[i % 3], dep_v[i % 3], m, ctx, fid0, allow)
        m, ctx = out.m, out.next_ctx
        # Real chunked-driver pattern: the per-chunk decision flags start
        # their D2H copy immediately and are consumed with a 2-chunk lag,
        # so the readback round trip overlaps device compute.
        out.flags.copy_to_host_async()
        pend.append(out.flags)
        if len(pend) > lag:
            np.asarray(pend.pop(0))
    for p in pend:
        np.asarray(p)
    jax.block_until_ready(out.flags)
    dt = (time.perf_counter() - t0) / (n_chunks * CHUNK)
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
