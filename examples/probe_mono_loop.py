"""Probe: monocular loop closure at realistic landmark density.

STATUS.md limitation #1 follow-up — run the 84-frame circular trajectory
monocularly at n_points=1500 (where mono tracking holds lock), with the
BoW+Sim3 loop-closing path enabled, and report whether a loop edge fires
and what the Sim3-aligned ATE is with/without loop closing.

Usage: JAX_PLATFORMS=cpu python examples/probe_mono_loop.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=84)
    ap.add_argument("--points", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--no-ba", action="store_true",
                    help="disable local BA to amplify drift")
    args = ap.parse_args()

    import numpy as np

    from orbslam2_tpu.config import (
        CameraSettings, OrbSettings, Settings, TpuSettings,
    )
    from orbslam2_tpu.models.system import SlamSystem, Sensor
    from orbslam2_tpu.ops.bow import train_vocabulary
    from orbslam2_tpu.ops.extractor import OrbExtractor
    from orbslam2_tpu.utils import synthetic

    settings = Settings(
        camera=CameraSettings(
            fx=320.0, fy=320.0, cx=160.0, cy=120.0,
            k1=0, k2=0, p1=0, p2=0, k3=0,
            width=320, height=240, bf=0.0, th_depth=40.0,
            depth_map_factor=1.0,
        ),
        orb=OrbSettings(n_features=800, n_levels=4),
        tpu=TpuSettings(),
    )
    cam = settings.camera_model()
    seq = synthetic.make_loop_sequence(
        cam, n_frames=args.frames, circle_radius=1.5,
        with_depth=False, seed=args.seed, n_points=args.points,
    )

    ex = OrbExtractor(settings.orb, settings.tpu)
    descs = np.concatenate([
        (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(seq.images[i]))
        for i in range(0, args.frames, 6)
    ])
    vocab = train_vocabulary(descs, k=10, levels=4, seed=0)

    for lc_on in (True,):
        sys_ = SlamSystem(settings, Sensor.MONOCULAR, vocabulary=vocab,
                          enable_loop_closing=lc_on)
        if args.no_ba:
            sys_.local_mapper.enable_ba = False
        # Diagnostics: log candidates + Sim3 gate outcomes per keyframe.
        lc = sys_.loop_closer
        orig_detect = lc.db.detect_loop_candidates
        orig_sim3 = lc._compute_sim3

        def detect(m, kf_id, n_candidates=3, _o=orig_detect, **kw):
            ids, scores, groups = _o(m, kf_id, n_candidates, **kw)
            if len(ids):
                print(f"  kf={kf_id} cands={list(zip(ids.tolist(), np.round(scores, 3).tolist()))} streak={lc.candidate_streak}")
            return ids, scores, groups

        def sim3(m, kf_c, kf_l, _o=orig_sim3):
            r = _o(m, kf_c, kf_l)
            print(f"  kf={kf_c} sim3 vs {kf_l}: {'ACCEPT' if r is not None else 'reject'}")
            return r

        lc.db.detect_loop_candidates = detect
        lc._compute_sim3 = sim3
        states = []
        t0 = time.time()
        for i in range(args.frames):
            sys_.track_monocular(seq.images[i], seq.timestamps[i])
            states.append(sys_.tracking_state())
        ate = synthetic.ate_rmse(sys_.poses_wc(), seq.poses_wc,
                                 with_scale=True)
        loops = ([(a, b) for a, b, _ in sys_.loop_closer.loop_edges]
                 if sys_.loop_closer else [])
        n_kf = int(np.asarray(sys_.tracker.map.kf_valid).sum())
        rej = {k: v for k, v in lc.metrics.items() if "sim3_reject" in k}
        print(f"lc={lc_on}: ATE(Sim3)={ate:.4f} lost={states.count(2)} "
              f"loops={loops} kf={n_kf} rej={rej} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
