"""AR demo — the ros_mono_ar / ViewerAR 'example binary' equivalent
(SURVEY.md §2.4): track a sequence, RANSAC-fit the dominant plane in the
map, and render a virtual cube locked to it from the live camera poses.

Usage: python examples/ar_demo.py [--cpu] [--out /tmp/orbslam2_tpu_ar]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/orbslam2_tpu_ar")
    ap.add_argument("--frames", type=int, default=14)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from orbslam2_tpu.config import (
        CameraSettings, OrbSettings, Settings, TpuSettings,
    )
    from orbslam2_tpu.models.system import Sensor, SlamSystem
    from orbslam2_tpu.utils import synthetic
    from orbslam2_tpu.utils.ar import draw_ar_overlay, fit_plane_ransac

    settings = Settings(
        camera=CameraSettings(
            fx=320.0, fy=320.0, cx=160.0, cy=120.0,
            k1=0, k2=0, p1=0, p2=0, k3=0,
            width=320, height=240, bf=32.0, th_depth=40.0,
            depth_map_factor=1.0,
        ),
        orb=OrbSettings(n_features=800, n_levels=4),
        tpu=TpuSettings(max_keypoints=1024, max_keyframes=96,
                        max_points=8192, min_init_matches=50),
    )
    cam = settings.camera_model()
    seq = synthetic.make_sequence(
        cam, n_frames=args.frames, n_points=400, with_depth=True, seed=11
    )
    sys_ = SlamSystem(settings, Sensor.RGBD)
    poses = []
    for i in range(args.frames):
        T = sys_.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
        poses.append(np.asarray(T))
    sys_.tracker.flush()

    m = sys_.tracker.map
    plane = fit_plane_ransac(
        m.pt_pos, m.pt_valid, jax.random.PRNGKey(0), inlier_th=0.05
    )
    print(f"plane inliers={int(plane.n_inliers)} ok={bool(plane.ok)} "
          f"normal={np.asarray(plane.normal).round(3)}")

    os.makedirs(args.out, exist_ok=True)
    for i in (0, args.frames // 2, args.frames - 1):
        p = os.path.join(args.out, f"ar_{i:03d}.png")
        draw_ar_overlay(seq.images[i], poses[i], cam, plane, p, size=0.4)
        print("wrote", p)


if __name__ == "__main__":
    main()
