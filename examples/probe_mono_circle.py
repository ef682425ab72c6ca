"""Per-frame diagnostic probe for the mono circle loss (dev tool).

Prints state / track path / inliers / map size per frame around the
rotation-dominant arc where tracking historically dies.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--radius", type=float, default=1.5)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from orbslam2_tpu.config import (
        CameraSettings, OrbSettings, Settings, TpuSettings,
    )
    from orbslam2_tpu.models.system import SlamSystem, Sensor
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
        cam, n_frames=args.frames, circle_radius=args.radius,
        with_depth=False, seed=args.seed,
    )

    sys_ = SlamSystem(settings, Sensor.MONOCULAR)
    sys_.tracker.use_fused = args.fused
    for i in range(args.frames):
        sys_.track_monocular(seq.images[i], seq.timestamps[i])
        t = sys_.tracker
        m = t.map
        n_kf = int(m.n_kf)
        n_pt = int(m.pt_valid.sum())
        nb = (
            int((t.last_bindings >= 0).sum())
            if t.last_bindings is not None else -1
        )
        # Ground-truth-visible map points (how many valid points project
        # into the gt camera) to separate "map starved" from "match failed".
        T_gt = np.linalg.inv(seq.poses_wc[i])
        pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
        pc = (T_gt[:3, :3] @ pts.T).T + T_gt[:3, 3]
        z = pc[:, 2]
        uv = pc[:, :2] / np.maximum(z[:, None], 1e-6) * 320.0 + np.array(
            [160.0, 120.0]
        )
        inview = int(
            ((z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < 320)
             & (uv[:, 1] >= 0) & (uv[:, 1] < 240)).sum()
        )
        print(
            f"f={i:3d} st={t.state} path={t.metrics['track_path']:6s} "
            f"inl={t.metrics['last_inliers']:4d} kf={n_kf:3d} pt={n_pt:5d} "
            f"bound={nb:4d} gt_inview={inview:5d}"
        )


if __name__ == "__main__":
    main()
