"""Probe: does post-loop global BA help now that the loop fuse applies
full MapPoint::Replace semantics?  Reproduces STATUS.md limitation #2's
measurement (loop fixture ATE with/without enable_gba).

Usage: JAX_PLATFORMS=cpu python examples/probe_gba.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
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
            width=320, height=240, bf=160.0, th_depth=40.0,
            depth_map_factor=1.0,
        ),
        orb=OrbSettings(n_features=800, n_levels=4),
        tpu=TpuSettings(),
    )
    cam = settings.camera_model()
    seq = synthetic.make_loop_sequence(
        cam, n_frames=84, circle_radius=1.5, with_depth=True, seed=5
    )
    ex = OrbExtractor(settings.orb, settings.tpu)
    descs = np.concatenate([
        (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(seq.images[i]))
        for i in range(0, 84, 6)
    ])
    vocab = train_vocabulary(descs, k=10, levels=4, seed=0)

    for gba in (False, True):
        sys_ = SlamSystem(settings, Sensor.RGBD, vocabulary=vocab,
                          enable_loop_closing=True)
        sys_.loop_closer.enable_gba = gba
        sys_.local_mapper.enable_ba = False  # amplify drift (as in the test)
        t0 = time.time()
        for i in range(84):
            sys_.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
        ate = synthetic.ate_rmse(sys_.poses_wc(), seq.poses_wc,
                                 with_scale=False)
        loops = [(a, b) for a, b, _ in sys_.loop_closer.loop_edges]
        print(f"gba={gba}: ATE={ate:.4f} loops={loops} "
              f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
