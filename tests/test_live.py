"""Live-driver layer (utils/live): approximate-time pairing + end-to-end
feed of an out-of-order, jittered RGB-D stream (the ROS-node capability,
SURVEY.md §2.4)."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.system import Sensor, SlamSystem
from orbslam2_tpu.utils import synthetic
from orbslam2_tpu.utils.live import ApproxTimeSync, LiveDriver


class TestApproxTimeSync:
    def test_pairs_jittered_streams(self):
        got = []
        s = ApproxTimeSync(slop=0.02, callback=lambda t, a, b: got.append((t, a, b)))
        for i in range(10):
            s.put_a(i * 0.1, f"a{i}")
            s.put_b(i * 0.1 + 0.008, f"b{i}")  # 8 ms offset, within slop
        assert len(got) == 10
        assert all(a[1:] == b[1:] for _, a, b in got)

    def test_drops_unmatched(self):
        got = []
        s = ApproxTimeSync(slop=0.01, callback=lambda t, a, b: got.append(t))
        s.put_a(0.0, "a0")
        s.put_b(0.5, "b0")   # 0.5 s apart: no pair, a0 dropped
        s.put_a(0.501, "a1")
        assert len(got) == 1 and s.dropped == 1

    def test_prefers_closest(self):
        got = []
        s = ApproxTimeSync(slop=0.1, callback=lambda t, a, b: got.append((a, b)))
        s.put_a(0.00, "a0")
        s.put_a(0.05, "a1")
        s.put_b(0.06, "b0")
        # a1 (6->1 ms away) must win over a0 (60 ms away).
        assert got == [("a1", "b0")]


class TestLiveDriver:
    def test_rgbd_stream_tracks(self):
        s = Settings(
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
        cam = s.camera_model()
        seq = synthetic.make_sequence(
            cam, n_frames=14, n_points=400, with_depth=True, seed=11
        )
        sys = SlamSystem(s, Sensor.RGBD)
        drv = LiveDriver(sys, "rgbd", slop=0.02)
        rng = np.random.default_rng(0)
        for i in range(14):
            t = seq.timestamps[i]
            # Jittered, rgb-first/depth-first alternating arrival order.
            jit = float(rng.uniform(0, 0.005))
            if i % 2:
                drv.feed_depth(seq.depths[i], t + jit)
                drv.feed_rgb(seq.images[i], t)
            else:
                drv.feed_rgb(seq.images[i], t)
                drv.feed_depth(seq.depths[i], t + jit)
        assert drv.frames == 14
        assert sys.tracking_state() == 1
        drv.shutdown()
        est = sys.poses_wc()
        ate = synthetic.ate_rmse(est, seq.poses_wc, with_scale=False)
        assert ate < 0.05, f"live rgbd ATE {ate}"

    @pytest.mark.slow
    def test_stereo_stream_with_rectify_hook(self):
        """Stereo topics arriving out of order, through a rectification
        hook (ros_stereo.cc's do_rectify path)."""
        s = Settings(
            camera=CameraSettings(
                fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                k1=0, k2=0, p1=0, p2=0, k3=0,
                width=320, height=240, bf=160.0, th_depth=40.0,
                depth_map_factor=1.0,
            ),
            orb=OrbSettings(n_features=800, n_levels=4),
            tpu=TpuSettings(max_keypoints=1024, max_keyframes=96,
                            max_points=8192, min_init_matches=50),
        )
        cam = s.camera_model()
        seq = synthetic.make_sequence(
            cam, n_frames=12, n_points=400, stereo_baseline=0.5, seed=13,
            radius=0.4, forward=0.8,
        )
        sys = SlamSystem(s, Sensor.STEREO)
        calls = {"n": 0}

        def rect(img):
            calls["n"] += 1
            return img  # identity maps (already-rectified input)

        drv = LiveDriver(sys, "stereo", slop=0.02, rectify=(rect, rect))
        for i in range(12):
            t = float(seq.timestamps[i])
            if i % 2:
                drv.feed_stereo_right(seq.images[i][1], t + 0.003)
                drv.feed_stereo_left(seq.images[i][0], t)
            else:
                drv.feed_stereo_left(seq.images[i][0], t)
                drv.feed_stereo_right(seq.images[i][1], t + 0.003)
        assert drv.frames == 12
        assert calls["n"] == 24, "rectify hook must run on every pair"
        assert sys.tracking_state() == 1
        drv.shutdown()
        ate = synthetic.ate_rmse(sys.poses_wc(), seq.poses_wc, with_scale=False)
        assert ate < 0.15, f"live stereo ATE {ate}"
