"""Fused single-dispatch tracking vs the step-by-step host state machine.

The fused program (models/track_fused.py) must implement the SAME decision
chain as the unfused host path (models/tracking.Tracker._track): motion
model + retry, ref-KF fallback, local map, rescue, keyframe policy.  XLA
fusion changes floating-point rounding, so trajectories are compared with
a tolerance, not bitwise.
"""

import numpy as np
import pytest

from orbslam2_tpu.models.system import SlamSystem, Sensor
from orbslam2_tpu.utils import synthetic

from test_slam_e2e import small_settings


def _run(sensor, use_fused, n_frames=24, pipeline=False, chunk=0):
    s = small_settings(bf=160.0)
    cam = s.camera_model()
    seq = synthetic.make_sequence(
        cam, n_frames=n_frames, with_depth=(sensor != Sensor.MONOCULAR),
        seed=3,
    )
    sys = SlamSystem(
        s, sensor, enable_loop_closing=False, pipeline=pipeline, chunk=chunk,
    )
    sys.tracker.use_fused = use_fused
    for i in range(n_frames):
        if sensor == Sensor.RGBD:
            sys.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
        else:
            sys.track_monocular(seq.images[i], seq.timestamps[i])
    sys.shutdown()
    return sys, seq


class TestFusedEquivalence:
    @pytest.mark.slow
    def test_rgbd_fused_matches_unfused(self):
        sys_f, seq = _run(Sensor.RGBD, True)
        sys_u, _ = _run(Sensor.RGBD, False)
        ate_f = synthetic.ate_rmse(sys_f.poses_wc(), seq.poses_wc, with_scale=False)
        ate_u = synthetic.ate_rmse(sys_u.poses_wc(), seq.poses_wc, with_scale=False)
        # Same decision chain; only XLA fusion rounding differs.
        assert abs(ate_f - ate_u) < 0.02, (ate_f, ate_u)
        assert ate_f < 0.08, ate_f
        assert int(sys_f.map.n_kf) == int(sys_u.map.n_kf)
        # Same tracking decisions frame by frame.
        assert sys_f.tracker.metrics["frames_lost"] == \
            sys_u.tracker.metrics["frames_lost"]

    def test_fused_is_single_dispatch_chain(self):
        """The fused path must run the per-frame hot loop through the ONE
        jitted program (plus the tiny flags readback) — guard against
        regressions that reintroduce per-step dispatches."""
        import jax

        sys_f, seq = _run(Sensor.RGBD, True, n_frames=6)
        tracker = sys_f.tracker
        step = tracker._get_fused_step("rgbd")
        # Steady-state non-KF frame: count traced executions via a counter
        # wrapper is impractical post-hoc; instead assert the step is a
        # compiled function and the tracker routes through it.
        assert tracker._fused_sensor == "rgbd"
        assert tracker.use_fused
        # Trajectory entries hold device arrays (no per-frame host sync).
        non_kf_entries = [t for t in tracker.trajectory if isinstance(
            t[1], jax.Array)]
        assert non_kf_entries, "fused path should log device-resident T_cr"


class TestPipelinedMode:
    def test_rgbd_pipelined(self):
        """Lag-1 flags readback (the reference's tracking/mapping thread
        split as a dispatch pipeline): keyframes enter the map one frame
        after their decision; accuracy must stay within the gate."""
        sys_p, seq = _run(Sensor.RGBD, True, pipeline=True)
        ate = synthetic.ate_rmse(sys_p.poses_wc(), seq.poses_wc, with_scale=False)
        assert ate < 0.10, ate
        assert len(sys_p.tracker.trajectory) == seq.images.shape[0]
        assert int(sys_p.map.n_kf) >= 3
        # Frames resolve one step late, but all resolve after shutdown().
        assert sys_p.tracker._pending is None
        assert sys_p.tracker.metrics["frames"] == seq.images.shape[0] - 1
        # (frame 0 is the stereo/RGB-D init frame, not a tracked frame)


class TestChunkedMode:
    @pytest.mark.slow
    def test_rgbd_chunked(self):
        """C frames per dispatch (lax.scan) with ON-DEVICE keyframe
        decision + insertion; mapping resolves after each chunk — the
        reference's tracking→LocalMapping queue with lag ≤ C."""
        sys_c, seq = _run(Sensor.RGBD, True, chunk=4)
        ate = synthetic.ate_rmse(sys_c.poses_wc(), seq.poses_wc, with_scale=False)
        assert ate < 0.10, ate
        # Frame 0 is the init frame; the rest all log a trajectory entry.
        assert len(sys_c.tracker.trajectory) == seq.images.shape[0]
        assert int(sys_c.map.n_kf) >= 3
        assert sys_c.tracker.metrics["frames"] == seq.images.shape[0] - 1
        assert not sys_c.tracker._chunk_buf  # tail flushed at shutdown

    @pytest.mark.slow
    def test_rgbd_chunk_tail_flush(self):
        """A sequence length that is NOT a chunk multiple: the tail runs
        through the single-frame path on the same device-chained ctx."""
        sys_c, seq = _run(Sensor.RGBD, True, n_frames=23, chunk=5)
        ate = synthetic.ate_rmse(sys_c.poses_wc(), seq.poses_wc, with_scale=False)
        assert ate < 0.10, ate
        assert len(sys_c.tracker.trajectory) == 23

    @pytest.mark.slow
    def test_mid_chunk_blackout_recovers(self):
        """A featureless blackout frame mid-chunk must not wreck the rest
        of the chunk: the next real frame re-acquires — by the in-scan
        ref-KF fallback when its match count clears the gate, else by the
        dispatcher's mid-chunk BoW relocalization walker — so only the
        blackout frame logs a bad trajectory entry."""
        from orbslam2_tpu.models.tracking import TrackState
        from orbslam2_tpu.ops.bow import train_vocabulary
        from orbslam2_tpu.ops.extractor import OrbExtractor

        s = small_settings(bf=160.0)
        cam = s.camera_model()
        n_frames = 24
        seq = synthetic.make_sequence(
            cam, n_frames=n_frames, with_depth=True, seed=3,
        )
        images = np.asarray(seq.images).copy()
        depths = np.asarray(seq.depths).copy()
        ex = OrbExtractor(s.orb, s.tpu)
        descs = np.concatenate([
            (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(images[i]))
            for i in range(0, n_frames, 4)
        ])
        vocab = train_vocabulary(descs, k=10, levels=4, seed=0)
        # Frame 13 = blackout (chunk=4 => position 1 of chunk [13..16]).
        images[13] = 0.0
        sys = SlamSystem(s, Sensor.RGBD, enable_loop_closing=False, chunk=4,
                         vocabulary=vocab)
        for i in range(n_frames):
            sys.track_rgbd(images[i], depths[i], seq.timestamps[i])
        sys.shutdown()
        tr = sys.tracker
        assert tr.state == TrackState.OK
        assert len(tr.trajectory) == n_frames
        # Frames 15+ must carry good poses (frame 14 is the re-acquire
        # frame; its ref-KF-only pose may be coarse).
        est = sys.poses_wc()[15:]
        gt = seq.poses_wc[15:]
        ate = synthetic.ate_rmse(est, gt, with_scale=False)
        assert ate < 0.12, ate
        # Only the blackout frame itself may be marked bad after frame 12.
        bad_tail = [t[0] for t in tr.trajectory if t[3] and t[0] >= 12]
        assert bad_tail in ([], [13]), bad_tail

    @pytest.mark.slow
    def test_mid_chunk_kidnap_relocalizes_and_requeues(self):
        """True kidnap mid-stream: the camera teleports back to an
        early-mapped region while the reference keyframe is on the other
        side of the circle.  The device-side ref-KF fallback cannot
        re-acquire (no view overlap); the dispatcher must BoW-relocalize
        at the first kidnapped frame and re-track the rest of the chunk
        from the relocalized ctx — not log garbage until the next chunk
        boundary (round-1 weakness)."""
        from orbslam2_tpu.models.tracking import TrackState

        from orbslam2_tpu.ops.bow import train_vocabulary
        from orbslam2_tpu.ops.extractor import OrbExtractor

        s = small_settings(bf=160.0)
        cam = s.camera_model()
        seq = synthetic.make_loop_sequence(
            cam, n_frames=48, circle_radius=1.5, with_depth=True, seed=5,
            n_points=900,
        )
        images = np.asarray(seq.images)
        depths = np.asarray(seq.depths)
        # Representative vocabulary (as the reference ships ORBvoc): the
        # BoW reloc candidates must rank by appearance, not noise.
        ex = OrbExtractor(s.orb, s.tpu)
        descs = np.concatenate([
            (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(images[i]))
            for i in range(0, 24, 4)
        ])
        vocab = train_vocabulary(descs, k=10, levels=4, seed=0)
        sys = SlamSystem(s, Sensor.RGBD, enable_loop_closing=False, chunk=4,
                         vocabulary=vocab)
        # Half circle (opposite side of the start), then kidnap to the
        # start region: frames 4..7 again.
        feed = list(range(24)) + [4, 5, 6, 7]
        for j, i in enumerate(feed):
            sys.track_rgbd(images[i], depths[i], float(j))
        sys.shutdown()
        tr = sys.tracker
        assert tr.metrics["relocalizations"] >= 1
        assert tr.state == TrackState.OK
        assert len(tr.trajectory) == len(feed)
        # The whole (kidnapped) trajectory must align against the ground
        # truth of the frames actually shown.
        ate = synthetic.ate_rmse(
            sys.poses_wc(), seq.poses_wc[feed], with_scale=False
        )
        # Bounded by the half-circle's own odometric drift (~0.24 without
        # any kidnap); what's under test is that the kidnap adds nothing.
        assert ate < 0.3, ate
        # And no garbage tail: at most the first kidnapped frame (where
        # the device discovered the loss) may be marked bad.
        bad_tail = [t[0] for t in tr.trajectory if t[3] and t[0] >= 24]
        assert bad_tail in ([], [24]), bad_tail
