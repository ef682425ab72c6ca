"""examples/evaluate.py — the TUM-benchmark-compatible ATE/RPE harness."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "evaluate", os.path.join(os.path.dirname(__file__), "..", "examples",
                             "evaluate.py")
)
ev = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ev)


def _write_tum(path, ts, poses_wc):
    from orbslam2_tpu.models.system import _rot_to_quat

    with open(path, "w") as f:
        f.write("# ground truth\n")
        for t, T in zip(ts, poses_wc):
            q = _rot_to_quat(T[:3, :3])
            p = T[:3, 3]
            f.write(
                f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def _circle(n, r=2.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        T = np.eye(4)
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [r * np.cos(a), 0.0, r * np.sin(a)]
        if noise:
            T[:3, 3] += rng.normal(0, noise, 3)
        poses.append(T)
    return np.stack(poses)


class TestEvaluate:
    def test_ate_zero_for_identical(self, tmp_path):
        ts = np.arange(50) * 0.1
        gt = _circle(50)
        _write_tum(tmp_path / "gt.txt", ts, gt)
        _write_tum(tmp_path / "est.txt", ts + 0.004, gt)  # jittered stamps
        res = ev.evaluate_files(
            str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")
        )
        assert res["pairs"] == 50
        assert res["ate_rmse_m"] < 1e-5
        assert res["rpe_trans_rmse_m"] < 1e-5

    def test_ate_reports_known_noise(self, tmp_path):
        ts = np.arange(100) * 0.1
        gt = _circle(100)
        est = _circle(100, noise=0.05, seed=3)
        # A global SE3 offset must be absorbed by alignment.
        off = np.eye(4)
        off[:3, 3] = [5.0, -2.0, 1.0]
        est = np.einsum("ij,fjk->fik", off, est)
        _write_tum(tmp_path / "gt.txt", ts, gt)
        _write_tum(tmp_path / "est.txt", ts, est)
        res = ev.evaluate_files(
            str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")
        )
        assert 0.05 < res["ate_rmse_m"] < 0.13, res  # ~sqrt(3)*0.05
        assert res["gt_path_length_m"] > 10

    def test_sim3_alignment_absorbs_scale(self, tmp_path):
        ts = np.arange(60) * 0.1
        gt = _circle(60)
        est = gt.copy()
        est[:, :3, 3] *= 3.1  # mono scale ambiguity
        _write_tum(tmp_path / "gt.txt", ts, gt)
        _write_tum(tmp_path / "est.txt", ts, est)
        res_se3 = ev.evaluate_files(
            str(tmp_path / "est.txt"), str(tmp_path / "gt.txt"))
        res_sim3 = ev.evaluate_files(
            str(tmp_path / "est.txt"), str(tmp_path / "gt.txt"),
            with_scale=True)
        assert res_sim3["ate_rmse_m"] < 1e-5
        assert res_se3["ate_rmse_m"] > 1.0

    def test_kitti_format_roundtrip(self, tmp_path):
        gt = _circle(40)
        est = _circle(40, noise=0.02, seed=5)
        for name, P in (("gt.txt", gt), ("est.txt", est)):
            with open(tmp_path / name, "w") as f:
                for T in P:
                    f.write(" ".join(
                        f"{x:.9e}" for x in T[:3, :4].reshape(-1)) + "\n")
        res = ev.evaluate_files(
            str(tmp_path / "est.txt"), str(tmp_path / "gt.txt"), fmt="kitti"
        )
        assert res["pairs"] == 40
        assert 0.01 < res["ate_rmse_m"] < 0.08

    def test_matches_system_trajectory_output(self, tmp_path):
        """End-to-end: a SLAM run's saved TUM trajectory evaluated against
        a ground-truth file reproduces synthetic.ate_rmse."""
        from tests.test_slam_e2e import small_settings

        from orbslam2_tpu.models.system import Sensor, SlamSystem
        from orbslam2_tpu.utils import synthetic

        s = small_settings(bf=32.0)
        cam = s.camera_model()
        seq = synthetic.make_sequence(
            cam, n_frames=10, n_points=400, with_depth=True, seed=11
        )
        sys_ = SlamSystem(s, Sensor.RGBD, enable_loop_closing=False)
        for i in range(10):
            sys_.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
        sys_.save_trajectory_tum(str(tmp_path / "est.txt"))
        _write_tum(tmp_path / "gt.txt", seq.timestamps, seq.poses_wc)
        res = ev.evaluate_files(
            str(tmp_path / "est.txt"), str(tmp_path / "gt.txt"),
            max_diff=0.05,
        )
        direct = synthetic.ate_rmse(
            sys_.poses_wc(), seq.poses_wc, with_scale=False
        )
        assert res["pairs"] == 10
        assert abs(res["ate_rmse_m"] - direct) < 5e-3, (res, direct)
