"""End-to-end dataset-driver test: write a TUM-format RGB-D dataset to disk
from synthetic frames, then run the real loader + SlamSystem path over it —
the integration the reference validates with rgbd_tum + real TUM data."""

import os
import subprocess
import sys

import numpy as np
import pytest

pil = pytest.importorskip("PIL.Image")

from orbslam2_tpu.utils import synthetic
from tests.test_slam_e2e import small_settings


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Materialize a 10-frame synthetic sequence in TUM RGB-D layout."""
    root = tmp_path_factory.mktemp("tum_seq")
    s = small_settings(bf=32.0)
    cam = s.camera_model()
    seq = synthetic.make_sequence(
        cam, n_frames=14, n_points=400, with_depth=True, seed=11
    )
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rgb_lines, assoc_lines = [], []
    for i in range(14):
        ts = seq.timestamps[i]
        rgb_name = f"rgb/{ts:.6f}.png"
        depth_name = f"depth/{ts:.6f}.png"
        pil.fromarray(seq.images[i].astype(np.uint8)).save(root / rgb_name)
        # TUM depth: uint16 with factor 5000.
        d16 = np.clip(seq.depths[i] * 5000.0, 0, 65535).astype(np.uint16)
        pil.fromarray(d16, mode="I;16").save(root / depth_name)
        rgb_lines.append(f"{ts:.6f} {rgb_name}")
        assoc_lines.append(f"{ts:.6f} {rgb_name} {ts:.6f} {depth_name}")
    (root / "rgb.txt").write_text(
        "# color images\n# timestamp filename\n" + "\n".join(rgb_lines) + "\n"
    )
    (root / "assoc.txt").write_text("\n".join(assoc_lines) + "\n")
    # Reference-format settings YAML for this synthetic camera.
    (root / "settings.yaml").write_text(
        "%YAML:1.0\n"
        "Camera.fx: 320.0\nCamera.fy: 320.0\n"
        "Camera.cx: 160.0\nCamera.cy: 120.0\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        "Camera.width: 320\nCamera.height: 240\n"
        "Camera.fps: 30.0\nCamera.bf: 32.0\nCamera.RGB: 1\n"
        "ThDepth: 40.0\nDepthMapFactor: 5000.0\n"
        "ORBextractor.nFeatures: 800\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 4\n"
        "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n"
        "Tpu.maxKeypoints: 1024\nTpu.maxKeyFrames: 32\nTpu.maxPoints: 8192\n"
    )
    return root, seq


class TestDatasetDriver:
    @pytest.mark.slow
    def test_rgbd_tum_driver_end_to_end(self, tum_dir, tmp_path):
        root, seq = tum_dir
        out = tmp_path / "out"
        env = dict(os.environ)
        proc = subprocess.run(
            [
                sys.executable, "examples/run_dataset.py",
                "--dataset", "tum", "--sensor", "rgbd",
                "--path", str(root), "--assoc", str(root / "assoc.txt"),
                "--settings", str(root / "settings.yaml"),
                "--out", str(out), "--cpu",
            ],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "median tracking time" in proc.stdout
        traj = (out / "CameraTrajectory.txt").read_text().strip().split("\n")
        assert len(traj) == 14
        # Trajectory should roughly track the ground truth (depth-anchored):
        est = np.array([[float(x) for x in l.split()[1:4]] for l in traj])
        gt = seq.poses_wc[:, :3, 3]
        # The estimate is in the first-camera frame; align SE3 and compare.
        P_est = np.tile(np.eye(4), (14, 1, 1)); P_est[:, :3, 3] = est
        P_gt = np.tile(np.eye(4), (14, 1, 1)); P_gt[:, :3, 3] = gt
        ate = synthetic.ate_rmse(P_est, P_gt, with_scale=False)
        assert ate < 0.25, f"driver ATE {ate}"

    def test_loaders_parse_layout(self, tum_dir):
        from orbslam2_tpu.utils import datasets

        root, _ = tum_dir
        rgb = datasets.load_tum_rgb_list(str(root))
        assert len(rgb) == 14 and rgb[0][1].endswith(".png")
        assoc = datasets.load_tum_associations(str(root / "assoc.txt"), str(root))
        assert len(assoc) == 14
        it = datasets.iter_tum_rgbd(str(root), str(root / "assoc.txt"))
        ts, im, depth = next(it)
        assert im.shape == (240, 320) and depth.shape == (240, 320)
        # Depth decodes back to metric range after the 5000 factor.
        d = depth / 5000.0
        assert 2.0 < np.median(d[d > 0]) < 15.0
