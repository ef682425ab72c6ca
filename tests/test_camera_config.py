import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import Settings, load_opencv_yaml
from orbslam2_tpu.utils import camera as cam_mod

TUM1_YAML = """%YAML:1.0

# Camera calibration and distortion parameters (OpenCV)
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989

Camera.k1: 0.262383
Camera.k2: -0.953104
Camera.p1: -0.005358
Camera.p2: 0.002628
Camera.k3: 1.163314

Camera.width: 640
Camera.height: 480

# Camera frames per second
Camera.fps: 30.0

# IR projector baseline times fx (aprox.)
Camera.bf: 40.0

Camera.RGB: 1

ThDepth: 40.0
DepthMapFactor: 5000.0

ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""

MATRIX_YAML = """%YAML:1.0
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
Camera.fx: 435.2046959714599
"""


class TestYaml:
    def test_scalars(self):
        d = load_opencv_yaml(TUM1_YAML)
        assert d["Camera.fx"] == 517.306408
        assert d["ORBextractor.nFeatures"] == 1000
        assert d["Camera.RGB"] == 1
        assert d["DepthMapFactor"] == 5000.0

    def test_matrix(self):
        d = load_opencv_yaml(MATRIX_YAML)
        K = d["LEFT.K"]
        assert K.shape == (3, 3)
        assert K[0, 0] == 458.654
        assert K[1, 2] == 248.375
        assert d["Camera.fx"] == 435.2046959714599

    def test_settings(self):
        s = Settings.from_yaml(TUM1_YAML, sensor="rgbd")
        assert s.camera.fx == 517.306408
        assert s.orb.min_th_fast == 7  # iniThFAST is subsumed (config.py)
        assert s.camera.depth_map_factor == 5000.0
        assert s.tpu.max_keypoints == 1024  # next pow2 >= 1000


class TestCamera:
    def _cam(self, dist=True):
        s = Settings.from_yaml(TUM1_YAML)
        c = s.camera
        d = np.array([c.k1, c.k2, c.p1, c.p2, c.k3], np.float32) if dist else None
        return cam_mod.make_camera(c.fx, c.fy, c.cx, c.cy, dist=d, bf=c.bf,
                                   width=c.width, height=c.height)

    def test_project_backproject(self):
        cam = self._cam(dist=False)
        p = jnp.array([[0.3, -0.2, 2.0], [0.0, 0.0, 1.0]], jnp.float32)
        uv = cam_mod.project(cam, p)
        p2 = cam_mod.backproject(cam, uv, p[:, 2])
        np.testing.assert_allclose(p, p2, atol=1e-4)

    def test_undistort_roundtrip(self):
        cam = self._cam(dist=True)
        # Distort normalized points, then check undistort recovers the pixel.
        xn = jnp.array([[0.1, 0.05], [-0.2, 0.15], [0.0, 0.0]], jnp.float32)
        xd = cam_mod.distort_normalized(cam, xn)
        uv_dist = jnp.stack(
            [cam.fx * xd[:, 0] + cam.cx, cam.fy * xd[:, 1] + cam.cy], -1
        )
        uv_undist = cam_mod.undistort_points(cam, uv_dist, iters=20)
        uv_true = jnp.stack(
            [cam.fx * xn[:, 0] + cam.cx, cam.fy * xn[:, 1] + cam.cy], -1
        )
        np.testing.assert_allclose(uv_undist, uv_true, atol=0.1)

    def test_stereo_projection(self):
        cam = self._cam(dist=False)
        p = jnp.array([[0.5, 0.1, 2.0]], jnp.float32)
        uvr = cam_mod.project_stereo(cam, p)
        assert uvr.shape == (1, 3)
        disparity = uvr[0, 0] - uvr[0, 2]
        np.testing.assert_allclose(disparity, cam.bf / 2.0, rtol=1e-5)

    def test_image_bounds_no_distortion(self):
        cam = self._cam(dist=False)
        assert float(cam.min_x) == 0.0
        assert float(cam.max_x) == 640.0
