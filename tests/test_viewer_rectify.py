"""Viewer-lite rendering + EuRoC-style stereo rectification maps."""

import numpy as np
import pytest

from orbslam2_tpu.models import map_state as ms
from orbslam2_tpu.utils import datasets, viewer


class TestViewer:
    def test_draw_map_and_frame(self, tmp_path, rng):
        import jax.numpy as jnp

        m = ms.make_empty_map(8, 128, 32)
        m = m._replace(
            pt_pos=jnp.asarray(rng.normal(size=(128, 3)), jnp.float32),
            pt_valid=jnp.ones(128, bool),
            kf_valid=jnp.asarray(np.arange(8) < 3),
            n_kf=jnp.int32(3),
        )
        p = tmp_path / "map.png"
        ok = viewer.draw_map(m, str(p), trajectory=np.tile(np.eye(4), (5, 1, 1)))
        assert ok and p.exists() and p.stat().st_size > 1000

        img = rng.uniform(0, 255, (120, 160))
        kp = rng.uniform(10, 150, (50, 2))
        tracked = rng.uniform(size=50) > 0.5
        p2 = tmp_path / "frame.png"
        ok = viewer.draw_frame(img, kp, tracked, str(p2), "OK | 42 matches")
        assert ok and p2.exists()


class TestRectification:
    def test_identity_maps(self):
        """No distortion + identity R + same P => identity sampling grid."""
        K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]])
        mx, my = datasets.build_rectify_maps(
            K, np.zeros(4), np.eye(3), K, 160, 120
        )
        u, v = np.meshgrid(np.arange(160), np.arange(120))
        np.testing.assert_allclose(mx, u, atol=1e-3)
        np.testing.assert_allclose(my, v, atol=1e-3)

    def test_rectified_rotation_consistency(self):
        """With a small rotation R, the map must sample where the rotated
        ray lands — verify against direct projection of a known pixel."""
        K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]])
        from orbslam2_tpu.solvers import lie
        import jax.numpy as jnp

        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.02, 0.0], jnp.float32)))
        mx, my = datasets.build_rectify_maps(K, np.zeros(4), R, K, 160, 120)
        # Destination pixel (100, 60): ray through K^-1, rotated by R^T? The
        # map returns a source pixel; resampling the source at that pixel
        # must produce the value of the rotated ray.  Verify the math:
        dst = np.array([100.0, 60.0, 1.0])
        ray = np.linalg.inv(K) @ dst
        src_ray = R.T @ ray  # build_rectify_maps applies ray @ R == R.T ray
        src_px = K @ (src_ray / src_ray[2])
        np.testing.assert_allclose(mx[60, 100], src_px[0], atol=1e-2)
        np.testing.assert_allclose(my[60, 100], src_px[1], atol=1e-2)

    def test_remap_bilinear_translation(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (40, 50)).astype(np.float32)
        u, v = np.meshgrid(np.arange(50, dtype=np.float32),
                           np.arange(40, dtype=np.float32))
        out = datasets.remap_bilinear(img, u + 0.5, v)
        # Half-pixel shift = average of neighbors.
        expect = 0.5 * (img[:, :-1] + img[:, 1:])
        np.testing.assert_allclose(out[:, :48], expect[:, :48], atol=1e-4)
