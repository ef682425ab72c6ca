"""M1 tests: pyramid, FAST, selection, descriptors, matching.

The reference has no unit tests; these are the kernel-level golden checks
SURVEY.md §4 calls for.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import OrbSettings, TpuSettings
from orbslam2_tpu.ops import fast as fast_ops
from orbslam2_tpu.ops import hamming
from orbslam2_tpu.ops import pyramid as pyr_ops
from orbslam2_tpu.ops import select as select_ops
from orbslam2_tpu.ops.extractor import OrbExtractor
from orbslam2_tpu.utils import synthetic
from orbslam2_tpu.utils.camera import make_camera


@pytest.fixture(scope="module")
def cam():
    return make_camera(320.0, 320.0, 160.0, 120.0, width=320, height=240)


@pytest.fixture(scope="module")
def seq(cam):
    return synthetic.make_sequence(cam, n_frames=3, n_points=150, seed=3)


class TestPyramid:
    def test_shapes(self):
        img = jnp.zeros((480, 640), jnp.float32)
        levels = pyr_ops.build_pyramid(img, 8, 1.2)
        assert len(levels) == 8
        assert levels[0].shape == (480, 640)
        assert levels[1].shape == (400, 533)

    def test_features_per_level_sums(self):
        n = pyr_ops.features_per_level(1000, 8, 1.2)
        assert sum(n) == 1000
        assert n[0] > n[-1] > 0

    def test_blur_preserves_mean(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64)), jnp.float32)
        out = pyr_ops.gaussian_blur(img)
        np.testing.assert_allclose(float(out.mean()), float(img.mean()), rtol=0.02)


class TestFast:
    def test_detects_bright_dot(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[30:33, 40:43] = 200.0  # 3x3 bright blob: all circle px darker
        score = fast_ops.fast_score(jnp.asarray(img))
        assert float(score[31, 41]) > 100.0

    def test_flat_image_no_corners(self):
        score = fast_ops.fast_score(jnp.full((64, 64), 128.0))
        assert float(jnp.max(score)) == 0.0

    def test_edge_is_not_corner(self):
        # A long straight vertical step edge: max contiguous arc is 8 < 9.
        img = np.full((64, 64), 50.0, np.float32)
        img[:, 32:] = 200.0
        score = fast_ops.fast_score(jnp.asarray(img))
        assert float(score[32, 31]) == 0.0 and float(score[32, 32]) == 0.0

    def test_corner_of_square(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[20:44, 20:44] = 200.0
        score = fast_ops.fast_score(jnp.asarray(img))
        # The inside corner pixel sees >9 contiguous darker circle pixels.
        assert float(score[20, 20]) > 0.0 or float(score[21, 21]) > 0.0

    def test_nms_keeps_single_peak(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[30:33, 40:43] = 200.0
        s = fast_ops.nms3x3(fast_ops.fast_score(jnp.asarray(img)))
        n_nonzero = int(jnp.sum(s > 0))
        dense = fast_ops.fast_score(jnp.asarray(img))
        assert n_nonzero < int(jnp.sum(dense > 0))
        assert n_nonzero >= 1


class TestSelect:
    def test_fixed_shapes_and_validity(self):
        rng = np.random.default_rng(0)
        score = jnp.asarray(rng.uniform(0, 1, (240, 320)) *
                            (rng.uniform(size=(240, 320)) > 0.99), jnp.float32)
        xy, resp, valid = select_ops.select_keypoints(score, 200)
        assert xy.shape == (200, 2) and valid.shape == (200,)
        v = np.asarray(valid)
        sxy = np.asarray(xy)[v]
        # All selected positions actually have the reported score.
        sc = np.asarray(score)
        for (x, y), r in zip(sxy[:20], np.asarray(resp)[v][:20]):
            np.testing.assert_allclose(sc[int(y), int(x)], r, rtol=1e-6)

    def test_spatial_spread(self):
        # Strong cluster in one corner + weak spread elsewhere: cell cap must
        # prevent the cluster from monopolizing the budget.
        rng = np.random.default_rng(1)
        score = np.zeros((256, 256), np.float32)
        score[:32, :32] = rng.uniform(50, 100, (32, 32))  # dense strong cluster
        weak = (rng.uniform(size=(256, 256)) > 0.995) * rng.uniform(8, 20, (256, 256))
        score = np.maximum(score, weak.astype(np.float32))
        xy, resp, valid = select_ops.select_keypoints(
            jnp.asarray(score), 64, cell=32, cand_per_cell=4, border=0
        )
        sxy = np.asarray(xy)[np.asarray(valid)]
        outside = np.sum((sxy[:, 0] >= 32) | (sxy[:, 1] >= 32))
        assert outside >= 20  # weak-but-spread keypoints survive


class TestExtractor:
    def _extractor(self, n_feat=300):
        return OrbExtractor(
            OrbSettings(n_features=n_feat, n_levels=4),
            TpuSettings(max_keypoints=512),
        )

    def test_extract_shapes(self, seq):
        ex = self._extractor()
        feats = ex(seq.images[0])
        assert feats.xy.shape == (512, 2)
        assert feats.desc.shape == (512, 8) and feats.desc.dtype == jnp.uint32
        assert int(feats.valid.sum()) > 50

    def test_landmarks_have_nearby_keypoints(self, seq, cam):
        # The rendered scene has a textured background plane, so keypoints
        # are everywhere; instead require that most LANDMARK sprites get a
        # keypoint detected on them (detection recall).
        ex = self._extractor()
        feats = ex(seq.images[0])
        v = np.asarray(feats.valid)
        kp = np.asarray(feats.xy)[v]
        Tcw = np.linalg.inv(seq.poses_wc[0])
        p_c = (Tcw[:3, :3] @ seq.world.points.T).T + Tcw[:3, 3]
        vis = p_c[:, 2] > 0.2
        uv = np.stack(
            [320.0 * p_c[:, 0] / p_c[:, 2] + 160.0,
             320.0 * p_c[:, 1] / p_c[:, 2] + 120.0], -1
        )[vis]
        uv = uv[(uv[:, 0] > 20) & (uv[:, 0] < 300) & (uv[:, 1] > 20) & (uv[:, 1] < 220)]
        d = np.linalg.norm(uv[:, None, :] - kp[None, :, :], axis=-1).min(axis=1)
        assert np.mean(d < 8.0) > 0.5, f"landmark recall {np.mean(d < 8.0)}"

    def test_descriptors_match_across_frames(self, seq):
        ex = self._extractor()
        fa = ex(seq.images[0])
        fb = ex(seq.images[1])
        m = hamming.match_descriptors(
            fa.desc, fa.valid, fb.desc, fb.valid,
            max_dist=hamming.TH_LOW, ratio=0.9, cross_check=True,
        )
        n_matched = int(m.ok.sum())
        assert n_matched > 40, f"only {n_matched} matches between frames"
        # Matched keypoints should move consistently (small camera motion):
        xa = np.asarray(fa.xy)[np.asarray(m.ok)]
        xb = np.asarray(fb.xy)[np.asarray(m.idx)[np.asarray(m.ok)]]
        flow = np.linalg.norm(xb - xa, axis=1)
        assert np.median(flow) < 40.0

    def test_hamming_identity(self):
        rng = np.random.default_rng(0)
        d = jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint32))
        dist = hamming.hamming_matrix(d, d)
        assert np.all(np.diag(np.asarray(dist)) == 0)
        # Symmetry + triangle sanity
        dm = np.asarray(dist)
        assert np.all(dm == dm.T)
        assert dm.max() <= 256
