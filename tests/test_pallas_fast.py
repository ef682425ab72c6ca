"""Parity: fused Pallas FAST-9+NMS kernel vs the XLA two-step path."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import fast as fast_ops
from orbslam2_tpu.ops.pallas_kernels import fast_score_nms_pallas


def _smooth_image(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 4 + 2, w // 4 + 2)).astype(np.float32)
    img = np.kron(img, np.ones((4, 4), np.float32))[:h, :w]
    img += rng.uniform(0, 8, (h, w)).astype(np.float32)
    return img


class TestFusedFastNms:
    @pytest.mark.parametrize("hw", [(240, 320), (96, 200), (37, 130)])
    def test_matches_xla_path(self, hw):
        h, w = hw
        img = jnp.asarray(_smooth_image(h, w, seed=h + w))
        ref = np.asarray(fast_ops.nms3x3(fast_ops.fast_score(img)))
        out = np.asarray(fast_score_nms_pallas(img, interpret=True))
        assert out.shape == ref.shape
        # Keypoint sets must agree exactly: same surviving pixels, same
        # scores (both paths share score semantics + raster tie-break).
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_zero_image(self):
        img = jnp.zeros((64, 128), jnp.float32)
        out = np.asarray(fast_score_nms_pallas(img, interpret=True))
        assert (out == 0).all()
