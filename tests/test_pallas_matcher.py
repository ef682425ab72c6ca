"""Parity: fused Pallas projection matcher (Hamming + window/level mask +
best-2) vs the XLA composition it replaces."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops.hamming import hamming_matrix, masked_best2
from orbslam2_tpu.ops.pallas_kernels import projection_best2_pallas


def _mk(na, nb, seed, all_invalid_rows=0):
    rng = np.random.default_rng(seed)
    da = rng.integers(0, 2**32, (na, 8), dtype=np.uint32)
    db = rng.integers(0, 2**32, (nb, 8), dtype=np.uint32)
    uv = rng.uniform(0, 640, (na, 2)).astype(np.float32)
    xy = rng.uniform(0, 640, (nb, 2)).astype(np.float32)
    rr2 = rng.uniform(30, 300, (na,)).astype(np.float32) ** 2
    la = rng.integers(0, 4, (na,)).astype(np.float32)
    lb = rng.integers(0, 4, (nb,)).astype(np.float32)
    va = (rng.uniform(size=na) > 0.2).astype(np.float32)
    vb = (rng.uniform(size=nb) > 0.2).astype(np.float32)
    if all_invalid_rows:
        rr2[:all_invalid_rows] = 0.0  # empty window: no candidates
    ma = np.zeros((na, 8), np.float32)
    ma[:, 0:2] = uv
    ma[:, 2] = rr2
    ma[:, 3] = la
    ma[:, 4] = va
    mb = np.zeros((nb, 8), np.float32)
    mb[:, 0:2] = xy
    mb[:, 2] = lb
    mb[:, 3] = vb
    return (jnp.asarray(da), jnp.asarray(ma), jnp.asarray(db),
            jnp.asarray(mb), uv, xy, rr2, la, lb, va, vb)


class TestProjectionBest2:
    @pytest.mark.parametrize("shape", [(128, 128), (256, 128), (128, 384)])
    def test_matches_xla_composition(self, shape):
        na, nb = shape
        da, ma, db, mb, uv, xy, rr2, la, lb, va, vb = _mk(na, nb, seed=na + nb)
        d2 = ((uv[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        mask = (
            (d2 <= rr2[:, None])
            & (np.abs(lb[None, :] - la[:, None]) <= 1)
            & (va[:, None] > 0.5) & (vb[None, :] > 0.5)
        )
        dist = np.asarray(hamming_matrix(da, db))
        ref_idx, ref_b1, ref_b2 = (
            np.asarray(x) for x in masked_best2(jnp.asarray(dist),
                                                jnp.asarray(mask))
        )
        bi, b1, b2 = (
            np.asarray(x) for x in projection_best2_pallas(
                da, ma, db, mb, level_band=1, interpret=True
            )
        )
        np.testing.assert_array_equal(b1, ref_b1)
        np.testing.assert_array_equal(b2, ref_b2)
        # Index must agree wherever a candidate exists (both pick the
        # first-minimum column).
        has = ref_b1 < 10_000
        np.testing.assert_array_equal(bi[has], ref_idx[has])

    def test_empty_window_rows(self):
        da, ma, db, mb, *_ = _mk(128, 128, seed=3, all_invalid_rows=16)
        bi, b1, b2 = projection_best2_pallas(
            da, ma, db, mb, level_band=1, interpret=True
        )
        assert (np.asarray(b1)[:16] == 10_000).all()
        assert (np.asarray(b2)[:16] == 10_000).all()
