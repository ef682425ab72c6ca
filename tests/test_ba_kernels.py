"""Parity: the fused Pallas normal-equation kernel vs the XLA einsum
formulation (solvers/local_ba._residuals + einsum blocks).

Runs the kernel in INTERPRET mode so the parity holds on the CPU test
backend; on TPU the same kernel lowers to Mosaic (solvers/ba_kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.solvers import local_ba as lb
from orbslam2_tpu.solvers.ba_kernels import ba_chi2, ba_normal_equations
from orbslam2_tpu.utils.camera import make_camera

C, N, P = 4, 256, 512


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    cam = make_camera(
        320.0, 320.0, 160.0, 120.0, dist=np.zeros(5, np.float32),
        bf=32.0, width=320, height=240,
    )
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (C, 1, 1))
    poses[:, :3, 3] = rng.normal(scale=0.1, size=(C, 3))
    pts = jnp.asarray(
        rng.normal(size=(P, 3)) + np.array([0, 0, 5.0]), jnp.float32
    )
    pid = jnp.asarray(rng.integers(0, P, (C, N)), jnp.int32)
    uv = jnp.asarray(rng.random((C, N, 2)) * np.array([320, 240]), jnp.float32)
    ur = jnp.asarray(
        np.where(rng.random((C, N)) < 0.5, rng.random((C, N)) * 320, -1.0),
        jnp.float32,
    )
    inv_s2 = jnp.asarray(rng.random((C, N)) + 0.5, jnp.float32)
    mask = jnp.asarray(rng.random((C, N)) < 0.9)
    return cam, jnp.asarray(poses), pts, pid, uv, ur, inv_s2, mask


def _reference_blocks(cam, poses, pts, pid, uv, ur, inv_s2, mask, robust):
    r, J_cam, J_pt, behind = lb._residuals(poses, pts, uv, ur, pid, mask, cam)
    w = inv_s2 * mask.astype(jnp.float32) * (~behind).astype(jnp.float32)
    if robust:
        chi2_th = jnp.where(ur >= 0, lb.CHI2_STEREO, lb.CHI2_MONO)
        rn = jnp.sqrt(jnp.sum(r * r, -1) * inv_s2 + 1e-12)
        w = w * jnp.minimum(1.0, jnp.sqrt(chi2_th) / jnp.maximum(rn, 1e-12))
    H_cc = jnp.einsum("cnij,cn,cnik->cjk", J_cam, w, J_cam)
    b_c = jnp.einsum("cnij,cn,cni->cj", J_cam, w, r)
    Hpp_c = jnp.einsum("cnij,cn,cnik->cnjk", J_pt, w, J_pt)
    bp_c = jnp.einsum("cnij,cn,cni->cnj", J_pt, w, r)
    G_c = jnp.einsum("cnij,cn,cnik->cnjk", J_cam, w, J_pt)
    chi2 = jnp.sum(r * r, -1) * inv_s2
    chi2 = jnp.where(behind, 1e9, chi2)
    err = jnp.sum(jnp.where(mask, chi2, 0.0), axis=1)
    return H_cc, b_c, Hpp_c, bp_c, G_c, chi2, err


@pytest.mark.parametrize("robust", [True, False])
def test_normal_equation_parity(problem, robust):
    cam, poses, pts, pid, uv, ur, inv_s2, mask = problem
    H_cc, b_c, Hpp_c, bp_c, G_c, chi2, err = _reference_blocks(
        cam, poses, pts, pid, uv, ur, inv_s2, mask, robust
    )
    X = jnp.swapaxes(pts[pid], 1, 2)
    uvT = jnp.swapaxes(uv, 1, 2)
    Hk, bk, pack, chi2k = ba_normal_equations(
        poses, X, uvT, ur, inv_s2, mask, cam, robust, interpret=True
    )

    def rel(a, b):
        # Plane-scaled: reassociation noise on near-zero entries must be
        # judged against the plane's magnitude, not the entry's.
        scale = jnp.maximum(jnp.max(jnp.abs(b)), 1.0)
        return float(jnp.max(jnp.abs(a - b)) / scale)

    assert rel(Hk, H_cc) < 1e-4
    assert rel(bk, b_c) < 1e-4
    triu3 = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    for r_, (a, b) in enumerate(triu3):
        assert rel(pack[:, r_], Hpp_c[..., a, b]) < 1e-4, r_
    for k in range(3):
        assert rel(pack[:, 6 + k], bp_c[..., k]) < 1e-4, k
    for i in range(6):
        for j in range(3):
            assert rel(pack[:, 9 + i * 3 + j], G_c[..., i, j]) < 1e-4, (i, j)
    assert rel(pack[:, 27], chi2) < 1e-3  # 1e9 sentinels included
    assert float(jnp.max(jnp.abs(chi2k - err) / jnp.maximum(err, 1.0))) < 1e-5


def test_chi2_parity(problem):
    cam, poses, pts, pid, uv, ur, inv_s2, mask = problem
    *_, chi2, err = _reference_blocks(
        cam, poses, pts, pid, uv, ur, inv_s2, mask, False
    )
    X = jnp.swapaxes(pts[pid], 1, 2)
    uvT = jnp.swapaxes(uv, 1, 2)
    chi2_obs, chi2_sum = ba_chi2(
        poses, X, uvT, ur, inv_s2, mask, cam, interpret=True
    )
    assert float(jnp.max(jnp.abs(chi2_obs - chi2) / (chi2 + 1.0))) < 1e-4
    assert float(jnp.max(jnp.abs(chi2_sum - err) / jnp.maximum(err, 1.0))) < 1e-5
