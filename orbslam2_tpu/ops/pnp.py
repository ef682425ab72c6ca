"""Perspective-n-Point RANSAC for relocalization.

Role of the reference's ``PnPsolver`` (src/PnPsolver.cc, EPnP + RANSAC —
SURVEY.md §2.1).  TPU-native substitution: the hypothesis solver is a
batched 6-point DLT (one (12,12) SVD per hypothesis, all hypotheses one
tensor) with orthogonal Procrustes rotation extraction, scored by
reprojection chi2 exactly like PnPsolver::CheckInliers; the winner is
polished by the shared LM pose optimizer (solvers/pose_opt), which plays
the role of EPnP's gauss_newton + the reference's follow-up
PoseOptimization.  Same capability (robust pose from 2D-3D matches under
outliers), kernel chosen for batch-friendliness.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solvers.lie import rt_to_mat
from ..utils.camera import CameraModel


def _dlt_pose(xn: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """6+ point DLT: normalized image coords (M, 2) + world points (M, 3)
    -> T_cw (4, 4).  Rotation re-orthogonalized by SVD (Procrustes)."""
    u, v = xn[:, 0], xn[:, 1]
    zeros = jnp.zeros_like(X)
    ones = jnp.ones_like(u)[:, None]
    Xh = jnp.concatenate([X, ones], axis=1)  # (M, 4)
    z4 = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, z4, -u[:, None] * Xh], axis=1)  # (M, 12)
    r2 = jnp.concatenate([z4, Xh, -v[:, None] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2M, 12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Pm = vt[-1].reshape(3, 4)
    # Fix scale + sign: ||R rows|| ~ 1, points in front.
    R_raw = Pm[:, :3]
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(R_raw)) + 1e-12)
    Pm = Pm / jnp.where(scale < 1e-9, 1e-9, scale)
    # Sign: mean depth of the points should be positive.
    depths = X @ Pm[2, :3] + Pm[2, 3]
    Pm = jnp.where(jnp.mean(depths) < 0, -Pm, Pm)
    # Procrustes: nearest rotation.
    U, _, Vt = jnp.linalg.svd(Pm[:, :3])
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    det = jnp.linalg.det(U @ Vt)
    D = D.at[2, 2].set(jnp.sign(det))
    R = U @ D @ Vt
    t = Pm[:, 3]
    return rt_to_mat(R, t)


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters",))
def pnp_ransac(
    uv: jnp.ndarray,
    points_w: jnp.ndarray,
    valid: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    cam: CameraModel,
    key: jnp.ndarray,
    iters: int = 256,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """Batched-hypothesis PnP RANSAC (PnPsolver::iterate, ≈170).

    uv: (M, 2) undistorted pixel obs; points_w: (M, 3); valid: (M,).
    """
    M = uv.shape[0]
    xn = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], -1
    )
    w = valid.astype(jnp.float32)
    p = w / jnp.maximum(w.sum(), 1.0)
    samples = jax.random.choice(key, M, shape=(iters, 6), replace=True, p=p)

    Ts = jax.vmap(lambda s: _dlt_pose(xn[s], points_w[s]))(samples)

    def score(T):
        pc = points_w @ T[:3, :3].T + T[:3, 3]
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        chi2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
        inl = valid & (chi2 < chi2_th) & (pc[:, 2] > 0.01)
        return jnp.sum(inl), inl

    n_in, inls = jax.vmap(score)(Ts)
    best = jnp.argmax(n_in)
    ok = n_in[best] >= min_inliers
    return PnPResult(
        T_cw=Ts[best], inliers=inls[best], n_inliers=n_in[best], ok=ok
    )
