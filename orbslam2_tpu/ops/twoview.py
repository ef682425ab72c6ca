"""Two-view reconstruction: batched H/F RANSAC + model select + CheckRT.

TPU-native equivalent of ``Initializer`` (src/Initializer.cc, SURVEY.md
§2.1): the reference runs two std::threads (FindHomography ∥
FindFundamental), each an adaptive 200-iteration RANSAC; here both models
score ALL hypotheses as one batched tensor program (hypotheses are a batch
dim — SURVEY.md §2.5 P5's TPU mapping), then the reference's model-selection
rule RH = SH/(SH+SF) > 0.40 picks H vs F, then ReconstructF/ReconstructH
candidate motions are verified by a batched CheckRT.

Thresholds are the reference's: chi2 3.841/5.991, score th 5.991, Faugeras
8-motion H decomposition, 4-motion E decomposition.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solvers.lie import rt_to_mat

CHI2_F = 3.841
CHI2_H = 5.991
SCORE_TH = 5.991


# ---------------------------------------------------------------------------
# Normalization (Initializer::Normalize, src/Initializer.cc:≈680)
# ---------------------------------------------------------------------------


def normalize_points(xy: jnp.ndarray, valid: jnp.ndarray):
    """Zero-mean, unit mean-abs-dev normalization. Returns (xn, T 3x3)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (xy * w[:, None]).sum(0) / n
    dev = (jnp.abs(xy - mean) * w[:, None]).sum(0) / n
    s = 1.0 / jnp.maximum(dev, 1e-8)
    xn = (xy - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return xn, T


# ---------------------------------------------------------------------------
# Minimal solvers (batched over hypotheses via vmap)
# ---------------------------------------------------------------------------


def _solve_f_8pt(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Normalized 8-point fundamental from (M, 2)+(M, 2) -> (3, 3).

    With ``w`` given, rows are weighted — used for the all-inlier
    least-squares refinement after RANSAC."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # (M, 9): rows x2^T F x1 = 0
    if w is not None:
        A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    # Enforce rank 2.
    uf, sf, vft = jnp.linalg.svd(F)
    sf = sf.at[2].set(0.0)
    return uf @ jnp.diag(sf) @ vft


def _solve_h_dlt(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Normalized DLT homography from (M, 2)+(M, 2) -> (3, 3), x2 ~ H x1."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    if w is not None:
        r1 = r1 * w[:, None]
        r2 = r2 * w[:, None]
    A = jnp.concatenate([r1, r2], axis=0)  # (2M, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


# ---------------------------------------------------------------------------
# Scoring (CheckHomography / CheckFundamental, src/Initializer.cc:≈240-380)
# ---------------------------------------------------------------------------


def _score_h(H: jnp.ndarray, xy1, xy2, valid, sigma: float = 1.0):
    """Symmetric transfer error score; returns (score, inlier_mask)."""
    inv_s2 = 1.0 / (sigma * sigma)

    def transfer(Hm, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], -1)
        p = ah @ Hm.T
        p = p[:, :2] / jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
        return jnp.sum((p - b) ** 2, -1)

    Hinv = jnp.linalg.inv(H)
    e12 = transfer(H, xy1, xy2) * inv_s2      # chi2 of x1->x2
    e21 = transfer(Hinv, xy2, xy1) * inv_s2
    in12 = e12 < CHI2_H
    in21 = e21 < CHI2_H
    score = jnp.sum(
        jnp.where(valid & in12, SCORE_TH - e12, 0.0)
        + jnp.where(valid & in21, SCORE_TH - e21, 0.0)
    )
    return score, valid & in12 & in21


def _score_f(F: jnp.ndarray, xy1, xy2, valid, sigma: float = 1.0):
    inv_s2 = 1.0 / (sigma * sigma)
    o1 = jnp.ones_like(xy1[:, :1])
    x1h = jnp.concatenate([xy1, o1], -1)
    x2h = jnp.concatenate([xy2, o1], -1)
    l2 = x1h @ F.T  # line in image 2
    l1 = x2h @ F    # line in image 1
    num2 = jnp.sum(l2 * x2h, -1)
    e2 = num2 * num2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12) * inv_s2
    num1 = jnp.sum(l1 * x1h, -1)
    e1 = num1 * num1 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12) * inv_s2
    in2 = e2 < CHI2_F
    in1 = e1 < CHI2_F
    score = jnp.sum(
        jnp.where(valid & in2, SCORE_TH - e2, 0.0)
        + jnp.where(valid & in1, SCORE_TH - e1, 0.0)
    )
    return score, valid & in1 & in2


# ---------------------------------------------------------------------------
# Triangulation (Initializer::Triangulate, src/Initializer.cc:≈210)
# ---------------------------------------------------------------------------


def triangulate_linear(
    P1: jnp.ndarray, P2: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray,
    gn_iters: int = 2,
) -> jnp.ndarray:
    """Linear (DLT) triangulation + Gauss-Newton reprojection polish.
    P*: (3, 4); xy*: (N, 2) -> (N, 3).

    Seed: inhomogeneous normal-equation DLT — with A = [A3 | a4] the DLT
    rows, solve A3^T A3 X = -A3^T a4 via the closed-form 3x3 inverse.  The
    reference SVD null-vector form (Initializer.cc:≈210) costs a batched
    4x4 SVD per point, LU-class slow on TPU, and this sits inside both the
    mono-init RANSAC scoring (hypotheses x points) and per-keyframe
    triangulation.  The closed form alone is slightly LESS accurate than
    the SVD (different algebraic norm), so ``gn_iters`` Gauss-Newton steps
    on the GEOMETRIC reprojection error follow — beating the SVD's
    algebraic optimum at a fraction of its cost (measured: ~20x faster at
    (4, 1024) points, trajectory ATE equal or better)."""
    from ..solvers.lie import inv3x3

    def rows(a, b):
        return jnp.stack(
            [
                a[..., 0, None] * P1[2] - P1[0],
                a[..., 1, None] * P1[2] - P1[1],
                b[..., 0, None] * P2[2] - P2[0],
                b[..., 1, None] * P2[2] - P2[1],
            ],
            axis=-2,
        )  # (N, 4, 4)

    A = rows(xy1, xy2)
    A3 = A[..., :3]
    a4 = A[..., 3]
    H = jnp.einsum("nri,nrj->nij", A3, A3)
    g = jnp.einsum("nri,nr->ni", A3, a4)
    X = -jnp.einsum("nij,nj->ni", inv3x3(H + 1e-9 * jnp.eye(3)), g)

    # GN on reprojection residuals of both views.
    def proj_residual_jac(Pm, X, xy):
        Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], -1)  # (N, 4)
        p = Xh @ Pm.T                                             # (N, 3)
        w = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        uv = p[..., :2] / w[..., None]
        r = uv - xy
        # d(uv)/dX = (P[:2,:3] - uv * P[2,:3]) / w
        J = (Pm[None, :2, :3] - uv[..., None] * Pm[None, 2:3, :3]) / \
            w[..., None, None]
        return r, J

    for _ in range(gn_iters):
        r1, J1 = proj_residual_jac(P1, X, xy1)
        r2, J2 = proj_residual_jac(P2, X, xy2)
        Hn = (
            jnp.einsum("nri,nrj->nij", J1, J1)
            + jnp.einsum("nri,nrj->nij", J2, J2)
        )
        gn = jnp.einsum("nri,nr->ni", J1, r1) + jnp.einsum("nri,nr->ni", J2, r2)
        dX = -jnp.einsum("nij,nj->ni", inv3x3(Hn + 1e-6 * jnp.eye(3)), gn)
        # Guard divergent steps on degenerate geometry (near-zero parallax).
        ok = jnp.isfinite(dX).all(-1) & (jnp.linalg.norm(dX, axis=-1) < 1e3)
        X = jnp.where(ok[..., None], X + dX, X)
    return X


def check_rt(
    R: jnp.ndarray,
    t: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    sigma: float = 1.0,
):
    """Count triangulated points with positive depth, parallax and low
    reprojection error under motion (R, t) — Initializer::CheckRT
    (src/Initializer.cc:≈720).

    Returns (n_good, parallax_deg, points (N,3), good_mask (N,)).
    """
    th2 = 4.0 * sigma * sigma
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_linear(P1, P2, xy1, xy2)

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    O2 = -R.T @ t  # camera-2 center in frame 1
    n1 = X
    n2 = X - O2
    cos_par = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    depth_ok = (z1 > 0) & (z2 > 0)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    p1 = jnp.stack([fx * X[:, 0] / z1 + cx, fy * X[:, 1] / z1 + cy], -1)
    p2 = jnp.stack([fx * Xc2[:, 0] / z2 + cx, fy * Xc2[:, 1] / z2 + cy], -1)
    e1 = jnp.sum((p1 - xy1) ** 2, -1)
    e2 = jnp.sum((p2 - xy2) ** 2, -1)
    good = (
        valid & finite & depth_ok & (cos_par < 0.99998)
        & (e1 < th2) & (e2 < th2)
    )
    n_good = jnp.sum(good)
    # Parallax quantile like the reference (50th-smallest good parallax).
    par_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_par, -1.0, 1.0)))
    par_sorted = jnp.sort(jnp.where(good, par_deg, 1e9))
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax = jnp.where(n_good > 0, par_sorted[idx], 0.0)
    return n_good, parallax, X, good


# ---------------------------------------------------------------------------
# Motion decomposition
# ---------------------------------------------------------------------------


def decompose_e(E: jnp.ndarray):
    """E -> 4 candidate (R, t) (Initializer::DecomposeE, Initializer.cc:≈870)."""
    u, _, vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = u @ W.T @ vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_h(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras 8-motion homography decomposition
    (Initializer::ReconstructH, src/Initializer.cc:≈480).

    Returns (Rs (8,3,3), ts (8,3)).
    """
    A = jnp.linalg.inv(K) @ H @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    aux_st = jnp.sqrt(
        jnp.maximum(
            (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0
        )
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sts = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def make_pos(x1, x3, st):
        Rp = jnp.array(
            [[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]]
        )
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1, 0.0, -x3]) * (d1 - d3)
        t = U @ tp
        return R, t

    Rs_pos, ts_pos = jax.vmap(make_pos)(x1s, x3s, sts)

    # case d' < 0
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sps = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def make_neg(x1, x3, sp):
        Rp = jnp.array(
            [[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]]
        )
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1, 0.0, x3]) * (d1 + d3)
        t = U @ tp
        return R, t

    Rs_neg, ts_neg = jax.vmap(make_neg)(x1s, x3s, sps)

    Rs = jnp.concatenate([Rs_pos, Rs_neg])
    ts = jnp.concatenate([ts_pos, ts_neg])
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


# ---------------------------------------------------------------------------
# Top-level two-view initialization (Initializer::Initialize, ≈40)
# ---------------------------------------------------------------------------


class TwoViewResult(NamedTuple):
    success: jnp.ndarray     # bool scalar
    T21: jnp.ndarray         # (4, 4): pose of cam2 w.r.t. cam1 (world=cam1)
    points: jnp.ndarray      # (N, 3) triangulated in cam-1 frame
    good: jnp.ndarray        # (N,) triangulation inliers
    used_h: jnp.ndarray      # bool scalar — which model was selected
    n_inliers: jnp.ndarray   # int


@functools.partial(jax.jit, static_argnames=("iters",))
def initialize_two_view(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    match_valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    iters: int = 256,
    sigma: float = 1.0,
    min_parallax: float = 1.0,
    min_triangulated: int = 50,
) -> TwoViewResult:
    """Monocular map bootstrap from matched undistorted keypoints.

    xy1/xy2: (N, 2) matched positions (xy2[i] matches xy1[i]); match_valid
    masks real matches.  Hypotheses for BOTH models are one batch.
    """
    n = xy1.shape[0]
    w = match_valid.astype(jnp.float32)
    p = w / jnp.maximum(w.sum(), 1.0)
    samples = jax.random.choice(key, n, shape=(iters, 8), replace=True, p=p)

    x1n, T1 = normalize_points(xy1, match_valid)
    x2n, T2 = normalize_points(xy2, match_valid)
    T2inv = jnp.linalg.inv(T2)

    s1 = x1n[samples]  # (iters, 8, 2)
    s2 = x2n[samples]

    # --- Fundamental hypotheses ---
    Fn = jax.vmap(_solve_f_8pt)(s1, s2)
    F = jnp.einsum("ij,bjk,kl->bil", T2.T, Fn, T1)  # denormalize: T2^T Fn T1
    f_scores, f_inliers = jax.vmap(lambda Fi: _score_f(Fi, xy1, xy2, match_valid, sigma))(F)
    fi = jnp.argmax(f_scores)
    f_in = f_inliers[fi]
    # Least-squares refinement on the full inlier set (reference reruns the
    # solver on all inliers after RANSAC; same effect, one weighted SVD).
    Fn_ref = _solve_f_8pt(x1n, x2n, w=f_in.astype(jnp.float32))
    F_ref = T2.T @ Fn_ref @ T1
    s_ref, in_ref = _score_f(F_ref, xy1, xy2, match_valid, sigma)
    better = s_ref >= f_scores[fi]
    SF = jnp.maximum(s_ref, f_scores[fi])
    bestF = jnp.where(better, F_ref, F[fi])
    f_in = jnp.where(better, in_ref, f_in)

    # --- Homography hypotheses ---
    Hn = jax.vmap(_solve_h_dlt)(s1, s2)
    H = jnp.einsum("ij,bjk,kl->bil", T2inv, Hn, T1)
    h_scores, h_inliers = jax.vmap(lambda Hi: _score_h(Hi, xy1, xy2, match_valid, sigma))(H)
    hi = jnp.argmax(h_scores)
    h_in = h_inliers[hi]
    Hn_ref = _solve_h_dlt(x1n, x2n, w=h_in.astype(jnp.float32))
    H_ref = T2inv @ Hn_ref @ T1
    hs_ref, h_in_ref = _score_h(H_ref, xy1, xy2, match_valid, sigma)
    h_better = hs_ref >= h_scores[hi]
    SH = jnp.maximum(hs_ref, h_scores[hi])
    bestH = jnp.where(h_better, H_ref, H[hi])
    h_in = jnp.where(h_better, h_in_ref, h_in)

    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40

    # --- Candidate motions: 4 from E, 8 from H -> evaluate all 12 batched,
    # but mask the half not selected by the model choice. ---
    E = K.T @ bestF @ K
    Rs_e, ts_e = decompose_e(E)
    Rs_h, ts_h = decompose_h(bestH, K)
    Rs = jnp.concatenate([Rs_e, Rs_h])       # (12, 3, 3)
    ts = jnp.concatenate([ts_e, ts_h])       # (12, 3)
    from_h = jnp.arange(12) >= 4
    model_mask = jnp.where(use_h, from_h, ~from_h)
    inlier_mask = jnp.where(use_h, h_in, f_in)

    n_goods, parallaxes, Xs, goods = jax.vmap(
        lambda R, t: check_rt(R, t, xy1, xy2, inlier_mask, K, sigma)
    )(Rs, ts)
    n_goods = jnp.where(model_mask, n_goods, -1)

    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    # Runner-up must be clearly worse (reference: secondBest < 0.75 * best
    # for F; H requires a unique winner at 0.75 similarly).
    n_sorted = jnp.sort(n_goods)
    n_second = n_sorted[-2]
    n_inliers = jnp.sum(inlier_mask)
    min_good = jnp.maximum(
        jnp.int32(min_triangulated), (0.9 * n_inliers).astype(jnp.int32)
    )
    success = (
        (n_best >= min_good)
        & (n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
        & (parallaxes[best] > min_parallax)
    )

    T21 = rt_to_mat(Rs[best], ts[best])
    return TwoViewResult(
        success=success,
        T21=T21,
        points=Xs[best],
        good=goods[best],
        used_h=use_h,
        n_inliers=n_best,
    )
