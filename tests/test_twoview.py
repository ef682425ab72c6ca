"""M2 tests: two-view geometry (H/F RANSAC, decomposition, CheckRT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import twoview
from orbslam2_tpu.solvers import lie

K = np.array([[320.0, 0, 160.0], [0, 320.0, 120.0], [0, 0, 1.0]], np.float32)


def make_scene(n=200, planar=False, seed=0, noise=0.3, outliers=0.1):
    """Ground-truth two-view scene. Returns xy1, xy2, valid, (R, t), X."""
    rng = np.random.default_rng(seed)
    if planar:
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)], -1
        )
    else:
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 9, n)], -1
        )
    # camera 1 at origin; camera 2 translated + rotated slightly
    phi = np.array([0.02, -0.06, 0.01])
    R = np.asarray(lie.so3_exp(jnp.asarray(phi, jnp.float32)))
    t = np.array([0.6, 0.05, 0.1], np.float32)  # baseline
    X2 = X @ R.T + t

    def proj(P):
        return np.stack(
            [K[0, 0] * P[:, 0] / P[:, 2] + K[0, 2],
             K[1, 1] * P[:, 1] / P[:, 2] + K[1, 2]], -1
        )

    xy1 = proj(X) + rng.normal(0, noise, (n, 2))
    xy2 = proj(X2) + rng.normal(0, noise, (n, 2))
    # Inject outliers
    n_out = int(n * outliers)
    out_idx = rng.choice(n, n_out, replace=False)
    xy2[out_idx] += rng.uniform(-60, 60, (n_out, 2))
    valid = np.ones(n, bool)
    return (
        jnp.asarray(xy1, jnp.float32), jnp.asarray(xy2, jnp.float32),
        jnp.asarray(valid), R, t, X, out_idx,
    )


class TestSolvers:
    def test_fundamental_exact(self):
        xy1, xy2, valid, R, t, X, _ = make_scene(noise=0.0, outliers=0.0)
        # F from E ground truth
        tx = np.asarray(lie.hat(jnp.asarray(t)))
        E = tx @ R
        F_gt = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
        assert F_gt.shape == (3, 3)
        # 8-point on normalized coords of 8 exact correspondences:
        x1n, T1 = twoview.normalize_points(xy1, valid)
        x2n, T2 = twoview.normalize_points(xy2, valid)
        Fn = twoview._solve_f_8pt(x1n[:8], x2n[:8])
        F = np.asarray(T2).T @ np.asarray(Fn) @ np.asarray(T1)
        # Check epipolar residuals of all points under estimated F
        o = np.ones((200, 1))
        x1h = np.concatenate([np.asarray(xy1), o], -1)
        x2h = np.concatenate([np.asarray(xy2), o], -1)
        res = np.abs(np.sum((x1h @ F.T) * x2h, -1))
        lines = x1h @ F.T
        dist = res / np.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)
        assert np.median(dist) < 0.5

    def test_homography_exact(self):
        xy1, xy2, valid, R, t, X, _ = make_scene(
            planar=True, noise=0.0, outliers=0.0
        )
        x1n, T1 = twoview.normalize_points(xy1, valid)
        x2n, T2 = twoview.normalize_points(xy2, valid)
        Hn = twoview._solve_h_dlt(x1n[:8], x2n[:8])
        H = np.linalg.inv(np.asarray(T2)) @ np.asarray(Hn) @ np.asarray(T1)
        x1h = np.concatenate([np.asarray(xy1), np.ones((200, 1))], -1)
        p = x1h @ H.T
        p = p[:, :2] / p[:, 2:3]
        err = np.linalg.norm(p - np.asarray(xy2), axis=-1)
        assert np.median(err) < 0.5


class TestInitialize:
    def test_general_scene_selects_f_and_recovers_motion(self):
        xy1, xy2, valid, R, t, X, out_idx = make_scene(seed=2)
        res = twoview.initialize_two_view(
            xy1, xy2, valid, jnp.asarray(K), jax.random.PRNGKey(0)
        )
        assert bool(res.success)
        assert not bool(res.used_h)
        T21 = np.asarray(res.T21)
        # Rotation error
        dR = T21[:3, :3] @ R.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, f"rotation error {ang} deg"
        # Translation direction error (scale is unobservable)
        tdir = T21[:3, 3] / np.linalg.norm(T21[:3, 3])
        tgt = t / np.linalg.norm(t)
        assert np.degrees(np.arccos(np.clip(np.dot(tdir, tgt), -1, 1))) < 3.0

    def test_planar_scene_selects_h_and_recovers_motion(self):
        xy1, xy2, valid, R, t, X, _ = make_scene(seed=3, planar=True)
        res = twoview.initialize_two_view(
            xy1, xy2, valid, jnp.asarray(K), jax.random.PRNGKey(1)
        )
        assert bool(res.used_h)
        assert bool(res.success)
        T21 = np.asarray(res.T21)
        dR = T21[:3, :3] @ R.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 2.0, f"rotation error {ang} deg"

    def test_triangulated_structure_matches_gt(self):
        xy1, xy2, valid, R, t, X, out_idx = make_scene(seed=4, outliers=0.0)
        res = twoview.initialize_two_view(
            xy1, xy2, valid, jnp.asarray(K), jax.random.PRNGKey(2)
        )
        assert bool(res.success)
        good = np.asarray(res.good)
        pts = np.asarray(res.points)[good]
        gt = X[good]
        # Reconstruction is up to scale: estimate scale by median ratio.
        s = np.median(gt[:, 2] / pts[:, 2])
        err = np.linalg.norm(pts * s - gt, axis=-1)
        assert np.median(err) < 0.15, f"median structure err {np.median(err)}"

    def test_outliers_rejected(self):
        xy1, xy2, valid, R, t, X, out_idx = make_scene(seed=5, outliers=0.15)
        res = twoview.initialize_two_view(
            xy1, xy2, valid, jnp.asarray(K), jax.random.PRNGKey(3)
        )
        good = np.asarray(res.good)
        # Most injected outliers must be excluded from the good set.
        assert good[out_idx].mean() < 0.2

    def test_insufficient_parallax_fails(self):
        rng = np.random.default_rng(6)
        X = np.stack(
            [rng.uniform(-3, 3, 150), rng.uniform(-2, 2, 150),
             rng.uniform(4, 9, 150)], -1,
        )
        # Pure rotation: no parallax -> must not initialize.
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.03, 0.0], jnp.float32)))
        X2 = X @ R.T

        def proj(P):
            return np.stack(
                [K[0, 0] * P[:, 0] / P[:, 2] + K[0, 2],
                 K[1, 1] * P[:, 1] / P[:, 2] + K[1, 2]], -1,
            )

        xy1 = jnp.asarray(proj(X) + rng.normal(0, 0.3, (150, 2)), jnp.float32)
        xy2 = jnp.asarray(proj(X2) + rng.normal(0, 0.3, (150, 2)), jnp.float32)
        res = twoview.initialize_two_view(
            xy1, xy2, jnp.ones(150, bool), jnp.asarray(K), jax.random.PRNGKey(4)
        )
        assert not bool(res.success)
