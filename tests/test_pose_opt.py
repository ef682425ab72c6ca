"""M3 tests: motion-only pose optimization (LM schedule, Huber, outliers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.solvers import lie
from orbslam2_tpu.solvers.pose_opt import PoseObs, pose_optimization
from orbslam2_tpu.utils.camera import make_camera


@pytest.fixture(scope="module")
def cam():
    return make_camera(320.0, 320.0, 160.0, 120.0, bf=32.0, width=320, height=240)


def make_problem(cam, n=300, noise=0.5, outlier_frac=0.0, stereo=False, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(3, 10, n)], -1
    ).astype(np.float32)
    xi_gt = np.array([0.2, -0.1, 0.15, 0.03, -0.05, 0.02], np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(xi_gt)))
    pc = X @ T_gt[:3, :3].T + T_gt[:3, 3]
    uv = np.stack(
        [320.0 * pc[:, 0] / pc[:, 2] + 160.0, 320.0 * pc[:, 1] / pc[:, 2] + 120.0],
        -1,
    )
    uv += rng.normal(0, noise, uv.shape)
    if stereo:
        ur = uv[:, 0] - 32.0 / pc[:, 2] + rng.normal(0, noise, n)
        ur = ur.astype(np.float32)
    else:
        ur = np.full(n, -1.0, np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    obs = PoseObs(
        points_w=jnp.asarray(X),
        uv=jnp.asarray(uv, jnp.float32),
        ur=jnp.asarray(ur),
        inv_sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    return obs, T_gt, out_idx


def pose_error(T_est, T_gt):
    d = np.asarray(T_est) @ np.linalg.inv(T_gt)
    rot = np.degrees(
        np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    )
    trans = np.linalg.norm(d[:3, 3])
    return rot, trans


class TestPoseOpt:
    def test_converges_from_perturbed_init(self, cam):
        obs, T_gt, _ = make_problem(cam)
        T0 = np.asarray(
            lie.se3_exp(jnp.asarray([0.1, 0.1, -0.1, 0.02, 0.03, -0.02]))
        ) @ T_gt
        res = pose_optimization(jnp.asarray(T0, jnp.float32), obs, cam)
        rot, trans = pose_error(res.T_cw, T_gt)
        assert rot < 0.1 and trans < 0.02, (rot, trans)
        assert int(res.n_inliers) > 280

    def test_outliers_identified(self, cam):
        obs, T_gt, out_idx = make_problem(cam, outlier_frac=0.2, seed=1)
        T0 = np.asarray(
            lie.se3_exp(jnp.asarray([0.05, -0.05, 0.05, 0.01, 0.01, 0.0]))
        ) @ T_gt
        res = pose_optimization(jnp.asarray(T0, jnp.float32), obs, cam)
        rot, trans = pose_error(res.T_cw, T_gt)
        assert rot < 0.2 and trans < 0.05, (rot, trans)
        inlier = np.asarray(res.inlier)
        assert inlier[out_idx].mean() < 0.1  # outliers flagged
        assert inlier.mean() > 0.6

    def test_stereo_observations(self, cam):
        obs, T_gt, _ = make_problem(cam, stereo=True, seed=2)
        T0 = np.asarray(
            lie.se3_exp(jnp.asarray([0.08, 0.02, -0.06, -0.02, 0.02, 0.01]))
        ) @ T_gt
        res = pose_optimization(jnp.asarray(T0, jnp.float32), obs, cam)
        rot, trans = pose_error(res.T_cw, T_gt)
        assert rot < 0.1 and trans < 0.02, (rot, trans)

    def test_invalid_obs_ignored(self, cam):
        obs, T_gt, _ = make_problem(cam, seed=3)
        # Mark half invalid with garbage measurements.
        uv = np.asarray(obs.uv).copy()
        uv[150:] = 1e5
        obs = obs._replace(
            uv=jnp.asarray(uv),
            valid=jnp.asarray(np.arange(300) < 150),
        )
        T0 = np.asarray(
            lie.se3_exp(jnp.asarray([0.05, 0.0, 0.05, 0.01, -0.01, 0.0]))
        ) @ T_gt
        res = pose_optimization(jnp.asarray(T0, jnp.float32), obs, cam)
        rot, trans = pose_error(res.T_cw, T_gt)
        assert rot < 0.2 and trans < 0.03, (rot, trans)
        assert int(res.n_inliers) <= 150
