import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.solvers import lie


def random_rotations(n, rng, max_angle=np.pi - 0.2):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-max_angle, max_angle, size=(n, 1))
    return axis * angle


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = jnp.asarray(random_rotations(64, rng), jnp.float32)
        R = lie.so3_exp(phi)
        phi2 = lie.so3_log(R)
        np.testing.assert_allclose(phi, phi2, atol=2e-4)

    def test_orthonormal(self, rng):
        phi = jnp.asarray(random_rotations(16, rng), jnp.float32)
        R = lie.so3_exp(phi)
        I = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(I, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]], jnp.float32)
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)
        assert np.all(np.isfinite(lie.so3_log(R)))

    def test_near_pi(self):
        phi = jnp.array([[np.pi - 1e-5, 0.0, 0.0]], jnp.float32)
        R = lie.so3_exp(phi)
        phi2 = lie.so3_log(R)
        # Angle magnitude must match (axis sign can flip at pi).
        np.testing.assert_allclose(
            np.linalg.norm(phi2), np.pi - 1e-5, atol=1e-3
        )


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(
            np.concatenate(
                [rng.normal(size=(32, 3)), random_rotations(32, rng, 2.5)], -1
            ),
            jnp.float32,
        )
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(xi, xi2, atol=5e-4)

    def test_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)) * 0.5, jnp.float32)
        T = lie.se3_exp(xi)
        TT = jnp.einsum("nij,njk->nik", T, lie.se3_inverse(T))
        np.testing.assert_allclose(TT, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_apply(self):
        T = lie.se3_exp(jnp.array([1.0, 2.0, 3.0, 0, 0, 0], jnp.float32))
        p = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        np.testing.assert_allclose(lie.se3_apply(T, p), [2.0, 3.0, 4.0], atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.concatenate(
            [
                rng.normal(size=(32, 3)),
                random_rotations(32, rng, 2.0),
                rng.uniform(-0.5, 0.5, size=(32, 1)),
            ],
            -1,
        ).astype(np.float32)
        S = lie.sim3_exp(jnp.asarray(xi))
        xi2 = lie.sim3_log(S)
        np.testing.assert_allclose(xi, xi2, atol=2e-3)

    def test_scale_recovery(self, rng):
        xi = jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.1, 0.4], jnp.float32)
        S = lie.sim3_exp(xi)
        R, t, s = lie.sim3_from_mat(S)
        np.testing.assert_allclose(s, np.exp(0.4), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(R) @ np.asarray(R).T, np.eye(3), atol=1e-5
        )

    def test_identity(self):
        S = lie.sim3_exp(jnp.zeros(7, jnp.float32))
        np.testing.assert_allclose(S, np.eye(4), atol=1e-6)

    def test_inverse(self, rng):
        xi = jnp.asarray(
            np.concatenate(
                [rng.normal(size=(4, 3)), random_rotations(4, rng, 1.5),
                 rng.uniform(-0.3, 0.3, size=(4, 1))], -1
            ), jnp.float32)
        S = lie.sim3_exp(xi)
        SS = jnp.einsum("nij,njk->nik", S, lie.sim3_inverse_mat(S))
        np.testing.assert_allclose(SS, np.tile(np.eye(4), (4, 1, 1)), atol=1e-4)

    def test_sim3_equals_se3_at_zero_scale(self, rng):
        xi6 = jnp.asarray(rng.normal(size=(8, 6)) * 0.4, jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1), jnp.float32)], -1)
        np.testing.assert_allclose(
            lie.sim3_exp(xi7), lie.se3_exp(xi6), atol=1e-5
        )
