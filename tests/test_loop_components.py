"""M6 component tests: BoW, PnP RANSAC, Sim3 solve/opt, pose graph, GBA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import bow as bow_mod
from orbslam2_tpu.ops import pnp as pnp_mod
from orbslam2_tpu.ops import sim3_solve
from orbslam2_tpu.solvers import lie, pose_graph, sim3_opt
from orbslam2_tpu.utils.camera import make_camera

CAM = make_camera(320.0, 320.0, 160.0, 120.0, width=320, height=240)


def rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def perturb_desc(rng, d, n_bits):
    """Flip n_bits random bits of each descriptor."""
    out = d.copy()
    bits = rng.integers(0, 256, size=(len(d), n_bits))
    for i in range(len(d)):
        for b in bits[i]:
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


class TestBow:
    def test_vocab_shapes_and_determinism(self, rng):
        descs = rand_desc(rng, 2000)
        v1 = bow_mod.train_vocabulary(descs, k=5, levels=2, seed=1)
        v2 = bow_mod.train_vocabulary(descs, k=5, levels=2, seed=1)
        assert v1.n_words == 25
        np.testing.assert_array_equal(v1.node_desc, v2.node_desc)

    def test_similar_frames_score_high(self, rng):
        train = rand_desc(rng, 4000)
        vocab = bow_mod.train_vocabulary(train, k=10, levels=3, seed=0)
        tf = bow_mod.BowTransformer(vocab)
        base = rand_desc(rng, 300)
        near = perturb_desc(rng, base, 12)      # ~12 bits flipped: same place
        far = rand_desc(rng, 300)               # unrelated place
        valid = jnp.ones(300, bool)
        b0, w0, _ = tf(jnp.asarray(base), valid)
        b1, _, _ = tf(jnp.asarray(near), valid)
        b2, _, _ = tf(jnp.asarray(far), valid)
        db = jnp.stack([b1, b2])
        scores = np.asarray(bow_mod.l1_scores(b0, db))
        assert scores[0] > scores[1] + 0.1, scores
        assert np.all(scores <= 1.0 + 1e-5) and np.all(scores >= -1e-5)

    def test_words_stable_under_noise(self, rng):
        train = rand_desc(rng, 4000)
        vocab = bow_mod.train_vocabulary(train, k=10, levels=3, seed=0)
        tf = bow_mod.BowTransformer(vocab)
        base = rand_desc(rng, 200)
        near = perturb_desc(rng, base, 6)
        valid = jnp.ones(200, bool)
        _, w0, _ = tf(jnp.asarray(base), valid)
        _, w1, _ = tf(jnp.asarray(near), valid)
        same = np.mean(np.asarray(w0) == np.asarray(w1))
        assert same > 0.35, f"word stability {same}"  # random descs sit near Voronoi
        # boundaries; real (clustered) descriptors are far stabler — the
        # scoring test above is the discriminative gate.


class TestPnp:
    def _scene(self, rng, n=200, outliers=0.3):
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 9, n)],
            -1,
        ).astype(np.float32)
        xi = np.array([0.3, -0.2, 0.4, 0.1, -0.15, 0.05], np.float32)
        T = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        pc = X @ T[:3, :3].T + T[:3, 3]
        uv = np.stack(
            [320 * pc[:, 0] / pc[:, 2] + 160, 320 * pc[:, 1] / pc[:, 2] + 120], -1
        ) + rng.normal(0, 0.5, (n, 2))
        n_out = int(n * outliers)
        idx = rng.choice(n, n_out, replace=False)
        uv[idx] += rng.uniform(30, 100, (n_out, 2))
        return jnp.asarray(uv, jnp.float32), jnp.asarray(X), T, idx

    def test_recovers_pose_with_outliers(self, rng):
        uv, X, T_gt, out_idx = self._scene(rng)
        res = pnp_mod.pnp_ransac(
            uv, X, jnp.ones(len(uv), bool), jnp.ones(len(uv)), CAM,
            jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        d = np.asarray(res.T_cw) @ np.linalg.inv(T_gt)
        rot = np.degrees(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
        assert rot < 2.0 and np.linalg.norm(d[:3, 3]) < 0.1, (rot, d[:3, 3])
        assert np.asarray(res.inliers)[out_idx].mean() < 0.15

    def test_degenerate_fails_gracefully(self, rng):
        uv = jnp.asarray(rng.uniform(0, 300, (50, 2)), jnp.float32)
        X = jnp.asarray(rng.uniform(-3, 3, (50, 3)), jnp.float32)
        res = pnp_mod.pnp_ransac(
            uv, X, jnp.zeros(50, bool), jnp.ones(50), CAM, jax.random.PRNGKey(1)
        )
        assert not bool(res.ok)


class TestSim3:
    def _pairs(self, rng, n=80, scale=1.4, noise=0.0, outliers=0.0):
        p2 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n)],
            -1,
        ).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.3, -0.2], jnp.float32)))
        t = np.array([0.5, -0.3, 0.8], np.float32)
        p1 = scale * p2 @ R.T + t + rng.normal(0, noise, (n, 3)).astype(np.float32)
        n_out = int(n * outliers)
        idx = rng.choice(n, n_out, replace=False)
        p1[idx] += rng.uniform(1, 3, (n_out, 3))
        return jnp.asarray(p1), jnp.asarray(p2), R, t, scale, idx

    def test_horn_exact(self, rng):
        p1, p2, R, t, s, _ = self._pairs(rng)
        R_est, t_est, s_est = sim3_solve.horn_sim3(p1, p2, fix_scale=False)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)
        np.testing.assert_allclose(float(s_est), s, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)

    def test_horn_fix_scale(self, rng):
        p1, p2, R, t, s, _ = self._pairs(rng, scale=1.0)
        R_est, t_est, s_est = sim3_solve.horn_sim3(p1, p2, fix_scale=True)
        assert float(s_est) == 1.0
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)

    def test_ransac_with_outliers(self, rng):
        p1, p2, R, t, s, out_idx = self._pairs(
            rng, noise=0.01, outliers=0.3
        )
        # Need camera-frame projections to be in front: both clouds have
        # positive z by construction.
        n = p1.shape[0]
        res = sim3_solve.sim3_ransac(
            p1, p2, jnp.ones(n, bool),
            jnp.full(n, 9.21 * 4), jnp.full(n, 7.78 * 4), CAM,
            jax.random.PRNGKey(0), fix_scale=False,
        )
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R12), R, atol=0.02)
        np.testing.assert_allclose(float(res.s12), s, rtol=0.02)

    def test_optimize_sim3_refines(self, rng):
        p1, p2, R, t, s, _ = self._pairs(rng, noise=0.005)
        n = p1.shape[0]
        uv1 = np.stack(
            [320 * np.asarray(p1)[:, 0] / np.asarray(p1)[:, 2] + 160,
             320 * np.asarray(p1)[:, 1] / np.asarray(p1)[:, 2] + 120], -1)
        uv2 = np.stack(
            [320 * np.asarray(p2)[:, 0] / np.asarray(p2)[:, 2] + 160,
             320 * np.asarray(p2)[:, 1] / np.asarray(p2)[:, 2] + 120], -1)
        # Perturbed init
        S0 = lie.sim3_to_mat(
            jnp.asarray(R @ np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.02, 0.01])))),
            jnp.asarray(t + 0.1), jnp.asarray(s * 1.05),
        )
        res = sim3_opt.optimize_sim3(
            S0, p1, p2, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), CAM,
        )
        R_f, t_f, s_f = lie.sim3_from_mat(res.S12)
        np.testing.assert_allclose(np.asarray(R_f), R, atol=5e-3)
        np.testing.assert_allclose(float(s_f), s, rtol=5e-3)
        assert int(res.n_inliers) > 70


class TestPoseGraph:
    @pytest.mark.slow
    def test_loop_correction_spreads_drift(self, rng):
        """Chain of K keyframes with accumulated drift; a loop edge between
        first and last pulls the chain back; the graph distributes it."""
        K = 12
        # Ground truth: poses along a line.
        gt = []
        for i in range(K):
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = -0.5 * i  # T_cw translation
            gt.append(T)
        gt = np.stack(gt)
        # Drifted estimate: small per-step error accumulating.
        drift = np.eye(4, dtype=np.float32)
        est = [gt[0]]
        for i in range(1, K):
            step = np.asarray(
                lie.se3_exp(jnp.asarray(
                    np.concatenate([[-0.5 + 0.03, 0.01, 0.0], [0, 0.01, 0]]
                                   ).astype(np.float32)))
            )
            est.append((step @ est[-1]).astype(np.float32))
        est = np.stack(est)

        kf_valid = jnp.ones(K, bool)
        parent = jnp.asarray(np.arange(K) - 1, jnp.int32)
        covis = jnp.zeros((K, K), jnp.int32)
        # Loop edge: measurement = TRUE relative pose between 0 and K-1.
        S_ji = jnp.asarray((gt[K - 1] @ np.linalg.inv(gt[0]))[None])
        edges = pose_graph.edges_from_map(
            jnp.asarray(est), kf_valid, parent, covis,
            loop_i=jnp.asarray([0], jnp.int32),
            loop_j=jnp.asarray([K - 1], jnp.int32),
            loop_S_ji=S_ji, loop_valid=jnp.asarray([True]),
        )
        fixed = jnp.zeros(K, bool).at[0].set(True)
        T_new, s_new = pose_graph.optimize_essential_graph(
            jnp.asarray(est), kf_valid, edges, fixed, iters=30,
        )
        err_before = np.linalg.norm(est[K - 1] @ np.linalg.inv(gt[K - 1]) - np.eye(4))
        err_after = np.linalg.norm(
            np.asarray(T_new)[K - 1] @ np.linalg.inv(gt[K - 1]) - np.eye(4)
        )
        assert err_after < 0.35 * err_before, (err_before, err_after)


class TestGlobalBA:
    def test_reduces_reprojection_error(self, rng):
        from orbslam2_tpu.models import map_state as ms
        from orbslam2_tpu.solvers.global_ba import global_bundle_adjustment

        K, N, P = 6, 64, 256
        m = ms.make_empty_map(K, P, N)
        X = np.stack(
            [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(4, 9, P)],
            -1,
        ).astype(np.float32)
        poses, kf_xy, kf_pt = [], [], []
        for k in range(K):
            T = np.asarray(
                lie.se3_exp(jnp.asarray(
                    np.array([0.3 * k, 0.01 * k, 0, 0, 0.02 * k, 0], np.float32)))
            )
            poses.append(T)
            ids = rng.choice(P, N, replace=False)
            pc = X[ids] @ T[:3, :3].T + T[:3, 3]
            uv = np.stack(
                [320 * pc[:, 0] / pc[:, 2] + 160, 320 * pc[:, 1] / pc[:, 2] + 120],
                -1,
            ) + rng.normal(0, 0.3, (N, 2))
            kf_xy.append(uv)
            kf_pt.append(ids)
        m = m._replace(
            kf_pose_cw=jnp.asarray(np.stack(poses)),
            kf_xy=jnp.asarray(np.stack(kf_xy), jnp.float32),
            kf_point=jnp.asarray(np.stack(kf_pt), jnp.int32),
            kf_kp_valid=jnp.ones((K, N), bool),
            kf_valid=jnp.ones(K, bool),
            pt_pos=jnp.asarray(X + rng.normal(0, 0.05, X.shape).astype(np.float32)),
            pt_valid=jnp.ones(P, bool),
            n_kf=jnp.int32(K), n_pt=jnp.int32(P),
        )
        # Perturb poses (except gauge KF0).
        pp = np.stack(poses).copy()
        for k in range(1, K):
            d = rng.normal(0, 0.02, 6).astype(np.float32)
            pp[k] = np.asarray(lie.se3_exp(jnp.asarray(d))) @ pp[k]
        m = m._replace(kf_pose_cw=jnp.asarray(pp))

        def mean_chi2(mm):
            from orbslam2_tpu.solvers.global_ba import CHI2_MONO  # noqa
            R = mm.kf_pose_cw[:, :3, :3]
            t = mm.kf_pose_cw[:, :3, 3]
            Xp = mm.pt_pos[mm.kf_point]
            pc = jnp.einsum("kij,knj->kni", R, Xp) + t[:, None, :]
            z = jnp.maximum(pc[..., 2], 1e-6)
            u = 320 * pc[..., 0] / z + 160
            v = 320 * pc[..., 1] / z + 120
            e = (u - mm.kf_xy[..., 0]) ** 2 + (v - mm.kf_xy[..., 1]) ** 2
            return float(jnp.mean(e))

        cam = CAM
        e0 = mean_chi2(m)
        m2 = global_bundle_adjustment(m, cam, jnp.ones(8), rounds=8)
        e1 = mean_chi2(m2)
        assert e1 < 0.25 * e0, (e0, e1)

    def _clean_problem(self, rng, K=6, N=64, P=256):
        from orbslam2_tpu.models import map_state as ms

        m = ms.make_empty_map(K, P, N)
        X = np.stack(
            [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(4, 9, P)],
            -1,
        ).astype(np.float32)
        poses, kf_xy, kf_pt = [], [], []
        for k in range(K):
            T = np.asarray(
                lie.se3_exp(jnp.asarray(
                    np.array([0.3 * k, 0.01 * k, 0, 0, 0.02 * k, 0], np.float32)))
            )
            poses.append(T)
            ids = rng.choice(P, N, replace=False)
            pc = X[ids] @ T[:3, :3].T + T[:3, 3]
            uv = np.stack(
                [320 * pc[:, 0] / pc[:, 2] + 160, 320 * pc[:, 1] / pc[:, 2] + 120],
                -1,
            ) + rng.normal(0, 0.3, (N, 2))
            kf_xy.append(uv)
            kf_pt.append(ids)
        m = m._replace(
            kf_pose_cw=jnp.asarray(np.stack(poses)),
            kf_xy=jnp.asarray(np.stack(kf_xy), jnp.float32),
            kf_point=jnp.asarray(np.stack(kf_pt), jnp.int32),
            kf_kp_valid=jnp.ones((K, N), bool),
            kf_valid=jnp.ones(K, bool),
            pt_pos=jnp.asarray(X),
            pt_valid=jnp.ones(P, bool),
            n_kf=jnp.int32(K), n_pt=jnp.int32(P),
        )
        return m, np.stack(poses), X

    @pytest.mark.slow
    def test_joint_gba_unbinds_wrong_associations(self, rng):
        """The persistent chi2 hygiene: observations bound to the WRONG
        map point (never cleaned because local BA didn't run) must be
        unbound by GBA, and the refined poses must land near truth instead
        of being dragged by the outliers in the plain phase."""
        from orbslam2_tpu.solvers.global_ba import run_joint_global_ba

        m, poses_gt, X = self._clean_problem(rng)
        K, N = m.kf_point.shape
        # Corrupt 8% of bindings per keyframe to random other points.
        kf_pt = np.asarray(m.kf_point).copy()
        n_bad = int(0.08 * N)
        wrong = np.zeros((K, N), bool)
        for k in range(K):
            bad = rng.choice(N, n_bad, replace=False)
            kf_pt[k, bad] = (kf_pt[k, bad] + 37) % X.shape[0]
            wrong[k, bad] = True
        # Perturb free poses so the solver has real work to do.
        pp = poses_gt.copy()
        for k in range(1, K):
            d = rng.normal(0, 0.01, 6).astype(np.float32)
            pp[k] = np.asarray(lie.se3_exp(jnp.asarray(d))) @ pp[k]
        m = m._replace(kf_point=jnp.asarray(kf_pt), kf_pose_cw=jnp.asarray(pp))

        m2 = run_joint_global_ba(
            m, CAM, jnp.ones(8), phase_iters=(5, 10), initial_prune=6.0,
        )
        still_bound = np.asarray(m2.kf_point) >= 0
        frac_wrong_kept = float(still_bound[wrong].mean())
        assert frac_wrong_kept < 0.15, frac_wrong_kept
        # Pose recovery: translation error vs truth small despite outliers.
        terr = np.linalg.norm(
            np.asarray(m2.kf_pose_cw)[:, :3, 3] - poses_gt[:, :3, 3], axis=-1
        )
        assert float(terr.max()) < 0.03, terr

    def test_loop_edge_guard(self, rng):
        """loop_edges_still_closed rejects a pose set that re-opens a
        verified loop edge and accepts one that keeps it closed."""
        from orbslam2_tpu.models.loop_closing import (
            loop_edge_residuals, loop_edges_still_closed,
        )

        T0 = np.eye(4, dtype=np.float32)
        T9 = np.asarray(lie.se3_exp(jnp.asarray(
            np.array([1.0, 0, 0, 0, 0.2, 0], np.float32))))
        poses = np.stack([T0, T9])
        S = T9 @ np.linalg.inv(T0)  # exact: residual ~ 0
        edges = [(0, 1, S)]
        r0 = loop_edge_residuals(poses, edges)
        assert r0[0][0] < 1e-5 and r0[0][1] < 1e-4
        # Small drift (noise scale): still accepted.
        T9b = np.asarray(lie.se3_exp(jnp.asarray(
            np.array([0.003, 0, 0, 0, 0, 0], np.float32)))) @ T9
        r1 = loop_edge_residuals(np.stack([T0, T9b]), edges)
        assert loop_edges_still_closed(r0, r1)
        # Seam re-opened by 5 cm: rejected.
        T9c = np.asarray(lie.se3_exp(jnp.asarray(
            np.array([0.05, 0, 0, 0, 0, 0], np.float32)))) @ T9
        r2 = loop_edge_residuals(np.stack([T0, T9c]), edges)
        assert not loop_edges_still_closed(r0, r2)


class TestSparseBow:
    def test_sparse_matches_dense(self, rng):
        train = rand_desc(rng, 4000)
        vocab = bow_mod.train_vocabulary(train, k=10, levels=3, seed=0)
        tf = bow_mod.BowTransformer(vocab)
        d1, d2 = rand_desc(rng, 300), rand_desc(rng, 300)
        valid = jnp.ones(300, bool)
        b1, w1, _ = tf(jnp.asarray(d1), valid)
        b2, w2, _ = tf(jnp.asarray(d2), valid)
        sw1, swt1 = bow_mod.sparse_bow(w1, vocab.idf, vocab.n_words)
        sw2, swt2 = bow_mod.sparse_bow(w2, vocab.idf, vocab.n_words)
        dense = float(bow_mod.l1_scores(b1, b2[None])[0])
        sparse = float(bow_mod.l1_scores_sparse(
            sw1, swt1, sw2[None], swt2[None], vocab.n_words)[0])
        np.testing.assert_allclose(sparse, dense, atol=1e-5)
        # Self-score is exactly 1 for L1-normalized vectors.
        self_s = float(bow_mod.l1_scores_sparse(
            sw1, swt1, sw1[None], swt1[None], vocab.n_words)[0])
        np.testing.assert_allclose(self_s, 1.0, atol=1e-5)

    def test_partial_validity(self, rng):
        train = rand_desc(rng, 2000)
        vocab = bow_mod.train_vocabulary(train, k=8, levels=2, seed=1)
        tf = bow_mod.BowTransformer(vocab)
        d = rand_desc(rng, 100)
        valid = jnp.asarray(np.arange(100) < 60)
        b, w, _ = tf(jnp.asarray(d), valid)
        sw, swt = bow_mod.sparse_bow(w, vocab.idf, vocab.n_words)
        assert abs(float(jnp.sum(swt)) - 1.0) < 1e-5
        assert int((sw >= 0).sum()) <= 60


class TestFuse:
    def test_fuse_binds_true_duplicates(self, rng):
        """fuse_with_neighbor must bind kf_a's points to kf_b's matching
        unbound keypoints when geometry + descriptors agree."""
        import jax
        from orbslam2_tpu.models import map_state as ms2
        from orbslam2_tpu.models.local_mapping import fuse_with_neighbor
        from orbslam2_tpu.solvers import lie as lie2

        K, N, P = 4, 64, 256
        m = ms2.make_empty_map(K, P, N)
        X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(4, 8, N)], -1).astype(np.float32)
        desc = rand_desc(rng, N)
        T_a = np.eye(4, dtype=np.float32)
        T_b = np.asarray(lie2.se3_exp(jnp.asarray(
            [0.3, 0.0, 0.0, 0.0, 0.02, 0.0], jnp.float32)))

        def project(T):
            pc = X @ T[:3, :3].T + T[:3, 3]
            return np.stack([320 * pc[:, 0] / pc[:, 2] + 160,
                             320 * pc[:, 1] / pc[:, 2] + 120], -1)

        m = m._replace(
            kf_pose_cw=m.kf_pose_cw.at[0].set(jnp.asarray(T_a)).at[1].set(jnp.asarray(T_b)),
            kf_xy=m.kf_xy.at[0].set(jnp.asarray(project(T_a), jnp.float32))
                        .at[1].set(jnp.asarray(project(T_b), jnp.float32)),
            kf_desc=m.kf_desc.at[0].set(jnp.asarray(desc)).at[1].set(jnp.asarray(desc)),
            kf_kp_valid=m.kf_kp_valid.at[0].set(True).at[1].set(True),
            # kf_a observes points 0..N-1; kf_b starts UNBOUND.
            kf_point=m.kf_point.at[0].set(jnp.arange(N)),
            kf_valid=m.kf_valid.at[0].set(True).at[1].set(True),
            pt_pos=m.pt_pos.at[:N].set(jnp.asarray(X)),
            pt_desc=m.pt_desc.at[:N].set(jnp.asarray(desc)),
            pt_valid=m.pt_valid.at[:N].set(True),
            # Scale band centered on the actual viewing distance so
            # predict_scale lands on octave 0-1 (matching the level-0 kps).
            pt_max_dist=m.pt_max_dist.at[:N].set(
                jnp.asarray(np.linalg.norm(X, axis=1) * 1.05, jnp.float32)
            ),
            pt_min_dist=m.pt_min_dist.at[:N].set(0.1),
            n_kf=jnp.int32(2), n_pt=jnp.int32(N),
        )
        cam = CAM
        scales = jnp.asarray([1.2 ** i for i in range(4)], jnp.float32)
        inv_s2 = 1.0 / (scales * scales)
        m2 = fuse_with_neighbor(
            m, jnp.int32(0), jnp.int32(1), cam, scales, inv_s2
        )
        bound = np.asarray(m2.kf_point[1])
        n_bound = int((bound >= 0).sum())
        assert n_bound > N * 0.6, f"only {n_bound} fused bindings"
        # Bindings must be the CORRECT point ids (keypoint i <-> point i).
        idx = np.nonzero(bound >= 0)[0]
        assert np.mean(bound[idx] == idx) > 0.95


class TestGroupedCandidateScoring:
    def test_aliased_candidate_rejected_by_group_accumulation(self, rng):
        """KeyFrameDatabase.cc:≈90-200 parity: a lone perceptually-aliased
        keyframe scores as high as the true revisit on raw L1, but the true
        revisit is corroborated by its covisible group's scores and the
        alias is not — the accumulated-score 0.75 cut must keep the true
        group's winner and drop the alias."""
        import jax.numpy as jnp

        from orbslam2_tpu.models import map_state as ms2
        from orbslam2_tpu.models.kf_database import KeyframeDatabase
        from orbslam2_tpu.models.system import _default_vocabulary

        vocab = _default_vocabulary()
        K, N, P = 16, 64, 1024
        db = KeyframeDatabase(vocab, K, feat_capacity=N)
        m = ms2.make_empty_map(K, P, N)

        q_desc = rand_desc(rng, N)          # query appearance
        near = q_desc.copy()
        # True-revisit neighborhood: mostly-shared words (they must pass the
        # 0.8*maxCommonWords gate, as real co-observing keyframes do).
        near[: N // 8] = rand_desc(rng, N // 8)
        other = rand_desc(rng, N)                 # unrelated scenery

        descs = {2: q_desc.copy(), 1: near.copy(), 3: near.copy(), 7: q_desc.copy()}
        # Alias KF7's neighbors look nothing like the query.
        for k in range(12):
            d = descs.get(k, other.copy() if k in (6, 8) else rand_desc(rng, N))
            valid = jnp.ones(N, bool)
            db.add_keyframe(k, jnp.asarray(d), valid)
            m = m._replace(
                kf_desc=m.kf_desc.at[k].set(jnp.asarray(d)),
                kf_kp_valid=m.kf_kp_valid.at[k].set(True),
                kf_valid=m.kf_valid.at[k].set(True),
            )
        # Covisibility: chain neighbors share points (1-2-3 and 6-7-8).
        kf_point = np.full((K, N), -1, np.int64)
        for a, b, base in ((1, 2, 0), (2, 3, 40), (6, 7, 200), (7, 8, 240)):
            ids = np.arange(base, base + 30)
            kf_point[a, 0:30] = ids
            kf_point[b, 30:60] = ids
        pt_valid = np.zeros(P, bool)
        pt_valid[np.unique(kf_point[kf_point >= 0])] = True
        m = m._replace(
            kf_point=jnp.asarray(kf_point, jnp.int32),
            pt_valid=jnp.asarray(pt_valid),
            n_kf=jnp.int32(12),
        )
        # Raw top-k would admit the alias: its L1 score equals KF2's.
        scores = np.asarray(db._scores(jnp.asarray(q_desc), jnp.ones(N, bool)))
        assert scores[7] >= 0.95 * scores[2], (scores[2], scores[7])

        ids = db.detect_relocalization_candidates(
            m, jnp.asarray(q_desc), jnp.ones(N, bool), n_candidates=2
        )
        assert len(ids) >= 1
        assert ids[0] == 2, f"true revisit must rank first, got {ids}"
        assert 7 not in ids.tolist(), f"aliased KF admitted: {ids}"


class TestSparseDatabase:
    def test_sparse_database_matches_dense(self, rng):
        """A sparse-mode KeyframeDatabase must return the same scores and
        candidates as the dense mode on the same data."""
        from orbslam2_tpu.models import map_state as ms2
        from orbslam2_tpu.models.kf_database import KeyframeDatabase
        import orbslam2_tpu.models.kf_database as kdb

        train = rand_desc(rng, 4000)
        vocab = bow_mod.train_vocabulary(train, k=10, levels=3, seed=0)
        m = ms2.make_empty_map(8, 64, 32)
        m = m._replace(kf_valid=jnp.ones(8, bool), n_kf=jnp.int32(8))

        dbs = []
        for force_sparse in (False, True):
            old = kdb._DENSE_MAX_WORDS
            kdb._DENSE_MAX_WORDS = 1 if force_sparse else old
            try:
                db = KeyframeDatabase(vocab, 8, feat_capacity=128)
            finally:
                kdb._DENSE_MAX_WORDS = old
            assert db.sparse == force_sparse
            for k in range(6):
                d = rand_desc(np.random.default_rng(1000 + k), 100)
                db.add_keyframe(k, jnp.asarray(d), jnp.ones(100, bool))
            dbs.append(db)

        q = rand_desc(np.random.default_rng(99), 100)
        s_dense = np.asarray(dbs[0]._scores(jnp.asarray(q), jnp.ones(100, bool)))
        s_sparse = np.asarray(dbs[1]._scores(jnp.asarray(q), jnp.ones(100, bool)))
        np.testing.assert_allclose(s_sparse[:6], s_dense[:6], atol=1e-5)
        c_dense = dbs[0].detect_relocalization_candidates(
            m, jnp.asarray(q), jnp.ones(100, bool))
        c_sparse = dbs[1].detect_relocalization_candidates(
            m, jnp.asarray(q), jnp.ones(100, bool))
        np.testing.assert_array_equal(c_dense, c_sparse)
