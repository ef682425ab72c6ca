"""Keyframe-pool compaction (map_state.compact_map) + trajectory
re-anchoring (Tracker._reanchor_culled_refs).

The reference keeps culled KeyFrames as heap objects and walks their
spanning-tree parents at trajectory-save time (System::SaveTrajectoryTUM,
System.cc:≈270); our pool equivalent re-anchors eagerly and compacts slots.
"""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models import map_state as ms
from orbslam2_tpu.models.system import Sensor, SlamSystem
from orbslam2_tpu.utils import synthetic


def small_settings(max_kf=96):
    return Settings(
        camera=CameraSettings(
            fx=320.0, fy=320.0, cx=160.0, cy=120.0,
            k1=0, k2=0, p1=0, p2=0, k3=0,
            width=320, height=240, bf=32.0, th_depth=40.0,
            depth_map_factor=1.0,
        ),
        orb=OrbSettings(n_features=800, n_levels=4),
        tpu=TpuSettings(max_keypoints=1024, max_keyframes=max_kf,
                        max_points=8192, min_init_matches=50),
    )


@pytest.fixture(scope="module")
def tracked_system():
    s = small_settings()
    cam = s.camera_model()
    seq = synthetic.make_sequence(
        cam, n_frames=14, n_points=400, with_depth=True, seed=11
    )
    sys = SlamSystem(s, Sensor.RGBD)
    for i in range(seq.images.shape[0]):
        sys.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
    sys.tracker.flush()
    return sys, seq


class TestCompactMap:
    def test_reanchor_then_compact_preserves_trajectory(self, tracked_system):
        import jax.numpy as jnp

        sys, seq = tracked_system
        t = sys.tracker
        before = t.poses_wc()
        n_kf_before = int(t.map.n_kf)
        assert n_kf_before >= 4, "fixture must create several keyframes"

        # Simulate KeyFrameCulling of two interior keyframes (never the
        # current ref, never roots 0/1).
        victims = [2, 3]
        assert t.ref_kf not in victims
        kf_valid = np.asarray(t.map.kf_valid).copy()
        for v in victims:
            kf_valid[v] = False
        t.map = t.map._replace(kf_valid=jnp.asarray(kf_valid))

        t._reanchor_culled_refs()
        # After re-anchoring no trajectory entry references a culled KF.
        for _, _, ref, _ in t.trajectory:
            assert kf_valid[ref], f"entry still referencing culled KF {ref}"
        mid = t.poses_wc()
        np.testing.assert_allclose(mid, before, rtol=1e-4, atol=1e-4)

        m2, kf_map = ms.compact_map(t.map)
        assert int(m2.n_kf) == n_kf_before - len(victims)
        for v in victims:
            assert kf_map[v] == -1
        # Apply the remap as Tracker._maybe_compact would.
        t.map = m2
        t.ref_kf = max(int(kf_map[t.ref_kf]), 0)
        t.trajectory = [
            (fid, T, max(int(kf_map[ref]), 0), lost)
            for fid, T, ref, lost in t.trajectory
        ]
        after = t.poses_wc()
        np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-4)
        # Parents were remapped to surviving ancestors.
        par = np.asarray(t.map.kf_parent)[: int(t.map.n_kf)]
        assert (par < int(t.map.n_kf)).all()
        valid = np.asarray(t.map.kf_valid)
        for k in range(1, int(t.map.n_kf)):
            assert par[k] < 0 or valid[par[k]]

    def test_database_remap_matches_rescore(self, tracked_system):
        """Database rows follow the keyframe remap: scoring a fixed query
        before and after remap gives identical scores at the remapped ids."""
        import jax.numpy as jnp

        from orbslam2_tpu.models.kf_database import KeyframeDatabase
        from orbslam2_tpu.ops.bow import train_vocabulary

        sys, _ = tracked_system
        t = sys.tracker
        m = t.map
        n_kf = int(m.n_kf)
        assert n_kf >= 4
        rng = np.random.default_rng(3)
        descs = rng.integers(0, 2**32, size=(600, 8), dtype=np.uint32)
        vocab = train_vocabulary(descs, k=5, levels=3, seed=0)
        db = KeyframeDatabase(vocab, m.kf_capacity, m.feat_capacity)
        for k in range(n_kf):
            db.add_keyframe(k, m.kf_desc[k], m.kf_kp_valid[k])

        q_desc, q_valid = m.kf_desc[0], m.kf_kp_valid[0]
        before = np.asarray(db._scores(q_desc, q_valid))

        drop = 2
        kf_map = np.full(m.kf_capacity, -1, np.int64)
        keep = [k for k in range(n_kf) if k != drop]
        kf_map[keep] = np.arange(len(keep))
        db.remap(kf_map)
        after = np.asarray(db._scores(q_desc, q_valid))
        has = np.asarray(db.has_entry)
        for old in keep:
            new = int(kf_map[old])
            assert has[new]
            np.testing.assert_allclose(after[new], before[old], rtol=1e-5)
        assert not has[len(keep):].any()

    def test_compact_noop_when_nothing_culled(self, tracked_system):
        sys, _ = tracked_system
        t = sys.tracker
        m2, kf_map = ms.compact_map(t.map)
        live = np.nonzero(np.asarray(t.map.kf_valid))[0]
        assert int(m2.n_kf) == len(live)


class TestForcedCompaction:
    @pytest.mark.slow
    def test_cull_compact_then_keep_tracking(self):
        """Mid-run: cull a batch of interior keyframes (as KeyFrameCulling
        would on a redundant stretch), compact through the tracker's public
        maintenance path, and keep tracking — the remapped ids (ref KF,
        trajectory, chained ctx) must stay consistent end-to-end."""
        import jax.numpy as jnp

        s = small_settings(max_kf=24)
        cam = s.camera_model()
        seq = synthetic.make_loop_sequence(
            cam, n_frames=60, circle_radius=1.5, with_depth=True, seed=5
        )
        sys = SlamSystem(s, Sensor.RGBD)
        for i in range(40):
            sys.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
        sys.tracker.flush()
        t = sys.tracker
        n_before = int(t.map.n_kf)
        assert n_before >= 20, "fixture should nearly fill the tiny pool"

        # Cull interior keyframes (protect 0/1, the current ref, and the
        # last few the tracker still matches against).
        kf_valid = np.asarray(t.map.kf_valid).copy()
        protect = {0, 1, t.ref_kf, n_before - 1, n_before - 2}
        victims = [k for k in range(2, n_before - 2) if k not in protect][::2]
        for v in victims:
            kf_valid[v] = False
        t.map = t.map._replace(kf_valid=jnp.asarray(kf_valid))
        t._reanchor_culled_refs()
        t._maybe_compact()
        assert t.metrics.get("compactions", 0) >= 1, "compaction did not fire"
        assert int(t.map.n_kf) == n_before - len(victims)

        # Keep tracking on the compacted map.
        for i in range(40, 60):
            sys.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
        sys.tracker.flush()
        assert sys.tracking_state() == 1, "lost after compaction"
        est = sys.poses_wc()
        ate = synthetic.ate_rmse(est, seq.poses_wc, with_scale=False)
        # Culling half the interior keyframes costs accuracy; the gate is
        # staying alive + bounded drift (the untouched run achieves ~0.2).
        assert ate < 1.5, f"post-compaction ATE {ate}"


class TestPointPoolPressure:
    def test_cull_drops_to_budget_keeping_valuable(self):
        """When the point pool exceeds 90% occupancy, cull_map_points drops
        the weakest survivors (few observations / low found ratio) down to
        budget, protecting fresh points."""
        import jax.numpy as jnp

        from orbslam2_tpu.models import map_state as ms
        from orbslam2_tpu.models.local_mapping import cull_map_points

        P, K, N = 256, 4, 64
        m = ms.make_empty_map(K, P, N)
        n_fill = int(0.95 * P)
        rng = np.random.default_rng(0)
        pos = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
        valid = np.zeros(P, bool)
        valid[:n_fill] = True
        # First half: well-observed (bound in 2 KFs); second half: orphans.
        kf_point = np.full((K, N), -1, np.int32)
        strong = np.arange(0, N)  # points 0..63 observed by KFs 0 and 1
        kf_point[0, :] = strong
        kf_point[1, :] = strong
        visible = np.full(P, 10, np.int32)
        found = np.full(P, 3, np.int32)  # ratio 0.3: above the base cull
        found[:N] = 9  # strong points also have high found ratio
        first_kf = np.zeros(P, np.int32)
        first_kf[n_fill - 8:n_fill] = 9  # last 8 are freshly created
        visible[n_fill - 8:n_fill] = 1   # fresh points start at 1/1
        found[n_fill - 8:n_fill] = 1
        m = m._replace(
            pt_pos=jnp.asarray(pos),
            pt_valid=jnp.asarray(valid),
            pt_visible=jnp.asarray(visible),
            pt_found=jnp.asarray(found),
            pt_first_kf=jnp.asarray(first_kf),
            kf_point=jnp.asarray(kf_point),
            kf_kp_valid=jnp.ones((K, N), bool),
            kf_valid=jnp.asarray(np.array([True, True, False, False])),
            n_kf=jnp.int32(10),
            n_pt=jnp.int32(n_fill),
        )
        m2 = cull_map_points(m)
        n_after = int(m2.pt_valid.sum())
        assert n_after <= int(0.90 * P)
        kept = np.asarray(m2.pt_valid)
        # Strong (multi-observed, high found ratio) points survive.
        assert kept[:N].all(), "well-observed points were culled"
        # Fresh points (age < 3) survive the pressure cull.
        assert kept[n_fill - 8:n_fill].all(), "fresh points were culled"
