import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import sys as S
from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.system import Sensor, SlamSystem
from orbslam2_tpu.models.tracking import TrackState
from orbslam2_tpu.utils import synthetic
import orbslam2_tpu.models.local_mapping as lmod
import jax.numpy as jnp
from orbslam2_tpu.models import map_state as ms

seq_fuse = S.argv[1] == "seq"

def small_settings(bf=0.0, th_depth=40.0):
    return Settings(
        camera=CameraSettings(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                              width=320, height=240, bf=bf, th_depth=th_depth,
                              depth_map_factor=1.0),
        orb=OrbSettings(n_features=800, n_levels=4),
        tpu=TpuSettings(max_keypoints=1024, max_keyframes=96, max_points=8192,
                        min_init_matches=50),
    )

if seq_fuse:
    # restore sequential fuse semantics
    orig_pk = lmod.LocalMapper.process_keyframe
    def pk(self, m, kf_id):
        kf = jnp.int32(kf_id)
        m = lmod.cull_map_points(m)
        tri_ids, _ = ms.best_covisible(m, kf, self.n_tri_neighbors)
        m = lmod.triangulate_new_points(m, kf, self.cam, self.scale_factors,
                                        self.sigma2, n_neighbors=self.n_tri_neighbors)
        fuse_ids = None
        if self.enable_fuse:
            nn = self.n_fuse_neighbors
            neighbor_ids, _ = ms.best_covisible(m, kf, nn)
            fuse_ids = neighbor_ids[:nn]
            for i in range(nn):
                nb = neighbor_ids[i]
                m = lmod.fuse_with_neighbor(m, kf, nb, self.cam, self.scale_factors, self.inv_sigma2)
                m = lmod.fuse_with_neighbor(m, nb, kf, self.cam, self.scale_factors, self.inv_sigma2)
        m = ms.update_point_stats(m, self.scale_factors)
        if self.enable_ba:
            m = self._local_ba(m, kf)
        touched = [kf[None], tri_ids]
        if fuse_ids is not None:
            touched.append(fuse_ids)
        m = ms.compute_distinctive_descriptors(m, touched_kfs=jnp.concatenate(touched))
        if self.enable_kf_culling:
            m = lmod.cull_keyframes(m, kf, n_levels=self.settings.orb.n_levels,
                                    bf=self._bf, th_depth=self._cull_th_depth)
        return m
    lmod.LocalMapper.process_keyframe = pk

s = small_settings(bf=32.0)
cam = s.camera_model()
seq = synthetic.make_sequence(cam, n_frames=36, n_points=400, with_depth=True,
                              seed=11, radius=0.1, forward=5.0)
sys_ = SlamSystem(s, Sensor.RGBD, enable_loop_closing=False)
for i in range(10):
    sys_.track_rgbd(seq.images[i], seq.depths[i], seq.timestamps[i])
    print(f"f={i} st={sys_.tracking_state()} in={sys_.tracker.metrics.get('last_inliers')}")
print("state after 10:", sys_.tracking_state())
