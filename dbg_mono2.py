import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import sys as S
from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.system import SlamSystem, Sensor
from orbslam2_tpu.ops.bow import train_vocabulary
from orbslam2_tpu.ops.extractor import OrbExtractor
from orbslam2_tpu.utils import synthetic

n_tri = int(S.argv[1]) if len(S.argv) > 1 else 8

settings = Settings(
    camera=CameraSettings(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                          width=320, height=240, bf=0.0, th_depth=40.0),
    orb=OrbSettings(n_features=800, n_levels=4),
    tpu=TpuSettings(),
)
cam = settings.camera_model()
seq = synthetic.make_loop_sequence(cam, n_frames=84, circle_radius=1.5,
                                   with_depth=False, seed=5, n_points=1500)
ex = OrbExtractor(settings.orb, settings.tpu)
descs = np.concatenate([
    (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(seq.images[i]))
    for i in range(0, 84, 6)])
vocab = train_vocabulary(descs, k=10, levels=4, seed=0)
sys_ = SlamSystem(settings, Sensor.MONOCULAR, vocabulary=vocab,
                  enable_loop_closing=False)
tr = sys_.tracker
tr.local_mapper.n_tri_neighbors = n_tri
lost = 0
for i in range(84):
    sys_.track_monocular(seq.images[i], seq.timestamps[i])
    st = sys_.tracking_state()
    lost += int(st == 2)
    if i % 4 == 0 or (30 <= i <= 40):
        npt = int(np.asarray(sys_.map.pt_valid).sum())
        print(f"f={i:2d} st={st} path={tr.metrics.get('track_path')} "
              f"in={tr.metrics.get('last_inliers')} kf={tr.metrics['keyframes_created']} npt={npt}")
print(f"n_tri={n_tri} lost={lost}")
