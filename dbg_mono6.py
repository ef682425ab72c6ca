import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.system import SlamSystem, Sensor
from orbslam2_tpu.ops.bow import train_vocabulary
from orbslam2_tpu.ops.extractor import OrbExtractor
from orbslam2_tpu.utils import synthetic
from orbslam2_tpu.models import map_state as ms

settings = Settings(
    camera=CameraSettings(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                          width=320, height=240, bf=0.0, th_depth=40.0),
    orb=OrbSettings(n_features=800, n_levels=4),
    tpu=TpuSettings(),
)
cam = settings.camera_model()
seq = synthetic.make_loop_sequence(cam, n_frames=120, circle_radius=1.5,
                                   with_depth=False, seed=5, n_points=2500)
ex = OrbExtractor(settings.orb, settings.tpu)
descs = np.concatenate([
    (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(seq.images[i]))
    for i in range(0, 120, 6)])
vocab = train_vocabulary(descs, k=10, levels=4, seed=0)
sys_ = SlamSystem(settings, Sensor.MONOCULAR, vocabulary=vocab,
                  enable_loop_closing=True)
for i in range(120):
    sys_.track_monocular(seq.images[i], seq.timestamps[i])
sys_.shutdown()
m = sys_.map
db = sys_.loop_closer.db
kfc = int(np.asarray(m.n_kf)) - 2
scores, common = db._scores_for_kf(m, kfc)
row = np.asarray(ms.covisible_row(m, jnp.int32(kfc)))
scores = np.asarray(scores); common = np.asarray(common)
print(f"kf_c={kfc}")
print("early kf scores:", np.round(scores[:12], 3).tolist())
print("early covis row:", row[:12].tolist())
print("early common:", common[:12].astype(int).tolist())
order = np.argsort(-scores[:int(np.asarray(m.n_kf))])
print("top-10 by score:", [(int(k), round(float(scores[k]),3), int(row[k])) for k in order[:10]])
# frame ids of keyframes
fid = np.asarray(m.kf_frame_id)
print("kf 0-12 frame ids:", fid[:12].tolist())
print("kf_c frame id:", fid[kfc])
