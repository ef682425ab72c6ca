import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import sys as S
from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.system import SlamSystem, Sensor
from orbslam2_tpu.ops.bow import train_vocabulary
from orbslam2_tpu.ops.extractor import OrbExtractor
from orbslam2_tpu.utils import synthetic

n_frames = int(S.argv[1]); radius = float(S.argv[2]); ba = S.argv[3] == "ba"
settings = Settings(
    camera=CameraSettings(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                          width=320, height=240, bf=0.0, th_depth=40.0),
    orb=OrbSettings(n_features=800, n_levels=4),
    tpu=TpuSettings(),
)
cam = settings.camera_model()
seq = synthetic.make_loop_sequence(cam, n_frames=n_frames, circle_radius=radius,
                                   with_depth=False, seed=5, n_points=2500)
ex = OrbExtractor(settings.orb, settings.tpu)
descs = np.concatenate([
    (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(seq.images[i]))
    for i in range(0, n_frames, 6)])
vocab = train_vocabulary(descs, k=10, levels=4, seed=0)
sys_ = SlamSystem(settings, Sensor.MONOCULAR, vocabulary=vocab,
                  enable_loop_closing=True)
if not ba:
    sys_.local_mapper.enable_ba = False
lost = 0
for i in range(n_frames):
    sys_.track_monocular(seq.images[i], seq.timestamps[i])
    lost += int(sys_.tracking_state() == 2)
sys_.shutdown()
lc = sys_.loop_closer
loops = [(a, b) for a, b, _ in lc.loop_edges]
ate = synthetic.ate_rmse(sys_.poses_wc(), seq.poses_wc, with_scale=True)
rej = {k: v for k, v in lc.metrics.items() if "reject" in k}
print(f"n={n_frames} r={radius} ba={ba}: lost={lost} loops={loops} ate={ate:.3f} rej={rej}")
