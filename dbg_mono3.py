import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import sys as S
from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.system import SlamSystem, Sensor
from orbslam2_tpu.ops.bow import train_vocabulary
from orbslam2_tpu.ops.extractor import OrbExtractor
from orbslam2_tpu.utils import synthetic

n_frames = int(S.argv[1]); n_points = int(S.argv[2]); seed = int(S.argv[3])
settings = Settings(
    camera=CameraSettings(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                          width=320, height=240, bf=0.0, th_depth=40.0),
    orb=OrbSettings(n_features=800, n_levels=4),
    tpu=TpuSettings(),
)
cam = settings.camera_model()
seq = synthetic.make_loop_sequence(cam, n_frames=n_frames, circle_radius=1.5,
                                   with_depth=False, seed=seed, n_points=n_points)
ex = OrbExtractor(settings.orb, settings.tpu)
descs = np.concatenate([
    (lambda f: np.asarray(f.desc)[np.asarray(f.valid)])(ex(seq.images[i]))
    for i in range(0, n_frames, 6)])
vocab = train_vocabulary(descs, k=10, levels=4, seed=0)
sys_ = SlamSystem(settings, Sensor.MONOCULAR, vocabulary=vocab,
                  enable_loop_closing=True)
tr = sys_.tracker
lost = 0
for i in range(n_frames):
    sys_.track_monocular(seq.images[i], seq.timestamps[i])
    lost += int(sys_.tracking_state() == 2)
loops = [(a, b) for a, b, _ in sys_.loop_closer.loop_edges] if sys_.loop_closer else []
ate = synthetic.ate_rmse(sys_.poses_wc(), seq.poses_wc, with_scale=True)
rej = {k: v for k, v in sys_.loop_closer.metrics.items() if "reject" in k}
print(f"frames={n_frames} pts={n_points} seed={seed}: lost={lost} "
      f"loops={loops} ate={ate:.3f} rej={rej} reloc={tr.metrics.get('relocalizations',0)}")
