import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.system import SlamSystem, Sensor
from orbslam2_tpu.ops.bow import train_vocabulary
from orbslam2_tpu.ops.extractor import OrbExtractor
from orbslam2_tpu.utils import synthetic

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
lc = sys_.loop_closer
# widen candidates
orig_det = lc.db.detect_loop_candidates
lc.db.detect_loop_candidates = lambda m, k, n_candidates=3, **kw: orig_det(m, k, 8, **kw)
orig = lc._compute_sim3
events = []
def sim3(m, kf_c, kf_l, _o=orig):
    before = dict(lc.metrics)
    r = _o(m, kf_c, kf_l)
    stage = [k for k in lc.metrics if lc.metrics.get(k, 0) != before.get(k, 0)]
    events.append((int(kf_c), int(kf_l), stage, r is not None))
    return r
lc._compute_sim3 = sim3
for i in range(120):
    sys_.track_monocular(seq.images[i], seq.timestamps[i])
sys_.shutdown()
for e in events[-30:]:
    print(e)
loops = [(a, b) for a, b, _ in lc.loop_edges]
ate = synthetic.ate_rmse(sys_.poses_wc(), seq.poses_wc, with_scale=True)
print("loops:", loops, "ate:", round(ate, 3))
