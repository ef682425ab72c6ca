"""Dissect the first mono-circle tracking loss (dev tool): run frames 0..3,
then at frame 4 evaluate each tracking stage with full diagnostics.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import CameraSettings, OrbSettings, Settings, TpuSettings
from orbslam2_tpu.models.frame import build_mono_frame
from orbslam2_tpu.models.system import Sensor, SlamSystem
from orbslam2_tpu.models.tracking import (
    gather_local_points, track_local_map, track_motion_model,
    track_reference_keyframe,
)
from orbslam2_tpu.utils import synthetic

settings = Settings(
    camera=CameraSettings(
        fx=320.0, fy=320.0, cx=160.0, cy=120.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        width=320, height=240, bf=0.0, th_depth=40.0,
        depth_map_factor=1.0,
    ),
    orb=OrbSettings(n_features=800, n_levels=4),
    tpu=TpuSettings(),
)
cam = settings.camera_model()
# Full 84-frame sequence (n_frames sets the angular speed — fewer frames
# would spin faster); only the first frames are tracked.
seq = synthetic.make_loop_sequence(
    cam, n_frames=84, circle_radius=1.5, with_depth=False, seed=5
)

sys_ = SlamSystem(settings, Sensor.MONOCULAR)
sys_.tracker.use_fused = False
LOSS_AT = None
N_TRACK = 44
for i in range(N_TRACK):
    sys_.track_monocular(seq.images[i], seq.timestamps[i])
    t = sys_.tracker
    print(f"f={i} st={t.state} path={t.metrics['track_path']} "
          f"inl={t.metrics['last_inliers']} kf={int(t.map.n_kf)} "
          f"pt={int(t.map.pt_valid.sum())}")
    if t.state == 2 and LOSS_AT is None:
        LOSS_AT = i
        break

if LOSS_AT is None:
    print("no loss in tracked range")
    sys.exit(0)

t = sys_.tracker
m = t.map
i = LOSS_AT
frame = build_mono_frame(seq.images[i], t.extractor, t.cam)
print(f"\n--- dissecting frame {i} ---")
print("frame valid kps:", int(frame.valid.sum()))

# Stage 1: motion model
if t.velocity is not None:
    T_pred = t.velocity @ t.last_T
    for th in (15.0, 30.0, 60.0):
        T, b, n_in, n_match = track_motion_model(
            m, frame, T_pred, t.last_frame.xy, t.last_bindings,
            t.last_frame.level, t.cam, t.scale_factors, t.inv_sigma2,
            jnp.float32(th),
        )
        print(f"motion th={th}: n_match={int(n_match)} n_in={int(n_in)}")
else:
    print("no velocity at loss frame")

# How many of last frame's bound points are in view under T_pred vs T_gt?
lb = np.asarray(t.last_bindings)
bound = lb >= 0
pid = np.where(bound, lb, 0)
pvalid = np.asarray(m.pt_valid)[pid] & bound
pts = np.asarray(m.pt_pos)[pid]


def inview(T):
    T = np.asarray(T)
    pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
    z = pc[:, 2]
    uv = pc[:, :2] / np.maximum(z[:, None], 1e-6) * 320.0 + np.array(
        [160.0, 120.0]
    )
    ok = (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < 320) \
        & (uv[:, 1] >= 0) & (uv[:, 1] < 240) & pvalid
    return int(ok.sum())


print("last-frame bound pts:", int(pvalid.sum()))
if t.velocity is not None:
    print("in view under T_pred:", inview(T_pred))
print("in view under T_last:", inview(t.last_T))

# Stage 2: reference keyframe
T, b, n_in, n_match = track_reference_keyframe(
    m, frame, jnp.int32(t.ref_kf), t.last_T, t.inv_sigma2, t.cam
)
print(f"refkf: n_match={int(n_match)} n_in={int(n_in)}")

# Descriptor-space check: best Hamming distances between the frame and the
# ref KF (are the features even repeatable?)
from orbslam2_tpu.ops.hamming import packed_hamming

D = packed_hamming(m.kf_desc[t.ref_kf], frame.desc)
D = np.asarray(D).astype(np.float32)
kfv = np.asarray(m.kf_kp_valid[t.ref_kf])
fv = np.asarray(frame.valid)
D[~kfv] = 1e9
D[:, ~fv] = 1e9
best = D.min(axis=1)
print("ref-kf desc best-dist percentiles [10,25,50,75]:",
      np.percentile(best[kfv], [10, 25, 50, 75]))

# GT motion magnitude between frames i-1 and i.
T_rel = np.linalg.inv(seq.poses_wc[i]) @ seq.poses_wc[i - 1]
ang = np.degrees(np.arccos(np.clip((np.trace(T_rel[:3, :3]) - 1) / 2, -1, 1)))
print(f"gt inter-frame rotation: {ang:.2f} deg, transl {np.linalg.norm(T_rel[:3,3]):.3f}")

# Velocity error: predicted relative motion vs gt (up to scale).
if t.velocity is not None:
    V = np.asarray(t.velocity)
    angv = np.degrees(np.arccos(np.clip((np.trace(V[:3, :3]) - 1) / 2, -1, 1)))
    print(f"velocity model rotation: {angv:.2f} deg, transl {np.linalg.norm(V[:3,3]):.3f}")
