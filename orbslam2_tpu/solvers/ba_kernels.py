"""Pallas TPU kernel: fused reprojection residuals + normal-equation blocks.

The Schur BA inner loop (solvers/local_ba.schur_ba_core — the g2o
BlockSolver_6_3 replacement, Optimizer.cc:≈460) evaluates, per LM
iteration, residuals and Jacobians for every (camera, observation) pair
and reduces them into per-camera 6x6 blocks, per-point 3x3 blocks and
6x3 cross blocks.  In pure XLA that graph fragments into ~100 small VPU
kernels per iteration (tiny trailing dims of 3/6 tile terribly on the
8x128 VPU): measured 12.8 ms per LM iteration at the production window
(48 cams x 1024 obs), dominating the whole mapping job.

This kernel computes the ENTIRE per-observation pipeline in one pass per
camera — projection, residuals, robust Huber weighting (IRLS), chi2, the
21 unique H_cc entries, b_c, and the packed per-observation point-side
contributions (6 H_pp entries + 3 b_p + 18 G entries) — laid out N-minor
so every vector op runs on full (8, 128) tiles.  XLA then finishes with
the (fast) scatter-adds and the Schur-reduction einsums.

Convention matches solvers/local_ba._residuals exactly: residual r =
predicted - observed; camera Jacobian J = J_proj @ [I3 | -hat(pc)]
(translation-first se3), point Jacobian J_proj @ R; behind-camera
observations carry a 1e9 chi2 sentinel (a candidate step that pushes
points behind the camera must be rejected by the LM accept test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

CHI2_MONO = 5.991
CHI2_STEREO = 7.815

# Packed per-observation output rows (N-minor):
#   rows  0..5   H_pp entries (00, 01, 02, 11, 12, 22)
#   rows  6..8   b_p entries
#   rows  9..26  G entries (6x3 row-major)
#   row   27     chi2 (1e9 sentinel where behind-camera)
#   row   28     robust weight actually used
N_OBS_ROWS = 32  # padded to a multiple of 8 sublanes


def _project(obs_ref, pose_ref):
    """Shared projection prologue; returns the per-lane intermediates.
    Intrinsics ride in the pose pack (slots 12-16): traced values cannot
    be baked into the kernel as Python floats."""
    Xx = obs_ref[0, 0, :]
    Xy = obs_ref[0, 1, :]
    Xz = obs_ref[0, 2, :]
    u_obs = obs_ref[0, 3, :]
    v_obs = obs_ref[0, 4, :]
    ur_obs = obs_ref[0, 5, :]
    inv_s2 = obs_ref[0, 6, :]
    m = obs_ref[0, 7, :]

    R = [pose_ref[0, 0, k] for k in range(9)]
    tx = pose_ref[0, 0, 9]
    ty = pose_ref[0, 0, 10]
    tz = pose_ref[0, 0, 11]
    fx = pose_ref[0, 0, 12]
    fy = pose_ref[0, 0, 13]
    cx = pose_ref[0, 0, 14]
    cy = pose_ref[0, 0, 15]
    bf = pose_ref[0, 0, 16]

    x = R[0] * Xx + R[1] * Xy + R[2] * Xz + tx
    y = R[3] * Xx + R[4] * Xy + R[5] * Xz + ty
    z = R[6] * Xx + R[7] * Xy + R[8] * Xz + tz
    behind = z <= 1e-6
    zi = 1.0 / jnp.maximum(z, 1e-6)
    u = fx * x * zi + cx
    v = fy * y * zi + cy
    has_ur = ur_obs >= 0.0
    ru = u - u_obs
    rv = v - v_obs
    rw = jnp.where(has_ur, (u - bf * zi) - ur_obs, 0.0)
    chi2 = (ru * ru + rv * rv + rw * rw) * inv_s2
    chi2_out = jnp.where(behind, 1e9, chi2)
    return (R, x, y, z, zi, behind, has_ur, ru, rv, rw, chi2, chi2_out,
            inv_s2, m, fx, fy, bf)


def _ne_kernel(robust: bool, obs_ref, pose_ref, out_obs_ref,
               out_cam_ref):
    """One camera per grid step.  obs block (1, 8, N): rows
    [Xx, Xy, Xz, u_obs, v_obs, ur_obs, inv_s2, mask]; pose block (1, 16):
    R row-major (9) + t (3) + pad."""
    (R, x, y, z, zi, behind, has_ur, ru, rv, rw, chi2, chi2_out,
     inv_s2, m, fx, fy, bf) = _project(obs_ref, pose_ref)
    zi2 = zi * zi

    w = inv_s2 * m * (~behind).astype(jnp.float32)
    if robust:
        chi2_th = jnp.where(has_ur, CHI2_STEREO, CHI2_MONO)
        delta_h = jnp.sqrt(chi2_th)
        rn = jnp.sqrt(chi2 + 1e-12)
        w = w * jnp.minimum(1.0, delta_h / jnp.maximum(rn, 1e-12))

    # J_proj rows (vs. camera-frame point pc): u-row [a0, 0, a2],
    # v-row [0, b1, b2], stereo-u row [c0, 0, c2] (zeroed when mono).
    a0 = fx * zi
    a2 = -fx * x * zi2
    b1 = fy * zi
    b2 = -fy * y * zi2
    hw = has_ur.astype(jnp.float32)
    c0 = a0 * hw
    c2 = (-fx * x + bf) * zi2 * hw
    zero = jnp.zeros_like(x)

    # Camera-side 6-vectors: [I3 | -hat(pc)], -hat columns
    # col3 = (0, -z, y), col4 = (z, 0, -x), col5 = (-y, x, 0).
    Ju = (a0, zero, a2, a2 * y, a0 * z - a2 * x, -a0 * y)
    Jv = (zero, b1, b2, -b1 * z + b2 * y, -b2 * x, b1 * x)
    Jw = (c0, zero, c2, c2 * y, c0 * z - c2 * x, -c0 * y)
    # Point-side 3-vectors: J_proj @ R.
    Pu = tuple(a0 * R[0 + k] + a2 * R[6 + k] for k in range(3))
    Pv = tuple(b1 * R[3 + k] + b2 * R[6 + k] for k in range(3))
    Pw = tuple(c0 * R[0 + k] + c2 * R[6 + k] for k in range(3))

    rows = []
    for i in range(3):
        for j in range(i, 3):
            rows.append(w * (Pu[i] * Pu[j] + Pv[i] * Pv[j] + Pw[i] * Pw[j]))
    for i in range(3):
        rows.append(w * (Pu[i] * ru + Pv[i] * rv + Pw[i] * rw))
    for i in range(6):
        for j in range(3):
            rows.append(w * (Ju[i] * Pu[j] + Jv[i] * Pv[j] + Jw[i] * Pw[j]))
    rows.append(chi2_out)
    rows.append(w)
    while len(rows) < N_OBS_ROWS:
        rows.append(zero)
    out_obs_ref[0] = jnp.stack(rows)

    vals = []
    for i in range(6):
        for j in range(i, 6):
            vals.append(jnp.sum(
                w * (Ju[i] * Ju[j] + Jv[i] * Jv[j] + Jw[i] * Jw[j])
            ))
    for i in range(6):
        vals.append(jnp.sum(w * (Ju[i] * ru + Jv[i] * rv + Jw[i] * rw)))
    # Masked chi2 total — 1e9 sentinels INCLUDED (reference accept
    # semantics: steps that push points behind the camera are rejected).
    vals.append(jnp.sum(m * chi2_out))
    while len(vals) < 32:
        vals.append(jnp.float32(0.0))
    out_cam_ref[0, 0] = jnp.stack(vals)


def _chi2_kernel(obs_ref, pose_ref, out_obs_ref, out_sum_ref):
    """chi2-only evaluation (the LM accept test + the per-phase outlier
    pruning), one camera per step."""
    out = _project(obs_ref, pose_ref)
    chi2_out, m = out[11], out[13]
    zero = jnp.zeros_like(chi2_out)
    out_obs_ref[0] = jnp.stack(
        [chi2_out] + [zero] * 7
    )
    out_sum_ref[0, 0] = jnp.stack([
        jnp.sum(m * chi2_out),
        jnp.float32(0.0),
    ])


def _pack_inputs(poses, X, uv, ur, inv_s2, mask, cam):
    C = X.shape[0]
    obs = jnp.concatenate(
        [X, uv, ur[:, None, :], inv_s2[:, None, :],
         mask.astype(jnp.float32)[:, None, :]],
        axis=1,
    )  # (C, 8, N)
    R = poses[:, :3, :3].reshape(C, 9)
    t = poses[:, :3, 3]
    intr = jnp.broadcast_to(
        jnp.stack([
            jnp.asarray(cam.fx, jnp.float32),
            jnp.asarray(cam.fy, jnp.float32),
            jnp.asarray(cam.cx, jnp.float32),
            jnp.asarray(cam.cy, jnp.float32),
            jnp.asarray(cam.bf, jnp.float32),
        ])[None, :],
        (C, 5),
    )
    pose_pack = jnp.concatenate(
        [R, t, intr, jnp.zeros((C, 15), poses.dtype)], axis=1
    ).reshape(C, 1, 32)  # leading 1: TPU block shapes need the last two
    # dims divisible by (8, 128) OR equal to the array dims.
    return obs, pose_pack


@functools.partial(jax.jit, static_argnames=("robust", "interpret"))
def ba_normal_equations(
    poses: jnp.ndarray,    # (C, 4, 4)
    X: jnp.ndarray,        # (C, 3, N)  gathered point positions, N-minor
    uv: jnp.ndarray,       # (C, 2, N)
    ur: jnp.ndarray,       # (C, N)
    inv_s2: jnp.ndarray,   # (C, N)
    mask: jnp.ndarray,     # (C, N) bool/float
    cam,                   # CameraModel (fx, fy, cx, cy, bf scalars)
    robust: bool,
    interpret: bool = False,
):
    """Returns (H_cc (C,6,6), b_c (C,6), obs_pack (C,32,N), chi2_sum (C,)).

    obs_pack rows: 0..5 H_pp upper-tri entries, 6..8 b_p, 9..26 G (6x3
    row-major), 27 per-obs chi2, 28 final IRLS weight."""
    C, _, N = X.shape
    obs, pose_pack = _pack_inputs(poses, X, uv, ur, inv_s2, mask, cam)
    kern = functools.partial(_ne_kernel, robust)
    out_obs, out_cam = pl.pallas_call(
        kern,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 8, N), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, 1, 32), lambda c: (c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, N_OBS_ROWS, N), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, 1, 32), lambda c: (c, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, N_OBS_ROWS, N), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, 32), jnp.float32),
        ],
        interpret=interpret,
    )(obs, pose_pack)

    out_cam = out_cam[:, 0]
    triu = out_cam[:, :21]
    ii, jj = jnp.triu_indices(6)
    H_up = jnp.zeros((C, 6, 6)).at[:, ii, jj].set(triu)
    H_full = H_up + jnp.swapaxes(H_up, 1, 2) - H_up * jnp.eye(6)[None]
    b_c = out_cam[:, 21:27]
    chi2_sum = out_cam[:, 27]
    return H_full, b_c, out_obs, chi2_sum


@functools.partial(jax.jit, static_argnames=("interpret",))
def ba_chi2(poses, X, uv, ur, inv_s2, mask, cam, interpret=False):
    """Returns (chi2_obs (C, N), chi2_sum (C,)): per-observation chi2
    (1e9 behind-sentinels, for the per-phase outlier pruning) and the
    masked per-camera totals (identical objective to
    ba_normal_equations' chi2_sum — the LM accept test)."""
    C, _, N = X.shape
    obs, pose_pack = _pack_inputs(poses, X, uv, ur, inv_s2, mask, cam)
    out_obs, out_sum = pl.pallas_call(
        _chi2_kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 8, N), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, 1, 32), lambda c: (c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, N), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda c: (c, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 8, N), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, 2), jnp.float32),
        ],
        interpret=interpret,
    )(obs, pose_pack)
    return out_obs[:, 0, :], out_sum[:, 0, 0]
