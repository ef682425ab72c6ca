"""Synthetic dataset generation for tests and benchmarks.

The reference validates itself by running real datasets (TUM/KITTI/EuRoC)
through the example binaries (SURVEY.md §4); this sandbox has no network and
no dataset files, so we generate controlled synthetic sequences with exact
ground truth instead: a 3-D landmark field where each landmark carries a
distinctive binary texture sprite, rendered into grayscale frames along a
smooth camera trajectory.  ATE against the generated ground truth is the
end-to-end metric (same role as evaluate_ate.py for TUM).

Host-side numpy: data generation is I/O, not device compute.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..utils.camera import CameraModel


class SyntheticWorld(NamedTuple):
    points: np.ndarray   # (P, 3) world landmarks
    sprites: np.ndarray  # (P, S, S) per-landmark texture (float32 0..255)


class SyntheticSequence(NamedTuple):
    world: SyntheticWorld
    poses_wc: np.ndarray  # (F, 4, 4) camera-to-world (ground truth)
    images: np.ndarray    # (F, H, W) float32 grayscale
    depths: Optional[np.ndarray]  # (F, H, W) float32 depth or None
    timestamps: np.ndarray  # (F,)


def make_world(
    n_points: int = 600,
    extent=(8.0, 5.0, 4.0),
    z_offset: float = 6.0,
    sprite_size: int = 9,
    seed: int = 0,
) -> SyntheticWorld:
    """Landmarks in a box in front of the origin looking +z, each with a
    high-contrast random sprite (so rBRIEF descriptors are distinctive)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, size=(n_points, 3)) * np.array(extent)
    pts[:, 2] += z_offset
    # Binary block texture, upsampled: stable under small viewpoint change.
    base = rng.integers(0, 2, size=(n_points, 3, 3)).astype(np.float32)
    reps = sprite_size // 3 + 1
    sprites = np.kron(base, np.ones((reps, reps), np.float32))[
        :, :sprite_size, :sprite_size
    ]
    sprites = 40.0 + sprites * 180.0  # dark/bright blocks
    return SyntheticWorld(points=pts.astype(np.float32), sprites=sprites)


def make_trajectory(
    n_frames: int = 30,
    radius: float = 0.8,
    forward: float = 1.5,
    yaw_amp: float = 0.05,
    seed: int = 1,
) -> np.ndarray:
    """Smooth sideways arc with slight yaw — keeps the landmark field in
    view while generating parallax (like the TUM fr1/xyz hand motion)."""
    t = np.linspace(0.0, 1.0, n_frames)
    poses = np.zeros((n_frames, 4, 4), np.float64)
    for i, s in enumerate(t):
        yaw = yaw_amp * np.sin(2 * np.pi * s)
        c, sn = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]])
        pos = np.array(
            [radius * np.sin(2 * np.pi * s), 0.15 * np.sin(4 * np.pi * s),
             forward * s]
        )
        poses[i, :3, :3] = R
        poses[i, :3, 3] = pos
        poses[i, 3, 3] = 1.0
    return poses.astype(np.float32)


def render_frame(
    world: SyntheticWorld,
    pose_wc: np.ndarray,
    cam: CameraModel,
    noise: float = 2.0,
    seed: int = 0,
    with_depth: bool = False,
):
    """Render one grayscale frame (and optional depth map).

    Sprites are splatted axis-aligned at the projected location with
    z-ordering (near landmarks draw over far ones).  Background is a low-
    contrast gradient so FAST doesn't fire on it.
    """
    H, W = cam.height, cam.width
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    rng = np.random.default_rng(seed)

    yy = np.linspace(0, 20, H)[:, None]
    xx = np.linspace(0, 20, W)[None, :]
    img = 90.0 + yy * 0.3 + xx * 0.2
    depth = np.full((H, W), np.inf, np.float32) if with_depth else None

    Tcw = np.linalg.inv(pose_wc.astype(np.float64))
    p_c = (Tcw[:3, :3] @ world.points.T).T + Tcw[:3, 3]
    z = p_c[:, 2]
    order = np.argsort(-z)  # far first so near overwrites
    S = world.sprites.shape[1]
    r = S // 2
    for i in order:
        if z[i] <= 0.2:
            continue
        u = fx * p_c[i, 0] / z[i] + cx
        v = fy * p_c[i, 1] / z[i] + cy
        ui, vi = int(round(u)), int(round(v))
        if not (r <= ui < W - r and r <= vi < H - r):
            continue
        img[vi - r : vi + r + 1, ui - r : ui + r + 1] = world.sprites[i]
        if with_depth:
            depth[vi - r : vi + r + 1, ui - r : ui + r + 1] = z[i]

    img = img + rng.normal(0.0, noise, size=img.shape)
    out_img = np.clip(img, 0, 255).astype(np.float32)
    if with_depth:
        depth = np.where(np.isfinite(depth), depth, 0.0).astype(np.float32)
        return out_img, depth
    return out_img


def make_sequence(
    cam: CameraModel,
    n_frames: int = 30,
    n_points: int = 600,
    with_depth: bool = False,
    stereo_baseline: float = 0.0,
    seed: int = 0,
) -> SyntheticSequence:
    """Full sequence with ground-truth poses.  If ``stereo_baseline`` > 0,
    ``images`` has shape (F, 2, H, W) with the right camera displaced by
    -baseline along x."""
    world = make_world(n_points=n_points, seed=seed)
    poses = make_trajectory(n_frames=n_frames, seed=seed + 1)
    frames = []
    depths = [] if with_depth else None
    for f in range(n_frames):
        if stereo_baseline > 0.0:
            right = poses[f].copy()
            right[:3, 3] = right[:3, 3] + right[:3, :3] @ np.array(
                [stereo_baseline, 0, 0], np.float32
            )
            im_l = render_frame(world, poses[f], cam, seed=seed + 100 + f)
            im_r = render_frame(world, right, cam, seed=seed + 5000 + f)
            frames.append(np.stack([im_l, im_r]))
        elif with_depth:
            im, d = render_frame(
                world, poses[f], cam, seed=seed + 100 + f, with_depth=True
            )
            frames.append(im)
            depths.append(d)
        else:
            frames.append(render_frame(world, poses[f], cam, seed=seed + 100 + f))
    return SyntheticSequence(
        world=world,
        poses_wc=poses,
        images=np.stack(frames),
        depths=np.stack(depths) if depths is not None else None,
        timestamps=np.arange(n_frames, dtype=np.float64) / 30.0,
    )


def ate_rmse(est_poses_wc: np.ndarray, gt_poses_wc: np.ndarray, align: bool = True,
             with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE after SE3 (or Sim3) alignment —
    the TUM evaluate_ate.py metric the reference is scored with."""
    est = est_poses_wc[:, :3, 3].astype(np.float64)
    gt = gt_poses_wc[:, :3, 3].astype(np.float64)
    if align:
        mu_e, mu_g = est.mean(0), gt.mean(0)
        ec, gc = est - mu_e, gt - mu_g
        W = ec.T @ gc
        U, D, Vt = np.linalg.svd(W)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = Vt.T @ S @ U.T
        if with_scale:
            var_e = (ec**2).sum() / len(ec)
            s = (D * np.diag(S)).sum() / var_e
        else:
            s = 1.0
        t = mu_g - s * R @ mu_e
        est = (s * (R @ est.T)).T + t
    err = est - gt
    return float(np.sqrt((err**2).sum(axis=1).mean()))
