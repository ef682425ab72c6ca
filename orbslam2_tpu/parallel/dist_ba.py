"""Distributed bundle adjustment over a device mesh.

The multi-chip version of solvers/local_ba.py: keyframes (cameras) are
sharded along the mesh axis ``"map"``; each device assembles the solver
blocks for ITS keyframe shard, then

  * landmark blocks H_pp, b_p are reduced with ``psum`` over ICI (points
    are shared across keyframe shards),
  * per-camera blocks (H_cc, b_c) and camera-point cross blocks G are
    ``all_gather``-ed so every device can form the (small, dense) reduced
    camera system S = H_cc - G H_pp^-1 G^T,
  * each device solves S (replicated) and applies its shard's pose update
    plus the replicated landmark update.

This is the SURVEY.md §2.5 "collectives replace shared-memory mutexes"
design: the reference's g2o runs single-threaded under a global map lock;
here the same normal equations are formed cooperatively with two
collectives and no locks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.lie import hat, se3_exp
from ..utils.camera import CameraModel
from .mesh import MAP_AXIS


class ShardedBAProblem(NamedTuple):
    """Per-shard observation arrays (leading axis = keyframes, sharded).

    poses:    (C, 4, 4)  keyframe poses (sharded along C)
    uv:       (C, N, 2)  measurements
    pid:      (C, N)     point index per observation (-1 invalid)
    obs_ok:   (C, N)     validity
    inv_s2:   (C, N)     information weights
    is_fixed: (C,)       gauge/fixed mask
    points:   (P, 3)     landmarks (replicated)
    """

    poses: jnp.ndarray
    uv: jnp.ndarray
    pid: jnp.ndarray
    obs_ok: jnp.ndarray
    inv_s2: jnp.ndarray
    is_fixed: jnp.ndarray
    points: jnp.ndarray


def _residuals_mono(poses, pts, uv, pid, cam: CameraModel):
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    X = pts[jnp.maximum(pid, 0)]
    pc = jnp.einsum("cij,cnj->cni", R, X) + t[:, None, :]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    zi2 = zi * zi
    u = cam.fx * x * zi + cam.cx
    v = cam.fy * y * zi + cam.cy
    r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], axis=-1)
    zeros = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * zi, zeros, -cam.fx * x * zi2], -1),
            jnp.stack([zeros, cam.fy * zi, -cam.fy * y * zi2], -1),
        ],
        axis=-2,
    )
    I3 = jnp.broadcast_to(jnp.eye(3), pc.shape + (3,))
    J_cam = J_proj @ jnp.concatenate([I3, -hat(pc)], axis=-1)
    J_pt = J_proj @ R[:, None, :, :]
    return r, J_cam, J_pt, z <= 1e-6


def make_distributed_ba_step(mesh: Mesh, cam: CameraModel, n_total_cams: int,
                             lam: float = 1e-4):
    """Build the pjit'd one-iteration distributed BA step.

    Returns step(problem) -> (new_poses (C,4,4) sharded, new_points (P,3)
    replicated).
    """
    n_dev = mesh.devices.size
    c_local = n_total_cams // n_dev

    def shard_step(poses, uv, pid, obs_ok, inv_s2, is_fixed, points):
        # --- local assembly over this device's keyframe shard ---
        P_cap = points.shape[0]
        r, J_cam, J_pt, behind = _residuals_mono(poses, points, uv, pid, cam)
        w = inv_s2 * obs_ok.astype(jnp.float32) * (~behind).astype(jnp.float32)
        J_cam = jnp.where(is_fixed[:, None, None, None], 0.0, J_cam)

        H_cc = jnp.einsum("cnij,cn,cnik->cjk", J_cam, w, J_cam)
        b_c = jnp.einsum("cnij,cn,cni->cj", J_cam, w, r)
        flat_pid = jnp.maximum(pid, 0).reshape(-1)
        H_pp_local = jnp.zeros((P_cap, 3, 3)).at[flat_pid].add(
            jnp.einsum("cnij,cn,cnik->cnjk", J_pt, w, J_pt).reshape(-1, 3, 3),
            mode="drop",
        )
        b_p_local = jnp.zeros((P_cap, 3)).at[flat_pid].add(
            jnp.einsum("cnij,cn,cni->cnj", J_pt, w, r).reshape(-1, 3),
            mode="drop",
        )
        cam_idx = jax.lax.broadcasted_iota(jnp.int32, pid.shape, 0).reshape(-1)
        G_local = jnp.zeros((P_cap, c_local, 6, 3)).at[flat_pid, cam_idx].add(
            jnp.einsum("cnij,cn,cnik->cnjk", J_cam, w, J_pt).reshape(-1, 6, 3),
            mode="drop",
        )

        # --- collectives: reduce landmark blocks, gather camera blocks ---
        H_pp = jax.lax.psum(H_pp_local, MAP_AXIS)              # ICI all-reduce
        b_p = jax.lax.psum(b_p_local, MAP_AXIS)
        G = jax.lax.all_gather(G_local, MAP_AXIS, axis=1, tiled=True)  # (P, C, 6, 3)
        H_cc_all = jax.lax.all_gather(H_cc, MAP_AXIS, tiled=True)      # (C, 6, 6)
        b_c_all = jax.lax.all_gather(b_c, MAP_AXIS, tiled=True)        # (C, 6)
        fixed_all = jax.lax.all_gather(is_fixed, MAP_AXIS, tiled=True)

        C = n_total_cams
        tr = jnp.trace(H_pp, axis1=-2, axis2=-1)
        active = tr > 1e-9
        H_pp_d = H_pp + (lam * jnp.eye(3))[None] * jnp.maximum(
            tr[:, None, None] / 3.0, 1e-6
        )
        Hpp_inv = jnp.where(
            active[:, None, None], jnp.linalg.inv(H_pp_d + 1e-9 * jnp.eye(3)), 0.0
        )

        M = jnp.einsum("pcij,pjk->pcik", G, Hpp_inv)
        S_red = jnp.einsum("pcik,pdlk->cidl", M, G).reshape(C * 6, C * 6)
        S = _blockdiag(H_cc_all) - S_red
        rhs = (b_c_all - jnp.einsum("pcik,pk->ci", M, b_p)).reshape(-1)

        free = ~fixed_all
        free6 = jnp.repeat(free, 6)
        S = S + jnp.diag(lam * jnp.maximum(jnp.diag(S), 1e-6))
        S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
        rhs = jnp.where(free6, rhs, 0.0)

        delta_c_all = -jnp.linalg.solve(S, rhs).reshape(C, 6)
        Gt_dc = jnp.einsum("pcij,ci->pj", G, delta_c_all)
        delta_p = -jnp.einsum("pij,pj->pi", Hpp_inv, b_p + Gt_dc)
        delta_p = jnp.where(active[:, None], delta_p, 0.0)

        # Apply this shard's slice of the camera update.
        my = jax.lax.axis_index(MAP_AXIS)
        delta_local = jax.lax.dynamic_slice_in_dim(
            delta_c_all, my * c_local, c_local, 0
        )
        poses_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(delta_local, poses)
        poses_new = jnp.where(is_fixed[:, None, None], poses, poses_new)
        return poses_new, points + delta_p

    step = jax.jit(
        jax.shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(
                P(MAP_AXIS), P(MAP_AXIS), P(MAP_AXIS), P(MAP_AXIS),
                P(MAP_AXIS), P(MAP_AXIS), P(),
            ),
            out_specs=(P(MAP_AXIS), P()),
            check_vma=False,  # points output IS replicated (derived from
                              # psum-reduced blocks); inference can't see it
        )
    )

    def run(prob: ShardedBAProblem):
        return step(
            prob.poses, prob.uv, prob.pid, prob.obs_ok, prob.inv_s2,
            prob.is_fixed, prob.points,
        )

    return run


def _blockdiag(blocks: jnp.ndarray) -> jnp.ndarray:
    C = blocks.shape[0]
    out = jnp.zeros((C, 6, C, 6))
    idx = jnp.arange(C)
    out = out.at[idx, :, idx, :].set(blocks)
    return out.reshape(C * 6, C * 6)
