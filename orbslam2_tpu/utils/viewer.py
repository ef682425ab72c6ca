"""Map / trajectory visualization (viewer-lite).

Role of the reference's Pangolin viewer stack (``Viewer``/``FrameDrawer``/
``MapDrawer``, SURVEY.md §2.1 L7) for TPU hosts without a GL stack:
renders the map points, keyframe frusta, covisibility graph and the
trajectory to a PNG (matplotlib), plus a FrameDrawer-style annotated frame.
Headless by design — the reference's live window becomes periodic snapshots
(SURVEY.md §5 'optional lightweight viewer').
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAS_MPL = True
except Exception:  # pragma: no cover
    _HAS_MPL = False

from ..models import map_state as ms


def draw_map(
    m: ms.MapState,
    path: str,
    trajectory: Optional[np.ndarray] = None,
    gt_trajectory: Optional[np.ndarray] = None,
    show_covisibility: bool = True,
    min_covis_weight: int = 100,
) -> bool:
    """Top-down (x-z) map view: points, keyframes, covisibility, trajectory.

    The drawing set matches MapDrawer::DrawMapPoints/DrawKeyFrames/graph
    (src/MapDrawer.cc:≈40-190).  Returns False if matplotlib is missing.
    """
    if not _HAS_MPL:
        return False
    fig, ax = plt.subplots(figsize=(8, 8))

    pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1, c="k", alpha=0.3, label="map points")

    kf_ok = np.asarray(m.kf_valid)
    n = int(m.n_kf)
    kf_poses = np.asarray(m.kf_pose_cw)
    centers = []
    for k in range(n):
        if not kf_ok[k]:
            centers.append(None)
            continue
        T = kf_poses[k]
        C = -T[:3, :3].T @ T[:3, 3]
        centers.append(C)
    cs = np.array([c for c in centers if c is not None])
    if len(cs):
        ax.scatter(cs[:, 0], cs[:, 2], s=14, c="tab:blue", marker="s",
                   label="keyframes")

    if show_covisibility and n:
        W = np.asarray(ms.covisibility(m))
        for i in range(n):
            if centers[i] is None:
                continue
            for j in range(i + 1, n):
                if centers[j] is None or W[i, j] < min_covis_weight:
                    continue
                ax.plot(
                    [centers[i][0], centers[j][0]],
                    [centers[i][2], centers[j][2]],
                    c="tab:green", lw=0.4, alpha=0.5,
                )

    if trajectory is not None:
        t = np.asarray(trajectory)[:, :3, 3]
        ax.plot(t[:, 0], t[:, 2], c="tab:red", lw=1.2, label="estimate")
    if gt_trajectory is not None:
        t = np.asarray(gt_trajectory)[:, :3, 3]
        ax.plot(t[:, 0], t[:, 2], c="tab:gray", lw=1.0, ls="--", label="ground truth")

    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title(
        f"map: {int(np.asarray(m.pt_valid).sum())} points, "
        f"{int(kf_ok[:n].sum())} keyframes"
    )
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return True


def draw_frame(
    image: np.ndarray,
    kp_xy: np.ndarray,
    kp_tracked: np.ndarray,
    path: str,
    state_text: str = "",
) -> bool:
    """FrameDrawer::DrawFrame equivalent: keypoints over the image, tracked
    ones in green, untracked in blue, plus the status line
    (src/FrameDrawer.cc:≈120)."""
    if not _HAS_MPL:
        return False
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(np.asarray(image), cmap="gray", vmin=0, vmax=255)
    kp = np.asarray(kp_xy)
    tracked = np.asarray(kp_tracked)
    if len(kp):
        ax.scatter(kp[~tracked, 0], kp[~tracked, 1], s=6, c="tab:blue",
                   marker="o", linewidths=0.5, facecolors="none")
        ax.scatter(kp[tracked, 0], kp[tracked, 1], s=6, c="tab:green",
                   marker="o", linewidths=0.5, facecolors="none")
    if state_text:
        ax.text(4, 12, state_text, color="yellow", fontsize=9,
                bbox=dict(facecolor="black", alpha=0.6, pad=2))
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return True
