"""Trajectory evaluation — ATE / RPE compatible with the TUM benchmark
tooling.

The reference's accuracy numbers are produced OUTSIDE the system by the
TUM scripts (evaluate_ate.py / evaluate_rpe.py) and the KITTI devkit
(SURVEY.md §4).  This is the equivalent, operating on the trajectory files
our System writes (save_trajectory_tum / save_trajectory_kitti) against
ground-truth files in the same formats:

  * TUM:   'timestamp tx ty tz qx qy qz qw' per line ('#' comments),
           association by nearest timestamp within --max-diff (0.02 s),
           exactly like evaluate_ate.py's associate().
  * KITTI: 12 numbers (3x4 row-major T_wc) per line, index-aligned.

ATE: Umeyama alignment (SE3, or Sim3 with --scale for monocular) then
RMSE over translational residuals — the headline metric of BASELINE.md.
RPE: relative-pose error over a fixed frame delta (translational RMSE and
drift %% per meter for KITTI-style reporting).

Usage:
  python examples/evaluate.py --est CameraTrajectory.txt --gt groundtruth.txt
  python examples/evaluate.py --est traj.kitti --gt poses/00.txt --format kitti
  python examples/evaluate.py --table runs.txt        # name est gt [scale]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """(..., 4) [qx, qy, qz, qw] -> (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - z * w)
    R[..., 0, 2] = 2 * (x * z + y * w)
    R[..., 1, 0] = 2 * (x * y + z * w)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - x * w)
    R[..., 2, 0] = 2 * (x * z - y * w)
    R[..., 2, 1] = 2 * (y * z + x * w)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def load_tum_trajectory(path: str):
    """Returns (timestamps (F,), T_wc (F, 4, 4))."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.replace(",", " ").split()]
            if len(v) < 8:
                continue
            ts.append(v[0])
            T = np.eye(4)
            T[:3, 3] = v[1:4]
            T[:3, :3] = quat_to_rot(np.asarray(v[4:8]))
            poses.append(T)
    return np.asarray(ts), np.stack(poses) if poses else np.zeros((0, 4, 4))


def load_kitti_trajectory(path: str):
    """Returns (indices (F,), T_wc (F, 4, 4))."""
    poses = []
    with open(path) as f:
        for line in f:
            v = [float(x) for x in line.split()]
            if len(v) < 12:
                continue
            T = np.eye(4)
            T[:3, :4] = np.asarray(v[:12]).reshape(3, 4)
            poses.append(T)
    P = np.stack(poses) if poses else np.zeros((0, 4, 4))
    return np.arange(len(P), dtype=np.float64), P


def associate(ts_est: np.ndarray, ts_gt: np.ndarray, max_diff: float = 0.02):
    """Nearest-timestamp matching (evaluate_ate.py associate()): greedy on
    sorted |dt|, one-to-one.  Returns (idx_est, idx_gt)."""
    if len(ts_est) == 0 or len(ts_gt) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    cand = []
    j0 = 0
    for i, t in enumerate(ts_est):
        j = int(np.searchsorted(ts_gt, t))
        for jj in (j - 1, j, j + 1):
            if 0 <= jj < len(ts_gt) and abs(ts_gt[jj] - t) <= max_diff:
                cand.append((abs(ts_gt[jj] - t), i, jj))
    cand.sort()
    used_i, used_j, pairs = set(), set(), []
    for _, i, j in cand:
        if i in used_i or j in used_j:
            continue
        used_i.add(i)
        used_j.add(j)
        pairs.append((i, j))
    pairs.sort()
    if not pairs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ai, aj = zip(*pairs)
    return np.asarray(ai), np.asarray(aj)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def umeyama(X: np.ndarray, Y: np.ndarray, with_scale: bool = False):
    """Least-squares similarity aligning X -> Y ((N, 3) each).
    Returns (s, R, t) with Y ~ s * R @ X + t."""
    mx, my = X.mean(0), Y.mean(0)
    Xc, Yc = X - mx, Y - my
    C = Yc.T @ Xc / len(X)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (Xc ** 2).sum() / len(X)
        s = float(np.trace(np.diag(D) @ S) / max(var, 1e-12))
    else:
        s = 1.0
    t = my - s * R @ mx
    return s, R, t


def ate_rmse(T_est: np.ndarray, T_gt: np.ndarray, with_scale: bool = False):
    """Absolute trajectory error RMSE (m) after Umeyama alignment."""
    X = T_est[:, :3, 3]
    Y = T_gt[:, :3, 3]
    s, R, t = umeyama(X, Y, with_scale)
    Xa = (s * (R @ X.T)).T + t
    err = np.linalg.norm(Xa - Y, axis=1)
    return float(np.sqrt((err ** 2).mean())), err


def rpe(T_est: np.ndarray, T_gt: np.ndarray, delta: int = 1):
    """Relative pose error over a fixed index delta: translational RMSE (m)
    and rotational RMSE (deg) — evaluate_rpe.py's fixed-delta mode."""
    F = len(T_est)
    terr, rerr = [], []
    for i in range(F - delta):
        de = np.linalg.inv(T_est[i]) @ T_est[i + delta]
        dg = np.linalg.inv(T_gt[i]) @ T_gt[i + delta]
        E = np.linalg.inv(dg) @ de
        terr.append(np.linalg.norm(E[:3, 3]))
        c = np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)
        rerr.append(np.degrees(np.arccos(c)))
    terr = np.asarray(terr)
    rerr = np.asarray(rerr)
    return (
        float(np.sqrt((terr ** 2).mean())) if len(terr) else 0.0,
        float(np.sqrt((rerr ** 2).mean())) if len(rerr) else 0.0,
    )


def evaluate_files(est_path, gt_path, fmt="tum", with_scale=False,
                   max_diff=0.02, rpe_delta=1):
    load = load_tum_trajectory if fmt == "tum" else load_kitti_trajectory
    ts_e, T_e = load(est_path)
    ts_g, T_g = load(gt_path)
    if fmt == "tum":
        ie, ig = associate(ts_e, ts_g, max_diff)
    else:
        n = min(len(T_e), len(T_g))
        ie = ig = np.arange(n)
    if len(ie) < 2:
        raise SystemExit(
            f"only {len(ie)} associated pose pairs between {est_path} and "
            f"{gt_path} (max_diff={max_diff})"
        )
    ate, err = ate_rmse(T_e[ie], T_g[ig], with_scale)
    rpe_t, rpe_r = rpe(T_e[ie], T_g[ig], rpe_delta)
    path_len = float(
        np.linalg.norm(np.diff(T_g[ig][:, :3, 3], axis=0), axis=1).sum()
    )
    return {
        "pairs": int(len(ie)),
        "ate_rmse_m": ate,
        "ate_mean_m": float(err.mean()),
        "ate_median_m": float(np.median(err)),
        "rpe_trans_rmse_m": rpe_t,
        "rpe_rot_rmse_deg": rpe_r,
        "gt_path_length_m": path_len,
        "drift_pct": 100.0 * ate / max(path_len, 1e-9),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--est", help="estimated trajectory file")
    ap.add_argument("--gt", help="ground-truth trajectory file")
    ap.add_argument("--format", choices=["tum", "kitti"], default="tum")
    ap.add_argument("--scale", action="store_true",
                    help="Sim3 alignment (monocular)")
    ap.add_argument("--max-diff", type=float, default=0.02)
    ap.add_argument("--rpe-delta", type=int, default=1)
    ap.add_argument("--table", help="file of 'name est gt [scale|kitti]' "
                    "lines -> BASELINE.md-format markdown table")
    args = ap.parse_args()

    if args.table:
        rows = []
        with open(args.table) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                name, est, gt = parts[:3]
                opts = parts[3:]
                fmt = "kitti" if "kitti" in opts else "tum"
                res = evaluate_files(
                    est, gt, fmt, with_scale="scale" in opts,
                    max_diff=args.max_diff,
                )
                rows.append((name, res))
        print("| Metric | Value | Pairs | RPE t (m) | Drift (%) |")
        print("|---|---|---|---|---|")
        for name, r in rows:
            print(
                f"| {name} | {r['ate_rmse_m']:.4f} | {r['pairs']} "
                f"| {r['rpe_trans_rmse_m']:.4f} | {r['drift_pct']:.2f} |"
            )
        return 0

    res = evaluate_files(
        args.est, args.gt, args.format, args.scale, args.max_diff,
        args.rpe_delta,
    )
    for k, v in res.items():
        print(f"{k}: {v:.6f}" if isinstance(v, float) else f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
