#!/usr/bin/env python
"""Trajectory evaluator: scale-aligned ATE, RPE, KITTI drift metrics.

Clean-room reimplementation of the evaluation the reference vendors from the
CMU TartanAir toolkit (/root/reference/evaluation/tartanair_eval/evaluation/
tartanair_evaluator.py: row-index association of a KITTI-format estimate
against ground truth, Umeyama scale alignment, ATE RMSE + RPE + KITTI
metrics) plus the TUM evaluate_ate_scale.py entry point.

Usage:
  python evaluator.py <gt_file> <est_file> [--fmt kitti|tum] [--plot out.png]

GT formats accepted: TartanAir pose file (tx ty tz qx qy qz qw per line) or
TUM (ts tx ty tz qx qy qz qw). Estimate: KITTI rows (frame_id + 3x4 pose) or
TUM rows.
"""
from __future__ import annotations

import json
import sys

import numpy as np


def quat_to_rot(q):
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def load_tartan_gt(path):
    """TartanAir GT: rows `tx ty tz qx qy qz qw` indexed by frame."""
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    poses = []
    for r in rows:
        if len(r) == 7:
            t, q = r[:3], r[3:7]
        else:  # TUM with timestamp
            t, q = r[1:4], r[4:8]
        T = np.eye(4)
        T[:3, :3] = quat_to_rot(q)
        T[:3, 3] = t
        poses.append(T)
    return poses


def load_gt_timestamps(path):
    """Timestamps of an 8-column TUM/EuRoC GT file; None for 7-col TartanAir."""
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    if rows.shape[1] < 8:
        return None
    return rows[:, 0].astype(float)


def associate_by_timestamp(gt_ts, est_ts, max_difference=0.02, offset=0.0):
    """Greedy nearest-timestamp association (the reference's
    evaluation/associate.py contract): all (gt_i, est_j) pairs within
    max_difference are sorted by |dt| and claimed first-wins, so each row
    matches at most once. Returns a list of (gt_index, est_index)."""
    cand = []
    j0 = 0
    est_adj = np.asarray(est_ts, float) + offset
    order = np.argsort(est_adj)
    est_sorted = est_adj[order]
    for i, t in enumerate(gt_ts):
        j0 = np.searchsorted(est_sorted, t - max_difference)
        j = j0
        while j < len(est_sorted) and est_sorted[j] <= t + max_difference:
            cand.append((abs(est_sorted[j] - t), i, int(order[j])))
            j += 1
    cand.sort()
    used_gt, used_est, pairs = set(), set(), []
    for _, i, j in cand:
        if i in used_gt or j in used_est:
            continue
        used_gt.add(i)
        used_est.add(j)
        pairs.append((i, j))
    pairs.sort()
    return pairs


def load_kitti_est(path):
    """KITTI estimate rows: frame_id + 12 pose values (T_wc 3x4)."""
    rows = np.loadtxt(path)
    if rows.size == 0:
        return {}
    if rows.ndim == 1:
        rows = rows[None]
    out = {}
    for r in rows:
        T = np.eye(4)
        T[:3] = r[1:13].reshape(3, 4)
        out[int(round(r[0]))] = T
    return out


def load_tum_est(path):
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    out = {}
    for i, r in enumerate(rows):
        T = np.eye(4)
        T[:3, :3] = quat_to_rot(r[4:8])
        T[:3, 3] = r[1:4]
        out[i] = (float(r[0]), T)
    return out


def umeyama_alignment(gt_xyz, est_xyz, with_scale=True):
    """Similarity alignment est -> gt (Umeyama 1991). Returns (s, R, t)."""
    mu_g = gt_xyz.mean(0)
    mu_e = est_xyz.mean(0)
    gc = gt_xyz - mu_g
    ec = est_xyz - mu_e
    n = len(gt_xyz)
    cov = gc.T @ ec / n
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_e = (ec * ec).sum() / n
        s = float((d * S.diagonal()).sum() / var_e)
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(gt_xyz, est_xyz, with_scale=True):
    s, R, t = umeyama_alignment(gt_xyz, est_xyz, with_scale)
    aligned = (s * (R @ est_xyz.T)).T + t
    err = np.linalg.norm(aligned - gt_xyz, axis=1)
    return float(np.sqrt((err**2).mean())), (s, R, t), aligned


def rpe(gt_poses, est_poses, delta=1):
    """Relative pose error over frame gaps of `delta`."""
    terr, rerr = [], []
    n = min(len(gt_poses), len(est_poses))
    for i in range(n - delta):
        dg = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        de = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        e = np.linalg.inv(dg) @ de
        terr.append(np.linalg.norm(e[:3, 3]))
        cos = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerr.append(np.degrees(np.arccos(cos)))
    return float(np.sqrt(np.mean(np.square(terr)))), float(
        np.sqrt(np.mean(np.square(rerr)))
    )


def kitti_metrics(gt_poses, est_poses, lengths=(7, 14, 21, 28, 35)):
    """KITTI-style average translation (%) / rotation (deg/m) drift over
    sub-sequences of the given path lengths."""
    gt_xyz = np.array([T[:3, 3] for T in gt_poses])
    dists = np.concatenate(
        [[0], np.cumsum(np.linalg.norm(np.diff(gt_xyz, axis=0), axis=1))]
    )

    def frame_at(start, length):
        target = dists[start] + length
        idx = np.searchsorted(dists, target)
        return idx if idx < len(dists) else -1

    t_rel, r_rel = [], []
    n = min(len(gt_poses), len(est_poses))
    for start in range(0, n, 3):
        for L in lengths:
            end = frame_at(start, L)
            if end < 0 or end >= n:
                continue
            dg = np.linalg.inv(gt_poses[start]) @ gt_poses[end]
            de = np.linalg.inv(est_poses[start]) @ est_poses[end]
            e = np.linalg.inv(dg) @ de
            t_rel.append(np.linalg.norm(e[:3, 3]) / L)
            cos = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
            r_rel.append(np.degrees(np.arccos(cos)) / L)
    if not t_rel:
        return None, None
    return float(np.mean(t_rel) * 100.0), float(np.mean(r_rel))


def evaluate(gt_file, est_file, fmt="kitti", with_scale=True,
             max_difference=0.02, return_traj=False):
    gt = load_tartan_gt(gt_file)
    if fmt == "kitti":
        est = load_kitti_est(est_file)
        pairs = [(fid, T) for fid, T in sorted(est.items()) if fid < len(gt)]
        gt_sel = [gt[fid] for fid, _ in pairs]
        est_sel = [T for _, T in pairs]
    else:
        est = load_tum_est(est_file)
        gt_ts = load_gt_timestamps(gt_file)
        if gt_ts is not None:
            # Timestamp association (reference evaluation/associate.py):
            # real EuRoC/TUM runs drop frames, so row index != frame.
            est_ts = np.array([est[i][0] for i in range(len(est))])
            pairs = associate_by_timestamp(gt_ts, est_ts, max_difference)
            gt_sel = [gt[i] for i, _ in pairs]
            est_sel = [est[j][1] for _, j in pairs]
        else:
            n = min(len(est), len(gt))
            gt_sel = [gt[i] for i in range(n)]
            est_sel = [est[i][1] for i in range(n)]

    if len(gt_sel) < 2:
        raise SystemExit("not enough associated poses to evaluate")

    gt_xyz = np.array([T[:3, 3] for T in gt_sel])
    est_xyz = np.array([T[:3, 3] for T in est_sel])
    ate, (s, R, t), aligned = ate_rmse(gt_xyz, est_xyz, with_scale)

    # Apply the similarity to full poses for RPE/KITTI metrics.
    est_aligned = []
    for T in est_sel:
        Ta = np.eye(4)
        Ta[:3, :3] = R @ T[:3, :3]
        Ta[:3, 3] = s * R @ T[:3, 3] + t
        est_aligned.append(Ta)

    rpe_t, rpe_r = rpe(gt_sel, est_aligned)
    kt, kr = kitti_metrics(gt_sel, est_aligned)
    res = {
        "ate_rmse": ate,
        "scale": s,
        "rpe_trans_rmse": rpe_t,
        "rpe_rot_rmse_deg": rpe_r,
        "kitti_t_pct": kt,
        "kitti_r_deg_per_m": kr,
        "n_poses": len(gt_sel),
    }
    if return_traj:
        return res, gt_xyz, np.array([T[:3, 3] for T in est_aligned])
    return res


def plot_ate(gt_xyz, est_aligned_xyz, out, ate=None):
    """Top-down GT vs scale-aligned estimate overlay (the reference's
    plot_ate in evaluate_ate_scale.py / tartanair results.png)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.plot(gt_xyz[:, 0], gt_xyz[:, 1], "-", color="black", label="ground truth")
    ax.plot(
        est_aligned_xyz[:, 0], est_aligned_xyz[:, 1], "-", color="tab:blue",
        label="estimate (aligned)",
    )
    # Error whiskers every ~20th pose: the visual ATE readout.
    step = max(1, len(gt_xyz) // 50)
    for g, e in zip(gt_xyz[::step], est_aligned_xyz[::step]):
        ax.plot([g[0], e[0]], [g[1], e[1]], "-", color="red", lw=0.6, alpha=0.6)
    title = "ATE RMSE: %.4f m" % ate if ate is not None else "ATE"
    ax.set_title(title)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.axis("equal")
    ax.legend()
    fig.savefig(out, dpi=120)
    plt.close(fig)


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    fmt = "kitti"
    if "--fmt" in argv:
        fmt = argv[argv.index("--fmt") + 1]
    max_diff = 0.02
    if "--max_difference" in argv:
        max_diff = float(argv[argv.index("--max_difference") + 1])
    res, gt_xyz, est_xyz = evaluate(
        argv[1], argv[2], fmt, max_difference=max_diff, return_traj=True
    )
    print(json.dumps(res, indent=2))
    if "--plot" in argv:
        out = argv[argv.index("--plot") + 1]
        try:
            plot_ate(gt_xyz, est_xyz, out, ate=res["ate_rmse"])
        except ImportError:
            print("matplotlib unavailable; skipping plot", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
