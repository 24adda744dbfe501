"""Evaluator unit tests: alignment correctness, timestamp association,
plot artifact.

The evaluator is a clean-room reimplementation of the reference's vendored
CMU TartanAir toolkit (/root/reference/evaluation/tartanair_eval/evaluation/
tartanair_evaluator.py) plus the TUM tools (evaluate_ate_scale.py,
associate.py)."""
import numpy as np
import pytest

from evaluation.evaluator import (
    associate_by_timestamp,
    ate_rmse,
    evaluate,
    plot_ate,
)

pytestmark = pytest.mark.smoke


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _traj(n=60):
    """Ground-truth circle + per-pose rotation."""
    ts = np.arange(n) / 20.0
    xyz = np.stack(
        [np.cos(ts), np.sin(ts), 0.1 * ts], axis=1
    )
    poses = []
    for k in range(n):
        T = np.eye(4)
        T[:3, :3] = _rot_z(ts[k])
        T[:3, 3] = xyz[k]
        poses.append(T)
    return ts, poses


def _rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return x, y, z, w


def _write_tum(path, ts, poses):
    with open(path, "w") as f:
        for t, T in zip(ts, poses):
            x, y, z, w = _rot_to_quat(T[:3, :3])
            f.write(
                "%f %f %f %f %f %f %f %f\n"
                % (t, T[0, 3], T[1, 3], T[2, 3], x, y, z, w)
            )


def _similarity(poses, s, R, t):
    out = []
    for T in poses:
        Ta = np.eye(4)
        Ta[:3, :3] = R @ T[:3, :3]
        Ta[:3, 3] = s * R @ T[:3, 3] + t
        out.append(Ta)
    return out


def test_ate_recovers_similarity():
    _, poses = _traj()
    gt_xyz = np.array([T[:3, 3] for T in poses])
    s, R, t = 2.5, _rot_z(0.7), np.array([3.0, -1.0, 0.5])
    est_xyz = np.array([s * R @ p + t for p in gt_xyz])
    ate, _, _ = ate_rmse(gt_xyz, est_xyz, with_scale=True)
    assert ate < 1e-9


def test_associate_by_timestamp_drops_and_jitter():
    gt_ts = np.arange(100) * 0.05
    # Estimate missing every 3rd frame, with +-4 ms jitter.
    keep = [i for i in range(100) if i % 3 != 0]
    rng = np.random.default_rng(0)
    est_ts = gt_ts[keep] + rng.uniform(-0.004, 0.004, len(keep))
    pairs = associate_by_timestamp(gt_ts, est_ts, max_difference=0.02)
    assert len(pairs) == len(keep)
    for gi, ej in pairs:
        assert gi == keep[ej]


def test_associate_respects_max_difference():
    gt_ts = np.array([0.0, 1.0, 2.0])
    est_ts = np.array([0.001, 1.5, 2.0005])
    pairs = associate_by_timestamp(gt_ts, est_ts, max_difference=0.02)
    assert pairs == [(0, 0), (2, 2)]


def test_evaluate_tum_timestamp_association(tmp_path):
    ts, poses = _traj(80)
    gt_file = tmp_path / "gt.txt"
    _write_tum(gt_file, ts, poses)
    # Estimate = similarity-transformed GT with frames dropped: row-index
    # association would mispair everything after the first drop; timestamp
    # association must recover a near-zero ATE.
    keep = [i for i in range(80) if i % 4 != 2]
    est = _similarity(
        [poses[i] for i in keep], 1.7, _rot_z(-0.4), np.array([1.0, 2.0, 3.0])
    )
    est_file = tmp_path / "est.txt"
    _write_tum(est_file, ts[keep], est)
    res = evaluate(str(gt_file), str(est_file), fmt="tum")
    assert res["n_poses"] == len(keep)
    assert res["ate_rmse"] < 1e-6
    assert abs(res["scale"] - 1 / 1.7) < 1e-6


def test_plot_overlays_estimate(tmp_path):
    pytest.importorskip("matplotlib")
    _, poses = _traj(40)
    gt_xyz = np.array([T[:3, 3] for T in poses])
    est = gt_xyz + 0.01
    out = tmp_path / "ate.png"
    plot_ate(gt_xyz, est, str(out), ate=0.01)
    assert out.exists() and out.stat().st_size > 1000
