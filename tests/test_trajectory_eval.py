"""Trajectory evaluation (ATE/RPE + TUM association): the in-repo
equivalent of the external TUM benchmark scripts the reference's saved
trajectories are evaluated with (cSystem::SaveMKFTrajectoryLAFIDA
output, cSystem.cpp:260-290). Golden-value tests on synthetic
trajectories with known injected errors."""

import subprocess
import sys

import numpy as np

from multicol_slam_tpu.ops import se3_np
from multicol_slam_tpu.utils import trajectory as tj


def _circle(n, radius=1.0, drift=0.0):
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        M = np.eye(4)
        c, s = np.cos(a), np.sin(a)
        M[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        M[:3, 3] = [radius * c + drift * i, radius * s, 0.0]
        out.append(M)
    return np.stack(out)


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        w = rng.standard_normal(3) * 0.7
        R = se3_np.cayley2rot(w)
        q = se3_np.rot2quat(R)
        np.testing.assert_allclose(tj.quat2rot(q), R, atol=1e-9)


def test_associate_nearest_unique():
    t_a = np.array([0.0, 0.1, 0.2, 0.3])
    t_b = np.array([0.005, 0.11, 0.29, 5.0])
    pairs = tj.associate(t_a, t_b, max_diff=0.02)
    assert pairs == [(0, 0), (1, 1), (3, 2)]


def test_rpe_detects_per_step_drift():
    gt = _circle(40)
    est = _circle(40, drift=0.01)   # 1 cm/frame along x
    rpe_t, rpe_deg = tj.rpe(est, gt, delta=1)
    assert abs(rpe_t - 0.01) < 2e-3, rpe_t
    assert rpe_deg < 0.01
    # identical trajectories -> zero error
    z_t, z_deg = tj.rpe(gt, gt, delta=3)
    assert z_t < 1e-12 and z_deg < 1e-6


def test_cli_end_to_end(tmp_path):
    gt = _circle(30)
    # similarity-transformed + noisy estimate: ATE ~= noise sigma,
    # invariant to the applied Sim3
    rng = np.random.default_rng(0)
    S = np.eye(4)
    S[:3, :3] = 1.7 * se3_np.cayley2rot(np.array([0.2, -0.1, 0.4]))
    S[:3, 3] = [3.0, -2.0, 1.0]
    est = np.stack([S @ M for M in gt])
    est[:, :3, :3] /= 1.7           # keep rotations orthonormal
    est[:, :3, 3] += rng.standard_normal((30, 3)) * 0.005 * 1.7
    ts = np.arange(30) / 25.0
    pe, pg = tmp_path / "est.txt", tmp_path / "gt.txt"
    tj.save_tum(str(pe), ts, est)
    tj.save_tum(str(pg), ts, gt)
    out = subprocess.run(
        [sys.executable, "tools/evaluate_trajectory.py", str(pe),
         str(pg)], capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    import json
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["n_associated"] == 30
    assert rec["ate_rmse_m"] < 0.02, rec
    assert rec["alignment"] == "sim3"
