#!/usr/bin/env python
"""Evaluate a saved TUM trajectory against ground truth: ATE + RPE.

The reference saves LAFIDA/TUM-format trajectories
(cSystem::SaveMKFTrajectoryLAFIDA, cSystem.cpp:260-290) and leaves
evaluation to the external TUM benchmark scripts; this tool ships the
same evaluation in-repo so a session is scoreable end to end:

  1. associate estimate and ground-truth rows by nearest timestamp
     (<= --max-diff apart, each used once);
  2. ATE: RMSE of positions after Umeyama alignment (Sim3 by default —
     monocular-style scale freedom; --no-scale for SE3);
  3. RPE: per-delta relative-pose drift (translation RMSE + rotation
     RMSE in degrees), immune to global alignment.

Usage: python tools/evaluate_trajectory.py est.txt gt.txt
           [--max-diff 0.02] [--rpe-delta 1] [--no-scale]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from multicol_slam_tpu.utils import trajectory as tj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est", help="estimated trajectory (TUM format)")
    ap.add_argument("gt", help="ground-truth trajectory (TUM format)")
    ap.add_argument("--max-diff", type=float, default=0.02,
                    help="max timestamp gap for association (s)")
    ap.add_argument("--rpe-delta", type=int, default=1,
                    help="frame delta for relative pose error")
    ap.add_argument("--no-scale", action="store_true",
                    help="SE3 (no-scale) ATE alignment")
    args = ap.parse_args()

    t_e, p_e, q_e = tj.load_tum(args.est)
    t_g, p_g, q_g = tj.load_tum(args.gt)
    pairs = tj.associate(t_e, t_g, max_diff=args.max_diff)
    if len(pairs) < 3:
        sys.exit(f"only {len(pairs)} associated pairs "
                 f"(need >= 3; try --max-diff)")
    ie = np.array([a for a, _ in pairs])
    ig = np.array([b for _, b in pairs])
    ate = tj.ate_rmse(p_e[ie], p_g[ig], with_scale=not args.no_scale)
    Me = tj.tum_to_matrices(p_e[ie], q_e[ie])
    Mg = tj.tum_to_matrices(p_g[ig], q_g[ig])
    rpe_t, rpe_deg = tj.rpe(Me, Mg, delta=args.rpe_delta)
    print(json.dumps(dict(
        n_est=len(t_e), n_gt=len(t_g), n_associated=len(pairs),
        ate_rmse_m=round(ate, 5),
        rpe_trans_rmse_m=round(rpe_t, 5),
        rpe_rot_rmse_deg=round(rpe_deg, 4),
        rpe_delta=args.rpe_delta,
        alignment="sim3" if not args.no_scale else "se3")))


if __name__ == "__main__":
    main()
