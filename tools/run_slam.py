#!/usr/bin/env python
"""CLI driver — the `multi_col_slam_lafida` executable equivalent
(reference Examples/Lafida/mult_col_slam_lafida.cpp).

Two input modes:
  --images DIR     a Lafida-format dataset: DIR/images_and_timestamps.txt
                   with lines `timestamp img1 img2 img3` (paths relative
                   to DIR), the format LoadImagesAndTimestamps reads
                   (mult_col_slam_lafida.cpp:167-199); requires cv2 or
                   PIL for image decoding.
  --synthetic N    N frames rendered through the calibration (no
                   dataset needed; ground-truth ATE is reported).

Usage:
  python tools/run_slam.py --calib /root/reference/Examples/Lafida \\
      --settings /root/reference/Examples/Lafida/Slam_Settings_indoor1.yaml \\
      --synthetic 40 --out-dir /tmp/slam_out
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_lafida(images_dir: str, start: int, end: int):
    """Yield (images (C,H,W) float32, timestamp) from a Lafida dataset."""
    path = os.path.join(images_dir, "images_and_timestamps.txt")
    rows = []
    with open(path) as f:
        for cnt, line in enumerate(f, start=1):
            if start <= cnt and (end < 0 or cnt < end):
                parts = line.split()
                if len(parts) < 4:
                    break
                rows.append((float(parts[0]),
                             [os.path.join(images_dir, p)
                              for p in parts[1:4]]))

    def imread_gray(p):
        try:
            import cv2
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise FileNotFoundError(p)
            return img.astype(np.float32)
        except ImportError:
            from PIL import Image
            return np.asarray(Image.open(p).convert("L"), np.float32)

    for ts, paths in rows:
        yield np.stack([imread_gray(p) for p in paths]), ts


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--calib", required=True,
                    help="calibration dir (MultiCamSys_Calibration.yaml + IOs)")
    ap.add_argument("--settings", default=None, help="SLAM settings yaml")
    ap.add_argument("--images", default=None, help="Lafida dataset dir")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a dataset")
    ap.add_argument("--vocabulary", default=None,
                    help=".npz vocabulary or DBoW2 .yml (optional; "
                         "self-trains when omitted)")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--async-mapping", action="store_true")
    ap.add_argument("--no-loops", action="store_true")
    ap.add_argument("--view", action="store_true",
                    help="live viewer loop: republishes live_map.png / "
                         "live_frame.png in --out-dir (cViewer role)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="rescale the calibration (match a dataset made "
                         "with tools/make_synthetic_seq.py --scale)")
    args = ap.parse_args()

    import jax
    # honor JAX_PLATFORMS even when an ambient PJRT plugin overrode the
    # env var at the config level
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multicol_slam_tpu.models.system import MultiColSLAM
    from multicol_slam_tpu.utils import config_io, synthetic, viz
    from multicol_slam_tpu.utils.checkpoint import save_map

    os.makedirs(args.out_dir, exist_ok=True)
    voc_path = args.vocabulary
    if voc_path and voc_path.endswith((".yml", ".yaml")):
        # convert a DBoW2 vocabulary once to our fast format
        from multicol_slam_tpu.models.vocabulary import (load_dbow2_yaml,
                                                         save_vocabulary)
        voc = load_dbow2_yaml(voc_path)
        voc_path = os.path.join(args.out_dir, "vocabulary.npz")
        save_vocabulary(voc, voc_path)

    rig = None
    if args.scale != 1.0:
        from multicol_slam_tpu.ops import rig as rig_ops
        full_rig, _ = config_io.load_mcs(args.calib, dtype=np.float32)
        rig = rig_ops.scale_rig(full_rig, args.scale)
    slam = MultiColSLAM(args.calib, settings_path=args.settings,
                        async_mapping=args.async_mapping,
                        enable_loop_closing=not args.no_loops,
                        vocabulary_path=voc_path, rig=rig)
    if args.view:
        slam.attach_viewer(args.out_dir, period_s=1.0)

    if args.synthetic:
        render = synthetic.make_renderer(slam.rig)
        gt = synthetic.lateral_trajectory(args.synthetic, step=0.045)
        frames = ((np.asarray(render(jnp.asarray(gt[t], jnp.float32))),
                   t / slam.settings.fps) for t in range(args.synthetic))
    elif args.images:
        frames = load_lafida(args.images, slam.settings.start_frame,
                             slam.settings.end_frame)
        gt = None
    else:
        ap.error("need --images or --synthetic")

    times = []
    n = 0
    est, used_idx = [], []
    for images, ts in frames:
        t0 = time.perf_counter()
        M = slam.track(jnp.asarray(images, jnp.float32), ts)
        times.append(time.perf_counter() - t0)
        if M is not None:
            est.append(M)
            used_idx.append(n)
        n += 1
        if n % 25 == 0:
            print(f"frame {n}: state={slam.state.name} "
                  f"kfs={slam.map.n_keyframes()} pts={slam.map.n_points()}",
                  flush=True)

    slam.shutdown()
    traj_path = os.path.join(args.out_dir, "MKFTrajectory.txt")
    slam.save_trajectory(traj_path)
    map_path = os.path.join(args.out_dir, "map.npz")
    save_map(map_path, slam.map)
    png = viz.draw_map(slam.map, slam.rig, trajectory=slam.tracker.all_poses,
                       path=os.path.join(args.out_dir, "map.png"))

    t = np.asarray(times)
    print("-------")
    print(f"processed {n} frames; median track time "
          f"{np.median(t) * 1e3:.1f} ms, mean {t.mean() * 1e3:.1f} ms")
    print(slam.tracker.timers.report())
    if args.synthetic and len(est) > 3:
        from multicol_slam_tpu.utils.trajectory import ate_rmse
        ep = np.stack([M[:3, 3] for M in est])
        gp = np.stack([gt[i][:3, 3] for i in used_idx])
        print(f"ATE RMSE vs ground truth: {ate_rmse(ep, gp):.4f} m")
    print(f"outputs: {traj_path}, {map_path}, {png}")


if __name__ == "__main__":
    main()
