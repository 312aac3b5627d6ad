#!/usr/bin/env python
"""Write a Lafida-format dataset from the synthetic renderer.

The reference consumes datasets laid out as
``DIR/images_and_timestamps.txt`` with lines
``timestamp img1 img2 img3`` (mult_col_slam_lafida.cpp:167-199). This
tool renders a synthetic multi-fisheye sequence through a real
calibration and writes exactly that layout, so ``tools/run_slam.py
--images`` exercises the same dataset-ingest path as the reference
binary — grayscale PNGs, one subdirectory per camera.

Usage:
  python tools/make_synthetic_seq.py --calib /root/reference/Examples/Lafida \
      --out /tmp/lafida_synth --frames 60 --trajectory smooth --scale 0.5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TRAJECTORIES = ("smooth", "lateral", "two_room", "two_room_revisit")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--trajectory", choices=TRAJECTORIES, default="smooth")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="calibration rescale factor (0.5 = half-res)")
    ap.add_argument("--fps", type=float, default=25.0)
    ap.add_argument("--two-room", action="store_true",
                    help="render the doorway-occluded two-room world")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from matplotlib.image import imsave

    from multicol_slam_tpu.ops import rig as rig_ops
    from multicol_slam_tpu.utils import config_io, synthetic

    rig, _ = config_io.load_mcs(args.calib, dtype=np.float32)
    if args.scale != 1.0:
        rig = rig_ops.scale_rig(rig, args.scale)

    two_room = args.two_room or args.trajectory.startswith("two_room")
    if two_room:
        render = synthetic.make_renderer(
            rig, room_half=(2.2, 2.2, 3.6),
            door_wall=dict(z=0.0, door_half_x=0.8, door_half_y=1.3))
    else:
        render = synthetic.make_renderer(rig)
    gt = {
        "smooth": lambda n: synthetic.smooth_trajectory(n, radius=0.8),
        "lateral": lambda n: synthetic.lateral_trajectory(n, step=0.045),
        "two_room": synthetic.two_room_loop_trajectory,
        "two_room_revisit": synthetic.two_room_revisit_trajectory,
    }[args.trajectory](args.frames)

    os.makedirs(args.out, exist_ok=True)
    for c in range(rig.n_cams):
        os.makedirs(os.path.join(args.out, f"cam{c}"), exist_ok=True)

    index = []
    for t in range(args.frames):
        imgs = np.asarray(render(jnp.asarray(gt[t], jnp.float32)))
        rels = []
        for c in range(rig.n_cams):
            rel = f"cam{c}/{t:06d}.png"
            imsave(os.path.join(args.out, rel),
                   imgs[c].astype(np.uint8), cmap="gray", vmin=0, vmax=255)
            rels.append(rel)
        index.append(f"{t / args.fps:.6f} " + " ".join(rels))
        if (t + 1) % 20 == 0:
            print(f"rendered {t + 1}/{args.frames}", flush=True)

    with open(os.path.join(args.out, "images_and_timestamps.txt"), "w") as f:
        f.write("\n".join(index) + "\n")
    np.save(os.path.join(args.out, "ground_truth_poses.npy"), gt)
    # TUM-format ground truth alongside, so a run over this dataset is
    # scoreable with tools/evaluate_trajectory.py directly
    from multicol_slam_tpu.utils.trajectory import save_tum
    save_tum(os.path.join(args.out, "ground_truth_tum.txt"),
             [t / args.fps for t in range(args.frames)], gt)
    print(f"dataset: {args.out} ({args.frames} frames x {rig.n_cams} cams, "
          f"{int(float(rig.cams.width[0]))}x{int(float(rig.cams.height[0]))})")


if __name__ == "__main__":
    main()
