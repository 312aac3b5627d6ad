"""Reproduce bench.py's full_system stage on CPU with per-frame debug.

VERDICT r3 missing #1: the TPU full-system bench tracked <=3/33 frames
(ate_m=-1, n_keyframes=2, dispatches_median=1). The half-res CPU system
tests pass, so the FULL-RES f32 path on smooth_trajectory is what is
undemonstrated. This driver runs exactly the bench scenario (Lafida
754x480, n_features=400, n_levels=8, smooth_trajectory radius=0.8) on
CPU with per-frame state prints so the failure mode is visible.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.utils import config_io, synthetic
from multicol_slam_tpu.utils.trajectory import ate_rmse

CALIB = "/root/reference/Examples/Lafida"


def main(n_frames=40):
    settings = config_io.SlamSettings(n_features=400, n_levels=8, fps=25.0)
    slam = MultiColSLAM(CALIB, settings=settings,
                        capacity_pts=30000, capacity_kfs=128)
    gt = synthetic.bench_trajectory(90, radius=0.8)
    render = synthetic.make_renderer(slam.rig)
    est, used = [], []
    import time
    for t in range(n_frames):
        t0 = time.perf_counter()
        M = slam.track(render(jnp.asarray(gt[t], jnp.float32)), t / 25.0)
        dt = time.perf_counter() - t0
        if M is not None:
            est.append(np.asarray(M))
            used.append(t)
        print(f"frame {t}: {slam.state.name} kfs={slam.map.n_keyframes()} "
              f"pts={slam.map.n_points()} "
              f"ntracked={slam.tracker.n_tracked[-1] if slam.tracker.n_tracked else -1} "
              f"disp={slam.tracker.dispatches_per_frame[-1] if slam.tracker.dispatches_per_frame else -1} "
              f"({dt:.1f}s)", file=sys.stderr, flush=True)
    slam.shutdown()
    if len(est) > 3:
        ep = np.stack([M[:3, 3] for M in est])
        gp = np.stack([gt[i][:3, 3] for i in used])
        print(f"ATE: {ate_rmse(ep, gp):.4f} m over {len(est)} tracked frames")
    else:
        print(f"tracked only {len(est)} frames — no ATE")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
