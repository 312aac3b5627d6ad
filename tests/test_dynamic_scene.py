"""Dynamic-scene robustness: the reference's benchmark sequence is
Lafida "indoor DYNAMIC" — moving people in view
(/root/reference/README.md:242-247). Real Lafida images are not
available in this environment, so the honest substitute is the
synthetic world plus moving RIGID distractor objects whose texture
rides the object (utils/synthetic.make_renderer ``distractors``):
features detected on them are real, matchable, and move inconsistently
with the static map — exactly what the tracker's pose-LM chi2 gates
(cOptimizer.cpp:412-440), the found-ratio culling
(cLocalMapping.cpp:187-221) and the triangulation gates must absorb.

Asserted: tracking HOLDS through the dynamic content (working fraction
>= 0.85 after init), the trajectory stays accurate (ATE within 2x of
the static-scene bound), and no false loop closure fires.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.ops import rig as rig_ops
from multicol_slam_tpu.utils import config_io, synthetic
from multicol_slam_tpu.utils.trajectory import ate_rmse

CALIB_DIR = "/root/reference/Examples/Lafida"


def test_tracking_survives_moving_distractors():
    full_rig, _ = config_io.load_mcs(CALIB_DIR, dtype=np.float32)
    rig = rig_ops.scale_rig(full_rig, 0.5)
    settings = config_io.SlamSettings(n_features=300, n_levels=4, fps=8.0)

    n_frames = 48
    gt = synthetic.bench_trajectory(n_frames, radius=0.7)
    # three textured spheres crossing the working volume at person-like
    # speeds (the rig moves ~0.05 m/frame; the distractors 0.04-0.08),
    # sized to occupy a real fraction of the fisheye view
    distractors = [
        dict(center=(0.9, 0.1, 0.9), velocity=(-0.06, 0.0, -0.03),
             radius=0.22),
        dict(center=(-1.0, -0.2, 0.6), velocity=(0.08, 0.01, 0.0),
             radius=0.18),
        dict(center=(0.2, 0.4, -1.0), velocity=(0.0, -0.02, 0.07),
             radius=0.25),
    ]
    render = synthetic.make_renderer(rig, distractors=distractors)

    with jax.enable_x64(False):
        slam = MultiColSLAM(settings=settings, rig=rig,
                            capacity_pts=25000, capacity_kfs=64,
                            enable_loop_closing=True)
        est, used, states = [], [], []
        for t in range(n_frames):
            M = slam.track(render(jnp.asarray(gt[t], jnp.float32),
                                  time=float(t)), t / 8.0)
            states.append(slam.state.name)
            if M is not None:
                est.append(M)
                used.append(t)
        slam.shutdown()

    assert used, f"never tracked; states={states}"
    first = used[0]
    working_frac = len(est) / (n_frames - first)
    assert working_frac >= 0.85, \
        (f"tracking did not hold through dynamic content: "
         f"{working_frac:.2f} from frame {first}; states={states}")

    ep = np.stack([M[:3, 3] for M in est])
    gp = np.stack([gt[i][:3, 3] for i in used])
    ate = float(ate_rmse(ep, gp))
    # static-scene system tests hold ~0.02 m at this scale; allow 2x
    # for the dynamic-content noise floor
    assert ate < 0.04, f"trajectory degraded under dynamic content: {ate}"

    # no false loop: the trajectory never revisits a drifted place, so
    # any fired loop is a distractor-induced false positive
    assert slam.loop_closer is None or slam.loop_closer.last_loop_kf < 0, \
        "false loop closure fired in a dynamic scene"

    # the outlier machinery actually engaged: some distractor-backed
    # observations must have been created and then culled/flagged
    # (found-ratio culling or chi2 pruning) — a run where nothing was
    # ever rejected means the distractors never challenged the gates
    n_culled = int((~slam.map.pt_valid[:slam.map._next_pt]).sum())
    assert n_culled > 0, "no landmark was ever culled — distractors idle?"
