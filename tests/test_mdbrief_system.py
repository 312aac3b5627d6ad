"""Full-system run on the mdBRIEF + learned-masks configuration
(extractor.usemdBRIEF=1, extractor.masks=1): exercises distortion-aware
descriptors and MASKED Hamming matching (TH 1.5d/1d) through tracking,
mapping and BA end to end."""

import numpy as np
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.models.tracking import TrackState
from multicol_slam_tpu.utils import config_io, synthetic
from multicol_slam_tpu.utils.trajectory import ate_rmse

CALIB_DIR = "/root/reference/Examples/Lafida"


def test_mdbrief_masked_system():
    import _sysutil
    from _sysutil import fast_rig, fast_settings, production_dtype
    with production_dtype():
        # mdBRIEF's distortion-warped masked pattern is weaker at half
        # resolution than plain ORB: it needs the 400-feature budget to
        # clear the initializer's >60-good-points leading-camera gate
        _run_mdbrief_system(fast_rig(), fast_settings(
            n_features=400, use_mdbrief=True, learn_masks=True,
            desc_size=32))


def _run_mdbrief_system(rig, settings):
    import _sysutil
    slam = MultiColSLAM(settings=settings, rig=rig, capacity_pts=20000,
                        capacity_kfs=64, enable_loop_closing=False)
    assert slam.tracker.params.masked
    render = synthetic.make_renderer(slam.rig)
    n = 24
    gt = synthetic.lateral_trajectory(n, step=_sysutil.STEP)
    est, used, states = [], [], []
    for t in range(n):
        M = slam.track(render(jnp.asarray(gt[t], jnp.float32)), t / 25.0)
        states.append(slam.state)
        if M is not None:
            est.append(M)
            used.append(gt[t])
    slam.shutdown()
    assert TrackState.WORKING in states
    first = states.index(TrackState.WORKING)
    frac = np.mean([s == TrackState.WORKING for s in states[first:]])
    assert frac > 0.85, f"mdBRIEF tracking unstable: {frac}"
    assert slam.map.n_points() > 100
    ep = np.stack([M[:3, 3] for M in est])
    gp = np.stack([M[:3, 3] for M in used])
    assert ate_rmse(ep, gp) < 0.06
