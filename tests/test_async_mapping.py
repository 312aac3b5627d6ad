"""Pipeline-parallel mapping (SURVEY.md §2.3: the reference's
tracking/mapping thread split). async_mapping=True moves local mapping
to a worker thread behind the same producer/consumer queue contract as
the reference's mlNewMultiKeyFrames deque."""

import time

import numpy as np
import jax.numpy as jnp

from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.models.tracking import TrackState
from multicol_slam_tpu.utils import config_io, synthetic

CALIB_DIR = "/root/reference/Examples/Lafida"


def test_async_mapping_tracks():
    from _sysutil import STEP, fast_rig, fast_settings, production_dtype
    with production_dtype():
        _run_async(fast_rig(), fast_settings(), STEP)


def _run_async(rig, settings, step):
    slam = MultiColSLAM(settings=settings, rig=rig, capacity_pts=20000,
                        capacity_kfs=64, async_mapping=True,
                        enable_loop_closing=False)
    render = synthetic.make_renderer(slam.rig)
    gt = synthetic.lateral_trajectory(24, step=step)
    states = []
    for t in range(24):
        slam.track(render(jnp.asarray(gt[t], jnp.float32)), t / 25.0)
        states.append(slam.state)
    # drain the mapper queue
    deadline = time.time() + 30
    while not slam._kf_queue.empty() and time.time() < deadline:
        time.sleep(0.1)
    slam.shutdown()
    assert TrackState.WORKING in states
    first = states.index(TrackState.WORKING)
    frac = np.mean([s == TrackState.WORKING for s in states[first:]])
    assert frac > 0.8, f"async tracking unstable: {frac}"
    assert slam.map.n_keyframes() >= 2
    assert slam.map.n_points() > 100
