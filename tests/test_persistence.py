"""Tests: map checkpointing (save/load/resume tracking) and viz renders."""

import numpy as np
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.models.tracking import TrackState
from multicol_slam_tpu.utils import checkpoint, config_io, synthetic, viz

CALIB_DIR = "/root/reference/Examples/Lafida"


@pytest.fixture(scope="module")
def run_state():
    from _sysutil import STEP, fast_rig, fast_settings, production_dtype
    with production_dtype():
        return _make_run_state(fast_rig(), fast_settings(), STEP)


def _make_run_state(rig, settings, step):
    slam = MultiColSLAM(settings=settings, rig=rig,
                        capacity_pts=20000,
                        capacity_kfs=64, enable_loop_closing=False)
    render = synthetic.make_renderer(slam.rig)
    gt = synthetic.lateral_trajectory(24, step=step)
    imgs_last = None
    for t in range(24):
        imgs_last = render(jnp.asarray(gt[t], jnp.float32))
        slam.track(imgs_last, t / 25.0)
    assert slam.state == TrackState.WORKING
    return slam, render, gt


def test_save_load_roundtrip(tmp_path, run_state):
    slam, *_ = run_state
    p = str(tmp_path / "map.npz")
    checkpoint.save_map(p, slam.map, extra={"note": "test"})
    m2, extra = checkpoint.load_map(p)
    assert extra["note"] == "test"
    assert m2.n_points() == slam.map.n_points()
    assert m2.n_keyframes() == slam.map.n_keyframes()
    np.testing.assert_array_equal(m2.pt_valid, slam.map.pt_valid)
    np.testing.assert_array_equal(m2.pt_pos, slam.map.pt_pos)
    np.testing.assert_array_equal(m2.kf_pose, slam.map.kf_pose)
    np.testing.assert_array_equal(m2.kf_pt, slam.map.kf_pt)
    # observation lists survive
    for p_ in slam.map.point_ids()[:20]:
        assert m2.pt_obs[int(p_)] == slam.map.pt_obs[int(p_)]
    # keyframe features restored
    kf0 = int(slam.map.keyframe_ids()[0])
    np.testing.assert_array_equal(
        np.asarray(m2.kf_features[kf0].desc),
        np.asarray(slam.map.kf_features[kf0].desc))


def test_resume_tracking_from_checkpoint(tmp_path, run_state):
    """A map loaded from disk supports relocalization + tracking."""
    from _sysutil import fast_rig, fast_settings, production_dtype
    slam, render, gt = run_state
    p = str(tmp_path / "map2.npz")
    checkpoint.save_map(p, slam.map)

    with production_dtype():
        _resume_and_track(tmp_path, p, render, gt)


def _resume_and_track(tmp_path, p, render, gt):
    from _sysutil import fast_rig, fast_settings
    slam2 = MultiColSLAM(settings=fast_settings(), rig=fast_rig(),
                         capacity_pts=20000,
                         capacity_kfs=64, enable_loop_closing=False)
    m2, _ = checkpoint.load_map(p)
    slam2.map = m2
    slam2.tracker.map = m2
    slam2.mapper.map = m2
    slam2.tracker.state = TrackState.LOST
    slam2.tracker.frame_id = 100
    C, K = m2.kf_pt.shape[1:3]
    slam2.tracker.cur_pt = np.full((C, K), -1, np.int32)

    # feed a frame near the end of the original run -> must relocalize
    ok_any = False
    for t in [22, 23]:
        M = slam2.track(render(jnp.asarray(gt[t], jnp.float32)), 10.0 + t)
        if M is not None:
            ok_any = True
    assert ok_any, "failed to relocalize against a loaded map"


def test_viz_renders(tmp_path, run_state):
    slam, render, gt = run_state
    p1 = viz.draw_map(slam.map, slam.rig,
                      trajectory=slam.tracker.all_poses,
                      path=str(tmp_path / "map.png"))
    import os
    assert os.path.getsize(p1) > 10000
    imgs = render(jnp.asarray(gt[23], jnp.float32))
    p2 = viz.draw_frame_mosaic(np.asarray(imgs), slam.tracker.last_feats,
                               slam.tracker.last_pt,
                               path=str(tmp_path / "frame.png"),
                               state_text="WORKING")
    assert os.path.getsize(p2) > 10000


def test_live_viewer_loop(tmp_path, run_state):
    """Viewer refresh loop (cViewer::Run, cViewer.cpp:72-144): attach,
    track a frame so the frame publisher has a snapshot, let the loop
    republish both PNGs, stop cleanly."""
    import os
    import time
    slam, render, gt = run_state
    from _sysutil import production_dtype
    viewer = slam.attach_viewer(str(tmp_path), period_s=0.05)
    try:
        with production_dtype():
            slam.track(render(jnp.asarray(gt[23], jnp.float32)), 99.0)
        # wait for BOTH publishers: refreshes that happen before track()
        # sets last_frame legitimately draw only the map, so counting
        # refreshes alone races with the tracker under CPU contention
        frame_png = str(tmp_path / "live_frame.png")
        deadline = time.time() + 60
        while (viewer.n_refreshes < 2 or not os.path.exists(frame_png)) \
                and time.time() < deadline:
            time.sleep(0.1)
        assert viewer.n_refreshes >= 2, "viewer loop never refreshed"
        assert os.path.exists(frame_png), "frame publisher never ran"
    finally:
        viewer.stop()
    assert not viewer._thread.is_alive()
    assert os.path.getsize(str(tmp_path / "live_map.png")) > 10000
    assert os.path.getsize(str(tmp_path / "live_frame.png")) > 10000
    n_after = viewer.n_refreshes
    time.sleep(0.2)
    assert viewer.n_refreshes == n_after, "viewer kept running after stop"
