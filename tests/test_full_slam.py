"""Full SLAM system test: synthetic 3-fisheye sequence through the REAL
pipeline — initialization (8pt RANSAC + CheckRT), tracking (motion model
+ local map), keyframes, local mapping (triangulation + local BA).

This is the integration test the reference only did manually on Lafida
(SURVEY.md §4c): ATE against ground truth after Sim3 alignment.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.models.tracking import TrackState
from multicol_slam_tpu.utils import config_io, synthetic
from multicol_slam_tpu.utils.trajectory import ate_rmse

CALIB_DIR = "/root/reference/Examples/Lafida"


@pytest.fixture(scope="module")
def slam_run():
    from _sysutil import STEP, fast_rig, fast_settings, production_dtype
    with production_dtype():
        slam = MultiColSLAM(settings=fast_settings(), rig=fast_rig(),
                            capacity_pts=20000, capacity_kfs=64)
        render = synthetic.make_renderer(slam.rig)

        n_frames = 30
        gt = synthetic.lateral_trajectory(n_frames, step=STEP)
        est = []
        used_gt = []
        states = []
        for t in range(n_frames):
            imgs = render(jnp.asarray(gt[t], jnp.float32))
            M = slam.track(imgs, t / 25.0)
            states.append(slam.state)
            if M is not None:
                est.append(M)
                used_gt.append(gt[t])
        slam.shutdown()
    return slam, est, used_gt, states


def test_initializes_and_tracks(slam_run):
    slam, est, used_gt, states = slam_run
    assert TrackState.WORKING in states, f"states: {[s.name for s in states]}"
    # after initialization the system should stay WORKING
    first_work = states.index(TrackState.WORKING)
    working_frac = np.mean([s == TrackState.WORKING
                            for s in states[first_work:]])
    assert working_frac > 0.9, f"tracking lost too often: {working_frac}"
    assert len(est) >= 15


def test_map_grows(slam_run):
    slam, *_ = slam_run
    assert slam.map.n_keyframes() >= 2
    assert slam.map.n_points() > 100


def test_working_path_is_one_dispatch(slam_run):
    """Steady-state WORKING frames issue exactly ONE device dispatch:
    working_track_step fuses extraction + motion tracking + local-map
    tracking into a single traced computation. Each synchronous dispatch
    pays the tunnel RTT on a remote accelerator, so the count IS the
    latency model."""
    slam, est, used_gt, states = slam_run
    disp = np.asarray(slam.tracker.dispatches_per_frame)
    working = np.asarray([s == TrackState.WORKING for s in states])
    # skip the two frames after initialization (no velocity yet ->
    # non-fused extraction + previous-frame window search)
    steady = disp[working & (np.arange(len(disp)) > int(np.argmax(working)) + 1)]
    assert len(steady) >= 10
    assert np.median(steady) == 1, f"dispatch counts: {steady.tolist()}"


def test_trajectory_accuracy(slam_run):
    slam, est, used_gt, _ = slam_run
    est_pos = np.stack([M[:3, 3] for M in est])
    gt_pos = np.stack([M[:3, 3] for M in used_gt])
    rmse = ate_rmse(est_pos, gt_pos, with_scale=True)
    # trajectory spans ~1m; accept < 5 cm ATE after Sim3 alignment
    assert rmse < 0.05, f"ATE RMSE {rmse:.4f} m"


def test_rotation_accuracy(slam_run):
    slam, est, used_gt, _ = slam_run
    # relative rotation between consecutive frames must match GT
    errs = []
    for i in range(1, len(est)):
        R_est = est[i - 1][:3, :3].T @ est[i][:3, :3]
        R_gt = used_gt[i - 1][:3, :3].T @ used_gt[i][:3, :3]
        dR = R_est.T @ R_gt
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        errs.append(np.rad2deg(ang))
    assert np.median(errs) < 0.5, f"median rel-rot err {np.median(errs)} deg"


def test_trajectory_io(tmp_path, slam_run):
    slam, est, *_ = slam_run
    p = str(tmp_path / "traj.txt")
    slam.save_trajectory(p)
    from multicol_slam_tpu.utils.trajectory import load_tum
    ts, pos, quat = load_tum(p)
    assert len(ts) == len(slam.tracker.all_poses)
    np.testing.assert_allclose(np.linalg.norm(quat, axis=1), 1.0, atol=1e-5)


def test_reloc_second_chance_recovers_weak_match_set(slam_run):
    """Relocalization second-chance round: a BoW match set too weak for
    the single-pass fit (8 of 16 candidate matches corrupted -> < 10
    pose-LM inliers) must still relocalize via the widened-window
    projection re-match from the refined pose (cTracking.cpp:1284-1297
    accepts at >=10; the projection round is ORB-SLAM's second reloc
    round through SearchByProjection(F, KF, ...), cORBmatcher.cpp:2120).
    """
    slam, *_ = slam_run
    tr = slam.tracker
    m = slam.map
    kfs = m.keyframe_ids()
    kf = int(kfs[-1])
    feats = m.kf_features[kf]
    assert feats is not None

    # weak match set: 16 triples against the KF's own frame, half with
    # a corrupted slot (wrong feature -> guaranteed pose-LM outlier)
    cams, slots = np.nonzero(m.kf_pt[kf] >= 0)
    order = np.argsort(slots)  # deterministic
    cams, slots = cams[order][:16], slots[order][:16]
    assert len(cams) == 16
    K = m.kf_pt.shape[2]
    triples = []
    for i, (c, s) in enumerate(zip(cams, slots)):
        p = int(m.kf_pt[kf, c, s])
        s_q = int(s) if i % 2 == 0 else int((s + 37) % K)   # corrupt half
        triples.append((p, int(c), s_q))

    def run_reloc(second_chance: bool) -> bool:
        tr.cfg.reloc_second_chance = second_chance
        tr.cur_feats = feats
        tr.cur_pt = np.full_like(m.kf_pt[kf], -1)
        tr.cur_outlier = np.zeros(tr.cur_pt.shape, bool)
        tr.cur_mt = m.kf_pose[kf].copy()
        tr.reloc_candidates_fn = lambda f: [kf]
        tr.reloc_bow_match_fn = lambda k, f: triples if k == kf else []
        try:
            return tr._relocalize()
        finally:
            tr.cfg.reloc_second_chance = True
            tr.reloc_candidates_fn = None
            tr.reloc_bow_match_fn = None

    from _sysutil import production_dtype
    with production_dtype():
        assert not run_reloc(second_chance=False), \
            "corrupted half-set should defeat the single-pass fit"
        assert run_reloc(second_chance=True), \
            "widened-window projection round should recover"
        # the per-candidate projection matcher ALONE (widened local-map
        # fallback disabled) must also recover — the reference's
        # SearchByProjection(F, KF, sFound, th, ORBdist) reloc round
        # (cORBmatcher.cpp:2120-2263, accept >= 10 inliers per
        # cTracking.cpp:1284-1297)
        orig_tlm = tr._track_local_map
        tr._track_local_map = lambda *a, **k: False
        try:
            assert run_reloc(second_chance=True), \
                "per-candidate projection matcher should recover alone"
        finally:
            tr._track_local_map = orig_tlm
