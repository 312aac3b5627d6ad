"""Loop-closing tests: BoW matching between keyframes, Sim3 RANSAC
scoring, and loop correction mechanics on a fabricated drifted map."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.models import loop_closing as lc
from multicol_slam_tpu.models import matcher, vocabulary as vocab
from multicol_slam_tpu.models.keyframe_database import KeyFrameDatabase
from multicol_slam_tpu.models.map import MapStore
from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.ops import sim3 as s3
from multicol_slam_tpu.ops.geometry import cayley2hom, hom2cayley
from multicol_slam_tpu.utils import config_io, synthetic

CALIB_DIR = "/root/reference/Examples/Lafida"


@pytest.fixture(scope="module")
def base_system():
    """Run the SLAM front-end briefly to get a real map with real
    features (loop closer disabled so we can drive it manually)."""
    settings = config_io.SlamSettings(n_features=250, n_levels=4, fps=25.0)
    slam = MultiColSLAM(CALIB_DIR, settings=settings, capacity_pts=20000,
                        capacity_kfs=64, enable_loop_closing=False)
    render = synthetic.make_renderer(slam.rig)
    gt = synthetic.lateral_trajectory(40, step=0.05)
    for t in range(40):
        slam.track(render(jnp.asarray(gt[t], jnp.float32)), t / 25.0)
    assert slam.map.n_keyframes() >= 3
    return slam


def make_loop_closer(slam):
    m = slam.map
    kfs = m.keyframe_ids()
    f = m.kf_features[int(kfs[0])]
    desc = np.asarray(f.desc).reshape(-1, f.desc.shape[-1])
    valid = np.asarray(f.valid).reshape(-1)
    voc = vocab.train_vocabulary(desc[valid], k=8, levels=3, seed=3)
    closer = lc.LoopCloser(slam.rig, m, voc, KeyFrameDatabase(),
                           slam._loop_params)
    return closer


class TestBowPairs:
    def test_matched_pairs_between_overlapping_kfs(self, base_system):
        slam = base_system
        closer = make_loop_closer(slam)
        kfs = slam.map.keyframe_ids()
        pairs = closer._matched_point_pairs(int(kfs[0]), int(kfs[1]))
        assert len(pairs) >= lc.MIN_BOW_MATCHES
        # most pairs should be the SAME landmark (both KFs observe it)
        same = sum(1 for p in pairs if p[0] == p[1])
        assert same / len(pairs) > 0.6, f"{same}/{len(pairs)} same-landmark"

    def test_sim3_between_adjacent_kfs_is_near_identity(self, base_system):
        """Adjacent KFs share the same world frame: Sim3 RANSAC +
        refinement between them must find ~identity (s~1)."""
        slam = base_system
        closer = make_loop_closer(slam)
        kfs = slam.map.keyframe_ids()
        kf1, kf2 = int(kfs[0]), int(kfs[1])
        pairs = closer._matched_point_pairs(kf1, kf2)
        X1 = closer._body_frame_points(kf1, [p[0] for p in pairs])
        X2 = closer._body_frame_points(kf2, [p[1] for p in pairs])
        obs = closer._make_sim3_obs(kf1, kf2, pairs, X1, X2)
        from multicol_slam_tpu.models import sim3_opt
        # init from Horn on all pairs
        S0 = s3.horn_alignment(jnp.asarray(X1), jnp.asarray(X2))
        S, inl, n_in = sim3_opt.optimize_sim3(slam.rig, S0, obs, iters=10)
        # the relative body transform between the two KFs
        M1 = np.asarray(cayley2hom(jnp.asarray(slam.map.kf_pose[kf1])))
        M2 = np.asarray(cayley2hom(jnp.asarray(slam.map.kf_pose[kf2])))
        Trel = np.linalg.inv(M1) @ M2      # kf2 body -> kf1 body
        np.testing.assert_allclose(float(S.s), 1.0, atol=0.05)
        np.testing.assert_allclose(np.asarray(S.R), Trel[:3, :3], atol=0.05)
        assert int(n_in) >= lc.MIN_SIM3_INLIERS


class TestLoopCorrection:
    def test_correct_loop_fixes_injected_drift(self, base_system):
        """Inject a known Sim3 drift into the newest keyframe + its
        points, then hand the correct loop transform to _correct_loop
        and check the drift is removed (essential-graph path)."""
        import copy
        slam = base_system
        m = slam.map
        kfs = m.keyframe_ids().tolist()
        assert len(kfs) >= 3
        kf_new = kfs[-1]
        kf_old = kfs[0]

        # snapshot
        pose_before = {k: m.kf_pose[k].copy() for k in kfs}

        # inject drift: move kf_new (pose only; points stay - as if the
        # map drifted)
        drift = s3.sim3_exp(jnp.asarray([0.01, -0.01, 0.02,
                                         0.05, 0.08, -0.05, 0.06]))
        M = np.asarray(cayley2hom(jnp.asarray(m.kf_pose[kf_new])), np.float64)
        S_old = s3.sim3_from_se3(jnp.asarray(np.linalg.inv(M)))
        S_drifted = drift.compose(S_old)
        m.kf_pose[kf_new] = np.asarray(hom2cayley(jnp.asarray(
            np.linalg.inv(np.asarray(S_drifted.to_se3())))))

        closer = make_loop_closer(slam)
        # ground-truth loop constraint: S12 between kf_new body (true
        # location) and kf_old body via their TRUE poses
        M_new_true = np.asarray(cayley2hom(jnp.asarray(pose_before[kf_new])))
        M_old = np.asarray(cayley2hom(jnp.asarray(pose_before[kf_old])))
        Trel = np.linalg.inv(M_new_true) @ M_old    # old body -> new body
        S12 = s3.sim3_from_se3(jnp.asarray(Trel))

        closer._correct_loop(kf_new, kf_old, S12)

        # kf_new must be pulled back toward its true pose
        M_corr = np.asarray(cayley2hom(jnp.asarray(m.kf_pose[kf_new])))
        err_before = np.linalg.norm(
            np.asarray(S_drifted.to_se3()) - np.linalg.inv(M_new_true))
        err_after = np.linalg.norm(np.linalg.inv(M_corr)
                                   - np.linalg.inv(M_new_true))
        assert err_after < 0.5 * err_before, \
            f"before {err_before:.4f} after {err_after:.4f}"


class TestDetection:
    def test_no_loop_for_sequential_kfs(self, base_system):
        """Sequential covisible keyframes must NOT trigger loops."""
        slam = base_system
        closer = make_loop_closer(slam)
        fired = []
        closer.on_loop = lambda a, b: fired.append((a, b))
        for kf in slam.map.keyframe_ids().tolist():
            closer.insert_keyframe(int(kf))
        assert fired == []
