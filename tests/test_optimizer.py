"""Synthetic-geometry tests for the MultiCol LM bundle adjuster
(SURVEY.md §4b: sample rig poses + points, project, solve, compare —
the OpenGV test style applied to cOptimizer's semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.models import optimizer as opt
from multicol_slam_tpu.ops import geometry as geo
from multicol_slam_tpu.ops import rig as rig_ops
from multicol_slam_tpu.utils import config_io

CALIB_DIR = "/root/reference/Examples/Lafida"


@pytest.fixture(scope="module")
def rig():
    r, _ = config_io.load_mcs(CALIB_DIR, dtype=np.float64)
    return r


def gen_world_points(rng, n):
    """Points in a shell 1.5-5m around the origin (visible to fisheyes)."""
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return d * rng.uniform(1.5, 5.0, (n, 1))


def project_valid(rig_, mt_min, X, rng=None, noise=0.0):
    """Project points through all cameras; return obs lists."""
    M_t = geo.cayley2hom(jnp.asarray(mt_min))
    uv, zpos = rig_ops.world_to_img_rig(rig_, M_t, jnp.asarray(X))
    uv = np.array(uv)
    ok = np.array(zpos)
    # inside image + z>0
    h, w = 480, 754
    ok &= (uv[..., 0] > 30) & (uv[..., 0] < w - 30) & \
          (uv[..., 1] > 30) & (uv[..., 1] < h - 30)
    if noise > 0:
        uv = uv + rng.standard_normal(uv.shape) * noise
    obs = []
    for c in range(rig_.n_cams):
        for p in range(X.shape[0]):
            if ok[c, p]:
                obs.append((uv[c, p], c, p))
    return obs


def build_pose_obs(obs_list, pad_to=None):
    k = len(obs_list)
    pad_to = pad_to or k
    uv = np.zeros((pad_to, 2))
    cam = np.zeros(pad_to, np.int32)
    pt = np.zeros(pad_to, np.int32)
    valid = np.zeros(pad_to, bool)
    for i, (m, c, p) in enumerate(obs_list):
        uv[i], cam[i], pt[i], valid[i] = m, c, p, True
    return opt.BAObservations(
        uv=jnp.asarray(uv), kf=jnp.zeros(pad_to, jnp.int32),
        cam=jnp.asarray(cam), pt=jnp.asarray(pt),
        inv_sigma2=jnp.ones(pad_to), valid=jnp.asarray(valid))


class TestPoseOptimization:
    def test_recovers_pose_from_perturbation(self, rig):
        rng = np.random.default_rng(0)
        X = gen_world_points(rng, 150)
        mt_true = np.array([0.02, -0.01, 0.03, 0.1, -0.2, 0.15])
        obs_list = project_valid(rig, mt_true, X)
        assert len(obs_list) > 100
        obs = build_pose_obs(obs_list)

        mt0 = mt_true + rng.standard_normal(6) * np.array(
            [0.01, 0.01, 0.01, 0.05, 0.05, 0.05])
        mt, inlier, n_in, _ = opt.pose_optimization(
            rig, jnp.asarray(mt0), obs, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(mt), mt_true, atol=1e-6)
        assert int(n_in) == len(obs_list)

    def test_outlier_rejection(self, rig):
        rng = np.random.default_rng(1)
        X = gen_world_points(rng, 150)
        mt_true = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
        obs_list = project_valid(rig, mt_true, X, rng, noise=0.3)
        obs = build_pose_obs(obs_list)
        # corrupt 20% of measurements grossly
        n = len(obs_list)
        bad = rng.choice(n, n // 5, replace=False)
        uv = np.array(obs.uv)
        uv[bad] += rng.uniform(30, 80, (len(bad), 2))
        obs = obs._replace(uv=jnp.asarray(uv))

        mt0 = mt_true + np.array([0.005, -0.005, 0.005, 0.03, 0.03, -0.03])
        mt, inlier, n_in, _ = opt.pose_optimization(
            rig, jnp.asarray(mt0), obs, jnp.asarray(X))
        # pose still accurate despite outliers
        np.testing.assert_allclose(np.asarray(mt)[3:], mt_true[3:], atol=0.02)
        inlier = np.asarray(inlier)
        # most corrupted obs flagged out, most clean obs kept
        assert inlier[bad].mean() < 0.2
        clean = np.setdiff1d(np.arange(n), bad)
        assert inlier[clean].mean() > 0.9

    def test_invalid_obs_ignored(self, rig):
        rng = np.random.default_rng(2)
        X = gen_world_points(rng, 80)
        mt_true = np.zeros(6)
        obs_list = project_valid(rig, mt_true, X)
        obs = build_pose_obs(obs_list, pad_to=len(obs_list) + 64)  # padded
        mt, _, n_in, _ = opt.pose_optimization(
            rig, jnp.asarray(mt_true + 0.01), obs, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(mt), mt_true, atol=1e-6)
        assert int(n_in) == len(obs_list)


def build_ba_problem(rig_, mt_all, X, rng, noise=0.0, n_pad_obs=None):
    """Project every point from every body pose; build BAProblem."""
    all_obs = []
    for kf, mt in enumerate(mt_all):
        for m, c, p in project_valid(rig_, mt, X, rng, noise):
            all_obs.append((m, kf, c, p))
    K = len(all_obs)
    Kp = (n_pad_obs or K) + 1  # +1 pad row
    uv = np.zeros((Kp, 2))
    kf = np.zeros(Kp, np.int32)
    cam = np.zeros(Kp, np.int32)
    pt = np.zeros(Kp, np.int32)
    valid = np.zeros(Kp, bool)
    for i, (m, f, c, p) in enumerate(all_obs):
        uv[i], kf[i], cam[i], pt[i], valid[i] = m, f, c, p, True
    obs = opt.BAObservations(
        uv=jnp.asarray(uv), kf=jnp.asarray(kf), cam=jnp.asarray(cam),
        pt=jnp.asarray(pt), inv_sigma2=jnp.ones(Kp), valid=jnp.asarray(valid))
    # per-point obs table
    P = X.shape[0]
    lists = [[] for _ in range(P)]
    for i, (m, f, c, p) in enumerate(all_obs):
        lists[p].append(i)
    M = max(1, max(len(l) for l in lists))
    pt_obs = np.full((P, M), Kp - 1, np.int32)  # pad -> invalid row
    for p, l in enumerate(lists):
        pt_obs[p, :len(l)] = l
    return obs, jnp.asarray(pt_obs)


class TestBundleAdjustment:
    def test_refines_noisy_structure_and_poses(self, rig):
        rng = np.random.default_rng(3)
        P = 120
        X = gen_world_points(rng, P)
        mt_all = np.stack([
            np.zeros(6),
            np.array([0.02, 0.01, -0.01, 0.3, 0.05, 0.1]),
            np.array([-0.01, 0.03, 0.02, 0.5, -0.1, 0.3]),
        ])
        obs, pt_obs = build_ba_problem(rig, mt_all, X, rng)
        problem = opt.BAProblem(
            obs=obs, pt_obs=pt_obs,
            fixed_kf=jnp.asarray([True, False, False]),
            fixed_pt=jnp.zeros(P, bool))

        mt0 = mt_all + rng.standard_normal(mt_all.shape) * 0.01
        mt0[0] = mt_all[0]  # fixed pose unperturbed
        X0 = X + rng.standard_normal(X.shape) * 0.05
        mt, Xr, chi2 = opt.bundle_adjustment(
            rig, jnp.asarray(mt0), jnp.asarray(X0), problem, iters=15)

        np.testing.assert_allclose(np.asarray(mt), mt_all, atol=1e-4)
        # only well-constrained points (>=3 observations) must recover;
        # single-view points are unconstrained along the ray (the
        # reference never instantiates points with < 2 observations)
        n_obs = np.asarray((pt_obs < obs.uv.shape[0] - 1).sum(1))
        well = n_obs >= 3
        assert well.sum() > 50
        np.testing.assert_allclose(np.asarray(Xr)[well], X[well], atol=1e-3)
        valid = np.array(obs.valid)
        valid &= well[np.asarray(obs.pt)]
        assert float(np.median(np.asarray(chi2)[valid])) < 1e-8

    def test_fixed_are_untouched(self, rig):
        rng = np.random.default_rng(4)
        P = 60
        X = gen_world_points(rng, P)
        mt_all = np.stack([np.zeros(6),
                           np.array([0.0, 0.02, 0.0, 0.4, 0.0, 0.2])])
        obs, pt_obs = build_ba_problem(rig, mt_all, X, rng, noise=0.5)
        fixed_pt = np.zeros(P, bool)
        fixed_pt[:10] = True
        problem = opt.BAProblem(
            obs=obs, pt_obs=pt_obs,
            fixed_kf=jnp.asarray([True, False]),
            fixed_pt=jnp.asarray(fixed_pt))
        X0 = X + rng.standard_normal(X.shape) * 0.02
        mt, Xr, _ = opt.bundle_adjustment(
            rig, jnp.asarray(mt_all), jnp.asarray(X0), problem, iters=5)
        np.testing.assert_allclose(np.asarray(mt)[0], mt_all[0], atol=0)
        np.testing.assert_allclose(np.asarray(Xr)[:10], X0[:10], atol=0)

    def test_chi2_decreases(self, rig):
        rng = np.random.default_rng(5)
        P = 80
        X = gen_world_points(rng, P)
        mt_all = np.stack([np.zeros(6),
                           np.array([0.01, 0.0, -0.02, 0.25, 0.1, -0.1])])
        obs, pt_obs = build_ba_problem(rig, mt_all, X, rng, noise=0.5)
        problem = opt.BAProblem(
            obs=obs, pt_obs=pt_obs,
            fixed_kf=jnp.asarray([True, False]),
            fixed_pt=jnp.zeros(P, bool))
        X0 = X + rng.standard_normal(X.shape) * 0.05
        mt0 = mt_all.copy()
        mt0[1] += 0.01

        _, _, chi2_0 = opt.bundle_adjustment(
            rig, jnp.asarray(mt0), jnp.asarray(X0), problem, iters=1)
        _, _, chi2_n = opt.bundle_adjustment(
            rig, jnp.asarray(mt0), jnp.asarray(X0), problem, iters=12)
        v = np.asarray(obs.valid)
        assert np.asarray(chi2_n)[v].sum() < np.asarray(chi2_0)[v].sum()


class TestSelfCalibration:
    def test_recovers_perturbed_extrinsics(self, rig):
        """Self-calibrating BA: perturb one camera's extrinsics, observe
        enough structure, recover the true extrinsics."""
        rng = np.random.default_rng(7)
        P = 150
        X = gen_world_points(rng, P)
        mt_all = np.stack([
            np.zeros(6),
            np.array([0.02, 0.01, -0.01, 0.3, 0.05, 0.1]),
            np.array([-0.01, 0.03, 0.02, 0.5, -0.1, 0.3]),
            np.array([0.03, -0.02, 0.01, 0.2, 0.3, -0.2]),
        ])
        obs, pt_obs = build_ba_problem(rig, mt_all, X, rng)
        problem = opt.BAProblem(
            obs=obs, pt_obs=pt_obs,
            fixed_kf=jnp.asarray([True, True, False, False]),
            fixed_pt=jnp.zeros(P, bool))

        # perturb cam 1 and 2 extrinsics in the rig handed to the solver
        import jax
        from multicol_slam_tpu.ops.rig import Rig, rig_from_cayley
        mc_true = np.asarray(rig.M_c_min)
        mc_pert = mc_true.copy()
        mc_pert[1] += np.array([0.002, -0.002, 0.002, 0.004, -0.004, 0.004])
        mc_pert[2] += np.array([-0.002, 0.002, 0.001, -0.004, 0.004, 0.002])
        rig_pert = rig_from_cayley(mc_pert, rig.cams)

        mt, Xr, mc, chi2 = opt.self_calibrating_bundle_adjustment(
            rig_pert, jnp.asarray(mt_all), jnp.asarray(X), problem, iters=12)
        mc = np.asarray(mc)
        # cam 0 anchored
        np.testing.assert_allclose(mc[0], mc_pert[0], atol=0)
        # perturbed cams pulled back to the truth
        np.testing.assert_allclose(mc[1], mc_true[1], atol=5e-4)
        np.testing.assert_allclose(mc[2], mc_true[2], atol=5e-4)

    def test_free_mc_flag_routes(self, rig):
        rng = np.random.default_rng(8)
        P = 60
        X = gen_world_points(rng, P)
        mt_all = np.stack([np.zeros(6),
                           np.array([0.0, 0.02, 0.0, 0.4, 0.0, 0.2])])
        obs, pt_obs = build_ba_problem(rig, mt_all, X, rng, noise=0.3)
        problem = opt.BAProblem(
            obs=obs, pt_obs=pt_obs,
            fixed_kf=jnp.asarray([True, False]),
            fixed_pt=jnp.zeros(P, bool))
        mt, Xr, chi2 = opt.bundle_adjustment(
            rig, jnp.asarray(mt_all), jnp.asarray(X), problem, iters=3,
            free_mc=True)
        assert mt.shape == (2, 6) and Xr.shape == (P, 3)


class TestIntrinsicsRefinement:
    def test_recovers_perturbed_intrinsics(self, rig):
        """Perturb camera intrinsics (principal point + inverse poly),
        refine with poses/structure fixed, recover the truth."""
        rng = np.random.default_rng(9)
        P = 200
        X = gen_world_points(rng, P)
        mt_all = np.stack([np.zeros(6),
                           np.array([0.02, 0.01, -0.01, 0.3, 0.05, 0.1])])
        obs, _ = build_ba_problem(rig, mt_all, X, rng)

        import jax
        from multicol_slam_tpu.ops.rig import Rig
        v_true = np.asarray(jax.tree.map(jnp.asarray, rig.cams).to_vector17())
        v_pert = v_true.copy()
        v_pert[:, 3] += 1.5   # u0 off by 1.5 px
        v_pert[:, 4] -= 1.0   # v0 off by 1 px
        cams_pert = jax.tree.map(jnp.asarray, rig.cams).with_vector17(
            jnp.asarray(v_pert))
        rig_pert = Rig(M_c=rig.M_c, cams=cams_pert)

        cams_ref, v17, cost = opt.refine_intrinsics(
            rig_pert, jnp.asarray(mt_all), jnp.asarray(X), obs, iters=10)
        v17 = np.asarray(v17)
        np.testing.assert_allclose(v17[:, 3], v_true[:, 3], atol=0.05)
        np.testing.assert_allclose(v17[:, 4], v_true[:, 4], atol=0.05)
