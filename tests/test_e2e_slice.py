"""Minimum end-to-end slice (SURVEY.md §7.4): synthetic 3-camera stream
-> extraction -> frame-to-frame matching -> pose-only LM -> trajectory.

Map points are bootstrapped from frame 0 with ground-truth geometry (the
renderer's room walls), so this isolates the perception + optimization
loop from mapping. Pose error against ground truth is the check.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.models import extractor as ext
from multicol_slam_tpu.models import matcher
from multicol_slam_tpu.models import optimizer as opt
from multicol_slam_tpu.ops import geometry as geo
from multicol_slam_tpu.ops import rig as rig_ops
from multicol_slam_tpu.ops.camera import make_extraction_masks
from multicol_slam_tpu.utils import config_io, synthetic

CALIB_DIR = "/root/reference/Examples/Lafida"
N_LEVELS = 4
N_FEATURES = 300          # shared system-test budget (_sysutil)


@pytest.fixture(scope="module")
def setup():
    from _sysutil import fast_rig
    rig = fast_rig()          # half-res production shape (see _sysutil)
    w = int(float(rig.cams.width[0]))
    h = int(float(rig.cams.height[0]))
    masks = []
    for c in range(3):
        cam = jax.tree.map(lambda x: x[c], rig.cams)
        masks.append(make_extraction_masks(float(cam.u0), float(cam.v0),
                                           w, h, N_LEVELS, 1.2))
    masks_lvl = [np.stack([masks[c][l] for c in range(3)])
                 for l in range(N_LEVELS)]
    cfg = ext.ExtractorConfig(n_features=N_FEATURES, n_levels=N_LEVELS)
    extract = ext.make_extractor(cfg, rig.cams, masks_lvl, (h, w))
    render = synthetic.make_renderer(rig)
    return rig, extract, render


def wall_points_for_features(rig, M_t, feats):
    """Ground-truth 3D wall points behind each keypoint (renderer geometry)."""
    T = rig_ops.mt_mc(jnp.asarray(M_t, jnp.float32), rig.M_c)
    R, C = T[:, :3, :3], T[:, :3, 3]
    rays_w = jnp.einsum("nij,nkj->nki", R, feats.ray)
    t = synthetic._ray_box_exit(C[:, None, :], rays_w)
    return C[:, None, :] + t[..., None] * rays_w  # (C, K, 3)


def test_track_sequence(setup):
    from _sysutil import production_dtype
    with production_dtype():
        _track_sequence(setup)


def _track_sequence(setup):
    rig, extract, render = setup
    n_frames = 8
    # realistic per-frame motion: the first 8 frames of a 100-frame arc
    gt = synthetic.smooth_trajectory(100, radius=0.6)[:n_frames]

    # frame 0: extract + bootstrap map points from GT geometry
    f0 = extract(render(jnp.asarray(gt[0], jnp.float32)))
    X_wall = wall_points_for_features(rig, gt[0], f0)      # (C, K, 3)
    params = matcher.MatchParams(desc_bytes=32)

    est_poses = [gt[0]]
    last_feats = f0
    last_pts = X_wall
    last_has = f0.valid
    mt_min_est = np.asarray(geo.hom2cayley(jnp.asarray(gt[0], jnp.float64)))

    errs = []
    match_counts = []
    for t in range(1, n_frames):
        imgs = render(jnp.asarray(gt[t], jnp.float32))
        feats = extract(imgs)

        # constant-velocity prediction: here just last estimated pose
        M_pred = geo.cayley2hom(jnp.asarray(mt_min_est, jnp.float32))
        # project last frame's points into the SAME camera at prediction
        C = rig.n_cams
        uv_pred = []
        ok_pred = []
        T = rig_ops.mt_mc(M_pred, rig.M_c)
        from multicol_slam_tpu.ops.camera import world_to_img
        from multicol_slam_tpu.ops.geometry import inv_se3
        Tinv = inv_se3(T)
        for c in range(C):
            Xc = last_pts[c] @ Tinv[c, :3, :3].T + Tinv[c, :3, 3]
            cam_c = jax.tree.map(lambda x: x[c], rig.cams)
            uv_c = world_to_img(cam_c, Xc)
            uv_pred.append(uv_c)
            ok_pred.append(Xc[:, 2] > 0)
        uv_pred = jnp.stack(uv_pred)
        ok_pred = jnp.stack(ok_pred)

        m = matcher.match_frame_to_frame(
            feats, last_feats, last_has, jnp.zeros_like(feats.valid),
            uv_pred, ok_pred, params, th=15.0)
        m_np = np.asarray(m)                       # (C, K_last) -> cur idx
        n_match = int((m_np >= 0).sum())
        match_counts.append(n_match)
        assert n_match > 60, f"frame {t}: only {n_match} matches"

        # build pose-only observations: matched cur kp <-> last 3D point
        obs_uv, obs_cam, obs_pt, X_list = [], [], [], []
        for c in range(C):
            for i in np.nonzero(m_np[c] >= 0)[0]:
                j = m_np[c, i]
                obs_uv.append(np.asarray(feats.xy[c, j]))
                obs_cam.append(c)
                obs_pt.append(len(X_list))
                X_list.append(np.asarray(last_pts[c, i]))
        K = len(obs_uv)
        obs = opt.BAObservations(
            uv=jnp.asarray(np.asarray(obs_uv)),
            kf=jnp.zeros(K, jnp.int32),
            cam=jnp.asarray(np.asarray(obs_cam, np.int32)),
            pt=jnp.asarray(np.arange(K, dtype=np.int32)),
            inv_sigma2=jnp.ones(K), valid=jnp.ones(K, bool))
        mt, inl, n_in, _ = opt.pose_optimization(
            rig, jnp.asarray(mt_min_est, jnp.float64), obs,
            jnp.asarray(np.asarray(X_list)))
        mt_min_est = np.asarray(mt)
        assert int(n_in) > 40, f"frame {t}: only {int(n_in)} inliers"

        # pose error vs GT
        M_est = np.asarray(geo.cayley2hom(jnp.asarray(mt_min_est)))
        t_err = np.linalg.norm(M_est[:3, 3] - gt[t][:3, 3])
        R_err = np.arccos(np.clip(
            (np.trace(M_est[:3, :3].T @ gt[t][:3, :3]) - 1) / 2, -1, 1))
        errs.append((t_err, R_err))

        # roll forward: new features + their GT points at ESTIMATED pose
        last_feats = feats
        last_pts = wall_points_for_features(rig, M_est, feats)
        last_has = feats.valid
        est_poses.append(M_est)

    t_errs = np.array([e[0] for e in errs])
    r_errs = np.array([e[1] for e in errs])
    # translation within 5 cm, rotation within 1 degree through the run
    assert t_errs.max() < 0.05, f"translation errors {t_errs}"
    assert np.rad2deg(r_errs).max() < 1.0, f"rotation errors (deg) {np.rad2deg(r_errs)}"
