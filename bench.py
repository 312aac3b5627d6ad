"""Benchmark: 3-camera tracking-loop rate on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's de-facto bar of 25 fps 3-camera real-time
tracking on a 2012 quad-core CPU (BASELINE.md; Slam_Settings fps=25).

The measured loop is the per-frame hot path of SURVEY.md §3.2: full
3-camera feature extraction (pyramid/FAST/selection/orientation/
descriptors) + frame-to-frame projection matching + 20-iteration
pose-only LM — on synthetic fisheye frames rendered through the real
Lafida calibration at the real 754x480 resolution and feature budget
(400 features x 8 levels x 3 cams, 32-byte descriptors).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multicol_slam_tpu.models import extractor as ext
    from multicol_slam_tpu.models import matcher
    from multicol_slam_tpu.models import optimizer as opt
    from multicol_slam_tpu.ops import geometry as geo
    from multicol_slam_tpu.ops.camera import make_extraction_masks
    from multicol_slam_tpu.utils import config_io, synthetic

    CALIB = "/root/reference/Examples/Lafida"
    N_LEVELS, N_FEATURES = 8, 400

    rig, _ = config_io.load_mcs(CALIB, dtype=np.float32)
    masks = []
    for c in range(rig.n_cams):
        cam = jax.tree.map(lambda x: x[c], rig.cams)
        masks.append(make_extraction_masks(float(cam.u0), float(cam.v0),
                                           754, 480, N_LEVELS, 1.2))
    masks_lvl = [np.stack([m[l] for m in masks]) for l in range(N_LEVELS)]
    cfg = ext.ExtractorConfig(n_features=N_FEATURES, n_levels=N_LEVELS)
    extract = ext.make_extractor(cfg, rig.cams, masks_lvl, (480, 754))
    render = synthetic.make_renderer(rig)
    params = matcher.MatchParams(desc_bytes=32)

    # pre-render a short sequence (rendering is not part of the loop)
    gt = synthetic.smooth_trajectory(100, radius=0.6)
    n_frames = 12
    frames = [render(jnp.asarray(gt[t], jnp.float32)) for t in range(n_frames)]
    jax.block_until_ready(frames)

    # fixed-capacity pose-opt observations (pad to static shape)
    K_OBS = 1024

    from multicol_slam_tpu.ops.camera import world_to_img
    from multicol_slam_tpu.ops.geometry import inv_se3
    from multicol_slam_tpu.ops.rig import mt_mc

    def scene_points(M_t, feats):
        """Map-point stand-ins: renderer wall hits behind each keypoint."""
        T = mt_mc(M_t, rig.M_c)
        rays_w = jnp.einsum("nij,nkj->nki", T[:, :3, :3], feats.ray)
        t = synthetic._ray_box_exit(T[:, None, :3, 3], rays_w)
        return T[:, None, :3, 3] + t[..., None] * rays_w

    @jax.jit
    def frame_step(images, last, last_pts, mt_min):
        """ONE device dispatch per frame: extraction + matching + 20-iter
        pose LM + map-point refresh. The host never syncs inside the
        loop, so dispatch overlaps device work (the reference's thread
        pipeline, collapsed into async dispatch)."""
        feats = extract(images)
        M_pred = geo.cayley2hom(mt_min)
        Tinv = inv_se3(mt_mc(M_pred, rig.M_c))
        Xc = jnp.einsum("cij,ckj->cki", Tinv[:, :3, :3], last_pts) \
            + Tinv[:, None, :3, 3]
        uv_pred = jax.vmap(world_to_img)(rig.cams, Xc)
        ok = Xc[..., 2] > 0
        m = matcher.match_frame_to_frame(
            feats, last, last.valid, jnp.zeros_like(feats.valid),
            uv_pred, ok, params, th=15.0)
        C, K = m.shape
        flat_m = m.reshape(-1)
        cam_ids = jnp.repeat(jnp.arange(C, dtype=jnp.int32), K)
        sel = jnp.nonzero(flat_m >= 0, size=K_OBS, fill_value=0)[0]
        got = (flat_m >= 0)[sel]
        cam_sel = cam_ids[sel]
        cur_idx = jnp.clip(flat_m[sel], 0)
        uv = feats.xy[cam_sel, cur_idx]
        X = last_pts.reshape(-1, 3)[sel]
        obs = opt.BAObservations(
            uv=uv, kf=jnp.zeros(K_OBS, jnp.int32), cam=cam_sel,
            pt=jnp.arange(K_OBS, dtype=jnp.int32),
            inv_sigma2=jnp.ones(K_OBS), valid=got)
        mt, _, n_in = opt.pose_optimization(rig, mt_min, obs, X)
        new_pts = scene_points(geo.cayley2hom(mt), feats)
        return feats, new_pts, mt, n_in

    # warm up (compile)
    f_prev = extract(frames[0])
    pts_prev = jax.jit(scene_points)(jnp.asarray(gt[0], jnp.float32), f_prev)
    mt_est = jnp.asarray(geo.hom2cayley(jnp.asarray(gt[0], jnp.float32)))
    f_prev, pts_prev, mt_est, n_in = frame_step(frames[1], f_prev, pts_prev,
                                                mt_est)
    jax.block_until_ready(mt_est)

    # timed loop: python dispatch per frame, single sync at the end
    t0 = time.time()
    n_loops = 0
    for rep in range(4):
        for t in range(1, n_frames):
            f_prev, pts_prev, mt_est, n_in = frame_step(
                frames[t], f_prev, pts_prev, mt_est)
            n_loops += 1
    jax.block_until_ready(mt_est)
    dt = (time.time() - t0) / n_loops
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "3cam_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 25.0, 2),
    }))


if __name__ == "__main__":
    main()
