"""Tracking front-end: per-frame state machine (cTracking.{h,cpp}).

Reference behavior (cTracking.cpp:237-346): state machine NO_IMAGES_YET
-> NOT_INITIALIZED -> INITIALIZING -> WORKING / LOST; motion-model
tracking (pose predict M_last * V, :800), previous-frame window tracking
fallback (:724-788), local-map tracking (:834-888), relocalization,
keyframe decision (:890-938 incl. the MultiCol baseline/depth > 0.2
condition :921), motion-model update V = M_last^-1 M_cur (:327-338).

TPU-first split: all per-frame math (extraction, projection, matching,
pose LM) runs as a handful of jitted batched calls with STATIC shapes
(fixed per-frame capacity C x K); the state machine, map bookkeeping and
keyframe policy stay host-side. Variable-size device inputs (local map
snapshots) are padded to power-of-two buckets to bound recompilation.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import world_to_img
from ..ops import se3_np
from ..ops.geometry import cayley2hom, hom2cayley, inv_se3
from ..ops.rig import Rig, mt_mc
from . import initializer, matcher
from . import optimizer as opt
from .extractor import Features
from .map import MapStore


class TrackState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    INITIALIZING = 2
    WORKING = 3
    LOST = 4


def bucket(n: int, minimum: int = 64) -> int:
    """Round up to a power of two (bounds jit recompilations)."""
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class TrackerConfig:
    n_features: int = 400
    desc_bytes: int = 32
    masked: bool = False
    scale_factor: float = 1.2
    n_levels: int = 8
    fps: float = 25.0
    use_motion_model: bool = True
    motion_th: float = 15.0        # window scale for motion-model search
    local_map_th: float = 3.0      # SearchReferencePointsInFrustum th
    min_inliers_track: int = 10    # TrackWithMotionModel accept
    min_inliers_local: int = 15    # TrackLocalMap accept (:874-887)
    kf_tracked_ratio: float = 0.9  # NeedNewKeyFrame ref-ratio condition
    kf_min_points: int = 50
    baseline_depth_ratio: float = 0.2  # curBaseline2MKF gate (:921)
    # widened-window projection re-match after a weak reloc fit
    reloc_second_chance: bool = True

    @property
    def min_frames(self) -> int:
        return int(self.fps / 3.0)   # cTracking.cpp:93

    @property
    def max_frames(self) -> int:
        return int(2 * self.fps / 3.0)


# ---------------------------------------------------------------------------
# jitted helpers (static shapes)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def project_slots(rig: Rig, mt_min: jax.Array, X: jax.Array):
    """Project per-slot world points into their own camera.

    X: (C, K, 3). Returns uv (C, K, 2), ok=(z>0) (C, K)."""
    T = inv_se3(mt_mc(cayley2hom(mt_min.astype(jnp.float32)), rig.M_c))
    Xc = jnp.einsum("cij,ckj->cki", T[:, :3, :3], X) + T[:, None, :3, 3]
    uv = jax.vmap(world_to_img)(rig.cams, Xc)
    return uv, Xc[..., 2] > 0


@functools.partial(jax.jit,
                   static_argnames=("n_levels", "scale_factor", "dist_slack"))
def frustum_check(rig: Rig, mt_min: jax.Array, X: jax.Array,
                  normal: jax.Array, min_dist: jax.Array, max_dist: jax.Array,
                  n_levels: int = 8, scale_factor: float = 1.2,
                  dist_slack: float = 1.0):
    """cMultiFrame::isInFrustum per (camera, point) (cMultiFrame.cpp:218-270):
    project into every camera, gate z>0 + image bounds + distance within
    [min, max] + viewing cos > 0.5; predict the octave from distance
    (cMapPoint::PredictScale rule). X: (P, 3). Returns (uv (C,P,2),
    ok (C,P), level (C,P), view_cos (C,P)).

    dist_slack loosens ONLY the distance-invariance gate (to
    [min/slack, max*slack]) without perturbing the predicted octave —
    callers projecting through a drifted/estimated transform (the loop
    closer's guided SearchBySim3 round) widen the gate this way;
    scaling max_dist itself would shift the predicted level by
    log(slack)/log(scale_factor) octaves and starve the level-windowed
    matchers downstream."""
    M = mt_mc(cayley2hom(mt_min.astype(jnp.float32)), rig.M_c)
    T = inv_se3(M)
    Xc = jnp.einsum("cij,pj->cpi", T[:, :3, :3], X) + T[:, None, :3, 3]
    uv = jax.vmap(world_to_img)(rig.cams, Xc)
    centers = M[:, :3, 3]                                  # (C, 3)
    PO = X[None, :, :] - centers[:, None, :]               # (C, P, 3)
    dist = jnp.linalg.norm(PO, axis=-1)
    view_cos = jnp.einsum("cpi,pi->cp", PO, normal) / jnp.maximum(dist, 1e-9)
    w = rig.cams.width.astype(jnp.float32)
    h = rig.cams.height.astype(jnp.float32)
    # mirror-mask containment (cMultiFrame.cpp:218-270 calls
    # isPointInMirrorMask at pyramid level 0, cam_model_omni.cpp:163-178):
    # the level-0 mask is analytic — a circle of radius v0+22 centered at
    # (col=u0, row=v0) (CreateMirrorMask, cam_model_omni.cpp:181-220) —
    # so candidates predicted into the fisheye corner dead zones are
    # rejected, not just a rectangular border. The circle applies only
    # to cameras whose calibration sets mirrorMask (cSystem.cpp:164-171
    # loads the flag per camera); other cameras gate on bounds alone.
    ur = jnp.round(uv[..., 0])
    vr = jnp.round(uv[..., 1])
    cx = rig.cams.u0.astype(jnp.float32)[:, None]
    cy = rig.cams.v0.astype(jnp.float32)[:, None]
    r = cy + 22.0
    masked = (rig.cams.mirror > 0.5).reshape(-1, 1)
    in_circle = (ur - cx) ** 2 + (vr - cy) ** 2 < r * r
    in_img = ((ur > 0) & (ur < w[:, None]) & (vr > 0) & (vr < h[:, None])
              & (in_circle | ~masked))
    ok = ((Xc[..., 2] > 0) & in_img
          & (dist >= min_dist[None, :] / dist_slack)
          & (dist <= max_dist[None, :] * dist_slack)
          & (view_cos > 0.5))
    ratio = jnp.maximum(max_dist[None, :] / jnp.maximum(dist, 1e-9), 1e-9)
    level = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32)
    level = jnp.clip(level, 0, n_levels - 1)
    return uv, ok, level, view_cos


def _motion_track_core(rig: Rig, mt_pred: jax.Array, last_pts: jax.Array,
                       last_has: jax.Array, cur: Features, last: Features,
                       cur_has_pt: jax.Array, params, th: float):
    """TrackWithMotionModel as one traced computation: project the last
    frame's landmarks at the predicted pose, projection-gated NN match
    into the current frame, then pose-only LM over the matches
    (cTracking.cpp:790-832 + cOptimizer.cpp:259-458). Fusing the three
    stages removes two host round-trips per frame — through a remote
    accelerator every synchronous dispatch pays the tunnel RTT.

    Returns (match (C,K_last)->cur slot, mt, inlier (C,K_last) over
    last slots, n_inliers, n_matches, n_lm_iters)."""
    T = inv_se3(mt_mc(cayley2hom(mt_pred.astype(jnp.float32)), rig.M_c))
    Xc = jnp.einsum("cij,ckj->cki", T[:, :3, :3], last_pts) \
        + T[:, None, :3, 3]
    uv_pred = jax.vmap(world_to_img)(rig.cams, Xc)
    ok = Xc[..., 2] > 0
    match = matcher.match_frame_to_frame(cur, last, last_has, cur_has_pt,
                                         uv_pred, ok, params, th=th)
    C, K = match.shape
    flat = match.reshape(-1)
    got = flat >= 0
    cam_ids = jnp.repeat(jnp.arange(C, dtype=jnp.int32), K)
    tgt = jnp.clip(flat, 0)
    uv = cur.xy[cam_ids, tgt]
    lvl = cur.level[cam_ids, tgt].astype(jnp.float32)
    obs = opt.BAObservations(
        uv=uv, kf=jnp.zeros(C * K, jnp.int32), cam=cam_ids,
        pt=jnp.arange(C * K, dtype=jnp.int32),
        inv_sigma2=jnp.where(got, params.scale_factor ** (-2.0 * lvl), 1.0),
        valid=got)
    mt, inlier, n_in, n_it = opt.pose_optimization(
        rig, mt_pred, obs, last_pts.reshape(-1, 3))
    return match, mt, inlier.reshape(C, K), n_in, jnp.sum(got), n_it


motion_track_step = functools.partial(jax.jit, static_argnames=(
    "params", "th"))(_motion_track_core)


@functools.partial(jax.jit,
                   static_argnames=("extract_fn", "params", "th"))
def extract_motion_track_step(extract_fn, rig: Rig, images: jax.Array,
                              mt_pred: jax.Array, last_pts: jax.Array,
                              last_has: jax.Array, last: Features,
                              params, th: float):
    """WORKING-state front half in ONE dispatch: feature extraction
    (cMultiFrame ctor, cMultiFrame.cpp:92-216) fused with the whole of
    TrackWithMotionModel. The extractor's Features feed matching
    directly on-device; the host receives the new Features (kept
    device-resident) plus the small association/pose outputs in a single
    transfer. With local-map tracking this puts the steady-state WORKING
    path at two device dispatches per frame instead of three — through a
    remote-TPU tunnel each saved synchronous dispatch is a full RTT.

    The current frame has no prior associations at this point in the
    state machine (cur_pt is reset before tracking), so the matcher
    occupancy mask is all-free."""
    cur = extract_fn(images)
    out = _motion_track_core(rig, mt_pred, last_pts, last_has, cur, last,
                             jnp.zeros_like(cur.valid), params, th=th)
    return (cur,) + tuple(out)


def _local_map_core(rig: Rig, mt_cur: jax.Array, X: jax.Array,
                    normal: jax.Array, mind: jax.Array,
                    maxd: jax.Array, cand_ok: jax.Array,
                    pt_desc: jax.Array, pt_mask: jax.Array,
                    cur: Features, cur_has_pt: jax.Array,
                    slot_X: jax.Array, slot_has: jax.Array,
                    params, th: float, n_levels: int,
                    scale_factor: float):
    """TrackLocalMap as one traced computation: isInFrustum over the
    local map snapshot, SearchByProjection into the frame, then
    pose-only LM over existing slot associations PLUS the new local-map
    matches (cTracking.cpp:834-888). cand_ok masks padding and points
    already in the frame; slot_X/slot_has carry the world positions of
    the frame's current associations (the motion-model matches).

    Returns (frustum_ok (C,P) for visibility counters, match (C,P)->cur
    slot, mt, slot inliers (C,K), new-match inliers (C,P), n_inliers)."""
    uv, ok, lvl, vcos = frustum_check(
        rig, mt_cur, X, normal, mind, maxd,
        n_levels=n_levels, scale_factor=scale_factor)
    ok &= cand_ok[None, :]
    match = matcher.match_local_map(cur, cur_has_pt, pt_desc, pt_mask,
                                    uv, ok, lvl, vcos, params, th=th)
    C, K = cur_has_pt.shape
    P = X.shape[0]
    sf = scale_factor
    # obs group 1: the frame's existing associations, one row per slot
    cam1 = jnp.repeat(jnp.arange(C, dtype=jnp.int32), K)
    lvl1 = cur.level.reshape(-1).astype(jnp.float32)
    valid1 = slot_has.reshape(-1)
    # obs group 2: the new local-map matches, one row per candidate
    flat2 = match.reshape(-1)
    got2 = flat2 >= 0
    cam2 = jnp.repeat(jnp.arange(C, dtype=jnp.int32), P)
    tgt2 = jnp.clip(flat2, 0)
    uv2 = cur.xy[cam2, tgt2]
    lvl2 = cur.level[cam2, tgt2].astype(jnp.float32)
    obs = opt.BAObservations(
        uv=jnp.concatenate([cur.xy.reshape(-1, 2), uv2], 0),
        kf=jnp.zeros(C * (K + P), jnp.int32),
        cam=jnp.concatenate([cam1, cam2], 0),
        pt=jnp.arange(C * (K + P), dtype=jnp.int32),
        inv_sigma2=sf ** (-2.0 * jnp.concatenate([lvl1, lvl2], 0)),
        valid=jnp.concatenate([valid1, got2], 0))
    X_all = jnp.concatenate(
        [slot_X.reshape(-1, 3), jnp.tile(X, (C, 1))], 0)
    mt, inlier, n_in, n_it = opt.pose_optimization(rig, mt_cur, obs, X_all)
    return (ok, match, mt, inlier[:C * K].reshape(C, K),
            inlier[C * K:].reshape(C, P), n_in, n_it)


local_map_track_step = functools.partial(jax.jit, static_argnames=(
    "params", "th", "n_levels", "scale_factor"))(_local_map_core)


@functools.partial(jax.jit,
                   static_argnames=("extract_fn", "params", "th_motion",
                                    "th_local", "n_levels",
                                    "scale_factor"))
def working_track_step(extract_fn, rig: Rig, images: jax.Array,
                       mt_pred: jax.Array, last_pts: jax.Array,
                       last_has: jax.Array, last: Features,
                       lp_slot: jax.Array, X: jax.Array,
                       normal: jax.Array, mind: jax.Array,
                       maxd: jax.Array, cand_base: jax.Array,
                       pt_desc: jax.Array, pt_mask: jax.Array,
                       params, th_motion: float, th_local: float,
                       n_levels: int, scale_factor: float):
    """The WHOLE steady-state WORKING frame in ONE device dispatch:
    feature extraction (cMultiFrame ctor, cMultiFrame.cpp:92-216) +
    TrackWithMotionModel (cTracking.cpp:790-832) + TrackLocalMap
    (cTracking.cpp:834-888), chained on-device. Through a remote-TPU
    tunnel every synchronous dispatch pays the link RTT, so the dispatch
    count IS the latency model; fusing the two tracking halves takes the
    WORKING path from two round trips per frame to one.

    The only cross-stage host work the two-dispatch split performed was
    deriving the current frame's associations (cur_pt) from the motion
    matches and excluding them from the local-map candidate set. Both
    are recomputed here on-device from the motion-stage outputs:

    * slot occupancy / positions: the motion match (C,K_last)->cur slot
      scattered through inlier gating — identical to the host loop in
      ``_track_with_motion_model`` (outliers nulled per
      cTracking.cpp:817-830);
    * candidate exclusion: ``lp_slot`` (P,C) carries, for every local
      map point, its last-frame slot index per camera (or -1). A local
      point is "already in the frame" iff any of those slots survived
      the motion match — the device-side equivalent of
      ``~np.isin(local_pts, cur_pt[slot_has])``.

    The local map snapshot itself (X/normal/mind/maxd/desc) is selected
    host-side from the LAST frame's associations (one-frame-lagged
    UpdateReference, cTracking.cpp:1014-1123): after motion tracking,
    cur_pt is a subset of the last frame's landmarks, so the voted
    keyframe set is the same modulo slots that failed to rematch.

    Returns (cur_feats, motion match, mt1, motion inliers, n_in1, n_m1,
    lm_iters1, frustum_ok, local match, mt2, slot inliers, new-match
    inliers, n_in2, lm_iters2)."""
    cur = extract_fn(images)
    m_out = _motion_track_core(rig, mt_pred, last_pts, last_has, cur,
                               last, jnp.zeros_like(cur.valid), params,
                               th=th_motion)
    match1, mt1, inl1, n_in1, n_m1, it1 = m_out
    C, K = match1.shape
    keep = (match1 >= 0) & inl1
    # scatter the surviving motion matches onto current-frame slots;
    # out-of-range targets (K) are dropped, so non-kept rows write nowhere
    tgt = jnp.where(keep, jnp.clip(match1, 0), K)
    slot_has = jax.vmap(
        lambda t: jnp.zeros((K,), bool).at[t].set(True, mode="drop"))(tgt)
    slot_X = jax.vmap(
        lambda t, p: jnp.zeros((K, 3), last_pts.dtype)
        .at[t].set(p, mode="drop"))(tgt, last_pts)
    cidx = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :], lp_slot.shape)
    taken = (lp_slot >= 0) & keep[cidx, jnp.clip(lp_slot, 0)]
    cand_ok = cand_base & ~taken.any(axis=1)
    l_out = _local_map_core(rig, mt1, X, normal, mind, maxd, cand_ok,
                            pt_desc, pt_mask, cur, slot_has, slot_X,
                            slot_has, params, th=th_local,
                            n_levels=n_levels, scale_factor=scale_factor)
    return (cur,) + tuple(m_out) + tuple(l_out)


@functools.partial(jax.jit,
                   static_argnames=("extract_fn", "params", "th_motion",
                                    "th_local", "n_levels",
                                    "scale_factor"))
def working_scan_chunk(extract_fn, rig: Rig, images: jax.Array,
                       mt0: jax.Array, V0: jax.Array, last: Features,
                       slot_X0: jax.Array, slot_lp0: jax.Array,
                       slot_has0: jax.Array, X: jax.Array,
                       normal: jax.Array, mind: jax.Array,
                       maxd: jax.Array, cand_base: jax.Array,
                       pt_desc: jax.Array, pt_mask: jax.Array,
                       params, th_motion: float, th_local: float,
                       n_levels: int, scale_factor: float):
    """A CHUNK of B steady-state WORKING frames as ONE device dispatch:
    lax.scan whose body is ``working_track_step`` plus the frame-state
    roll the host performs between frames (slot scatter of surviving
    motion matches + new local-map matches, velocity update). Through a
    remote-accelerator link every dispatch/fetch pays the link RTT, so
    chunking amortizes BOTH over B frames — the real-time cost model of
    a pipelined production frontend (latency +B frames, throughput at
    device compute speed). The reference has no analogue: its per-frame
    loop is free on a local CPU, cTracking.cpp:237-346.

    The carried identity of each slot association is ``slot_lp`` — the
    index into the frozen local-map snapshot (X/desc arrays) — which
    the host maps back to landmark ids at chunk end; the snapshot is
    held fixed for the chunk, the same staleness the async mapper
    already imposes between a keyframe and its mapping pass landing.

    images: (B, C, H, W). Returns (carry, ys) where carry is the state
    after frame B-1 and ys stacks per-frame outputs: mt (B, 6), lp /
    has (B, C, K) rolled slot state, vis (B, cap) frustum visibility,
    scalars n_in1/n_m1/n_in2/it1/it2 (B,), and the per-frame Features
    (fetched per-slice only when a keyframe fires)."""
    C, K = slot_has0.shape
    cap = X.shape[0]

    def scatter(tgt, vals, fill):
        def one(t, v):
            sx = jnp.full((K + 1,) + v.shape[1:], fill, v.dtype) \
                .at[t].set(v, mode="drop")
            return sx[:K]
        return jax.vmap(one)(tgt, vals)

    def body(carry, img):
        last_f, slot_X, slot_lp, slot_has, mt, V = carry
        M_last = cayley2hom(mt)
        mt_pred = hom2cayley(M_last @ V)

        def inv_one(lp_c):
            idx = jnp.where(lp_c >= 0, lp_c, cap)
            return jnp.full((cap + 1,), -1, jnp.int32).at[idx].set(
                jnp.arange(K, dtype=jnp.int32), mode="drop")[:cap]
        lp_slot = jax.vmap(inv_one)(slot_lp).T          # (cap, C)
        out = working_track_step(
            extract_fn, rig, img, mt_pred, slot_X, slot_has, last_f,
            lp_slot, X, normal, mind, maxd, cand_base, pt_desc, pt_mask,
            params, th_motion=th_motion, th_local=th_local,
            n_levels=n_levels, scale_factor=scale_factor)
        (cur, match1, mt1, inl1, n_in1, n_m1, it1,
         fr_ok, match2, mt2, inl_slot, inl_new, n_in2, it2) = out
        # roll the slot state exactly like the host bookkeeping between
        # frames (_track_working_fused + next-frame preamble: surviving
        # inlier associations keep their landmark, outliers drop)
        keep = (match1 >= 0) & inl1 & slot_has
        tgt1 = jnp.where(keep, jnp.clip(match1, 0), K)
        sX1 = scatter(tgt1, slot_X, 0.0)
        slp1 = scatter(tgt1, slot_lp, -1)
        sh1 = scatter(tgt1, keep, False)
        got2 = (match2 >= 0) & inl_new
        tgt2 = jnp.where(got2, jnp.clip(match2, 0), K)
        src_X = jnp.broadcast_to(X[None], (C,) + X.shape)
        src_lp = jnp.broadcast_to(
            jnp.arange(cap, dtype=jnp.int32)[None], (C, cap))
        sX2 = scatter(tgt2, src_X, 0.0)
        slp2 = scatter(tgt2, src_lp, -1)
        sh2 = scatter(tgt2, got2, False)
        keep_slot = sh1 & inl_slot
        nxt_X = jnp.where(keep_slot[..., None], sX1, sX2)
        nxt_lp = jnp.where(keep_slot, slp1, slp2)
        nxt_has = keep_slot | sh2
        M_cur = cayley2hom(mt2)
        V_new = inv_se3(M_last) @ M_cur
        ys = dict(mt=mt2, lp=nxt_lp, has=nxt_has,
                  vis=fr_ok.any(axis=0),
                  n_in1=n_in1, n_m1=n_m1, n_in2=n_in2,
                  it1=it1, it2=it2, feats=cur)
        return (cur, nxt_X, nxt_lp, nxt_has, mt2, V_new), ys

    carry0 = (last, slot_X0, slot_lp0, slot_has0, mt0, V0)
    return jax.lax.scan(body, carry0, images)


class Tracker:
    """Host-side tracking orchestration. One instance per SLAM session."""

    def __init__(self, rig: Rig, extract_fn, extract_init_fn,
                 map_store: MapStore, cfg: TrackerConfig):
        self.rig = rig
        self.extract = extract_fn
        self.extract_init = extract_init_fn or extract_fn
        self.map = map_store
        self.cfg = cfg
        self.params = matcher.MatchParams(
            desc_bytes=cfg.desc_bytes, masked=cfg.masked,
            scale_factor=cfg.scale_factor)
        self.state = TrackState.NO_IMAGES_YET
        self.key = jax.random.PRNGKey(42)
        self._M_c_np = np.asarray(jax.device_get(rig.M_c), np.float64)

        self.frame_id = -1
        self.last_kf_id = -1
        self.last_reloc_frame = -1000
        self.velocity: Optional[np.ndarray] = None   # 4x4 V = M_last^-1 M_cur

        # current / last frame data
        self.cur_feats: Optional[Features] = None
        self.cur_pt: Optional[np.ndarray] = None     # (C, K) map point ids
        self.cur_outlier: Optional[np.ndarray] = None
        self.cur_mt = np.zeros(6)
        self.last_feats: Optional[Features] = None
        self.last_pt: Optional[np.ndarray] = None
        self.last_outlier: Optional[np.ndarray] = None
        self.last_mt = np.zeros(6)

        self.init_ref_feats: Optional[Features] = None

        # eval vectors (cTracking.h:114-121)
        self.all_poses: list[np.ndarray] = []
        self.timestamps: list[float] = []
        self.inlier_ratios: list[float] = []
        self.n_tracked: list[int] = []
        # pose-LM iterations actually run per optimization (gain-ratio
        # early stop, cOptimizer.cpp:88-92): observability for bench
        self.lm_iters: list[int] = []
        # device dispatches issued per frame (each synchronous dispatch
        # pays the tunnel RTT on a remote accelerator; the fused WORKING
        # path targets 2: extract+motion-track, local-map-track)
        self.dispatches_per_frame: list[int] = []
        self._dispatch_n = 0
        # per-stage timings (cTracking.h:119-121 timingFeatureExtraction /
        # timingInitalPoseEst / timingTrackLocalMap)
        from ..utils.timing import StageTimers
        self.timers = StageTimers()

        # callbacks wired by the System
        self.on_new_keyframe = None        # fn(kf_id)
        self.on_init_keyframes = None      # fn(kf0, kf1): sync bootstrap
        # async mapping backpressure (cTracking.cpp:922-935): keyframes
        # are only inserted while local mapping can accept them
        # (cLocalMapping::AcceptMultiKeyFrames); when it can't, the
        # tracker signals InterruptBA and retries next frame, so at most
        # one multikeyframe is ever in flight and the local map never
        # lags the tracker by more than one mapping pass.
        self.mapper_idle_fn = None         # fn() -> bool
        self.interrupt_ba_fn = None        # fn(): LocalMapping::InterruptBA
        self.on_reset = None               # fn(): reset fan-out
        self.reloc_candidates_fn = None    # fn(Features) -> list[int] (BoW)
        self.reloc_bow_match_fn = None     # fn(kf, Features) -> [(pt, c, s)]
        self.force_reloc = False
        # device-resident local-map snapshot cache: between map
        # mutations the voted point set is usually identical frame to
        # frame, and re-uploading its six padded arrays through a
        # remote-accelerator link costs real per-frame latency. The
        # System flips map_dirty after every mapping pass / loop
        # correction / reset; an identical vote with a clean flag
        # reuses the device arrays (see _local_map_snapshot).
        self.map_dirty = True
        self._snap_cache = None
        # per-frame path taken (fused / fused_weak / chunk / reloc /
        # thin_carry:N / ...): cheap diagnostic surfaced by the bench to
        # explain p90 frames (the non-fused fallback costs ~4 dispatches)
        self.frame_path: list[str] = []
        # fault injection (SURVEY 5.3): optional per-frame pose
        # perturbation applied after a successful track and BEFORE the
        # keyframe decision, so keyframes/points inherit the error like
        # real accumulated odometry drift (used to exercise loop closing
        # on drift-free synthetic worlds)
        self.perturb_pose_fn = None        # fn(mt_min6, frame_id) -> mt_min6

    # ------------------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def track(self, images, timestamp: float) -> Optional[np.ndarray]:
        """Main entry (cTracking::GrabImageSet + Track). Returns the
        estimated M_t (4x4) or None while not tracking."""
        self.frame_id += 1
        C, K = self.map.kf_pt.shape[1], self.map.kf_pt.shape[2]
        self._dispatch_n = 0

        self.cur_pt = np.full((C, K), -1, np.int32)
        self.cur_outlier = np.zeros((C, K), bool)

        # WORKING + motion model: extraction is FUSED into the motion
        # tracking dispatch (extract_motion_track_step) — decide before
        # extracting. The gather below only touches LAST-frame host
        # state, so it is free to run before the current frame exists.
        # force_reloc is SNAPSHOT once per frame: with async_mapping the
        # loop closer's thread can set it between this decision and the
        # branch below; a mid-frame flip is honored on the NEXT frame —
        # using the live flag in both places would route the reloc
        # branch at the previous frame's features (extraction is fused
        # into the motion dispatch and would not have run).
        forced = self.force_reloc
        motion_in = None
        lm_in = None
        why = "state"          # frame-path diagnostic (bench extras)
        if self.state == TrackState.WORKING and not forced:
            why = ("velocity" if self.velocity is None else
                   "reloc_recent" if self.frame_id
                   < self.last_reloc_frame + 2 else "")
        if (self.state == TrackState.WORKING and not forced
                and self.velocity is not None and self.cfg.use_motion_model
                and self.frame_id >= self.last_reloc_frame + 2):
            pts, has = self._gather_last_slot_points()
            if has.sum() < 20:
                why = f"thin_carry:{int(has.sum())}"
            else:
                motion_in = (pts, has)
                # local-map snapshot voted by the LAST frame's (just
                # resolved, by _gather_last_slot_points) associations:
                # lets the whole WORKING frame run as ONE fused dispatch
                # (working_track_step). Outlier-flagged slots DO vote —
                # the reference's UpdateReferenceKeyFrames counts every
                # non-bad mvpMapPoint without consulting mvbOutlier
                # (cTracking.cpp:1055-1075); dead/merged ids are handled
                # by the resolve + the voter's pt_valid filter
                lm_in = self._local_map_snapshot(self.last_pt)

        if motion_in is None:
            with self.timers.time("feature_extraction"):
                self._dispatch_n += 1
                if self.state in (TrackState.NO_IMAGES_YET,
                                  TrackState.NOT_INITIALIZED,
                                  TrackState.INITIALIZING):
                    feats = self.extract_init(images)
                else:
                    feats = self.extract(images)
                jax.block_until_ready(feats.desc)
            self.cur_feats = feats

        if self.state == TrackState.NO_IMAGES_YET:
            self.state = TrackState.NOT_INITIALIZED

        if self.state == TrackState.NOT_INITIALIZED:
            self.frame_path.append("init")
            self._first_initialization()
        elif self.state == TrackState.INITIALIZING:
            self.frame_path.append("init")
            self._try_initialize()
        else:
            ok = False
            fused_done = False
            if self.state == TrackState.WORKING and not forced:
                tried_fused = motion_in is not None and lm_in is not None
                if tried_fused:
                    # the ONE fused dispatch covers extraction + motion
                    # tracking + local-map tracking: timed under its own
                    # stage so per-stage medians keep a single meaning
                    # (feature_extraction / initial_pose_estimation /
                    # track_local_map cover only non-fused frames)
                    with self.timers.time("working_fused"):
                        r = self._track_working_fused(motion_in, lm_in,
                                                      images)
                    if r is not None:
                        ok, fused_done = r, True
                self.frame_path.append(
                    "fused" if fused_done else
                    "fused_weak" if tried_fused else
                    (why or "no_snapshot"))
                if not fused_done:
                    with self.timers.time("initial_pose_estimation"):
                        if not tried_fused and motion_in is not None:
                            ok = self._track_with_motion_model(motion_in,
                                                               images)
                        if not ok:
                            ok = self._track_previous_frame()
            else:
                self.frame_path.append("reloc")
                with self.timers.time("initial_pose_estimation"):
                    ok = self._relocalize()
                if ok and forced == self.force_reloc:
                    # clear only if no NEW request landed mid-frame
                    self.force_reloc = False

            if ok and not fused_done:
                with self.timers.time("track_local_map"):
                    ok = self._track_local_map()

            if ok:
                self.state = TrackState.WORKING
                if self.perturb_pose_fn is not None:
                    self.cur_mt = np.asarray(
                        self.perturb_pose_fn(self.cur_mt, self.frame_id))
                if self._need_new_keyframe():
                    self._create_new_keyframe()
                # motion model V = M_last^-1 * M_cur  (cTracking.cpp:327-338)
                M_last = se3_np.cayley2hom(self.last_mt)
                M_cur = se3_np.cayley2hom(self.cur_mt)
                self.velocity = np.linalg.inv(M_last) @ M_cur
            else:
                self.state = TrackState.LOST
                self.velocity = None
                # reset if the map is young (cTracking.cpp:317-324);
                # record this frame's dispatch count first so per-frame
                # eval vectors stay index-aligned up to the reset
                if self.map.n_keyframes() <= 3:
                    self.dispatches_per_frame.append(self._dispatch_n)
                    self.reset()
                    return None

        self.dispatches_per_frame.append(self._dispatch_n)
        # roll frame state
        self.last_feats = self.cur_feats
        self.last_pt = self.cur_pt
        self.last_outlier = self.cur_outlier
        self.last_mt = self.cur_mt.copy()
        if self.state == TrackState.WORKING:
            M = se3_np.cayley2hom(self.cur_mt)
            self.all_poses.append(M)
            self.timestamps.append(timestamp)
            return M
        return None

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def _first_initialization(self):
        """cTracking::FirstInitialization (:375-391): require >= 100 kps."""
        if int(np.asarray(self.cur_feats.valid).sum()) >= initializer.MIN_MATCHES:
            self.init_ref_feats = self.cur_feats
            self.cur_mt = np.zeros(6)
            self.state = TrackState.INITIALIZING

    def _try_initialize(self):
        feats = self.cur_feats
        if int(np.asarray(feats.valid).sum()) < initializer.MIN_MATCHES:
            self.state = TrackState.NOT_INITIALIZED
            return
        cand = initializer.initialize_device(
            self._next_key(), self.rig, self.init_ref_feats, feats,
            self.params)
        if int(np.asarray(cand.match_idx >= 0).sum()) < initializer.MIN_MATCHES:
            self.state = TrackState.NOT_INITIALIZED
            return
        res = initializer.pick_leading_camera(cand, self.rig)
        if res is None:
            return  # keep trying with the same reference
        self._create_initial_map(res)

    def _create_initial_map(self, res: initializer.InitResult):
        """cTracking::CreateInitialMap (:439-722), simplified: 2 MKFs +
        lead-camera points + pose refinement via BA (host mapping adds
        cross-camera points later)."""
        m = self.map
        kf0 = m.alloc_keyframe(res.mt_ref, self.init_ref_feats,
                               self.frame_id - 1)
        kf1 = m.alloc_keyframe(res.mt_cur, self.cur_feats, self.frame_id)

        ids = m.alloc_points(len(res.X_world))
        m.pt_pos[ids] = res.X_world.astype(np.float32)
        m.pt_first_kf[ids] = kf0
        lead = res.lead_cam
        for i, p in enumerate(ids):
            m.add_observation(int(p), kf0, lead, int(res.ref_slots[i]))
            m.add_observation(int(p), kf1, lead, int(res.cur_slots[i]))
        m.update_point_stats(ids, self._M_c_np,
                             self.cfg.scale_factor, self.cfg.n_levels)
        m.update_spanning_tree(kf1)

        # current frame associations
        self.cur_pt[lead, res.cur_slots] = ids
        self.cur_mt = res.mt_cur.copy()
        self.last_kf_id = kf1
        self.state = TrackState.WORKING
        self.velocity = None
        # The reference performs ALL of CreateInitialMap — cross-camera
        # matching and the scale-fixing global BAs included — inline in
        # the tracking thread BEFORE handing the keyframes to the local
        # mapper (cTracking.cpp:439-722). Mirror that: even in async
        # mode the two bootstrap keyframes are mapped synchronously via
        # on_init_keyframes, because their first BA applies the metric
        # scale correction (the monocular-init map's scale is arbitrary
        # until cross-camera observations pin it to the rig baseline) —
        # a gauge jump the tracker must observe before its next frame.
        if self.on_init_keyframes:
            self.on_init_keyframes(kf0, kf1)
        elif self.on_new_keyframe:
            self.on_new_keyframe(kf0)
            self.on_new_keyframe(kf1)
        if self.on_init_keyframes or self.on_new_keyframe:
            # mapping refined kf1's pose; keep the tracker consistent
            # with the refined map (reference: GlobalBundleAdjustment
            # inside CreateInitialMap updates the current frame pose)
            self.cur_mt = m.kf_pose[kf1].copy()

    # ------------------------------------------------------------------
    # frame-to-frame tracking
    # ------------------------------------------------------------------

    def _gather_last_slot_points(self):
        """(C, K, 3) world position per last-frame slot (zeros if none)."""
        C, K = self.last_pt.shape
        # follow merge forwarding first (mapper may have fused landmarks)
        self.last_pt = self.map.resolve_points(self.last_pt)
        pts = np.zeros((C, K, 3), np.float32)
        has = (self.last_pt >= 0) & ~self.last_outlier
        ids = self.last_pt[has]
        pts[has] = self.map.pt_pos[ids]
        # drop slots whose point died
        alive = np.zeros((C, K), bool)
        alive[has] = self.map.pt_valid[ids]
        # dedupe: merge forwarding can leave one landmark id in TWO slots
        # of a camera; keep only the first slot so (a) a landmark never
        # votes twice in the pose LM and (b) the fused path's id->slot
        # inverse (lp_slot, working_track_step candidate exclusion) is
        # exact — with duplicates, the recorded slot failing to rematch
        # while the other survived would let the local-map stage
        # re-associate a landmark already in the frame
        for c in range(C):
            idx = np.nonzero(alive[c])[0]
            if len(idx) == 0:
                continue
            _, first = np.unique(self.last_pt[c, idx], return_index=True)
            dup = np.ones(len(idx), bool)
            dup[first] = False
            alive[c, idx[dup]] = False
        return pts, alive

    def _track_with_motion_model(self, gathered=None, images=None) -> bool:
        """cTracking::TrackWithMotionModel (:790-832), fused: feature
        extraction + projection + matching + pose LM run as ONE device
        dispatch (extract_motion_track_step) when ``images`` is given;
        the host only applies the returned associations and inlier flags
        to its bookkeeping. The returned Features stay device-resident
        for the local-map step and keyframe creation."""
        M_last = se3_np.cayley2hom(self.last_mt)
        M_pred = M_last @ self.velocity
        mt_pred = se3_np.hom2cayley(M_pred)

        if gathered is None:
            gathered = self._gather_last_slot_points()
            if gathered[1].sum() < 20:
                return False
        pts, has = gathered
        self._dispatch_n += 1
        if images is not None:
            out = extract_motion_track_step(
                self.extract, self.rig, images, jnp.asarray(mt_pred),
                jnp.asarray(pts), jnp.asarray(has), self.last_feats,
                self.params, th=self.cfg.motion_th)
            self.cur_feats = out[0]    # device-resident, NOT transferred
            out = out[1:]
        else:
            out = motion_track_step(
                self.rig, jnp.asarray(mt_pred), jnp.asarray(pts),
                jnp.asarray(has), self.cur_feats, self.last_feats,
                jnp.asarray(self.cur_pt >= 0), self.params,
                th=self.cfg.motion_th)
        # ONE host transfer for all outputs: through a remote-TPU
        # tunnel every separate blocking fetch pays the dispatch RTT
        match, mt, inlier, n_in, n_matches, n_it = jax.device_get(out)
        n_matches = int(n_matches)
        self.lm_iters.append(int(n_it))
        if n_matches < 20:
            return False

        # assign matched map points to current slots; DISCARD LM outliers
        # (the reference nulls outlier mvpMapPoints after
        # TrackWithMotionModel, cTracking.cpp:817-830, so they neither
        # vote in TrackLocalMap's LM nor block the slot from rematching)
        C, K = match.shape
        for c in range(C):
            sel = np.nonzero(match[c] >= 0)[0]
            self.cur_pt[c, match[c, sel]] = self.last_pt[c, sel]
            bad = sel[~inlier[c, sel]]
            self.cur_pt[c, match[c, bad]] = -1
        self.cur_mt = np.asarray(mt)
        n_in = int(n_in)
        self.inlier_ratios.append(n_in / max(n_matches, 1))
        return n_in >= self.cfg.min_inliers_track

    def _track_working_fused(self, motion_in, lm_in, images):
        """The steady-state WORKING frame as ONE device dispatch
        (``working_track_step``): extraction + motion tracking +
        local-map tracking chained on-device; the host applies ALL
        bookkeeping from a single transfer of the outputs.

        Returns the local-map verdict (bool), or None when the motion
        stage failed — the caller falls back to the previous-frame
        window search exactly like the two-dispatch flow
        (cTracking.cpp:300-315); ``cur_feats`` are already set from the
        fused dispatch, and the motion associations were applied (or
        not) with the same semantics as ``_track_with_motion_model``."""
        pts, has = motion_in
        local_pts, cap, arrs = lm_in
        M_last = se3_np.cayley2hom(self.last_mt)
        mt_pred = se3_np.hom2cayley(M_last @ self.velocity)
        C, K = self.last_pt.shape
        P = len(local_pts)
        # per-camera inverse lookup: landmark id -> last-frame slot, so
        # the device can exclude already-matched local points from the
        # candidate set (the host-side np.isin of the split flow)
        lp_slot = np.full((cap, C), -1, np.int32)
        inv = np.full(self.map.pt_pos.shape[0], -1, np.int32)
        for c in range(C):
            inv[:] = -1
            s = np.nonzero(has[c])[0]
            inv[self.last_pt[c, s]] = s
            lp_slot[:P, c] = inv[local_pts]
        cand_base = np.zeros(cap, bool)
        cand_base[:P] = True

        self._dispatch_n += 1
        out = working_track_step(
            self.extract, self.rig, images, jnp.asarray(mt_pred),
            jnp.asarray(pts), jnp.asarray(has), self.last_feats,
            jnp.asarray(lp_slot), jnp.asarray(arrs["X"]),
            jnp.asarray(arrs["normal"]), jnp.asarray(arrs["mind"]),
            jnp.asarray(arrs["maxd"]), jnp.asarray(cand_base),
            jnp.asarray(arrs["desc"]), jnp.asarray(arrs["dmask"]),
            self.params, th_motion=self.cfg.motion_th,
            th_local=self.cfg.local_map_th, n_levels=self.cfg.n_levels,
            scale_factor=self.cfg.scale_factor)
        self.cur_feats = out[0]    # device-resident, NOT transferred
        # ONE host transfer for every scalar/association output
        (match1, mt1, inl1, n_in1, n_m1, it1,
         fr_ok, match2, mt2, inl_slot, inl_new, n_in2, it2) = \
            jax.device_get(out[1:])
        n_m1 = int(n_m1)
        self.lm_iters.append(int(it1))
        if n_m1 < 20:
            return None
        # motion bookkeeping — identical to _track_with_motion_model:
        # assign matched points, DISCARD LM outliers (cTracking.cpp:817-830)
        for c in range(C):
            sel = np.nonzero(match1[c] >= 0)[0]
            self.cur_pt[c, match1[c, sel]] = self.last_pt[c, sel]
            bad = sel[~inl1[c, sel]]
            self.cur_pt[c, match1[c, bad]] = -1
        self.cur_mt = np.asarray(mt1)
        n_in1 = int(n_in1)
        self.inlier_ratios.append(n_in1 / max(n_m1, 1))
        if n_in1 < self.cfg.min_inliers_track:
            return None

        # local-map bookkeeping — mirrors _track_local_map's post-
        # dispatch section against the lagged snapshot
        self.lm_iters.append(int(it2))
        m = self.map
        vis = fr_ok[:, :P].any(0)
        m.pt_visible[local_pts[vis]] += 1
        slot_has = self.cur_pt >= 0
        n_new = 0
        for c in range(C):
            sel = np.nonzero(match2[c, :P] >= 0)[0]
            slots = match2[c, sel]
            free = self.cur_pt[c, slots] < 0
            self.cur_pt[c, slots[free]] = local_pts[sel[free]]
            n_new += int(free.sum())
            bad = sel[~inl_new[c, sel]]
            self.cur_outlier[c, match2[c, bad]] = True
        self.cur_outlier |= slot_has & ~inl_slot
        self.cur_mt = np.asarray(mt2)
        n_in2 = int(n_in2)
        n_obs = int(slot_has.sum()) + n_new
        self.inlier_ratios.append(n_in2 / max(n_obs, 1))
        # resolve merge forwarding + drop dead landmarks BEFORE the
        # found counters and the keyframe decision (the split flow does
        # this in _track_local_map's preamble; without it
        # _median_scene_depth and _create_new_keyframe could read
        # merged-away ids for one frame and silently drop observations)
        self.cur_pt = m.resolve_points(self.cur_pt)
        raw_has = self.cur_pt >= 0
        dead = np.zeros_like(raw_has)
        dead[raw_has] = ~m.pt_valid[self.cur_pt[raw_has]]
        self.cur_pt[dead] = -1
        tracked = self.cur_pt[(self.cur_pt >= 0) & ~self.cur_outlier]
        m.pt_found[tracked] += 1
        self.n_tracked.append(len(tracked))
        return n_in2 >= self.cfg.min_inliers_local

    def track_chunk(self, images, timestamps):
        """Track a chunk of B consecutive steady-state WORKING frames
        with ONE device dispatch and ONE fetch (``working_scan_chunk``):
        the device scans ``working_track_step`` + the inter-frame slot
        roll over all B frames, the host then replays the bookkeeping
        (counters, keyframe policy) from the stacked outputs in frame
        order. Amortizes the link RTT and the per-dispatch overhead over
        B frames — the production throughput mode; latency grows by B
        frames, which at 25 fps and B=8 is the same order as the async
        mapper's keyframe-to-map-update lag.

        Semantics vs the per-frame fused path, both documented
        deviations of the same kind the async pipeline already makes:
        the local-map snapshot is frozen for the whole chunk (per-frame
        mode re-votes every frame from associations that change only
        when mapping lands), and a keyframe fired at chunk position i
        is inserted when the walk reaches it (insertion lag < B frames;
        the reference's mapper consumes keyframes from a queue with the
        same property, cSystem.cpp:96-110).

        Returns (n_accepted, poses) — poses are (4, 4) body poses for
        the accepted prefix — or None when the streaming preconditions
        do not hold. The caller falls back to per-frame ``track()``
        starting at the first unaccepted frame: tracking-quality floors
        (the same min-inlier gates the per-frame path enforces), a
        keyframe whose mapping must land before the stale snapshot
        drifts too far, or a loop-closer relocalization request all
        truncate the accepted prefix."""
        B = int(images.shape[0])
        if (self.state != TrackState.WORKING or self.force_reloc
                or self.velocity is None or not self.cfg.use_motion_model
                or self.perturb_pose_fn is not None
                or self.frame_id < self.last_reloc_frame + 2):
            return None
        pts, has = self._gather_last_slot_points()
        if has.sum() < 20:
            return None
        lm_in = self._local_map_snapshot(self.last_pt)
        if lm_in is None:
            return None
        local_pts, cap, arrs = lm_in
        m = self.map
        P = len(local_pts)
        C, K = self.last_pt.shape
        # slot -> snapshot index; the device carries associations by
        # snapshot index (landmark ids resolve back at walk time)
        id_to_lp = np.full(m.pt_pos.shape[0], -1, np.int32)
        id_to_lp[local_pts] = np.arange(P, dtype=np.int32)
        slot_lp0 = np.full((C, K), -1, np.int32)
        hs = np.asarray(has).copy()
        slot_lp0[hs] = id_to_lp[self.last_pt[hs]]
        hs &= slot_lp0 >= 0     # ids outside the snapshot can't carry
        cand_base = np.zeros(cap, bool)
        cand_base[:P] = True

        with self.timers.time("working_chunk"):
            self._dispatch_n += 1
            carry, ys = working_scan_chunk(
                self.extract, self.rig, jnp.asarray(images),
                jnp.asarray(self.last_mt, jnp.float32),
                jnp.asarray(self.velocity.astype(np.float32)),
                self.last_feats, jnp.asarray(pts),
                jnp.asarray(slot_lp0), jnp.asarray(hs),
                jnp.asarray(arrs["X"]), jnp.asarray(arrs["normal"]),
                jnp.asarray(arrs["mind"]), jnp.asarray(arrs["maxd"]),
                jnp.asarray(cand_base), jnp.asarray(arrs["desc"]),
                jnp.asarray(arrs["dmask"]), self.params,
                th_motion=self.cfg.motion_th,
                th_local=self.cfg.local_map_th,
                n_levels=self.cfg.n_levels,
                scale_factor=self.cfg.scale_factor)
            feats_stack = ys.pop("feats")      # stays device-resident
            host = jax.device_get(ys)          # ONE fetch for the chunk

        entry_mt = self.last_mt.copy()
        mt_arr = host["mt"]
        poses: list[np.ndarray] = []
        accepted = 0
        for i in range(B):
            if self.force_reloc:
                break       # loop closer moved the map mid-chunk
            if (int(host["n_m1"][i]) < 20
                    or int(host["n_in1"][i]) < self.cfg.min_inliers_track
                    or int(host["n_in2"][i]) < self.cfg.min_inliers_local):
                break       # per-frame path handles recovery from here
            self.frame_id += 1
            self.lm_iters.append(int(host["it1"][i]))
            self.lm_iters.append(int(host["it2"][i]))
            m.pt_visible[local_pts[host["vis"][i][:P]]] += 1
            hs_i = host["has"][i]
            cur_pt = np.full((C, K), -1, np.int32)
            cur_pt[hs_i] = local_pts[host["lp"][i][hs_i]]
            cur_pt = m.resolve_points(cur_pt)
            raw = cur_pt >= 0
            dead = np.zeros_like(raw)
            dead[raw] = ~m.pt_valid[cur_pt[raw]]
            cur_pt[dead] = -1
            tracked = cur_pt[cur_pt >= 0]
            m.pt_found[tracked] += 1
            self.n_tracked.append(len(tracked))
            self.inlier_ratios.append(
                int(host["n_in1"][i]) / max(int(host["n_m1"][i]), 1))
            self.inlier_ratios.append(
                int(host["n_in2"][i]) / max(int(hs_i.sum()), 1))
            self.cur_pt = cur_pt
            self.cur_outlier = np.zeros((C, K), bool)
            self.cur_mt = mt_arr[i].astype(np.float64)
            self.dispatches_per_frame.append(1 if i == 0 else 0)
            self.frame_path.append("chunk")
            M = se3_np.cayley2hom(self.cur_mt)
            self.all_poses.append(M)
            self.timestamps.append(timestamps[i])
            poses.append(M)
            accepted += 1
            if self._need_new_keyframe():
                self.cur_feats = jax.tree.map(lambda a, _i=i: a[_i],
                                              feats_stack)
                self._create_new_keyframe()

        if accepted:
            i = accepted - 1
            self.cur_feats = (carry[0] if accepted == B else
                              jax.tree.map(lambda a, _i=i: a[_i],
                                           feats_stack))
            self.last_feats = self.cur_feats
            self.last_pt = self.cur_pt
            self.last_outlier = np.zeros((C, K), bool)
            self.last_mt = self.cur_mt.copy()
            prev = (entry_mt if accepted == 1
                    else mt_arr[accepted - 2].astype(np.float64))
            self.velocity = np.linalg.inv(se3_np.cayley2hom(prev)) \
                @ se3_np.cayley2hom(self.cur_mt)
        return accepted, poses

    def _track_previous_frame(self) -> bool:
        """cTracking::TrackPreviousFrame (:724-788): wide window search
        from the last frame, then pose optimization."""
        pts, has = self._gather_last_slot_points()
        if has.sum() < 10:
            return False
        self._dispatch_n += 1
        match = matcher.window_search(
            self.last_feats, self.cur_feats, jnp.asarray(has), self.params,
            window=200.0, nn_ratio=0.9)
        match = np.asarray(match)      # (C, K_last) -> cur slot
        n = int((match >= 0).sum())
        if n < 20:
            # second round with a larger window (the reference's
            # TrackPreviousFrame retries with widened search,
            # cTracking.cpp:735-760)
            self._dispatch_n += 1
            match = np.asarray(matcher.window_search(
                self.last_feats, self.cur_feats, jnp.asarray(has),
                self.params, window=400.0, nn_ratio=0.95))
            n = int((match >= 0).sum())
        C, K = match.shape
        for c in range(C):
            sel = np.nonzero(match[c] >= 0)[0]
            self.cur_pt[c, match[c, sel]] = self.last_pt[c, sel]
        if n < 10:
            return False
        return self._optimize_current_pose(self.last_mt,
                                           self.cfg.min_inliers_track)

    def _optimize_current_pose(self, mt_init, min_inliers: int) -> bool:
        """Pose-only LM over the current frame associations."""
        C, K = self.cur_pt.shape
        self.cur_pt = self.map.resolve_points(self.cur_pt)
        has = self.cur_pt >= 0
        cam_idx, slot_idx = np.nonzero(has)
        pt_ids = self.cur_pt[cam_idx, slot_idx]
        alive = self.map.pt_valid[pt_ids]
        cam_idx, slot_idx, pt_ids = (cam_idx[alive], slot_idx[alive],
                                     pt_ids[alive])
        n = len(pt_ids)
        if n < min_inliers:
            return False
        cap = bucket(n, 128)
        uv = np.zeros((cap, 2), np.float32)
        xy = np.asarray(self.cur_feats.xy)
        lvl = np.asarray(self.cur_feats.level)
        uv[:n] = xy[cam_idx, slot_idx]
        inv_sigma2 = np.ones(cap, np.float32)
        inv_sigma2[:n] = self.cfg.scale_factor ** (
            -2.0 * lvl[cam_idx, slot_idx])
        cams = np.zeros(cap, np.int32)
        cams[:n] = cam_idx
        X = np.zeros((cap, 3), np.float32)
        X[:n] = self.map.pt_pos[pt_ids]
        valid = np.zeros(cap, bool)
        valid[:n] = True
        obs = opt.BAObservations(
            uv=jnp.asarray(uv), kf=jnp.zeros(cap, jnp.int32),
            cam=jnp.asarray(cams), pt=jnp.arange(cap, dtype=jnp.int32),
            inv_sigma2=jnp.asarray(inv_sigma2), valid=jnp.asarray(valid))
        self._dispatch_n += 1
        mt, inlier, n_in, n_it = opt.pose_optimization(
            self.rig, jnp.asarray(np.asarray(mt_init, np.float64)), obs,
            jnp.asarray(X))
        n_in = int(n_in)
        self.lm_iters.append(int(n_it))
        inlier = np.asarray(inlier)[:n]
        # mark outliers on the frame (cOptimizer.cpp:414-438 effect)
        out_c = cam_idx[~inlier]
        out_s = slot_idx[~inlier]
        self.cur_outlier[out_c, out_s] = True
        self.cur_mt = np.asarray(mt)
        self.inlier_ratios.append(n_in / max(n, 1))
        return n_in >= min_inliers

    # ------------------------------------------------------------------
    # local map tracking
    # ------------------------------------------------------------------

    def _local_map_ids(self, src_pt=None):
        """UpdateReference (cTracking.cpp:1014-1123): keyframes observing
        current points (K1) + their covisible neighbours (K2); local
        points = all points of those KFs. ``src_pt`` selects which
        frame's associations vote (default: the current frame; the fused
        WORKING path votes with the LAST frame's, see
        ``working_track_step``)."""
        if src_pt is None:
            src_pt = self.cur_pt
        m = self.map
        ids = src_pt[src_pt >= 0]
        ids = ids[m.pt_valid[ids]]
        if len(ids) == 0:
            return np.empty(0, np.int32), np.empty(0, np.int32)
        # vectorized vote over the map's flat observation log: count the
        # live (pt, kf) rows whose point is associated in the frame —
        # host cost is one gather + bincount, flat in map size (the
        # per-association python/dict walk grew with every observation
        # list and became the tracker's host bottleneck on 100+ KF maps)
        in_frame = np.zeros(m.pt_pos.shape[0], bool)
        in_frame[ids] = True
        rows = m.obs_rows()
        votes = np.bincount(rows[in_frame[rows[:, 0]], 1],
                            minlength=m.kf_pt.shape[0])
        k1 = np.nonzero(votes)[0]
        if len(k1) == 0:
            return np.empty(0, np.int32), np.empty(0, np.int32)
        k1 = k1[np.argsort(-votes[k1], kind="stable")].tolist()
        local_kfs = list(k1)
        seen = set(local_kfs)
        for kf in k1[:10]:
            for nkf in self.map.covisible_keyframes(kf, best_n=10):
                if nkf not in seen:
                    seen.add(nkf)
                    local_kfs.append(nkf)
        arr = self.map.kf_pt[np.asarray(local_kfs, np.int64)]
        pts = np.unique(arr[arr >= 0])
        pts = pts[self.map.pt_valid[pts]].astype(np.int32)
        return np.asarray(local_kfs, np.int32), pts

    def _local_map_snapshot(self, src_pt=None):
        """Bucket-padded device inputs for the local-map stage (point
        positions / normals / distance range / distinctive descriptors),
        selected by ``_local_map_ids`` voting with ``src_pt``. Returns
        (local_pts, cap, dict of padded arrays) or None when no local
        map exists yet."""
        local_kfs, local_pts = self._local_map_ids(src_pt)
        if len(local_pts) == 0:
            return None
        m = self.map
        # reuse the device copies while the map is unchanged AND the
        # vote selected the identical point set (a concurrent worker
        # mutation between the check and the store is re-flagged by the
        # NEXT mapping pass, so staleness is bounded by one pass — the
        # same bound the async snapshot semantics already carry)
        c = self._snap_cache
        if (c is not None and not self.map_dirty
                and np.array_equal(c[0], local_pts)):
            return c
        P = len(local_pts)
        cap = bucket(P, 256)
        pad = lambda a, fill=0: np.concatenate(
            [a, np.full((cap - P,) + a.shape[1:], fill, a.dtype)], 0)
        arrs = dict(X=pad(m.pt_pos[local_pts]),
                    normal=pad(m.pt_normal[local_pts]),
                    mind=pad(m.pt_min_dist[local_pts]),
                    maxd=pad(m.pt_max_dist[local_pts], 1.0),
                    desc=pad(m.pt_desc[local_pts]),
                    dmask=pad(m.pt_desc_mask[local_pts]))
        arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
        self._snap_cache = (local_pts, cap, arrs)
        self.map_dirty = False
        return self._snap_cache

    def _track_local_map(self, th: float | None = None,
                         update_counters: bool = True) -> bool:
        """TrackLocalMap (:834-888), fused: frustum check + local-map
        matching + pose LM over (existing slot associations + new
        matches) run as ONE device dispatch (local_map_track_step).

        ``th`` overrides the search window scale (the relocalization
        second-chance round re-matches with widened windows, th=10);
        ``update_counters=False`` skips the visibility/found counters so
        a reloc attempt does not skew culling statistics."""
        snap = self._local_map_snapshot()
        if snap is None:
            return False
        local_pts, cap, arrs = snap
        m = self.map
        P = len(local_pts)
        X, normal, mind, maxd, desc, dmask = (
            arrs["X"], arrs["normal"], arrs["mind"], arrs["maxd"],
            arrs["desc"], arrs["dmask"])

        # clean up the frame's associations BEFORE deriving the
        # candidate set: follow merge forwarding, drop slots flagged as
        # outliers by the initial pose LM (the reference nulls those,
        # cTracking.cpp:817-830) and slots whose landmark died — the
        # remaining set is both the LM observation group and the matcher
        # occupancy mask, so the inlier denominator matches the applied
        # associations exactly
        self.cur_pt = m.resolve_points(self.cur_pt)
        drop = (self.cur_pt >= 0) & self.cur_outlier
        self.cur_pt[drop] = -1
        self.cur_outlier[drop] = False
        C, K = self.cur_pt.shape
        raw_has = self.cur_pt >= 0
        dead = np.zeros((C, K), bool)
        dead[raw_has] = ~m.pt_valid[self.cur_pt[raw_has]]
        self.cur_pt[dead] = -1
        slot_has = self.cur_pt >= 0
        slot_X = np.zeros((C, K, 3), np.float32)
        slot_X[slot_has] = m.pt_pos[self.cur_pt[slot_has]]

        # padding + points already associated in the frame are not
        # candidates (computed AFTER resolve_points so a landmark merged
        # into an already-associated id is excluded too)
        cand_ok = np.zeros(cap, bool)
        cand_ok[:P] = ~np.isin(local_pts, self.cur_pt[slot_has])

        self._dispatch_n += 1
        out = local_map_track_step(
            self.rig, jnp.asarray(self.cur_mt), jnp.asarray(X),
            jnp.asarray(normal), jnp.asarray(mind), jnp.asarray(maxd),
            jnp.asarray(cand_ok), jnp.asarray(desc), jnp.asarray(dmask),
            self.cur_feats, jnp.asarray(slot_has),
            jnp.asarray(slot_X), jnp.asarray(slot_has), self.params,
            th=self.cfg.local_map_th if th is None else th,
            n_levels=self.cfg.n_levels,
            scale_factor=self.cfg.scale_factor)
        # ONE host transfer for all outputs (see motion_track_step note)
        ok, match, mt, inl_slot, inl_new, n_in, n_it = jax.device_get(out)
        self.lm_iters.append(int(n_it))

        # visibility counters (isInFrustum -> IncreaseVisible)
        if update_counters:
            vis = ok[:, :P].any(0)
            m.pt_visible[local_pts[vis]] += 1
        n_new = 0
        for c in range(C):
            sel = np.nonzero(match[c, :P] >= 0)[0]
            slots = match[c, sel]
            free = self.cur_pt[c, slots] < 0
            self.cur_pt[c, slots[free]] = local_pts[sel[free]]
            n_new += int(free.sum())
            bad = sel[~inl_new[c, sel]]
            self.cur_outlier[c, match[c, bad]] = True
        # LM outliers among the pre-existing associations
        self.cur_outlier |= slot_has & ~inl_slot
        self.cur_mt = np.asarray(mt)
        n_in = int(n_in)
        n_obs = int(slot_has.sum()) + n_new
        self.inlier_ratios.append(n_in / max(n_obs, 1))
        okpose = n_in >= self.cfg.min_inliers_local
        if update_counters:
            # found counters for culling (TrackLocalMap IncreaseFound)
            tracked = self.cur_pt[(self.cur_pt >= 0) & ~self.cur_outlier]
            m.pt_found[tracked] += 1
            self.n_tracked.append(len(tracked))
        return okpose

    # ------------------------------------------------------------------
    # keyframe policy
    # ------------------------------------------------------------------

    def _need_new_keyframe(self) -> bool:
        """cTracking::NeedNewKeyFrame (:890-938)."""
        m = self.map
        if self.last_kf_id < 0:
            return False
        n_tracked = int(((self.cur_pt >= 0) & ~self.cur_outlier).sum())
        frames_since = self.frame_id - m.kf_frame_id[self.last_kf_id]
        if frames_since < self.cfg.min_frames:
            return False
        # tracked vs reference KF points
        ref_pts = int((m.kf_pt[self.last_kf_id] >= 0).sum())
        weak = n_tracked < ref_pts * self.cfg.kf_tracked_ratio
        stale = frames_since >= self.cfg.max_frames
        # MultiCol baseline condition (:921): distance to last KF relative
        # to median scene depth > 0.2
        M_cur = se3_np.cayley2hom(self.cur_mt)
        M_kf = se3_np.cayley2hom(m.kf_pose[self.last_kf_id])
        baseline = np.linalg.norm(M_cur[:3, 3] - M_kf[:3, 3])
        depth = self._median_scene_depth()
        moved = depth > 0 and (baseline / depth) > self.cfg.baseline_depth_ratio
        need = (weak and n_tracked > self.cfg.kf_min_points) or stale or moved
        if not need:
            return False
        # mapper busy -> interrupt its BA but do NOT insert yet
        # (cTracking.cpp:922-935); sync mode has no mapper_idle_fn
        if self.mapper_idle_fn is not None and not self.mapper_idle_fn():
            if self.interrupt_ba_fn is not None:
                self.interrupt_ba_fn()
            return False
        return True

    def _median_scene_depth(self) -> float:
        pts = self.cur_pt[(self.cur_pt >= 0) & ~self.cur_outlier]
        if len(pts) == 0:
            return 0.0
        M_cur = se3_np.cayley2hom(self.cur_mt)
        X = self.map.pt_pos[pts]
        d = np.linalg.norm(X - M_cur[:3, 3], axis=1)
        return float(np.median(d))

    def _create_new_keyframe(self):
        """cTracking::CreateNewKeyFrame (:940-951)."""
        m = self.map
        kf = m.alloc_keyframe(self.cur_mt, self.cur_feats, self.frame_id)
        C, K = self.cur_pt.shape
        for c in range(C):
            for s in np.nonzero((self.cur_pt[c] >= 0)
                                & ~self.cur_outlier[c])[0]:
                pid = int(self.cur_pt[c, s])
                if m.pt_valid[pid]:
                    m.add_observation(pid, kf, c, int(s))
        m.update_spanning_tree(kf)
        self.last_kf_id = kf
        if self.on_new_keyframe:
            self.on_new_keyframe(kf)

    # ------------------------------------------------------------------
    # relocalization (cTracking::Relocalisation :1125-1312)
    # ------------------------------------------------------------------

    def _relocalize(self) -> bool:
        """Relocalization (cTracking.cpp:1125-1312): candidate keyframes
        via the BoW inverted file when available (DetectRelocalisation-
        Candidates), else the recent keyframes; descriptor matching
        against each candidate, then robust pose LM from the candidate's
        pose (the reference runs GP3P RANSAC + gpnp refine; robust LM
        from a candidate pose fills the same recover-from-LOST contract
        and the batched GP3P solver slots in here)."""
        m = self.map
        cands = None
        if self.reloc_candidates_fn is not None:
            try:
                cands = self.reloc_candidates_fn(self.cur_feats)
            except Exception:
                cands = None
        # always ALSO try the most recent keyframes: BoW candidates can
        # be aliased to the wrong place (similar-looking rooms) while
        # the KF that actually overlaps the lost view is simply the
        # last one inserted — losing it means relocalization never
        # recovers even though the answer is trivial
        recent = m.keyframe_ids()[-10:].tolist()
        cands = list(dict.fromkeys((cands or []) + recent))
        best = None
        for kf in cands:
            f_kf = m.kf_features[kf]
            if f_kf is None:
                continue
            if self.reloc_bow_match_fn is not None:
                # vocabulary-node-gated SearchByBoW (cORBmatcher.cpp:
                # 179-323) — the reference's relocalization matcher
                triples = self.reloc_bow_match_fn(kf, self.cur_feats)
            else:
                # no vocabulary: brute-force window search fallback
                kf_has = jnp.asarray(m.kf_pt[kf] >= 0)
                match = np.asarray(matcher.window_search(
                    f_kf, self.cur_feats, kf_has, self.params,
                    window=1e6, nn_ratio=0.75, use_low_th=True))
                triples = []
                for c in range(match.shape[0]):
                    for s in np.nonzero(match[c] >= 0)[0]:
                        p = int(m.kf_pt[kf, c, s])
                        if p >= 0:
                            triples.append((p, c, int(match[c, s])))
            n = len(triples)
            if n >= 15 and (best is None or n > best[0]):
                best = (n, kf, triples)
        if best is None:
            return False
        _, kf, triples = best
        for p, c, s in triples:
            self.cur_pt[c, s] = p

        # GP3P-role absolute pose: batched non-central RANSAC over the
        # 2D-3D matches (rays in body frame x landmark positions), then
        # pose-only LM refine (cTracking.cpp:1234-1266 contract)
        mt_init = m.kf_pose[kf]
        has = self.cur_pt >= 0
        cam_idx, slot_idx = np.nonzero(has)
        pids = self.cur_pt[cam_idx, slot_idx]
        alive = m.pt_valid[pids]
        cam_idx, slot_idx, pids = cam_idx[alive], slot_idx[alive], pids[alive]
        if len(pids) >= 6:
            # minimal GP3P hypotheses (3 points each): usable in the
            # sparse-match regime the reference relocalizes in
            # (cTracking.cpp:1234-1266)
            from ..ops import ransac as ransac_ops
            rays = np.asarray(self.cur_feats.ray)[cam_idx, slot_idx]
            Mc = np.asarray(self.rig.M_c, np.float64)
            dirs = np.einsum("nij,nj->ni", Mc[cam_idx, :3, :3], rays)
            origins = Mc[cam_idx, :3, 3]
            X = m.pt_pos[pids].astype(np.float64)
            cap = bucket(len(pids), 128)
            padf = lambda a: np.concatenate(
                [a, np.zeros((cap - len(a),) + a.shape[1:], a.dtype)], 0)
            T, inl, n_in = ransac_ops.ransac_gpnp(
                self._next_key(), jnp.asarray(padf(origins)),
                jnp.asarray(padf(dirs)), jnp.asarray(padf(X)),
                jnp.asarray(np.arange(cap) < len(pids)), n_hyps=256,
                sample_size=3)
            if int(n_in) >= max(6, int(0.4 * len(pids))):
                M_body = np.linalg.inv(np.asarray(T))   # body -> world
                mt_init = se3_np.hom2cayley(M_body)

        ok = self._optimize_current_pose(mt_init, 10)
        n_assoc = int(((self.cur_pt >= 0) & ~self.cur_outlier).sum())
        if self.cfg.reloc_second_chance and (not ok or n_assoc < 50):
            # SECOND-CHANCE round: the first fit was weak (or failed) —
            # project the CANDIDATE KEYFRAME's landmarks at the refined
            # pose with widened windows and the loose ORBdist gate, then
            # re-optimize (SearchByProjection(F, KF, sFound, th,
            # ORBdist), cORBmatcher.cpp:2120-2263; accept a fit at >=10
            # inliers per cTracking.cpp:1284-1297)
            if self._reloc_project_candidate(kf) > 0:
                ok = self._optimize_current_pose(self.cur_mt, 10) or ok
                n_assoc = int(((self.cur_pt >= 0)
                               & ~self.cur_outlier).sum())
            if not ok or n_assoc < 50:
                # widened local-map re-match (fallback: helps when BoW
                # aliased to a neighbouring keyframe of the right place)
                ok = self._track_local_map(th=10.0,
                                           update_counters=False) or ok
        if ok:
            self.last_reloc_frame = self.frame_id
        return ok

    def _reloc_project_candidate(self, kf: int) -> int:
        """Project candidate keyframe ``kf``'s landmarks into the frame
        at the current (refined) pose and associate free slots — the
        reloc-specific SearchByProjection (cORBmatcher.cpp:2120-2263).
        Landmarks already associated (sAlreadyFound) are excluded.
        Returns the number of NEW associations."""
        m = self.map
        arr = m.kf_pt[kf]
        cand = np.unique(arr[arr >= 0])
        cand = cand[m.pt_valid[cand]]
        found = self.cur_pt[self.cur_pt >= 0]
        if len(found):
            cand = cand[~np.isin(cand, found)]
        if len(cand) == 0:
            return 0
        P = len(cand)
        cap = bucket(P, 128)
        pad = lambda a, fill=0: np.concatenate(
            [a, np.full((cap - P,) + a.shape[1:], fill, a.dtype)], 0)
        self._dispatch_n += 1
        uv, ok, lvl, _ = frustum_check(
            self.rig, jnp.asarray(self.cur_mt),
            jnp.asarray(pad(m.pt_pos[cand])),
            jnp.asarray(pad(m.pt_normal[cand])),
            jnp.asarray(pad(m.pt_min_dist[cand])),
            jnp.asarray(pad(m.pt_max_dist[cand], 1.0)),
            n_levels=self.cfg.n_levels, scale_factor=self.cfg.scale_factor,
            # generous distance slack: the pose was just recovered from
            # a LOST episode (the reference's reloc search gates only on
            # the mirror mask, cORBmatcher.cpp:2160)
            dist_slack=4.0)
        ok = np.array(ok)
        ok[:, P:] = False
        # ORBdist: the classic 100-per-256-bit loose gate, scaled to the
        # descriptor size (masked distances are halved by construction)
        orb_dist = int(round((50 if self.params.masked else 100)
                             * self.cfg.desc_bytes / 32))
        self._dispatch_n += 1
        match = np.asarray(matcher.reloc_projection_match(
            self.cur_feats, jnp.asarray(self.cur_pt >= 0),
            jnp.asarray(pad(m.pt_desc[cand])),
            jnp.asarray(pad(m.pt_desc_mask[cand])),
            uv, jnp.asarray(ok), lvl, self.params, th=10.0,
            orb_dist=orb_dist))
        n_new = 0
        C = match.shape[0]
        for c in range(C):
            sel = np.nonzero(match[c, :P] >= 0)[0]
            slots = match[c, sel]
            free = self.cur_pt[c, slots] < 0
            self.cur_pt[c, slots[free]] = cand[sel[free]]
            n_new += int(free.sum())
        return n_new

    # ------------------------------------------------------------------

    def reset(self):
        """cTracking::Reset (:1327-1375). ``on_reset`` (wired by the
        System) propagates the reset to the mapper + loop closer, like
        the reference's RequestReset fan-out. ALL eval state is cleared
        (the reference clears its eval vectors on reset,
        cTracking.cpp:1371-1373) so metrics never straddle a reset."""
        self.map.clear()
        self.state = TrackState.NOT_INITIALIZED
        self.velocity = None
        self.init_ref_feats = None
        self.last_feats = None
        self.last_kf_id = -1
        self.force_reloc = False
        self.map_dirty = True
        self._snap_cache = None
        self.cur_pt = np.full_like(self.cur_pt, -1) \
            if self.cur_pt is not None else None
        self.last_pt = None
        self.last_outlier = None
        self.all_poses.clear()
        self.timestamps.clear()
        self.inlier_ratios.clear()
        self.n_tracked.clear()
        self.lm_iters.clear()
        self.dispatches_per_frame.clear()
        self.timers.clear()
        if getattr(self, "on_reset", None):
            self.on_reset()
