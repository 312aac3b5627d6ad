"""Data-association searches over Features/map points (cORBmatcher.cpp).

Every search mode of the reference becomes: one Hamming distance matrix
(MXU popcount-GEMM, ops/hamming.py) + one boolean GATE matrix encoding
the mode's candidate rules (grid radius, scale window, frustum,
same-camera, free-slot) + gated_nn_match. The reference's per-keypoint
hash-grid lookups (cMultiFrame::GetFeaturesInArea) disappear: radius
gating is a dense coordinate comparison fused by XLA.

Implemented modes (reference entry points):
  - match_frame_to_frame      <- SearchByProjection(cur, last, th)
                                 (cORBmatcher.cpp:1990-2110)
  - match_local_map           <- SearchByProjection(F, vpMapPoints, th)
                                 (cORBmatcher.cpp:67-166)
  - window_search             <- WindowSearch (cORBmatcher.cpp:326-473)
  - search_for_initialization <- SearchForInitialization (cORBmatcher.cpp:579)
  - search_for_triangulation  <- SearchForTriangulationRaw
                                 (cORBmatcher.cpp:968-1155; the epipolar
                                 gate uses the CORRECTED essential pairing,
                                 see ops/geometry.py)
  - fuse_candidates           <- Fuse (cORBmatcher.cpp:1265-1570)

Rotation-consistency histograms are omitted: the reference constructs
them but ships with checkOrientation=false (cORBmatcher.h:40).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming as hm
from ..ops.geometry import epipolar_distance_sq
from .extractor import Features


def _dist_matrix(d1, m1, d2, m2, masked: bool):
    if masked:
        return hm.hamming_matrix_masked(d1, d2, m1, m2)
    return hm.hamming_matrix(d1, d2)


class MatchParams(NamedTuple):
    desc_bytes: int = 32
    masked: bool = False
    scale_factor: float = 1.2

    @property
    def th_high(self) -> int:
        return hm.thresholds(self.desc_bytes, self.masked)[0]

    @property
    def th_low(self) -> int:
        return hm.thresholds(self.desc_bytes, self.masked)[1]


# ---------------------------------------------------------------------------
# Frame-to-frame motion-model search
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params", "th"))
def match_frame_to_frame(cur: Features, last: Features,
                         last_has_point: jax.Array, cur_has_point: jax.Array,
                         uv_pred: jax.Array, pred_ok: jax.Array,
                         params: MatchParams, th: float = 50.0):
    """Per-camera projection search (cORBmatcher.cpp:1990-2110).

    last_has_point: (C, K) last-frame slots carrying a tracked map point
    (non-outlier); uv_pred: (C, K, 2) their projections into the SAME
    camera at the predicted pose; pred_ok: (C, K) projection validity
    (z>0 + mirror mask). Returns (C, K_last) int32 indices into the
    current frame's per-camera slots (-1 = no match).
    """
    sf = params.scale_factor

    def per_cam(cd, cm, cxy, clvl, cvalid, chas,
                ld, lm, llvl, lvalid, lhas, luv, lok):
        dist = _dist_matrix(ld, lm, cd, cm, params.masked)      # (K, K)
        radius = th * sf ** llvl.astype(jnp.float32)            # (K,)
        d2 = jnp.sum((cxy[None, :, :] - luv[:, None, :]) ** 2, -1)
        gate = d2 <= (radius ** 2)[:, None]
        gate &= (clvl[None, :] >= (llvl - 1)[:, None]) & \
                (clvl[None, :] <= (llvl + 1)[:, None])
        gate &= cvalid[None, :] & (~chas)[None, :]
        gate &= (lvalid & lhas & lok)[:, None]
        match, best_d = hm.gated_nn_match(dist, gate,
                                          max_dist=params.th_high)
        return hm.resolve_duplicate_targets(match, best_d, cd.shape[0])

    return jax.vmap(per_cam)(
        cur.desc, cur.desc_mask, cur.xy, cur.level, cur.valid, cur_has_point,
        last.desc, last.desc_mask, last.level, last.valid, last_has_point,
        uv_pred, pred_ok)


# ---------------------------------------------------------------------------
# Local-map projection search (tracking the local map)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params", "th", "nn_ratio"))
def match_local_map(feats: Features, has_point: jax.Array,
                    pt_desc: jax.Array, pt_mask: jax.Array,
                    uv_pred: jax.Array, pred_ok: jax.Array,
                    pred_level: jax.Array, view_cos: jax.Array,
                    params: MatchParams, th: float = 3.0,
                    nn_ratio: float = 0.9):
    """SearchByProjection(F, vpMapPoints, th) (cORBmatcher.cpp:67-166).

    pt_desc/pt_mask: (P, W) distinctive descriptors of local map points;
    uv_pred/pred_ok/pred_level/view_cos: per (camera, point) frustum
    data (C, P, ...) from the isInFrustum pass. Returns (C, P) int32
    match index into the frame slots per camera (-1 = none).
    """
    sf = params.scale_factor

    def per_cam(fd, fm, fxy, flvl, fvalid, fhas, uv, ok, plvl, vcos):
        dist = _dist_matrix(pt_desc, pt_mask, fd, fm, params.masked)  # (P, K)
        # radius from viewing angle (2.5 / 4.0 rule) times scale of the
        # predicted octave (cORBmatcher.cpp:97-104)
        r = jnp.where(vcos > 0.998, 2.5, 4.0)
        radius = th * r * sf ** plvl.astype(jnp.float32)
        d2 = jnp.sum((fxy[None, :, :] - uv[:, None, :]) ** 2, -1)
        gate = d2 <= (radius ** 2)[:, None]
        gate &= (flvl[None, :] >= (plvl - 1)[:, None]) & \
                (flvl[None, :] <= plvl[:, None])
        gate &= fvalid[None, :] & (~fhas)[None, :]
        gate &= ok[:, None]
        match, best_d = hm.gated_nn_match(dist, gate,
                                          max_dist=params.th_high,
                                          nn_ratio=nn_ratio)
        return hm.resolve_duplicate_targets(match, best_d, fd.shape[0])

    return jax.vmap(per_cam, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0))(
        feats.desc, feats.desc_mask, feats.xy, feats.level, feats.valid,
        has_point, uv_pred, pred_ok, pred_level, view_cos)


# ---------------------------------------------------------------------------
# Window search (previous-frame tracking / refinement)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params", "window", "use_low_th",
                                             "nn_ratio"))
def window_search(f1: Features, f2: Features, f1_select: jax.Array,
                  params: MatchParams, window: float = 100.0,
                  nn_ratio: float = 0.9, use_low_th: bool = False):
    """WindowSearch (cORBmatcher.cpp:326-473): for each selected f1 slot,
    find the best f2 slot of the SAME camera within a coordinate window,
    same octave, NN ratio + threshold gate. Returns (C, K) match indices.
    """
    max_d = params.th_low if use_low_th else params.th_high

    def per_cam(d1, m1, xy1, l1, v1, sel, d2, m2, xy2, l2, v2):
        dist = _dist_matrix(d1, m1, d2, m2, params.masked)
        dd = jnp.sum((xy2[None, :, :] - xy1[:, None, :]) ** 2, -1)
        gate = dd <= window * window
        gate &= (l2[None, :] == l1[:, None])  # same octave (WindowSearch:86)
        gate &= v2[None, :] & (v1 & sel)[:, None]
        match, best_d = hm.gated_nn_match(dist, gate, max_dist=max_d,
                                          nn_ratio=nn_ratio)
        return hm.resolve_duplicate_targets(match, best_d, d2.shape[0])

    return jax.vmap(per_cam)(f1.desc, f1.desc_mask, f1.xy, f1.level,
                             f1.valid, f1_select,
                             f2.desc, f2.desc_mask, f2.xy, f2.level, f2.valid)


@functools.partial(jax.jit, static_argnames=("params", "window", "nn_ratio"))
def search_for_initialization(f1: Features, f2: Features,
                              params: MatchParams, window: float = 50.0,
                              nn_ratio: float = 0.9):
    """SearchForInitialization (cORBmatcher.cpp:579): window search at
    level 0 only, mutual-best + duplicate resolution."""

    def per_cam(d1, m1, xy1, l1, v1, d2, m2, xy2, l2, v2):
        dist = _dist_matrix(d1, m1, d2, m2, params.masked)
        dd = jnp.sum((xy2[None, :, :] - xy1[:, None, :]) ** 2, -1)
        gate = dd <= window * window
        gate &= (l1[:, None] == 0) & (l2[None, :] == 0)
        gate &= v2[None, :] & v1[:, None]
        match, best_d = hm.gated_nn_match(dist, gate,
                                          max_dist=params.th_low,
                                          nn_ratio=nn_ratio, mutual=True)
        return hm.resolve_duplicate_targets(match, best_d, d2.shape[0])

    return jax.vmap(per_cam)(f1.desc, f1.desc_mask, f1.xy, f1.level,
                             f1.valid,
                             f2.desc, f2.desc_mask, f2.xy, f2.level, f2.valid)


# ---------------------------------------------------------------------------
# Triangulation search between two keyframes
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params", "epi_th"))
def search_for_triangulation(f1: Features, f1_free: jax.Array,
                             f2: Features, f2_free: jax.Array,
                             E12: jax.Array, params: MatchParams,
                             epi_th: float = 1e-2):
    """SearchForTriangulationRaw (cORBmatcher.cpp:968-1155): brute-force
    descriptor matching restricted to the SAME camera in both frames
    (:1047), gated by the per-camera-pair essential matrix on bearing
    rays. E12: (C, 3, 3) essential between KF1 cam c and KF2 cam c
    (world-to-cam pose convention, ops/geometry.essential_from_poses).
    f*_free: slots not already matched to a map point.
    Returns (C, K1) match indices into f2 slots.
    """

    def per_cam(d1, m1, r1, v1, free1, d2, m2, r2, v2, free2, E):
        dist = _dist_matrix(d1, m1, d2, m2, params.masked)
        epi = epipolar_distance_sq(r1[:, None, :], r2[None, :, :], E)
        gate = epi < epi_th
        gate &= (v1 & free1)[:, None] & (v2 & free2)[None, :]
        match, best_d = hm.gated_nn_match(dist, gate,
                                          max_dist=params.th_low)
        return hm.resolve_duplicate_targets(match, best_d, d2.shape[0])

    return jax.vmap(per_cam)(f1.desc, f1.desc_mask, f1.ray, f1.valid, f1_free,
                             f2.desc, f2.desc_mask, f2.ray, f2.valid, f2_free,
                             E12)


# ---------------------------------------------------------------------------
# Fuse: project map points into a keyframe, find duplicate observations
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params", "th", "loose_desc"))
def fuse_candidates(feats: Features, has_point: jax.Array,
                    pt_desc: jax.Array, pt_mask: jax.Array,
                    uv_pred: jax.Array, pred_ok: jax.Array,
                    pred_level: jax.Array, params: MatchParams,
                    th: float = 3.0, loose_desc: bool = False):
    """Fuse (cORBmatcher.cpp:1265-1420): project candidate points into
    the keyframe; a match against a slot that already HAS a point means
    "merge the two landmarks", a match against a free slot means "add
    observation". Returns (C, P) slot index (-1 none); caller consults
    has_point to decide replace-vs-add (host-side map surgery).

    loose_desc=True accepts up to TH_HIGH instead of TH_LOW — the
    reference's guided SearchBySim3 gate (cORBmatcher.cpp:1869), used by
    the loop closer where descriptors straddle the loop's viewpoint gap.
    """
    sf = params.scale_factor
    desc_th = params.th_high if loose_desc else params.th_low

    def per_cam(fd, fm, fxy, flvl, fvalid, uv, ok, plvl):
        dist = _dist_matrix(pt_desc, pt_mask, fd, fm, params.masked)
        radius = th * sf ** plvl.astype(jnp.float32)
        d2 = jnp.sum((fxy[None, :, :] - uv[:, None, :]) ** 2, -1)
        gate = d2 <= (radius ** 2)[:, None]
        gate &= (flvl[None, :] >= (plvl - 1)[:, None]) & \
                (flvl[None, :] <= (plvl + 1)[:, None])
        gate &= fvalid[None, :] & ok[:, None]
        match, best_d = hm.gated_nn_match(dist, gate,
                                          max_dist=desc_th)
        return hm.resolve_duplicate_targets(match, best_d, fd.shape[0])

    return jax.vmap(per_cam, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
        feats.desc, feats.desc_mask, feats.xy, feats.level, feats.valid,
        uv_pred, pred_ok, pred_level)


@functools.partial(jax.jit, static_argnames=("params", "th", "orb_dist"))
def reloc_projection_match(feats: Features, has_point: jax.Array,
                           pt_desc: jax.Array, pt_mask: jax.Array,
                           uv_pred: jax.Array, pred_ok: jax.Array,
                           pred_level: jax.Array, params: MatchParams,
                           th: float = 10.0, orb_dist: int = 100):
    """SearchByProjection(F, KF, sAlreadyFound, th, ORBdist) — the
    relocalization-specific projection search (cORBmatcher.cpp:
    2120-2263): project a candidate keyframe's landmarks at the refined
    pose, window th*scale^predicted_level, octave window ±1, FREE frame
    slots only, and an ABSOLUTE descriptor gate ORBdist (looser than
    TH_HIGH — the refined pose is trusted, the descriptors straddle the
    viewpoint gap). Candidate exclusion (sAlreadyFound) is encoded in
    pred_ok by the caller. Returns (C, P) frame-slot index or -1."""
    sf = params.scale_factor

    def per_cam(fd, fm, fxy, flvl, fvalid, fhas, uv, ok, plvl):
        dist = _dist_matrix(pt_desc, pt_mask, fd, fm, params.masked)
        radius = th * sf ** plvl.astype(jnp.float32)
        d2 = jnp.sum((fxy[None, :, :] - uv[:, None, :]) ** 2, -1)
        gate = d2 <= (radius ** 2)[:, None]
        gate &= (flvl[None, :] >= (plvl - 1)[:, None]) & \
                (flvl[None, :] <= (plvl + 1)[:, None])
        gate &= fvalid[None, :] & (~fhas)[None, :]
        gate &= ok[:, None]
        match, best_d = hm.gated_nn_match(dist, gate, max_dist=orb_dist)
        return hm.resolve_duplicate_targets(match, best_d, fd.shape[0])

    return jax.vmap(per_cam)(
        feats.desc, feats.desc_mask, feats.xy, feats.level, feats.valid,
        has_point, uv_pred, pred_ok, pred_level)


# candidate-set size beyond which the streaming Pallas kernel serves the
# fuse path instead of the XLA dense-distance-matrix path. Measured at
# the production bucket sizes (bench_pallas_threshold, BENCH_r05_dev:
# fuse_{dense,pallas}_{512,1024,2048}_ms): end-to-end the two are within
# remote-link noise (~24-35 ms, dominated by dispatch latency; the
# device-only delta is sub-millisecond at these sizes). The dense path
# stays default for production buckets because XLA fuses it with the
# surrounding gates in ONE kernel; the Pallas kernel earns its keep at
# map-scale candidate sets (loop closing's SearchAndFuse over a whole
# neighbourhood) where the dense (C, P, K) distance tensor's HBM
# traffic grows quadratically and VMEM streaming holds O(N).
PALLAS_MIN_CANDIDATES = 2048


def pick_fuse_fn(n_candidates: int, params: MatchParams):
    """Route map-scale fuse passes through the Pallas streaming kernel
    (VMEM-bounded, no (P, K) f32 distance matrix) when the candidate set
    is large and we're on TPU. Masked (mdBRIEF) descriptors stream too
    via the two-extra-GEMM masked kernel."""
    if (n_candidates >= PALLAS_MIN_CANDIDATES
            and jax.default_backend() == "tpu"):
        return fuse_candidates_fused
    return fuse_candidates


@functools.partial(jax.jit, static_argnames=("params", "th", "loose_desc"))
def fuse_candidates_fused(feats: Features, has_point: jax.Array,
                          pt_desc: jax.Array, pt_mask: jax.Array,
                          uv_pred: jax.Array, pred_ok: jax.Array,
                          pred_level: jax.Array, params: MatchParams,
                          th: float = 3.0, loose_desc: bool = False):
    """fuse_candidates semantics with the distance+argmin computed by
    the streaming Pallas Hamming-NN kernel (ops/pallas/hamming_nn):
    per-camera, the (P, K) f32 distance matrix never materializes in
    HBM. P must be a multiple of 128 (the callers' power-of-two
    candidate buckets satisfy this); masked (mdBRIEF) descriptors use
    the masked kernel variant."""
    from ..ops.pallas.hamming_nn import (fused_hamming_nn,
                                         fused_hamming_nn_masked)

    sf = params.scale_factor
    desc_th = params.th_high if loose_desc else params.th_low
    C, K = feats.desc.shape[:2]
    P = pt_desc.shape[0]
    Kpad = -(-K // 256) * 256
    outs = []
    for c in range(C):       # C is tiny and static: unrolled
        fd = feats.desc[c]
        fm = feats.desc_mask[c]
        flvl = feats.level[c]
        radius = th * sf ** pred_level[c].astype(jnp.float32)
        d2 = jnp.sum((feats.xy[c][None, :, :]
                      - uv_pred[c][:, None, :]) ** 2, -1)
        gate = d2 <= (radius ** 2)[:, None]
        gate &= (flvl[None, :] >= (pred_level[c] - 1)[:, None]) & \
                (flvl[None, :] <= (pred_level[c] + 1)[:, None])
        gate &= feats.valid[c][None, :] & pred_ok[c][:, None]
        if Kpad != K:
            fd = jnp.concatenate(
                [fd, jnp.zeros((Kpad - K, fd.shape[1]), fd.dtype)], 0)
            fm = jnp.concatenate(
                [fm, jnp.zeros((Kpad - K, fm.shape[1]), fm.dtype)], 0)
            gate = jnp.concatenate(
                [gate, jnp.zeros((P, Kpad - K), bool)], 1)
        if params.masked:
            idx, best, _ = fused_hamming_nn_masked(pt_desc, pt_mask,
                                                   fd, fm, gate)
        else:
            idx, best, _ = fused_hamming_nn(pt_desc, fd, gate)
        match = jnp.where(best <= desc_th, idx, -1)
        outs.append(hm.resolve_duplicate_targets(match, best, Kpad))
    return jnp.stack(outs)
