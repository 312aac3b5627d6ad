"""Map bootstrap from two multi-frames (cMultiInitializer.cpp).

Reference behavior: per-camera central relative-pose RANSAC over matched
bearing rays (STEWENIUS 5pt, threshold 1e-4, 200 hypotheses,
cMultiInitializer.cpp:131-146 — here the batched 8-point of ops/ransac);
per-inlier parallax measure ||b1 x R b2|| with median > 0.06; CheckRT
triangulation gates (z>0 both views, reprojection err^2 < 5 px^2 both
views, parallax > 1 deg, cMultiInitializer.cpp:200-307); a camera leads
if it reconstructs > 60 good points (:180-196).

World anchoring (cTracking::CreateInitialMap:443-449): the world frame
is the LEADING camera's frame at the reference time, so
M_t(ref) = M_c[lead]^-1 and M_t(cur) = T_rel * M_c[lead]^-1 where T_rel
is the cam2->cam1 relative pose from RANSAC.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ransac
from ..ops.camera import world_to_img
from ..ops.geometry import inv_se3, triangulate_midpoint, hom2cayley
from ..ops.rig import Rig
from .extractor import Features
from . import matcher

MIN_MATCHES = 100        # cTracking.cpp:405-416
MIN_GOOD = 60            # cMultiInitializer.cpp:184
MIN_MEDIAN_NORM = 0.06   # cMultiInitializer.cpp:185
REPROJ_TH2 = 5.0         # CheckRT th2
MIN_PARALLAX_DEG = 1.0


class InitCandidate(NamedTuple):
    """Per-camera device results (leading camera chosen on host)."""

    R12: jax.Array         # (C, 3, 3) cam(cur)->cam(ref) rotation
    t12: jax.Array         # (C, 3)
    X: jax.Array           # (C, K, 3) triangulated points (ref-cam frame)
    good: jax.Array        # (C, K) CheckRT-passing matches (ref slot space)
    n_good: jax.Array      # (C,)
    median_norm: jax.Array  # (C,)
    match_idx: jax.Array   # (C, K) ref slot -> cur slot (-1 none)


@functools.partial(jax.jit, static_argnames=("params", "n_hyps"))
def initialize_device(key: jax.Array, rig: Rig, f_ref: Features,
                      f_cur: Features, params: matcher.MatchParams,
                      n_hyps: int = 256) -> InitCandidate:
    """All per-camera compute in one call: match, RANSAC, CheckRT."""
    match_idx = matcher.search_for_initialization(f_ref, f_cur, params)

    ray1 = f_ref.ray
    ray2 = f_cur.ray
    keys = jax.random.split(key, ray1.shape[0])

    def per_cam(ck, m, r1, r2, xy1, xy2_all, cam):
        matched = m >= 0
        idx2 = jnp.clip(m, 0)
        v1, v2 = r1, r2[idx2]
        E, inl, _ = ransac.ransac_essential(ck, v1, v2, matched,
                                            threshold=1e-4, n_hyps=n_hyps)
        Rs, ts = ransac.decompose_essential(E)
        counts, Xs = ransac.cheirality_counts(Rs, ts, v1, v2, inl)
        b = jnp.argmax(counts)
        R12, t12, X = Rs[b], ts[b], Xs[b]

        cr = jnp.cross(v1, jnp.einsum("ij,nj->ni", R12, v2))
        norms = jnp.linalg.norm(cr, axis=-1)
        med = jnp.nanmedian(jnp.where(inl, norms, jnp.nan))

        z1 = jnp.einsum("ni,ni->n", X, v1)
        X2 = jnp.einsum("ji,nj->ni", R12, X - t12)
        z2 = jnp.einsum("ni,ni->n", X2, v2)
        uv1 = world_to_img(cam, X)
        uv2 = world_to_img(cam, X2)
        err1 = jnp.sum((uv1 - xy1) ** 2, -1)
        err2 = jnp.sum((uv2 - xy2_all[idx2]) ** 2, -1)
        # parallax between viewing rays from the two camera centres
        n1 = X
        n2 = X - t12
        cosp = jnp.einsum("ni,ni->n", n1, n2) / jnp.maximum(
            jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12)
        cos_th = jnp.cos(jnp.deg2rad(MIN_PARALLAX_DEG))
        good = (inl & (z1 > 0) & (z2 > 0)
                & (err1 <= REPROJ_TH2) & (err2 <= REPROJ_TH2)
                & (cosp < cos_th) & jnp.isfinite(X).all(-1))
        return R12, t12, X, good, jnp.sum(good), med

    R12, t12, X, good, n_good, med = jax.vmap(per_cam)(
        keys, match_idx, ray1, ray2, f_ref.xy, f_cur.xy, rig.cams)
    return InitCandidate(R12=R12, t12=t12, X=X, good=good, n_good=n_good,
                         median_norm=med, match_idx=match_idx)


class InitResult(NamedTuple):
    lead_cam: int
    mt_ref: np.ndarray     # (6,) body pose cayley at ref frame
    mt_cur: np.ndarray     # (6,)
    X_world: np.ndarray    # (G, 3) good points in world frame
    ref_slots: np.ndarray  # (G,) ref-frame slot index (within lead cam)
    cur_slots: np.ndarray  # (G,)
    n_matches: int


def pick_leading_camera(cand: InitCandidate, rig: Rig) -> Optional[InitResult]:
    """Host-side leading-camera selection + world anchoring
    (cMultiInitializer.cpp:180-196, cTracking.cpp:443-449)."""
    n_good = np.asarray(cand.n_good)
    med = np.asarray(cand.median_norm)
    ok = (n_good > MIN_GOOD) & (med > MIN_MEDIAN_NORM)
    if not ok.any():
        return None
    # among qualifying cameras, take the most reconstructed points
    lead = int(max(np.nonzero(ok)[0], key=lambda c: n_good[c]))

    R12 = np.asarray(cand.R12[lead])
    t12 = np.asarray(cand.t12[lead])
    X_cam = np.asarray(cand.X[lead])
    good = np.asarray(cand.good[lead])
    m = np.asarray(cand.match_idx[lead])

    Mc = np.asarray(rig.M_c[lead], np.float64)
    Mc_inv = np.linalg.inv(Mc)
    # world = lead camera frame at ref time
    M_t_ref = Mc_inv
    T_rel = np.eye(4)
    T_rel[:3, :3] = R12
    T_rel[:3, 3] = t12
    M_t_cur = T_rel @ Mc_inv

    ref_slots = np.nonzero(good)[0]
    cur_slots = m[ref_slots]
    X_world = X_cam[ref_slots]

    import jax.numpy as _jnp
    from ..ops.geometry import hom2cayley as _h2c
    mt_ref = np.asarray(_h2c(_jnp.asarray(M_t_ref)))
    mt_cur = np.asarray(_h2c(_jnp.asarray(M_t_cur)))
    return InitResult(lead_cam=lead, mt_ref=mt_ref, mt_cur=mt_cur,
                      X_world=X_world,
                      ref_slots=ref_slots.astype(np.int32),
                      cur_slots=cur_slots.astype(np.int32),
                      n_matches=int((m >= 0).sum()))
