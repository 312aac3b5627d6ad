"""Local mapping back-end (cLocalMapping.{h,cpp}).

Reference loop per inserted keyframe (cLocalMapping.cpp:69-129):
ProcessNewMultiKeyFrame (:145-185) -> MapPointCulling (:187-221) ->
CreateNewMapPoints (:223-383) -> SearchInNeighbors / Fuse (:385-454) ->
LocalBundleAdjustment (cOptimizer.cpp:461-874) -> KeyFrameCulling
(:517-593).

TPU-first: triangulation candidate search + the two-view checks are
dense device batches per covisible-keyframe pair; the local BA is one
Schur-LM call on a host-assembled static-shape problem; culling
bookkeeping is host numpy. Runs synchronously when invoked (the
reference's thread handoff becomes a direct call; the System can also
defer it to a worker thread).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..ops import se3_np
from ..ops.camera import world_to_img
from ..ops.rig import Rig
from . import matcher
from . import optimizer as opt
from .map import MapStore
from .tracking import bucket, frustum_check

# Reference gates (cLocalMapping.cpp:39-43, 244-379)
MIN_BASELINE_DEPTH_RATIO = 0.01   # :253
TRIANG_PARALLAX_DEG = 3.0         # :318 area
TRIANG_REPROJ_TH = 4.0            # two-view reprojection error (px)
TRIANG_MAX_DIST = 25.0            # :360 area
CULL_FOUND_RATIO = 0.25           # MapPointCulling :199
KF_CULL_REDUNDANT = 0.9           # KeyFrameCulling :585
KF_CULL_MIN_OBS = 5               # maxNrObs, KeyFrameCulling :522
KF_CULL_PREGATE_OBS = 3           # Observations() > 3 pre-gate :548


# ---------------------------------------------------------------------------
# Batched device kernels for the mapping pass. Each stage of the
# reference's per-keyframe loop fans out over a small host list (top-5
# covisible neighbours, C(C,2) camera pairs, 1st/2nd-degree fuse
# targets, cLocalMapping.cpp:223-454); rounds 1-4 issued one device
# dispatch per list item, which through a remote accelerator serialized
# tens of tunnel round-trips per keyframe (the measured 1.1 s keyframe
# stall). Stacking the list as a leading batch axis makes each stage ONE
# dispatch + ONE transfer.
# ---------------------------------------------------------------------------


def _triangulate_and_gate(cam1, cam2, xy1, xy2_all, r1, ray2_all, m_c,
                          Trel_c, Tcw_c):
    """Shared triangulation + acceptance gates for one camera pair
    (CreateNewMapPoints gates, cLocalMapping.cpp:270-379): midpoint
    triangulation in camera-1 frame, then z>0 in both views, parallax,
    two-view reprojection error, distance. Returns (Xw, good)."""
    j = jnp.clip(m_c, 0)
    r2 = ray2_all[j]
    xy2 = xy2_all[j]
    R12, t12 = Trel_c[:3, :3], Trel_c[:3, 3]
    X1 = geo.triangulate_midpoint(t12, R12, r1, r2)
    z1 = jnp.sum(X1 * r1, -1)
    X2 = (X1 - t12) @ R12
    z2 = jnp.sum(X2 * r2, -1)
    n1 = X1 / jnp.maximum(jnp.linalg.norm(X1, axis=-1, keepdims=True), 1e-12)
    d2v = X1 - t12
    n2 = d2v / jnp.maximum(jnp.linalg.norm(d2v, axis=-1, keepdims=True),
                           1e-12)
    cosp = jnp.sum(n1 * n2, -1)
    uv1 = world_to_img(cam1, X1)
    uv2 = world_to_img(cam2, X2)
    e1 = jnp.linalg.norm(uv1 - xy1, axis=-1)
    e2 = jnp.linalg.norm(uv2 - xy2, axis=-1)
    dist = jnp.linalg.norm(X1, axis=-1)
    good = ((m_c >= 0) & (z1 > 0) & (z2 > 0)
            & (cosp < jnp.cos(jnp.deg2rad(TRIANG_PARALLAX_DEG)))
            & (e1 < TRIANG_REPROJ_TH) & (e2 < TRIANG_REPROJ_TH)
            & (dist < TRIANG_MAX_DIST) & jnp.isfinite(X1).all(-1))
    Xw = X1 @ Tcw_c[:3, :3].T + Tcw_c[:3, 3]
    return Xw, good


@functools.partial(jax.jit, static_argnames=("params",))
def triangulation_batch(rig: Rig, f1, f1_free, f2s, free2, E, Trel, Tcw,
                        params):
    """SearchForTriangulationRaw + midpoint triangulation + gates over
    ALL top-covisible neighbour keyframes in ONE dispatch
    (CreateNewMapPoints, cLocalMapping.cpp:223-383; same-camera search,
    cORBmatcher.cpp:968-1155).

    f2s: neighbour Features stacked on a leading axis (N, C, K, ...);
    free2 (N, C, K); E (N, C, 3, 3) per-(neighbour, camera) essentials;
    Trel (N, C, 4, 4) cam2->cam1 relative poses; Tcw (C, 4, 4)
    cam1->world of the NEW keyframe. Padded neighbour rows carry
    free2=False so they can never match. Returns (match (N, C, K),
    Xw (N, C, K, 3), good (N, C, K))."""

    def per_neighbor(f2, fr2, E_n, Trel_n):
        match = matcher.search_for_triangulation(f1, f1_free, f2, fr2,
                                                 E_n, params)

        def per_cam(cam, m_c, xy1, r1, xy2_all, ray2_all, Trel_c, Tcw_c):
            return _triangulate_and_gate(cam, cam, xy1, xy2_all, r1,
                                         ray2_all, m_c, Trel_c, Tcw_c)

        Xw, good = jax.vmap(per_cam)(rig.cams, match, f1.xy, f1.ray,
                                     f2.xy, f2.ray, Trel_n, Tcw)
        return match, Xw, good

    return jax.vmap(per_neighbor)(f2s, free2, E, Trel)


@functools.partial(jax.jit, static_argnames=("params",))
def cross_camera_batch(rig: Rig, f, free, i1, i2, E, Trel, Tcw, params):
    """Intra-keyframe cross-camera triangulation over ALL C(C,2) camera
    pairs in ONE dispatch (SearchForTriangulationBetweenCameras,
    cORBmatcher.cpp:1158-1262). i1/i2 (Np,) index the camera axis; the
    pair-sliced Features reuse search_for_triangulation's per-"camera"
    vmap with the pair axis in the camera slot. Returns (match (Np, K),
    Xw (Np, K, 3), good (Np, K))."""
    take = lambda idx: jax.tree.map(lambda a: a[idx], f)
    f1p, f2p = take(i1), take(i2)
    cams1 = jax.tree.map(lambda a: a[i1], rig.cams)
    cams2 = jax.tree.map(lambda a: a[i2], rig.cams)
    free1, free2 = free[i1], free[i2]
    match = matcher.search_for_triangulation(f1p, free1, f2p, free2, E,
                                             params)

    def per_pair(cam1, cam2, m_c, xy1, r1, xy2_all, ray2_all, Trel_c, Tcw_c):
        return _triangulate_and_gate(cam1, cam2, xy1, xy2_all, r1,
                                     ray2_all, m_c, Trel_c, Tcw_c)

    Xw, good = jax.vmap(per_pair)(cams1, cams2, match, f1p.xy, f1p.ray,
                                  f2p.xy, f2p.ray, Trel, Tcw)
    return match, Xw, good


@functools.partial(jax.jit, static_argnames=("params", "th", "n_levels",
                                             "scale_factor"))
def fuse_targets_batch(rig: Rig, poses, feats, occupied, X, normal, mind,
                       maxd, cand_valid, desc, dmask, params, th: float,
                       n_levels: int, scale_factor: float):
    """SearchInNeighbors' Fuse pass over ALL target keyframes in ONE
    dispatch (cLocalMapping.cpp:385-454 + cORBmatcher.cpp:1265-1420):
    frustum-check the candidate points against every target pose, then
    the projection-gated NN fuse match per target. poses (T, 6); feats:
    target Features stacked on a leading axis (T, C, K, ...); occupied
    (T, C, K); candidate arrays are shared across targets (P,...).
    Returns match (T, C, P) into each target's slots."""

    def per_target(mt, f, occ):
        uv, ok, lvl, _ = frustum_check(
            rig, mt, X, normal, mind, maxd,
            n_levels=n_levels, scale_factor=scale_factor)
        ok &= cand_valid[None, :]
        return matcher.fuse_candidates(f, occ, desc, dmask, uv, ok, lvl,
                                       params, th=th)

    return jax.vmap(per_target)(poses, feats, occupied)


def assemble_ba_problem(m: MapStore, kfs: list[int], fixed_mask: np.ndarray,
                        scale_factor: float, min_obs: int = 10):
    """Assemble a static-shape BAProblem over the given keyframes (host
    side of cOptimizer graph building, cOptimizer.cpp:57-257/461-874).

    Returns (problem, mt0 (N,6), X0 (P,3), pts (P,), rows) or None when
    there are fewer than ``min_obs`` observations. rows is the (K, 4)
    (pt, kf_id, cam, slot) table aligned with the obs arrays, for callers
    that prune observations by chi2 afterwards.

    Fully vectorized off the MapStore's flat observation log — host
    assembly cost is O(selected observations) in numpy, not a python
    walk over per-point lists (which dominated the mapping pass on
    larger maps).
    """
    kfs_a = np.asarray(kfs, np.int64)
    kf_in = np.zeros(m.kf_pt.shape[0], bool)
    kf_in[kfs_a] = True
    rows = m.obs_rows()
    rows = rows[kf_in[rows[:, 1]] & m.pt_valid[rows[:, 0]]]
    if len(rows) < min_obs:
        return None
    rows = np.unique(rows, axis=0)   # dedupe re-added observations

    # per-row measurement + octave, gathered per unique keyframe
    K = len(rows)
    uv_r = np.zeros((K, 2), np.float32)
    lvl_r = np.zeros(K, np.int32)
    keep = np.ones(K, bool)
    srt = np.argsort(rows[:, 1], kind="stable")
    rs = rows[srt]
    uk, starts = np.unique(rs[:, 1], return_index=True)
    for i, kf in enumerate(uk):
        end = starts[i + 1] if i + 1 < len(uk) else K
        sl = srt[starts[i]:end]
        host = m.kf_host(int(kf))
        if host is None:
            keep[sl] = False
            continue
        uv_r[sl] = host.xy[rows[sl, 2], rows[sl, 3]]
        lvl_r[sl] = host.level[rows[sl, 2], rows[sl, 3]]
    if not keep.all():
        rows, uv_r, lvl_r = rows[keep], uv_r[keep], lvl_r[keep]
        K = len(rows)
    if K < min_obs:
        return None
    pts = np.unique(rows[:, 0]).astype(np.int32)
    kf_to_idx = np.full(m.kf_pt.shape[0], -1, np.int32)
    kf_to_idx[kfs_a] = np.arange(len(kfs), dtype=np.int32)
    pti_r = np.searchsorted(pts, rows[:, 0]).astype(np.int32)

    cap = bucket(K, 512) + 1
    uv = np.zeros((cap, 2), np.float32)
    kfi = np.zeros(cap, np.int32)
    cami = np.zeros(cap, np.int32)
    pti = np.zeros(cap, np.int32)
    isig = np.ones(cap, np.float32)
    valid = np.zeros(cap, bool)
    uv[:K] = uv_r
    kfi[:K] = kf_to_idx[rows[:, 1]]
    cami[:K] = rows[:, 2]
    pti[:K] = pti_r
    isig[:K] = scale_factor ** (-2.0 * lvl_r)
    valid[:K] = True
    obs = opt.BAObservations(
        uv=jnp.asarray(uv), kf=jnp.asarray(kfi), cam=jnp.asarray(cami),
        pt=jnp.asarray(pti), inv_sigma2=jnp.asarray(isig),
        valid=jnp.asarray(valid))
    # per-point obs table (padded with the guaranteed-invalid row cap-1)
    counts = np.bincount(pti_r, minlength=len(pts))
    Mo = bucket(int(max(counts.max(), 1)), 4)
    pt_obs_tab = np.full((len(pts), Mo), cap - 1, np.int32)
    order2 = np.argsort(pti_r, kind="stable")
    group_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(K) - group_start[pti_r[order2]]
    pt_obs_tab[pti_r[order2], pos] = order2
    # bucket the KEYFRAME and POINT axes too: without this every map
    # growth step compiles a fresh BA executable (hundreds per run —
    # slow everywhere, and enough accumulated LLVM JIT code to exhaust
    # its allocator in long CPU runs). Padded KFs/points are marked
    # fixed, so LM never updates them; their pt_obs rows point at the
    # guaranteed-invalid observation row.
    P, N = len(pts), len(kfs)
    Pcap = bucket(P, 256)
    Ncap = bucket(N, 8)
    pt_obs_tab = np.concatenate(
        [pt_obs_tab, np.full((Pcap - P, Mo), cap - 1, np.int32)], 0)
    fixed_kf = np.concatenate([fixed_mask, np.ones(Ncap - N, bool)])
    fixed_pt = np.concatenate([np.zeros(P, bool), np.ones(Pcap - P, bool)])
    problem = opt.BAProblem(
        obs=obs, pt_obs=jnp.asarray(pt_obs_tab),
        fixed_kf=jnp.asarray(fixed_kf),
        fixed_pt=jnp.asarray(fixed_pt))
    mt0 = np.concatenate([np.stack([m.kf_pose[k] for k in kfs]),
                          np.zeros((Ncap - N, 6))], 0)
    X0 = np.concatenate([m.pt_pos[pts].astype(np.float64),
                         np.ones((Pcap - P, 3))], 0)
    return problem, mt0, X0, pts, rows


@dataclasses.dataclass
class LocalMapper:
    rig: Rig
    map: MapStore
    params: matcher.MatchParams
    scale_factor: float = 1.2
    n_levels: int = 8
    ba_iters: int = 5

    def __post_init__(self):
        self.recent_pts: list[tuple[int, int]] = []   # (pt, created_at_kf)
        # InterruptBA (cTracking.cpp:931, cLocalMapping.cpp:512-515):
        # when this callable reports a pending keyframe, the expensive
        # tail stages yield to it — the reference aborts a running local
        # BA via mbAbortBA; here the abort granularity is between stages
        # (each stage is one fast jitted call)
        self.interrupt_check = None
        # host copy of the rig extrinsics for batched point-stat math
        self._M_c_np = np.asarray(jax.device_get(self.rig.M_c), np.float64)

    def _interrupted(self) -> bool:
        return bool(self.interrupt_check is not None and self.interrupt_check())

    # ------------------------------------------------------------------

    def process_keyframe(self, kf: int):
        """One full local-mapping pass for a new keyframe. Stage order +
        interrupt points mirror cLocalMapping::Run (:69-129): fuse only
        runs when no new keyframe is queued, local BA + keyframe culling
        only when still uninterrupted."""
        self._update_point_stats_for_kf(kf)
        self._cull_map_points(kf)
        self._create_new_map_points(kf)
        self._create_cross_camera_points(kf)
        if not self._interrupted():
            self._fuse_in_neighbors(kf)
        if not self._interrupted():
            self._local_bundle_adjustment(kf)
            self._cull_keyframes(kf)

    def reset(self):
        """cLocalMapping::RequestReset effect: drop probation lists so a
        fresh map never sees stale point ids (cTracking.cpp:1327-1375)."""
        self.recent_pts.clear()

    # ------------------------------------------------------------------

    def _update_point_stats_for_kf(self, kf: int):
        """ProcessNewMultiKeyFrame: refresh normals/depths/descriptors of
        the keyframe's points (cLocalMapping.cpp:145-185)."""
        pts = self.map.kf_pt[kf]
        pts = np.unique(pts[pts >= 0])
        self.map.update_point_stats(pts, self._M_c_np,
                                    self.scale_factor, self.n_levels)

    def _cull_map_points(self, kf: int):
        """MapPointCulling (:187-221): drop points with found-ratio < 0.25
        or too few observations shortly after creation."""
        m = self.map
        keep = []
        for pt, born_kf in self.recent_pts:
            if not m.pt_valid[pt]:
                continue
            found_ratio = m.pt_found[pt] / max(m.pt_visible[pt], 1)
            age = kf - born_kf
            n_obs_kfs = len({o[0] for o in m.pt_obs.get(pt, [])})
            if found_ratio < CULL_FOUND_RATIO:
                m.remove_point(pt)
            elif age >= 2 and n_obs_kfs <= 2:
                m.remove_point(pt)
            elif age >= 3:
                continue  # survived probation
            else:
                keep.append((pt, born_kf))
        self.recent_pts = keep

    # ------------------------------------------------------------------

    # neighbour-batch size: top-5 covisible KFs (cLocalMapping.cpp:244)
    TRIANG_NEIGHBORS = 5

    def _create_new_map_points(self, kf: int):
        """CreateNewMapPoints (:223-383): triangulate unmatched features
        of the new KF against its top covisible KFs (same-camera pairs,
        epipolar-gated search, midpoint triangulation + gates). All
        neighbours are stacked into ONE triangulation_batch dispatch;
        the host only allocates the accepted points."""
        m = self.map
        neighbors = m.covisible_keyframes(kf, best_n=self.TRIANG_NEIGHBORS)
        f1 = m.kf_features[kf]
        if not neighbors or f1 is None:
            return
        M1 = se3_np.cayley2hom(m.kf_pose[kf])
        depth1 = self._median_depth_of_kf(kf)
        C, K = m.kf_pt.shape[1:]
        Mc = self._M_c_np
        T1 = np.stack([np.linalg.inv(M1 @ Mc[c]) for c in range(C)])
        Tcw = np.stack([M1 @ Mc[c] for c in range(C)])

        valid_nb = []
        for nkf in neighbors:
            if m.kf_features[nkf] is None:
                continue
            M2 = se3_np.cayley2hom(m.kf_pose[nkf])
            baseline = np.linalg.norm(M1[:3, 3] - M2[:3, 3])
            if depth1 > 0 and baseline / depth1 < MIN_BASELINE_DEPTH_RATIO:
                continue  # :244-254
            valid_nb.append((nkf, M2))
        if not valid_nb:
            return

        NB = self.TRIANG_NEIGHBORS
        E = np.zeros((NB, C, 3, 3), np.float32)
        Trel = np.tile(np.eye(4, dtype=np.float32), (NB, C, 1, 1))
        free2 = np.zeros((NB, C, K), bool)
        f2_list = []
        for n, (nkf, M2) in enumerate(valid_nb):
            for c in range(C):
                T2 = np.linalg.inv(M2 @ Mc[c])
                E[n, c] = se3_np.essential_from_poses(T1[c], T2)
                Trel[n, c] = T1[c] @ np.linalg.inv(T2)
            free2[n] = m.kf_pt[nkf] < 0
            f2_list.append(m.kf_features[nkf])
        while len(f2_list) < NB:
            f2_list.append(f1)    # pad rows; free2=False -> never match
        f2s = jax.tree.map(lambda *xs: jnp.stack(xs), *f2_list)
        match, Xw, good = jax.device_get(triangulation_batch(
            self.rig, f1, jnp.asarray(m.kf_pt[kf] < 0), f2s,
            jnp.asarray(free2), jnp.asarray(E), jnp.asarray(Trel),
            jnp.asarray(Tcw.astype(np.float32)), self.params))

        # allocate, processing neighbours in covisibility order with a
        # slot-dedup mask (the reference's sequential loop leaves a slot
        # occupied once an earlier neighbour triangulated it)
        taken = np.zeros((C, K), bool)
        new_ids = []
        for n, (nkf, _) in enumerate(valid_nb):
            for c in range(C):
                sel = np.nonzero(good[n, c] & ~taken[c])[0]
                if len(sel) == 0:
                    continue
                j = match[n, c, sel]
                ids = m.alloc_points(len(sel))
                m.pt_pos[ids] = Xw[n, c, sel].astype(np.float32)
                m.pt_first_kf[ids] = kf
                for i, p in enumerate(ids):
                    m.add_observation(int(p), kf, c, int(sel[i]))
                    m.add_observation(int(p), nkf, c, int(j[i]))
                    self.recent_pts.append((int(p), kf))
                taken[c, sel] = True
                new_ids.append(ids)
        if new_ids:
            m.update_point_stats(np.concatenate(new_ids), self._M_c_np,
                                 self.scale_factor, self.n_levels)

    def _create_cross_camera_points(self, kf: int):
        """Intra-MKF cross-camera triangulation
        (cORBmatcher::SearchForTriangulationBetweenCameras,
        cORBmatcher.cpp:1158-1262): match free features between DIFFERENT
        cameras of the SAME keyframe with the rig-extrinsics epipolar
        gate and triangulate with the METRIC rig baseline — the
        observations that anchor absolute scale."""
        m = self.map
        f = m.kf_features[kf]
        if f is None:
            return
        M1 = se3_np.cayley2hom(m.kf_pose[kf])
        C, K = m.kf_pt.shape[1:]
        Mc = self._M_c_np

        # all C(C,2) pairs with a usable baseline, as ONE batched dispatch
        pairs = []
        for c1 in range(C):
            for c2 in range(c1 + 1, C):
                Trel = np.linalg.inv(Mc[c1]) @ Mc[c2]
                if np.linalg.norm(Trel[:3, 3]) < 1e-6:
                    continue
                pairs.append((c1, c2, Trel))
        if not pairs:
            return
        Np = len(pairs)
        i1 = np.asarray([p[0] for p in pairs], np.int32)
        i2 = np.asarray([p[1] for p in pairs], np.int32)
        Trel = np.stack([p[2] for p in pairs]).astype(np.float32)
        E = np.stack([se3_np.essential_from_poses(
            np.linalg.inv(Mc[c1]), np.linalg.inv(Mc[c2]))
            for c1, c2, _ in pairs]).astype(np.float32)
        Tcw = np.stack([M1 @ Mc[c1] for c1, _, _ in pairs]).astype(np.float32)
        match, Xw, good = jax.device_get(cross_camera_batch(
            self.rig, f, jnp.asarray(m.kf_pt[kf] < 0), jnp.asarray(i1),
            jnp.asarray(i2), jnp.asarray(E), jnp.asarray(Trel),
            jnp.asarray(Tcw), self.params))

        # allocate with endpoint dedup across pairs (sequential semantics:
        # a slot consumed by an earlier pair is no longer free)
        taken = np.zeros((C, K), bool)
        new_ids = []
        for pidx, (c1, c2, _) in enumerate(pairs):
            sel = np.nonzero(good[pidx])[0]
            if len(sel) == 0:
                continue
            j = match[pidx, sel]
            ok = ~taken[c1, sel] & ~taken[c2, j]
            sel, j = sel[ok], j[ok]
            if len(sel) == 0:
                continue
            ids = m.alloc_points(len(sel))
            m.pt_pos[ids] = Xw[pidx, sel].astype(np.float32)
            m.pt_first_kf[ids] = kf
            for i, p in enumerate(ids):
                m.add_observation(int(p), kf, c1, int(sel[i]))
                m.add_observation(int(p), kf, c2, int(j[i]))
                self.recent_pts.append((int(p), kf))
            taken[c1, sel] = True
            taken[c2, j] = True
            new_ids.append(ids)
        if new_ids:
            m.update_point_stats(np.concatenate(new_ids), self._M_c_np,
                                 self.scale_factor, self.n_levels)

    def _median_depth_of_kf(self, kf: int) -> float:
        """cMultiKeyFrame::ComputeSceneMedianDepth (body frame)."""
        m = self.map
        pts = m.kf_pt[kf]
        pts = np.unique(pts[pts >= 0])
        if len(pts) == 0:
            return 0.0
        M = se3_np.cayley2hom(m.kf_pose[kf])
        X = m.pt_pos[pts]
        return float(np.median(np.linalg.norm(X - M[:3, 3], axis=1)))

    # ------------------------------------------------------------------

    def _fuse_in_neighbors(self, kf: int):
        """SearchInNeighbors (:385-454): project this KF's points into
        1st/2nd degree neighbours and fuse duplicates, then the reverse.
        Forward direction runs as ONE fuse_targets_batch dispatch over
        all targets (rounds 1-4 issued 2 dispatches per target)."""
        m = self.map
        targets = m.covisible_keyframes(kf, best_n=10)
        second = []
        for t in targets[:5]:
            second.extend(m.covisible_keyframes(t, best_n=5))
        all_targets = [t for t in dict.fromkeys(targets + second)
                       if t != kf and m.kf_features[t] is not None]

        kf_pts = m.kf_pt[kf]
        kf_pts = np.unique(kf_pts[kf_pts >= 0])
        self.fuse_into_keyframes(kf_pts, all_targets)
        # reverse direction: fuse neighbours' points into kf
        if all_targets:
            arr = m.kf_pt[np.asarray(all_targets, np.int64)]
            neigh_pts = np.unique(arr[arr >= 0])
            self.fuse_into_keyframes(neigh_pts, [kf])
        self._update_point_stats_for_kf(kf)

    def fuse_into_keyframes(self, pts: np.ndarray, targets: list[int]):
        """Project candidate landmarks into every target keyframe and
        fuse duplicates (Fuse, cORBmatcher.cpp:1265-1420): one batched
        frustum+match dispatch over the stacked target axis, then the
        host merge/add bookkeeping per target in covisibility order."""
        m = self.map
        targets = [t for t in targets if m.kf_features[t] is not None]
        pts = np.asarray(pts, np.int64)
        pts = pts[m.pt_valid[pts]] if len(pts) else pts
        if len(pts) == 0 or not targets:
            return
        P = len(pts)
        cap = bucket(P, 256)
        pad = lambda a, fill=0: np.concatenate(
            [a, np.full((cap - P,) + a.shape[1:], fill, a.dtype)], 0)
        Tn = len(targets)
        Tcap = bucket(Tn, 4)
        tg = targets + [targets[-1]] * (Tcap - Tn)
        feats = jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[m.kf_features[t] for t in tg])
        poses = np.stack([m.kf_pose[t] for t in tg])
        occ = np.stack([m.kf_pt[t] >= 0 for t in tg])
        match = np.asarray(fuse_targets_batch(
            self.rig, jnp.asarray(poses), feats, jnp.asarray(occ),
            jnp.asarray(pad(m.pt_pos[pts])),
            jnp.asarray(pad(m.pt_normal[pts])),
            jnp.asarray(pad(m.pt_min_dist[pts])),
            jnp.asarray(pad(m.pt_max_dist[pts], 1.0)),
            jnp.asarray(np.arange(cap) < P),
            jnp.asarray(pad(m.pt_desc[pts])),
            jnp.asarray(pad(m.pt_desc_mask[pts])),
            self.params, th=3.0, n_levels=self.n_levels,
            scale_factor=self.scale_factor))
        for t_idx, t in enumerate(targets):
            self._apply_fuse_matches(pts, t, match[t_idx], P)

    def _fuse_points_into_kf(self, pts: np.ndarray, kf: int):
        """Single-target fuse (kept for the loop closer's SearchAndFuse,
        cLoopClosing.cpp:597-610)."""
        self.fuse_into_keyframes(np.asarray(pts), [kf])

    def _apply_fuse_matches(self, pts: np.ndarray, kf: int,
                            match: np.ndarray, P: int):
        m = self.map
        C = match.shape[0]
        for c in range(C):
            for i in np.nonzero(match[c, :P] >= 0)[0]:
                p = int(pts[i])
                # follow merges performed earlier in this fuse pass
                while not m.pt_valid[p] and m.pt_forward[p] != p:
                    p = int(m.pt_forward[p])
                if not m.pt_valid[p]:
                    continue
                slot = int(match[c, i])
                existing = int(m.kf_pt[kf, c, slot])
                if existing >= 0 and existing != p:
                    # merge: keep the landmark with more observations
                    if len(m.pt_obs[existing]) >= len(m.pt_obs[p]):
                        m.replace_point(p, existing)
                    else:
                        m.replace_point(existing, p)
                elif existing < 0:
                    dup = [o for o in m.pt_obs[p] if o[0] == kf and o[1] == c]
                    if not dup:
                        m.add_observation(p, kf, c, slot)

    # ------------------------------------------------------------------

    def _local_bundle_adjustment(self, kf: int):
        """LocalBundleAdjustment (cOptimizer.cpp:461-874): local KFs =
        covisible set + kf; fixed KFs = other observers of local points;
        points marginalized; chi2-based observation pruning after."""
        m = self.map
        local = [kf] + m.covisible_keyframes(kf)
        arr = m.kf_pt[np.asarray(local, np.int64)]
        pts = np.unique(arr[arr >= 0])
        pts = pts[m.pt_valid[pts]]
        if len(pts) == 0:
            return
        # fixed KFs = out-of-window observers of the local points,
        # found vectorized off the flat observation log
        in_local_pts = np.zeros(m.pt_pos.shape[0], bool)
        in_local_pts[pts] = True
        in_window = np.zeros(m.kf_pt.shape[0], bool)
        in_window[np.asarray(local, np.int64)] = True
        rows = m.obs_rows()
        okf = rows[in_local_pts[rows[:, 0]], 1]
        fixed = set(np.unique(okf[~in_window[okf]]).tolist())
        kfs = local + sorted(fixed)
        # always fix KF0 (gauge), plus the out-of-window observers
        fixed_mask = np.zeros(len(kfs), bool)
        for i, k in enumerate(kfs):
            if k in fixed or k == 0:
                fixed_mask[i] = True
        if not (~fixed_mask).any():
            return
        built = assemble_ba_problem(m, kfs, fixed_mask, self.scale_factor)
        if built is None:
            return
        problem, mt0, X0, pts, rows = built
        mt, X, chi2 = opt.bundle_adjustment(
            self.rig, jnp.asarray(mt0), jnp.asarray(X0), problem,
            huber=opt.HUBER_LOCAL, iters=self.ba_iters)
        mt = np.asarray(mt)
        X = np.asarray(X)
        chi2 = np.asarray(chi2)
        # write back
        for i, k in enumerate(kfs):
            if not fixed_mask[i]:
                m.kf_pose[k] = mt[i]
        m.pt_pos[pts] = X[:len(pts)].astype(np.float32)
        # prune high-chi2 observations (cOptimizer.cpp:766-816)
        th = opt.HUBER_LOCAL ** 2
        for i in np.nonzero(chi2[:len(rows)] > th * 4)[0]:
            p, okf, c, s = rows[i]
            m.erase_observation(int(p), int(okf), int(c), int(s))
        # the BA moved poses and points, so the cached viewing-ray /
        # scale-invariance distances are stale (cMapPoint::
        # UpdateNormalAndDepth is the reference's per-mutation refresh);
        # especially right after initialization the adjustment can be a
        # large gauge/scale correction, and stale min/max distances would
        # make frustum_check reject most of the map
        self.map.update_point_stats(np.asarray(pts, np.int64),
                                    self._M_c_np,
                                    self.scale_factor, self.n_levels)

    # ------------------------------------------------------------------

    def _cull_keyframes(self, kf: int):
        """KeyFrameCulling (cLocalMapping.cpp:517-593): a covisible KF is
        redundant if 90% of its landmark observations are backed by at
        least maxNrObs=5 OTHER keyframes observing the point at
        finer-or-equal scale (level <= own level + 1). Only points with
        Observations() > 3 are considered (:548), and only each other
        keyframe's FIRST observation of the point counts (:565 'just
        take the first, even if there are more')."""
        m = self.map
        cands = [c for c in m.covisible_keyframes(kf)
                 if c != 0 and m.kf_valid[c] and m.kf_host(c) is not None]
        if not cands:
            return
        # vectorized off the flat observation log: one pass builds, per
        # (point, level) of every live observation, the first-per-
        # keyframe counts; each candidate then reduces in numpy — host
        # cost stays flat as the map grows
        rows = m.obs_rows()
        n_obs_per_pt = np.bincount(rows[:, 0], minlength=m.pt_pos.shape[0])
        # per-row octave, gathered per unique keyframe
        lvl_row = np.zeros(len(rows), np.int32)
        ok_row = np.zeros(len(rows), bool)
        srt = np.argsort(rows[:, 1], kind="stable")
        rs = rows[srt]
        uk, starts = np.unique(rs[:, 1], return_index=True)
        for i, okf in enumerate(uk):
            end = starts[i + 1] if i + 1 < len(uk) else len(rows)
            sl = srt[starts[i]:end]
            host = m.kf_host(int(okf))
            if host is None:
                continue
            lvl_row[sl] = host.level[rows[sl, 2], rows[sl, 3]]
            ok_row[sl] = True
        # only each other keyframe's FIRST observation of a point counts
        # (:565 'just take the first, even if there are more'): first in
        # log (insertion) order per (pt, kf)
        key = rows[:, 0].astype(np.int64) * m.kf_pt.shape[0] + rows[:, 1]
        _, first_idx = np.unique(key, return_index=True)
        first = np.zeros(len(rows), bool)
        first[first_idx] = True

        for cand in cands:
            if not m.kf_valid[cand]:
                continue
            host_cand = m.kf_host(cand)
            if host_cand is None:
                continue
            cams, slots = np.nonzero(m.kf_pt[cand] >= 0)
            if len(cams) == 0:
                continue
            p_i = m.kf_pt[cand, cams, slots]
            lvl_i = host_cand.level[cams, slots].astype(np.int32)
            uniq, inv = np.unique(p_i, return_inverse=True)
            pt_idx_of = np.full(m.pt_pos.shape[0], -1, np.int64)
            pt_idx_of[uniq] = np.arange(len(uniq))
            # per (uniq pt, level) histogram of first-per-KF rows of
            # OTHER keyframes
            selr = (first & ok_row & (rows[:, 1] != cand)
                    & (pt_idx_of[rows[:, 0]] >= 0))
            hist = np.zeros((len(uniq), self.n_levels), np.int32)
            np.add.at(hist, (pt_idx_of[rows[selr, 0]],
                             np.clip(lvl_row[selr], 0,
                                     self.n_levels - 1)), 1)
            cum = np.cumsum(hist, axis=1)
            n_finer = cum[inv, np.clip(lvl_i + 1, 0, self.n_levels - 1)]
            redundant = ((n_obs_per_pt[p_i] > KF_CULL_PREGATE_OBS)
                         & (n_finer >= KF_CULL_MIN_OBS))
            if redundant.sum() > KF_CULL_REDUNDANT * len(cams):
                m.remove_keyframe(cand)
                # removal invalidates the precomputed row tables for
                # subsequent candidates only through rows of ``cand``
                # itself; mask them out
                dead = rows[:, 1] == cand
                ok_row[dead] = False
                first[dead] = False
                n_obs_per_pt = n_obs_per_pt - np.bincount(
                    rows[dead, 0], minlength=len(n_obs_per_pt))
