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

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3_np
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

    def _create_new_map_points(self, kf: int):
        """CreateNewMapPoints (:223-383): triangulate unmatched features
        of the new KF against its top covisible KFs (same-camera pairs,
        epipolar-gated search, midpoint triangulation + gates)."""
        m = self.map
        neighbors = m.covisible_keyframes(kf, best_n=5)
        if not neighbors:
            return
        f1 = m.kf_features[kf]
        h1 = m.kf_host(kf)
        mt1 = m.kf_pose[kf]
        M1 = se3_np.cayley2hom(mt1)
        depth1 = self._median_depth_of_kf(kf)
        C = m.kf_pt.shape[1]

        for nkf in neighbors:
            f2 = m.kf_features[nkf]
            h2 = m.kf_host(nkf)
            if f2 is None or h2 is None:
                continue
            mt2 = m.kf_pose[nkf]
            M2 = se3_np.cayley2hom(mt2)
            baseline = np.linalg.norm(M1[:3, 3] - M2[:3, 3])
            if depth1 > 0 and baseline / depth1 < MIN_BASELINE_DEPTH_RATIO:
                continue  # :244-254

            # per-camera essential (world-to-cam poses of the SAME camera)
            Es = []
            T1s, T2s = [], []
            for c in range(C):
                T1 = np.linalg.inv(M1 @ np.asarray(self.rig.M_c[c], np.float64))
                T2 = np.linalg.inv(M2 @ np.asarray(self.rig.M_c[c], np.float64))
                T1s.append(T1)
                T2s.append(T2)
                Es.append(se3_np.essential_from_poses(T1, T2))
            free1 = jnp.asarray(m.kf_pt[kf] < 0)
            free2 = jnp.asarray(m.kf_pt[nkf] < 0)
            match = matcher.search_for_triangulation(
                f1, free1, f2, free2, jnp.asarray(np.stack(Es), jnp.float32),
                self.params)
            match = np.asarray(match)          # (C, K) kf slots -> nkf slots

            for c in range(C):
                sel = np.nonzero(match[c] >= 0)[0]
                if len(sel) == 0:
                    continue
                j = match[c, sel]
                # triangulate in camera-1 frame: rays + relative pose
                r1 = h1.ray[c][sel]
                r2 = h2.ray[c][j]
                T1, T2 = T1s[c], T2s[c]
                Trel = T1 @ np.linalg.inv(T2)      # cam2 -> cam1
                R12, t12 = Trel[:3, :3], Trel[:3, 3]
                X1 = se3_np.triangulate_midpoint(t12, R12, r1, r2)
                # gates (z>0 both, parallax, reprojection, distance)
                z1 = (X1 * r1).sum(1)
                X2 = (X1 - t12) @ R12
                z2 = (X2 * r2).sum(1)
                n1 = X1 / np.maximum(np.linalg.norm(X1, axis=1, keepdims=True), 1e-12)
                n2v = X1 - t12
                n2 = n2v / np.maximum(np.linalg.norm(n2v, axis=1, keepdims=True), 1e-12)
                cosp = (n1 * n2).sum(1)
                cos_th = np.cos(np.deg2rad(TRIANG_PARALLAX_DEG))
                cam_c = jax.tree.map(lambda x: np.asarray(x[c]), self.rig.cams)
                uv1 = se3_np.world_to_img(cam_c, X1)
                uv2 = se3_np.world_to_img(cam_c, X2)
                e1 = np.linalg.norm(uv1 - h1.xy[c][sel], axis=1)
                e2 = np.linalg.norm(uv2 - h2.xy[c][j], axis=1)
                dist = np.linalg.norm(X1, axis=1)
                good = ((z1 > 0) & (z2 > 0) & (cosp < cos_th)
                        & (e1 < TRIANG_REPROJ_TH) & (e2 < TRIANG_REPROJ_TH)
                        & (dist < TRIANG_MAX_DIST) & np.isfinite(X1).all(1))
                if not good.any():
                    continue
                # to world: X_w = (M1 Mc) X_cam1
                Tcw = M1 @ np.asarray(self.rig.M_c[c], np.float64)
                Xw = (X1[good] @ Tcw[:3, :3].T) + Tcw[:3, 3]
                ids = m.alloc_points(len(Xw))
                m.pt_pos[ids] = Xw.astype(np.float32)
                m.pt_first_kf[ids] = kf
                for i, p in enumerate(ids):
                    m.add_observation(int(p), kf, c, int(sel[good][i]))
                    m.add_observation(int(p), nkf, c, int(j[good][i]))
                    self.recent_pts.append((int(p), kf))
                m.update_point_stats(ids, self._M_c_np,
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
        h = m.kf_host(kf)
        if f is None or h is None:
            return
        M1 = se3_np.cayley2hom(m.kf_pose[kf])
        C = m.kf_pt.shape[1]
        Mc = np.asarray(self.rig.M_c, np.float64)

        def cam_slice(feats, c):
            return jax.tree.map(lambda a: a[c:c + 1], feats)

        for c1 in range(C):
            for c2 in range(c1 + 1, C):
                # relative pose cam2 -> cam1 from extrinsics
                Trel = np.linalg.inv(Mc[c1]) @ Mc[c2]
                R12, t12 = Trel[:3, :3], Trel[:3, 3]
                if np.linalg.norm(t12) < 1e-6:
                    continue
                E = se3_np.essential_from_poses(
                    np.linalg.inv(Mc[c1]), np.linalg.inv(Mc[c2]))
                free1 = jnp.asarray(m.kf_pt[kf, c1:c1 + 1] < 0)
                free2 = jnp.asarray(m.kf_pt[kf, c2:c2 + 1] < 0)
                match = np.asarray(matcher.search_for_triangulation(
                    cam_slice(f, c1), free1, cam_slice(f, c2), free2,
                    jnp.asarray(E[None], jnp.float32), self.params))[0]
                sel = np.nonzero(match >= 0)[0]
                if len(sel) == 0:
                    continue
                j = match[sel]
                r1 = h.ray[c1][sel]
                r2 = h.ray[c2][j]
                X1 = se3_np.triangulate_midpoint(t12, R12, r1, r2)
                z1 = (X1 * r1).sum(1)
                X2 = (X1 - t12) @ R12
                z2 = (X2 * r2).sum(1)
                cam_1 = jax.tree.map(lambda x: np.asarray(x[c1]), self.rig.cams)
                cam_2 = jax.tree.map(lambda x: np.asarray(x[c2]), self.rig.cams)
                uv1 = se3_np.world_to_img(cam_1, X1)
                uv2 = se3_np.world_to_img(cam_2, X2)
                e1 = np.linalg.norm(uv1 - h.xy[c1][sel], axis=1)
                e2 = np.linalg.norm(uv2 - h.xy[c2][j], axis=1)
                # parallax over the rig baseline
                n1 = X1 / np.maximum(
                    np.linalg.norm(X1, axis=1, keepdims=True), 1e-12)
                n2v = X1 - t12
                n2 = n2v / np.maximum(
                    np.linalg.norm(n2v, axis=1, keepdims=True), 1e-12)
                cosp = (n1 * n2).sum(1)
                dist = np.linalg.norm(X1, axis=1)
                good = ((z1 > 0) & (z2 > 0)
                        & (cosp < np.cos(np.deg2rad(TRIANG_PARALLAX_DEG)))
                        & (e1 < TRIANG_REPROJ_TH) & (e2 < TRIANG_REPROJ_TH)
                        & (dist < TRIANG_MAX_DIST) & np.isfinite(X1).all(1))
                if not good.any():
                    continue
                Tcw = M1 @ Mc[c1]
                Xw = (X1[good] @ Tcw[:3, :3].T) + Tcw[:3, 3]
                ids = m.alloc_points(len(Xw))
                m.pt_pos[ids] = Xw.astype(np.float32)
                m.pt_first_kf[ids] = kf
                for i, p in enumerate(ids):
                    m.add_observation(int(p), kf, c1, int(sel[good][i]))
                    m.add_observation(int(p), kf, c2, int(j[good][i]))
                    self.recent_pts.append((int(p), kf))
                m.update_point_stats(ids, self._M_c_np,
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
        1st/2nd degree neighbours and fuse duplicates, then the reverse."""
        m = self.map
        targets = m.covisible_keyframes(kf, best_n=10)
        second = []
        for t in targets[:5]:
            second.extend(m.covisible_keyframes(t, best_n=5))
        all_targets = [t for t in dict.fromkeys(targets + second) if t != kf]

        kf_pts = m.kf_pt[kf]
        kf_pts = np.unique(kf_pts[kf_pts >= 0])
        for t in all_targets:
            self._fuse_points_into_kf(kf_pts, t)
        # reverse direction: fuse neighbours' points into kf
        neigh_pts = set()
        for t in all_targets:
            arr = m.kf_pt[t]
            neigh_pts.update(int(p) for p in arr[arr >= 0])
        neigh_pts = np.asarray(sorted(neigh_pts), np.int32)
        self._fuse_points_into_kf(neigh_pts, kf)
        self._update_point_stats_for_kf(kf)

    def _fuse_points_into_kf(self, pts: np.ndarray, kf: int):
        m = self.map
        pts = pts[m.pt_valid[pts]] if len(pts) else pts
        if len(pts) == 0:
            return
        f = m.kf_features[kf]
        if f is None:
            return
        cap = bucket(len(pts), 256)
        P = len(pts)
        pad = lambda a, fill=0: np.concatenate(
            [a, np.full((cap - P,) + a.shape[1:], fill, a.dtype)], 0)
        uv, ok, lvl, _ = frustum_check(
            self.rig, jnp.asarray(m.kf_pose[kf]),
            jnp.asarray(pad(m.pt_pos[pts])),
            jnp.asarray(pad(m.pt_normal[pts])),
            jnp.asarray(pad(m.pt_min_dist[pts])),
            jnp.asarray(pad(m.pt_max_dist[pts], 1.0)),
            n_levels=self.n_levels, scale_factor=self.scale_factor)
        ok = np.array(ok)
        ok[:, P:] = False
        fuse_fn = matcher.pick_fuse_fn(cap, self.params)
        match = fuse_fn(
            f, jnp.asarray(m.kf_pt[kf] >= 0),
            jnp.asarray(pad(m.pt_desc[pts])),
            jnp.asarray(pad(m.pt_desc_mask[pts])),
            uv, jnp.asarray(ok), lvl, self.params)
        match = np.asarray(match)
        C = match.shape[0]
        for c in range(C):
            for i in np.nonzero(match[c, :P] >= 0)[0]:
                p = int(pts[i])
                slot = int(match[c, i])
                existing = int(m.kf_pt[kf, c, slot])
                if existing >= 0 and existing != p:
                    # merge: keep the landmark with more observations
                    if len(m.pt_obs[existing]) >= len(m.pt_obs[p]):
                        m.replace_point(p, existing)
                    else:
                        m.replace_point(existing, p)
                elif existing < 0 and m.pt_valid[p]:
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
        for cand in m.covisible_keyframes(kf):
            if cand == 0 or not m.kf_valid[cand]:
                continue
            host_cand = m.kf_host(cand)
            if host_cand is None:
                continue
            lvl_cand = host_cand.level
            cams, slots = np.nonzero(m.kf_pt[cand] >= 0)
            if len(cams) == 0:
                continue
            redundant = 0
            total = 0
            levels_cache: dict[int, np.ndarray] = {}
            for c, s in zip(cams, slots):
                p = int(m.kf_pt[cand, c, s])
                total += 1
                obs = m.pt_obs.get(p, [])
                if len(obs) <= KF_CULL_PREGATE_OBS:
                    continue
                own_lvl = int(lvl_cand[c, s])
                n_finer = 0
                seen_kfs = set()
                for okf, ocam, oslot in obs:
                    if okf == cand or okf in seen_kfs:
                        continue
                    seen_kfs.add(okf)
                    lv = levels_cache.get(okf)
                    if lv is None:
                        ho = m.kf_host(okf)
                        if ho is None:
                            continue
                        lv = ho.level
                        levels_cache[okf] = lv
                    if int(lv[ocam, oslot]) <= own_lvl + 1:
                        n_finer += 1
                        if n_finer >= KF_CULL_MIN_OBS:
                            break
                if n_finer >= KF_CULL_MIN_OBS:
                    redundant += 1
            if redundant > KF_CULL_REDUNDANT * total:
                m.remove_keyframe(cand)
