"""Map store: fixed-capacity landmark/keyframe pools (host + device).

Re-design of the reference's pointer-graph map (cMap.h:42-89,
cMapPoint.h, cMultiKeyFrame.h) as arrays-of-structs: XLA wants static
shapes, so landmarks live in a capacity-P pool with validity masks, and
keyframes in a capacity-N pool. The covisibility graph
(cMultiKeyFrame.cpp:406-500), spanning tree (:502-560) and observation
lists are HOST-side numpy/python - they drive control flow, not device
math. Device work always consumes padded snapshots of the pools.

Observation bookkeeping mirrors cMapPoint::observations
(map<MKF*, vector<size_t>> - multiple observations per keyframe, one
per camera, cMapPoint.h:124): here a point's observations are a list of
(kf, cam, slot) triples, and each keyframe keeps the inverse table
kf_pt[(kf, cam, slot)] -> point id.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Optional

import numpy as np

from .extractor import Features


@dataclasses.dataclass
class MapStore:
    """Fixed-capacity SLAM map."""

    capacity_pts: int = 30000
    capacity_kfs: int = 256
    n_cams: int = 3
    k_per_cam: int = 400
    desc_words: int = 8

    def __post_init__(self):
        P, N = self.capacity_pts, self.capacity_kfs
        C, K, W = self.n_cams, self.k_per_cam, self.desc_words
        self.pt_valid = np.zeros(P, bool)
        self.pt_pos = np.zeros((P, 3), np.float32)
        self.pt_desc = np.zeros((P, W), np.uint32)
        self.pt_desc_mask = np.full((P, W), 0xFFFFFFFF, np.uint32)
        self.pt_normal = np.zeros((P, 3), np.float32)
        self.pt_min_dist = np.zeros(P, np.float32)
        self.pt_max_dist = np.zeros(P, np.float32)
        self.pt_visible = np.zeros(P, np.int32)   # mnVisible
        self.pt_found = np.zeros(P, np.int32)     # mnFound
        self.pt_first_kf = np.full(P, -1, np.int32)
        self.pt_obs: dict[int, list[tuple[int, int, int]]] = defaultdict(list)
        self.pt_replaced: dict[int, int] = {}   # old id -> merged-into id
        # replacement forwarding as a flat table (vectorized resolution)
        self.pt_forward = np.arange(P, dtype=np.int32)
        # incremental covisibility (cMultiKeyFrame::UpdateConnections kept
        # live on add/erase instead of re-scanned per query):
        # _covis[kf][other] = #shared map points; _pt_kfs[pt][kf] =
        # observation multiplicity of pt in kf (multi-camera -> can be >1)
        self._covis: dict[int, dict[int, int]] = defaultdict(dict)
        self._pt_kfs: dict[int, dict[int, int]] = {}

        self.kf_valid = np.zeros(N, bool)
        self.kf_pose = np.zeros((N, 6), np.float64)   # M_t cayley (body->world)
        self.kf_features: list[Optional[Features]] = [None] * N
        self.kf_pt = np.full((N, C, K), -1, np.int32)
        self.kf_parent = np.full(N, -1, np.int32)     # spanning tree
        self.kf_loop_edges: dict[int, set[int]] = defaultdict(set)
        self.kf_frame_id = np.full(N, -1, np.int64)   # source frame id

        self._next_pt = 0
        self._next_kf = 0
        # SetBadFlag fan-out: the reference erases a culled keyframe
        # from the BoW keyframe database (cMultiKeyFrame::SetBadFlag ->
        # mpKeyFrameDB->erase); subscribers (loop closer) hook this
        self.on_kf_removed = None

    # ------------------------------------------------------------------
    # allocation
    # ------------------------------------------------------------------

    def alloc_points(self, n: int) -> np.ndarray:
        """Allocate n point slots. BUMP-ONLY: dead ids are never reused,
        so stale references (tracker frames, queued work) can always be
        resolved through ``pt_replaced`` or detected as dead — the
        array-pool analogue of the reference's mpReplaced pointer
        (cMapPoint::Replace)."""
        if self._next_pt + n > self.capacity_pts:
            raise MemoryError("map point pool exhausted")
        ids = np.arange(self._next_pt, self._next_pt + n, dtype=np.int32)
        self._next_pt += n
        self.pt_valid[ids] = True
        return ids

    def resolve_points(self, ids: np.ndarray) -> np.ndarray:
        """Follow replacement forwarding for an int32 array of point ids
        (-1 passes through); dead unreplaced ids stay as-is (callers
        filter by pt_valid). Vectorized: iterate the flat forwarding
        table to a fixpoint (chains are short; merges only ever point at
        older-or-newer live ids, never cycles)."""
        out = np.asarray(ids).copy()
        flat = out.reshape(-1)
        live = flat >= 0
        for _ in range(32):
            nxt = np.where(live, self.pt_forward[np.clip(flat, 0, None)],
                           flat)
            if np.array_equal(nxt, flat):
                break
            flat[...] = nxt
        return out

    def alloc_keyframe(self, pose_min: np.ndarray, feats: Features,
                       frame_id: int) -> int:
        if self._next_kf >= self.capacity_kfs:
            raise MemoryError("keyframe pool exhausted")
        kf = self._next_kf
        self._next_kf += 1
        self.kf_valid[kf] = True
        self.kf_pose[kf] = np.asarray(pose_min, np.float64)
        self.kf_features[kf] = feats
        self.kf_frame_id[kf] = frame_id
        return kf

    # ------------------------------------------------------------------
    # observations
    # ------------------------------------------------------------------

    def _covis_link(self, pt: int, kf: int):
        """kf gained its FIRST observation of pt (multiplicity 0 -> 1):
        bump the pair count with every other observing keyframe."""
        c = self._pt_kfs.setdefault(pt, {})
        if c.get(kf, 0) == 0:
            for other in c:
                self._covis[kf][other] = self._covis[kf].get(other, 0) + 1
                self._covis[other][kf] = self._covis[other].get(kf, 0) + 1
        c[kf] = c.get(kf, 0) + 1

    def _covis_unlink(self, pt: int, kf: int):
        c = self._pt_kfs.get(pt)
        if not c or kf not in c:
            return
        c[kf] -= 1
        if c[kf] == 0:
            del c[kf]
            for other in c:
                w = self._covis[kf].get(other, 0) - 1
                if w > 0:
                    self._covis[kf][other] = w
                    self._covis[other][kf] = w
                else:
                    self._covis[kf].pop(other, None)
                    self._covis[other].pop(kf, None)
            if not c:
                self._pt_kfs.pop(pt, None)

    def add_observation(self, pt: int, kf: int, cam: int, slot: int):
        self.pt_obs[pt].append((kf, cam, slot))
        self.kf_pt[kf, cam, slot] = pt
        self._covis_link(pt, kf)

    def erase_observation(self, pt: int, kf: int, cam: int, slot: int):
        try:
            self.pt_obs[pt].remove((kf, cam, slot))
        except ValueError:
            return
        if self.kf_pt[kf, cam, slot] == pt:
            self.kf_pt[kf, cam, slot] = -1
        self._covis_unlink(pt, kf)
        # a point with < 2 observations is no landmark (cMapPoint SetBadFlag
        # trigger in EraseObservation)
        if len(self.pt_obs[pt]) < 2:
            self.remove_point(pt)

    def remove_point(self, pt: int):
        if not self.pt_valid[pt]:
            return
        for kf, cam, slot in self.pt_obs.pop(pt, []):
            if self.kf_pt[kf, cam, slot] == pt:
                self.kf_pt[kf, cam, slot] = -1
            self._covis_unlink(pt, kf)
        self.pt_valid[pt] = False

    def replace_point(self, old: int, new: int):
        """cMapPoint::Replace (cMapPoint.cpp:231-239) - rebind all
        observations of ``old`` to ``new``; where ``new`` is already
        observed in the same (keyframe, camera), the old match is ERASED
        instead of duplicated (a duplicate would double-count BA
        residuals and inflate covisibility)."""
        if old == new or not self.pt_valid[old]:
            return
        for kf, cam, slot in self.pt_obs.pop(old, []):
            self._covis_unlink(old, kf)
            existing = [o for o in self.pt_obs[new]
                        if o[0] == kf and o[1] == cam]
            if any(s == slot for _, _, s in existing):
                self.kf_pt[kf, cam, slot] = new
            elif existing:
                # new already matched elsewhere in this (kf, cam): drop
                # old's slot rather than double-observe
                if self.kf_pt[kf, cam, slot] == old:
                    self.kf_pt[kf, cam, slot] = -1
            else:
                self.pt_obs[new].append((kf, cam, slot))
                self.kf_pt[kf, cam, slot] = new
                self._covis_link(new, kf)
        self.pt_found[new] += self.pt_found[old]
        self.pt_visible[new] += self.pt_visible[old]
        self.pt_valid[old] = False
        self.pt_replaced[old] = new
        self.pt_forward[old] = new

    def remove_keyframe(self, kf: int):
        """cMultiKeyFrame::SetBadFlag (simplified: observations detached,
        children re-parented to this KF's parent)."""
        if not self.kf_valid[kf]:
            return
        C, K = self.kf_pt.shape[1:]
        for cam in range(C):
            for slot in np.nonzero(self.kf_pt[kf, cam] >= 0)[0]:
                pt = int(self.kf_pt[kf, cam, slot])
                self.erase_observation(pt, kf, cam, int(slot))
        parent = self.kf_parent[kf]
        self.kf_parent[self.kf_parent == kf] = parent
        self.kf_valid[kf] = False
        self.kf_features[kf] = None
        if self.on_kf_removed is not None:
            self.on_kf_removed(kf)

    # ------------------------------------------------------------------
    # covisibility (cMultiKeyFrame::UpdateConnections semantics)
    # ------------------------------------------------------------------

    def covisibility_weights(self, kf: int) -> dict[int, int]:
        """#shared map points between ``kf`` and every other keyframe.

        Served from the INCREMENTAL pair-count table maintained by
        add/erase/replace (cMultiKeyFrame::UpdateConnections semantics,
        cMultiKeyFrame.cpp:406-500, kept live like the reference instead
        of re-scanning the observation table per query) — O(neighbors)
        per call regardless of map size."""
        return {k: w for k, w in self._covis.get(kf, {}).items()
                if self.kf_valid[k]}

    def recompute_covisibility(self):
        """Full rebuild of the incremental covisibility state from
        pt_obs (checkpoint load; invariant tests compare this against
        the live-maintained counts)."""
        self._covis = defaultdict(dict)
        self._pt_kfs = {}
        for pt, lst in self.pt_obs.items():
            for kf, _, _ in lst:
                self._covis_link(pt, kf)

    def covisible_keyframes(self, kf: int, min_weight: int = 15,
                            best_n: int | None = None) -> list[int]:
        """Covisible KFs sorted by weight (threshold 15 like
        UpdateConnections; GetBestCovisibilityKeyFrames with best_n)."""
        w = self.covisibility_weights(kf)
        ordered = sorted(w.items(), key=lambda kv: -kv[1])
        out = [k for k, v in ordered if v >= min_weight]
        if not out and ordered:
            out = [ordered[0][0]]  # keep the single best (reference rule)
        return out[:best_n] if best_n else out

    def update_spanning_tree(self, kf: int):
        """Parent = strongest covisible older KF (UpdateConnections tail)."""
        w = self.covisibility_weights(kf)
        older = {k: v for k, v in w.items() if k < kf}
        if older:
            self.kf_parent[kf] = max(older.items(), key=lambda kv: kv[1])[0]

    # ------------------------------------------------------------------
    # point statistics (cMapPoint::UpdateNormalAndDepth,
    # ComputeDistinctiveDescriptors)
    # ------------------------------------------------------------------

    def update_point_stats(self, pts: np.ndarray, rig_centers_fn,
                           scale_factor: float = 1.2, n_levels: int = 8):
        """Recompute mean viewing ray + scale-invariance distances for the
        given points (min*0.8 / max*1.2 rule, cMapPoint.cpp:449-504) and
        the distinctive descriptor (min-median Hamming,
        cMapPoint.cpp:294-388, computed in numpy - observation counts are
        tiny)."""
        for p in np.atleast_1d(pts):
            p = int(p)
            obs = self.pt_obs.get(p, [])
            if not obs or not self.pt_valid[p]:
                continue
            pos = self.pt_pos[p]
            normals = []
            descs = []
            ref_dist = None
            ref_level = 0
            for kf, cam, slot in obs:
                center = rig_centers_fn(kf, cam)
                d = pos - center
                n = np.linalg.norm(d)
                if n > 1e-9:
                    normals.append(d / n)
                f = self.kf_features[kf]
                if f is not None:
                    descs.append(np.asarray(f.desc[cam, slot]))
                    if ref_dist is None:
                        ref_dist = n
                        ref_level = int(f.level[cam, slot])
            if normals:
                m = np.mean(normals, 0)
                nm = np.linalg.norm(m)
                self.pt_normal[p] = m / nm if nm > 1e-9 else m
            if ref_dist is not None:
                level_factor = scale_factor ** ref_level
                max_d = ref_dist * level_factor
                min_d = max_d / (scale_factor ** (n_levels - 1))
                self.pt_min_dist[p] = min_d * 0.8
                self.pt_max_dist[p] = max_d * 1.2
            if descs:
                from .. import runtime
                D = np.stack(descs)          # (O, W) uint32
                best = runtime.distinctive_descriptor(D)
                self.pt_desc[p] = D[best]
                f = self.kf_features[obs[best][0]]
                if f is not None:
                    self.pt_desc_mask[p] = np.asarray(
                        f.desc_mask[obs[best][1], obs[best][2]])

    # ------------------------------------------------------------------
    # snapshots for device work
    # ------------------------------------------------------------------

    def n_points(self) -> int:
        return int(self.pt_valid.sum())

    def n_keyframes(self) -> int:
        return int(self.kf_valid.sum())

    def point_ids(self) -> np.ndarray:
        return np.nonzero(self.pt_valid)[0].astype(np.int32)

    def keyframe_ids(self) -> np.ndarray:
        return np.nonzero(self.kf_valid)[0].astype(np.int32)

    def clear(self):
        self.__post_init__()
