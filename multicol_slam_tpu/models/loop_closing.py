"""Loop closing (cLoopClosing.{h,cpp} + cSim3Solver).

Reference pipeline per keyframe (cLoopClosing.cpp:63-98):
  DetectLoop (:113-245): >= 10 KFs since last loop; minScore = lowest
    BoW score among the query's covisible KFs; database candidates;
    candidates must be covisibility-consistent across 3 consecutive
    detections.
  ComputeSim3 (:247-427): SearchByBoW >= 15 matches -> Sim3 RANSAC
    (Horn 3-point, bidirectional rig-reprojection inlier gate,
    cSim3Solver.cpp) -> guided SearchBySim3 -> OptimizeSim3 >= 20
    inliers -> project loop-neighborhood points, >= 20 total matches.
  CorrectLoop (:429-595): propagate the corrected Sim3 over the current
    covisible group and remap their points, fuse duplicates, add loop
    edges, OptimizeEssentialGraph, flag the tracker.

TPU-first: BoW transform, Sim3 RANSAC (vmapped Horn over hypothesis
batches), guided matching and both optimizations are device batches;
candidate bookkeeping and map surgery are host-side.
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3_np
from ..ops.camera import world_to_img
from ..ops.geometry import inv_se3
from ..ops.rig import Rig
from ..ops.sim3 import Sim3, horn_alignment, sim3_exp, sim3_log, sim3_from_se3
from . import matcher
from . import sim3_opt
from .keyframe_database import KeyFrameDatabase
from .map import MapStore
from .vocabulary import Vocabulary, bow_score_l1, bow_vector, transform_words


def _dbg(msg: str):
    if os.environ.get("MCSLAM_DEBUG"):
        print(msg, file=sys.stderr, flush=True)

MIN_KFS_BETWEEN_LOOPS = 10     # cLoopClosing.cpp:125
CONSISTENCY_TH = 3             # 3 consecutive consistent detections
MIN_BOW_MATCHES = 15           # :258
MIN_SIM3_INLIERS = 20          # :343-364
MIN_TOTAL_MATCHES = 20         # :400-424
MIN_FEAT_GRAPH = 100           # cOptimizerLoopStuff.cpp:303 minNumFeat
RANSAC_HYPS = 256
RANSAC_CHI2 = 9.21             # per-direction gate (cSim3Solver.cpp:374-415)


@dataclasses.dataclass
class LoopCloser:
    rig: Rig
    map: MapStore
    voc: Vocabulary
    db: KeyFrameDatabase
    params: matcher.MatchParams
    # the multi-camera rig is metric, so Sim3 scale is observable — hold
    # it in OptimizeSim3 and the essential graph by default (see
    # optimize_essential_graph's docstring; the reference's vertex type
    # defines this gate but never enables it)
    fix_scale: bool = True
    fuser: object = None          # LocalMapper for post-correction fusing
    # post-loop GLOBAL bundle adjustment (ORB-SLAM2's
    # RunGlobalBundleAdjustment; this ORB-SLAM1-era reference has none).
    # OFF by default: a global BA only helps once the essential graph
    # has distributed the loop error (it polishes a good init); launched
    # from an undistributed init it re-tensions the drifted interior
    # against the corrected group and can bend the map instead of
    # unbending it. Enable for maps whose pose-graph topology carries
    # the distribution (long chains, no cross-loop short-circuits).
    global_ba_iters: int = 0
    scale_factor: float = 1.2
    n_levels: int = 8

    def __post_init__(self):
        self.last_loop_kf = -MIN_KFS_BETWEEN_LOOPS
        self.consistent_groups: list[tuple[set[int], int]] = []
        self.kf_words: dict[int, np.ndarray] = {}
        self.kf_nodes: dict[int, np.ndarray] = {}
        self.on_loop = None          # callback(kf, loop_kf) after correction
        self.key = jax.random.PRNGKey(7)

    def reset(self):
        """cLoopClosing::RequestReset effect (cTracking.cpp:1327-1375):
        clear the inverted file + BoW caches so reused keyframe ids from
        a fresh map never collide with the dead map's entries."""
        self.db.clear()
        self.kf_words.clear()
        self.kf_nodes.clear()
        self.consistent_groups.clear()
        self.last_loop_kf = -MIN_KFS_BETWEEN_LOOPS

    def set_vocabulary(self, voc: Vocabulary):
        """Swap in a (re)trained vocabulary and rebuild every piece of
        place-recognition state derived from the old word space: BoW
        caches and the inverted file are recomputed for all keyframes
        currently in the database. Used by the corpus retrain — the
        reference ships a vocabulary trained offline on a large corpus
        (cSystem.cpp:60-63); our self-bootstrapping system starts from
        one frame and upgrades once enough keyframes exist."""
        self.voc = voc
        self.kf_words.clear()
        self.kf_nodes.clear()
        kfs = list(self.db.kf_bow)
        self.db.clear()
        for kf in kfs:
            if self.map.kf_valid[kf] and self.map.kf_features[kf] is not None:
                words, _ = self._bow_of_kf(kf)
                self.db.add(kf, bow_vector(self.voc, words))

    def forget_keyframe(self, kf: int):
        """A culled keyframe must leave the place-recognition state
        (cMultiKeyFrame::SetBadFlag erases itself from the keyframe
        database): otherwise it keeps winning DetectLoop candidacies it
        can never serve, and every such detection resets the
        covisibility-consistency chain — organic loops then never reach
        CONSISTENCY_TH."""
        self.db.erase(kf)
        self.kf_words.pop(kf, None)
        self.kf_nodes.pop(kf, None)
        self.consistent_groups = [
            (g - {kf}, c) for g, c in self.consistent_groups if g - {kf}]

    # ------------------------------------------------------------------

    def _bow_of_kf(self, kf: int):
        if kf in self.kf_words:
            return self.kf_words[kf], self.kf_nodes[kf]
        f = self.map.kf_features[kf]
        C, K = self.map.kf_pt.shape[1:3]
        desc = jnp.reshape(f.desc, (-1, f.desc.shape[-1]))
        valid = jnp.reshape(f.valid, (-1,))
        # score at LEAF resolution (sharp place ranking) but gate
        # SearchByBoW at DEPTH-1 nodes (~k groups): the vocabulary is
        # self-trained on one multi-frame, so deep-node quantization is
        # unstable across the viewpoint change a loop must bridge —
        # measured on the organic episode, depth-2 gating collapses the
        # kf<->candidate BoW pairs from ~90 to <15 and no loop can fire
        words, nodes = transform_words(self.voc, desc, valid,
                                       levelsup=self.voc.levels - 1)
        self.kf_words[kf] = np.asarray(words)
        self.kf_nodes[kf] = np.asarray(nodes)
        return self.kf_words[kf], self.kf_nodes[kf]

    def insert_keyframe(self, kf: int) -> bool:
        """Process one keyframe; returns True if a loop was closed."""
        words, _ = self._bow_of_kf(kf)
        bow = bow_vector(self.voc, words)
        candidates = self._detect_loop(kf, bow)
        self.db.add(kf, bow)
        if not candidates:
            return False
        for cand in candidates:
            ok = self._compute_sim3_and_correct(kf, cand)
            if ok:
                self.last_loop_kf = kf
                self.consistent_groups.clear()
                return True
        return False

    # ------------------------------------------------------------------

    def _detect_loop(self, kf: int, bow) -> list[int]:
        m = self.map
        if kf < self.last_loop_kf + MIN_KFS_BETWEEN_LOOPS:
            return []
        # exclusion set = EVERY keyframe sharing >=1 landmark
        # (GetConnectedKeyFrames, cMultiKeyFrameDatabase.cpp:85-105)
        connected = set(m.connected_keyframes(kf))
        # minScore: lowest BoW similarity to the >=30 covisibility list
        # (GetVectorCovisibleKeyFrames, cLoopClosing.cpp:132-151)
        min_score = 1.0
        for ckf in m.covisible_keyframes(kf):
            if ckf in self.db.kf_bow:
                s = bow_score_l1(bow, self.db.kf_bow[ckf])
                min_score = min(min_score, s)
        cands = self.db.detect_loop_candidates(kf, bow, min_score, m,
                                               connected)
        # drop keyframes culled since they entered the database
        cands = [c for c in cands
                 if m.kf_valid[c] and m.kf_features[c] is not None]
        _dbg(f"[loop] kf={kf} min_score={min_score:.4f} "
             f"excl={len(connected)} cands={cands} "
             f"groups={[(len(g), c) for g, c in self.consistent_groups]}")
        if os.environ.get("MCSLAM_DEBUG"):
            scores = sorted(
                ((c, bow_score_l1(bow, self.db.kf_bow[c]))
                 for c in self.db.kf_bow
                 if c != kf and c not in connected),
                key=lambda cs: -cs[1])[:5]
            _dbg(f"[loop]   top-nonconnected-scores="
                 f"{[(c, round(s, 3)) for c, s in scores]}")
            oldest = sorted(self.db.kf_bow)[:4]
            mypts = set(int(p) for p in m.kf_pt[kf].ravel() if p >= 0)

            def _shared(c):
                theirs = set(int(p) for p in m.kf_pt[c].ravel() if p >= 0)
                both = mypts & theirs
                if both and len(both) <= 8:
                    for p in sorted(both):
                        obs = m.pt_obs.get(p, [])
                        kfs = sorted({o[0] for o in obs})
                        pos = np.round(m.pt_pos[p], 2)
                        _dbg(f"[loop]     bridge {c}<->{kf}: pt {p} "
                             f"at {pos.tolist()} "
                             f"obs_kfs={kfs[:4]}..{kfs[-4:]} "
                             f"n={len(obs)}")
                return len(both)
            _dbg("[loop]   oldest-scores=" + str(
                [(c, round(bow_score_l1(bow, self.db.kf_bow[c]), 3),
                  f"C{_shared(c)}" if c in connected else "-")
                 for c in oldest]))
        if not cands:
            self.consistent_groups = []
            return []
        # covisibility-consistency across consecutive detections (:166-241)
        new_groups: list[tuple[set[int], int]] = []
        enough: list[int] = []
        for cand in cands:
            # candidate group = ALL connections (cLoopClosing.cpp:178)
            group = set(m.connected_keyframes(cand)) | {cand}
            matched = False
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    new_groups.append((group, count + 1))
                    matched = True
                    if count + 1 >= CONSISTENCY_TH:
                        enough.append(cand)
                    break
            if not matched:
                new_groups.append((group, 1))
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------

    def _matched_point_pairs(self, kf1: int, kf2: int):
        """SearchByBoW between two keyframes: vocabulary-node-gated NN
        over slots that carry landmarks (cORBmatcher.cpp:885)."""
        m = self.map
        f1, f2 = m.kf_features[kf1], m.kf_features[kf2]
        if f1 is None or f2 is None:
            return []
        _, nodes1 = self._bow_of_kf(kf1)
        _, nodes2 = self._bow_of_kf(kf2)
        C, K = m.kf_pt.shape[1:3]
        n1 = nodes1.reshape(C, K)
        n2 = nodes2.reshape(C, K)
        pairs = []   # (pt1, pt2, cam1, slot1, cam2, slot2)
        from ..ops import hamming as hm
        # dense across cameras: flatten both KF's landmark-carrying slots
        d1 = np.asarray(f1.desc).reshape(-1, f1.desc.shape[-1])
        d2 = np.asarray(f2.desc).reshape(-1, f2.desc.shape[-1])
        m1 = np.asarray(f1.desc_mask).reshape(-1, f1.desc.shape[-1])
        m2 = np.asarray(f2.desc_mask).reshape(-1, f2.desc.shape[-1])
        has1 = (m.kf_pt[kf1] >= 0).reshape(-1)
        has2 = (m.kf_pt[kf2] >= 0).reshape(-1)
        nn1 = n1.reshape(-1)
        nn2 = n2.reshape(-1)
        dist = hm.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2))
        gate = jnp.asarray(has1)[:, None] & jnp.asarray(has2)[None, :]
        gate &= jnp.asarray(nn1)[:, None] == jnp.asarray(nn2)[None, :]
        match, best_d = hm.gated_nn_match(dist, gate,
                                          max_dist=self.params.th_low,
                                          nn_ratio=0.75)
        match = np.asarray(
            hm.resolve_duplicate_targets(match, best_d, d2.shape[0]))
        idx = np.nonzero(match >= 0)[0]
        j = match[idx]
        c1, s1 = np.divmod(idx, K)
        c2, s2 = np.divmod(j, K)
        p1 = m.kf_pt[kf1, c1, s1]
        p2 = m.kf_pt[kf2, c2, s2]
        ok = (p1 >= 0) & (p2 >= 0)
        ok &= m.pt_valid[np.clip(p1, 0, None)] \
            & m.pt_valid[np.clip(p2, 0, None)]
        pairs.extend(zip(p1[ok].tolist(), p2[ok].tolist(),
                         c1[ok].tolist(), s1[ok].tolist(),
                         c2[ok].tolist(), s2[ok].tolist()))
        return pairs

    def bow_match_frame(self, kf: int, feats) -> list[tuple[int, int, int]]:
        """SearchByBoW(KF, F) (cORBmatcher.cpp:179-323): match the
        keyframe's landmark-carrying slots against a frame's features,
        gated to equal vocabulary nodes — the relocalization matcher the
        reference uses instead of brute force. Returns
        (point_id, frame_cam, frame_slot) triples."""
        m = self.map
        f1 = m.kf_features[kf]
        if f1 is None:
            return []
        _, nodes1 = self._bow_of_kf(kf)
        C, K = m.kf_pt.shape[1:3]
        from ..ops import hamming as hm
        desc2 = jnp.reshape(feats.desc, (-1, feats.desc.shape[-1]))
        valid2 = jnp.reshape(feats.valid, (-1,))
        _, nodes2 = transform_words(self.voc, desc2, valid2,
                                    levelsup=self.voc.levels - 1)
        d1 = np.asarray(f1.desc).reshape(-1, f1.desc.shape[-1])
        has1 = (m.kf_pt[kf] >= 0).reshape(-1)
        dist = hm.hamming_matrix(jnp.asarray(d1), desc2)
        gate = jnp.asarray(has1)[:, None] & valid2[None, :]
        gate &= nodes1.reshape(-1)[:, None] == np.asarray(nodes2)[None, :]
        match, best_d = hm.gated_nn_match(dist, jnp.asarray(gate),
                                          max_dist=self.params.th_low,
                                          nn_ratio=0.75)
        match = np.asarray(
            hm.resolve_duplicate_targets(match, best_d, int(desc2.shape[0])))
        K2 = feats.desc.shape[1]
        idx = np.nonzero(match >= 0)[0]
        c1, s1 = np.divmod(idx, K)
        p = m.kf_pt[kf, c1, s1]
        ok = (p >= 0) & m.pt_valid[np.clip(p, 0, None)]
        c2, s2 = np.divmod(match[idx[ok]], K2)
        return list(zip(p[ok].tolist(), c2.tolist(), s2.tolist()))

    def _body_frame_points(self, kf: int, pt_ids) -> np.ndarray:
        M = se3_np.cayley2hom(self.map.kf_pose[kf])
        Minv = np.linalg.inv(M)
        X = self.map.pt_pos[np.asarray(pt_ids, np.int32)]
        return X @ Minv[:3, :3].T + Minv[:3, 3]

    def _compute_sim3_and_correct(self, kf: int, cand: int) -> bool:
        m = self.map
        pairs = self._matched_point_pairs(kf, cand)
        # drop pairs where both sides are the SAME landmark (possible
        # only when tracking already re-associated across the loop,
        # e.g. through a shared corridor): such a pair's Sim3 residual
        # is satisfied identically by the current relative estimate, so
        # it carries zero alignment information and only votes for a
        # no-op correction in the RANSAC, diluting the real loop signal
        # carried by (new landmark, old landmark) pairs
        pairs = [p for p in pairs if p[0] != p[1]]
        if os.environ.get("MCSLAM_DEBUG"):
            n1 = int((self.map.kf_pt[kf] >= 0).sum())
            n2 = int((self.map.kf_pt[cand] >= 0).sum())
            _dbg(f"[loop] sim3 kf={kf} cand={cand}: {len(pairs)} bow "
                 f"pairs (landmark slots {n1} vs {n2})")
        if len(pairs) < MIN_BOW_MATCHES:
            return False
        p1 = [p[0] for p in pairs]
        p2 = [p[1] for p in pairs]
        X1 = self._body_frame_points(kf, p1)      # (M, 3) in kf body frame
        X2 = self._body_frame_points(cand, p2)

        # --- Sim3 RANSAC (Horn 3pt, batched hypotheses) ---
        n = len(pairs)
        self.key, k = jax.random.split(self.key)
        idx = jax.random.randint(k, (RANSAC_HYPS, 3), 0, n)
        S_hyp = jax.vmap(lambda i: horn_alignment(
            jnp.asarray(X1)[i], jnp.asarray(X2)[i],
            fix_scale=self.fix_scale))(idx)
        # score: bidirectional reprojection through the rigs
        obs = self._make_sim3_obs(kf, cand, pairs, X1, X2)

        def score(S: Sim3):
            c1, c2 = _sim3_chi2(self.rig, S, obs)
            return jnp.sum((c1 <= RANSAC_CHI2) & (c2 <= RANSAC_CHI2)
                           & obs.valid)

        scores = jax.vmap(lambda s, R, t: score(Sim3(s, R, t)))(
            S_hyp.s, S_hyp.R, S_hyp.t)
        best = int(np.argmax(np.asarray(scores)))
        _dbg(f"[loop] sim3 kf={kf} cand={cand}: ransac best inliers "
             f"{int(scores[best])}/{n}")
        if int(scores[best]) < MIN_SIM3_INLIERS // 2:
            return False
        S0 = Sim3(S_hyp.s[best], S_hyp.R[best], S_hyp.t[best])

        # --- refine (OptimizeSim3) ---
        S12, inlier, n_in = sim3_opt.optimize_sim3(
            self.rig, S0, obs, iters=10, fix_scale=self.fix_scale)
        if int(n_in) < MIN_SIM3_INLIERS:
            return False

        # --- guided SearchBySim3 round (cLoopClosing.cpp:343-364):
        # project the candidate's landmarks into kf through S12, pick up
        # extra correspondences, re-optimize ---
        extra = self._guided_sim3_pairs(kf, cand, S12,
                                        {(a, b) for a, b, *_ in pairs})
        if extra:
            pairs2 = pairs + extra
            X1b = self._body_frame_points(kf, [p[0] for p in pairs2])
            X2b = self._body_frame_points(cand, [p[1] for p in pairs2])
            obs2 = self._make_sim3_obs(kf, cand, pairs2, X1b, X2b)
            S12b, _, n_in2 = sim3_opt.optimize_sim3(
                self.rig, S12, obs2, iters=10, fix_scale=self.fix_scale)
            if int(n_in2) >= int(n_in):
                S12, n_in = S12b, n_in2

        # --- loop-neighborhood support gate (cLoopClosing.cpp:400-424):
        # total matches incl. the candidate's covisible neighborhood ---
        n_total = int(n_in) + self._count_neighborhood_support(kf, cand, S12)
        _dbg(f"[loop] sim3 kf={kf} cand={cand}: refined inliers "
             f"{int(n_in)}, total w/ neighborhood {n_total}")
        if n_total < MIN_TOTAL_MATCHES:
            return False

        self._correct_loop(kf, cand, S12)
        if self.on_loop:
            self.on_loop(kf, cand)
        return True

    def _guided_sim3_pairs(self, kf, cand, S12: Sim3, have):
        """SearchBySim3: project cand's landmarks (mapped through S12)
        into kf's cameras; gated NN against slots carrying landmarks."""
        m = self.map
        arr = m.kf_pt[cand]
        cand_pts = np.unique(arr[arr >= 0])
        cand_pts = cand_pts[m.pt_valid[cand_pts]]
        if len(cand_pts) == 0:
            return []
        # cand-body coords -> kf-body via S12 -> world via kf pose
        Xc_body = self._body_frame_points(cand, cand_pts)
        Xk_body = np.asarray(S12.apply(jnp.asarray(Xc_body)))
        M_kf = se3_np.cayley2hom(m.kf_pose[kf])
        Xw = Xk_body @ M_kf[:3, :3].T + M_kf[:3, 3]

        from .tracking import bucket, frustum_check
        cap = bucket(len(cand_pts), 256)
        P = len(cand_pts)
        pad = lambda a, fill=0: np.concatenate(
            [a, np.full((cap - P,) + a.shape[1:], fill, a.dtype)], 0)
        # distance gate widened 2x for the S12-projected points (the
        # estimated transform carries the loop drift) WITHOUT shifting
        # the predicted octave; descriptor gate is TH_HIGH per the
        # reference's SearchBySim3 (cORBmatcher.cpp:1869)
        uv, ok, lvl, _ = frustum_check(
            self.rig, jnp.asarray(m.kf_pose[kf]),
            jnp.asarray(pad(Xw.astype(np.float32))),
            jnp.asarray(pad(m.pt_normal[cand_pts])),
            jnp.asarray(pad(m.pt_min_dist[cand_pts])),
            jnp.asarray(pad(m.pt_max_dist[cand_pts], 1.0)),
            n_levels=self.n_levels, scale_factor=self.scale_factor,
            dist_slack=2.0)
        ok = np.array(ok)
        ok[:, P:] = False
        f = m.kf_features[kf]
        fuse_fn = matcher.pick_fuse_fn(cap, self.params)
        match = np.asarray(fuse_fn(
            f, jnp.asarray(m.kf_pt[kf] >= 0),
            jnp.asarray(pad(m.pt_desc[cand_pts])),
            jnp.asarray(pad(m.pt_desc_mask[cand_pts])),
            uv, jnp.asarray(ok), lvl, self.params, th=7.5,
            loose_desc=True))
        # the reverse Sim3 edge is measured at p2's OWN observation in
        # the candidate keyframe — the reference looks up
        # GetIndexInKeyFrame(pKF2) (cOptimizerLoopStuff.cpp:128); the
        # kf-side (cam, slot) indexes an unrelated candidate feature and
        # would feed the optimizer a garbage reverse residual. First
        # observation per point in insertion order, vectorized off the
        # flat observation log.
        rows = m.obs_rows()
        rows = rows[rows[:, 1] == cand]
        _, first = np.unique(rows[:, 0], return_index=True)
        obs_cam = np.full(m.pt_pos.shape[0], -1, np.int32)
        obs_slot = np.full(m.pt_pos.shape[0], -1, np.int32)
        obs_cam[rows[first, 0]] = rows[first, 2]
        obs_slot[rows[first, 0]] = rows[first, 3]

        cidx, iidx = np.nonzero(match[:, :P] >= 0)
        slots = match[cidx, iidx]
        p1 = m.kf_pt[kf, cidx, slots]
        p2 = cand_pts[iidx]
        ok = (p1 >= 0) & m.pt_valid[np.clip(p1, 0, None)] & (obs_cam[p2] >= 0)
        return [(int(a), int(b), int(c), int(s), int(c2), int(s2))
                for a, b, c, s, c2, s2
                in zip(p1[ok], p2[ok], cidx[ok], slots[ok],
                       obs_cam[p2[ok]], obs_slot[p2[ok]])
                if (int(a), int(b)) not in have]

    def _count_neighborhood_support(self, kf, cand, S12: Sim3) -> int:
        """Project landmarks of cand's covisible neighborhood into kf
        (through S12) and count additional consistent matches."""
        m = self.map
        neigh = m.covisible_keyframes(cand, best_n=10)
        if not neigh:
            return 0
        arr = m.kf_pt[np.asarray(neigh, np.int64)]
        pts = np.unique(arr[arr >= 0])
        pts = pts[m.pt_valid[pts]]
        own = m.kf_pt[cand]
        pts = pts[~np.isin(pts, own[own >= 0])].astype(np.int32)
        if len(pts) == 0:
            return 0
        Xc_body = self._body_frame_points(cand, pts)
        Xk_body = np.asarray(S12.apply(jnp.asarray(Xc_body)))
        M_kf = se3_np.cayley2hom(m.kf_pose[kf])
        Xw = Xk_body @ M_kf[:3, :3].T + M_kf[:3, 3]
        from .tracking import bucket, frustum_check
        cap = bucket(len(pts), 256)
        P = len(pts)
        pad = lambda a, fill=0: np.concatenate(
            [a, np.full((cap - P,) + a.shape[1:], fill, a.dtype)], 0)
        uv, ok, lvl, _ = frustum_check(
            self.rig, jnp.asarray(m.kf_pose[kf]),
            jnp.asarray(pad(Xw.astype(np.float32))),
            jnp.asarray(pad(m.pt_normal[pts])),
            jnp.asarray(pad(m.pt_min_dist[pts])),
            jnp.asarray(pad(m.pt_max_dist[pts], 1.0)),
            n_levels=self.n_levels, scale_factor=self.scale_factor,
            dist_slack=2.0)
        ok = np.array(ok)
        ok[:, P:] = False
        f = m.kf_features[kf]
        fuse_fn = matcher.pick_fuse_fn(cap, self.params)
        match = np.asarray(fuse_fn(
            f, jnp.asarray(m.kf_pt[kf] >= 0),
            jnp.asarray(pad(m.pt_desc[pts])),
            jnp.asarray(pad(m.pt_desc_mask[pts])),
            uv, jnp.asarray(ok), lvl, self.params, th=7.5,
            loose_desc=True))
        return int((match[:, :P] >= 0).sum())

    def _make_sim3_obs(self, kf1, kf2, pairs, X1, X2) -> sim3_opt.Sim3Obs:
        m = self.map
        f1, f2 = m.kf_features[kf1], m.kf_features[kf2]
        n = len(pairs)
        uv1 = np.zeros((n, 2), np.float64)
        uv2 = np.zeros((n, 2), np.float64)
        cam1 = np.zeros(n, np.int32)
        cam2 = np.zeros(n, np.int32)
        s1v = np.ones(n)
        s2v = np.ones(n)
        xy1 = np.asarray(f1.xy)
        xy2 = np.asarray(f2.xy)
        lv1 = np.asarray(f1.level)
        lv2 = np.asarray(f2.level)
        sf = self.params.scale_factor
        for i, (pa, pb, c1, s1, c2, s2) in enumerate(pairs):
            uv1[i] = xy1[c1, s1]
            uv2[i] = xy2[c2, s2]
            cam1[i] = c1
            cam2[i] = c2
            s1v[i] = sf ** (-2.0 * lv1[c1, s1])
            s2v[i] = sf ** (-2.0 * lv2[c2, s2])
        return sim3_opt.Sim3Obs(
            X1=jnp.asarray(X1), X2=jnp.asarray(X2),
            uv1=jnp.asarray(uv1), uv2=jnp.asarray(uv2),
            cam1=jnp.asarray(cam1), cam2=jnp.asarray(cam2),
            inv_sigma2_1=jnp.asarray(s1v), inv_sigma2_2=jnp.asarray(s2v),
            valid=jnp.ones(n, bool))

    # ------------------------------------------------------------------

    def _correct_loop(self, kf: int, loop_kf: int, S12: Sim3):
        """CorrectLoop (cLoopClosing.cpp:429-595) + essential-graph pass
        (cOptimizerLoopStuff.cpp:267-513), in reference order:

        1. snapshot every KF's PRE-correction world->body Sim3 (the
           reference's NonCorrectedSim3 map, cLoopClosing.cpp:448-470);
        2. directly correct the current covisible group and its points
           with delta = S_corr o S_kf^-1 (:471-524);
        3. SearchAndFuse loop-region duplicates into the group (:548);
        4. collect the NEW covisibility links the fusion created
           (LoopConnections, :550-570);
        5. optimize the essential graph: spanning-tree / old-loop /
           strong-covisibility edges are measured from the
           PRE-correction relative poses (so the loop error distributes
           over the whole trajectory, cOptimizerLoopStuff.cpp:385-428)
           while the new loop edges are measured from the corrected
           estimates (:330-360); vertices start at the corrected
           estimates for the group, pre-correction elsewhere;
        6. write back poses and remap every point through its corrected
           reference (mnCorrectedByKF) or first observer (:490-512).
        """
        m = self.map
        kf_ids = m.keyframe_ids().tolist()
        idx_of = {k: i for i, k in enumerate(kf_ids)}
        N = len(kf_ids)

        def siw_log(pose6) -> np.ndarray:
            M = se3_np.cayley2hom(pose6)
            return np.asarray(sim3_log(sim3_from_se3(
                jnp.asarray(np.linalg.inv(M)))))

        # (1) NonCorrectedSim3 snapshot
        logs_pre = np.stack([siw_log(m.kf_pose[k]) for k in kf_ids])

        S_kf = sim3_exp(jnp.asarray(logs_pre[idx_of[kf]]))
        S_loop = sim3_exp(jnp.asarray(logs_pre[idx_of[loop_kf]]))
        # corrected world->kf: x_kf = S12 x_loop = S12 S_loop x_world
        S_corr = S12.compose(S_loop)
        delta = S_corr.compose(S_kf.inverse())

        group = set(m.covisible_keyframes(kf)) | {kf}
        # the loop keyframe is the gauge anchor of the whole correction
        # (its pose defines S_corr and it is held fixed in the essential
        # graph); it can only appear covisible here if tracking already
        # re-associated across the loop — never "correct" it
        group.discard(loop_kf)
        pre_conn = {g: set(m.covisible_keyframes(g)) for g in group}

        # (2) direct correction of the covisible group + its points.
        # Each member is corrected THROUGH ITS OWN relative pose to the
        # current keyframe — S_i_new = (S_i o S_kf^-1) o S_corr, the
        # reference's g2oCorrectedSiw = g2oSic * mg2oScw
        # (cLoopClosing.cpp:471-487) — which preserves every intra-group
        # relative pose exactly. (A common left-multiplied world delta
        # does NOT: relatives get conjugated, planting spurious
        # residuals on intra-group edges.)
        logs_init = logs_pre.copy()
        corrected_by: dict[int, int] = {}     # point -> corrected ref vertex
        for gkf in group:
            i = idx_of[gkf]
            S_old = sim3_exp(jnp.asarray(logs_pre[i]))
            S_new = S_old.compose(S_kf.inverse()).compose(S_corr)
            logs_init[i] = np.asarray(sim3_log(S_new))
            arr = m.kf_pt[gkf]
            pts = np.unique(arr[arr >= 0])
            pts = pts[m.pt_valid[pts]] if len(pts) else pts
            pts = np.asarray([p for p in pts if int(p) not in corrected_by],
                             np.int32)
            if len(pts):
                Xb = _apply_sim3_np(S_old, m.pt_pos[pts].astype(np.float64))
                m.pt_pos[pts] = _apply_sim3_np(
                    S_new.inverse(), Xb).astype(np.float32)
                for p in pts:
                    corrected_by[int(p)] = i
            m.kf_pose[gkf] = se3_np.hom2cayley(
                np.linalg.inv(np.asarray(S_new.to_se3())))

        # (3) SearchAndFuse BEFORE the pose graph so the new covisibility
        # links (LoopConnections) feed it, mirroring the reference order
        if self.fuser is not None:
            nks = np.asarray(
                [loop_kf] + m.covisible_keyframes(loop_kf, best_n=10),
                np.int64)
            arr2 = m.kf_pt[nks]
            loop_pts = np.unique(arr2[arr2 >= 0])
            loop_pts = loop_pts[m.pt_valid[loop_pts]].astype(np.int32)
            # all corrected-group targets in ONE batched fuse dispatch
            self.fuser.fuse_into_keyframes(
                loop_pts, [g for g in group if m.kf_valid[g]])

        # (4) LoopConnections: links from group KFs created by the fusion
        loop_connections: list[tuple[int, int]] = [(kf, loop_kf)]
        for g in group:
            if not m.kf_valid[g]:
                continue
            for nk in set(m.covisible_keyframes(g)) - pre_conn[g] - group:
                loop_connections.append((g, nk))

        # (5) essential graph. Edge families follow
        # cOptimizerLoopStuff.cpp:349-463 — crucially, the pre-measured
        # spanning-tree edges are added INDEPENDENTLY of the
        # loop-connection edges: a boundary pair (last uncorrected KF,
        # first corrected KF) may carry BOTH a corrected-measured loop
        # edge and a pre-measured spanning edge, and it is the pre edge
        # whose residual the optimizer distributes around the cycle.
        # (An all-category dedup silently drops that edge and the whole
        # optimization becomes a no-op.)
        ei, ej, meas = [], [], []
        loop_pairs = set()

        def add_edge(a, b, logs_src):
            ia, ib = idx_of[a], idx_of[b]
            Sa = sim3_exp(jnp.asarray(logs_src[ia]))
            Sb = sim3_exp(jnp.asarray(logs_src[ib]))
            meas.append(np.asarray(sim3_log(Sa.compose(Sb.inverse()))))
            ei.append(ia)
            ej.append(ib)

        # new loop constraints carry relative poses of the CORRECTED
        # estimates, gated by the reference's minNumFeat=100 except the
        # fired pair itself (cOptimizerLoopStuff.cpp:362-365): fusion's
        # replace-forwarding also creates WEAK cross-links (including to
        # mid-trajectory keyframes); admitting those as zero-residual
        # loop edges staples the graph together in its broken state.
        for a, b in loop_connections:
            if a not in idx_of or b not in idx_of:
                continue
            if (a, b) in loop_pairs or (b, a) in loop_pairs:
                continue
            if not (a == kf and b == loop_kf) \
                    and m.covisibility_weights(a).get(b, 0) < MIN_FEAT_GRAPH:
                continue
            loop_pairs.add((a, b))
            add_edge(a, b, logs_init)
        # odometry-era constraints from the PRE-correction poses:
        # spanning tree (unconditional), previous loop closures, and
        # strong-covisibility edges. Covis pairs already carrying a
        # loop-connection edge are skipped — their pre measurement is
        # the drifted relative, which would fight the loop constraint
        # one-to-one (the ORB-SLAM1-era double-add this reference
        # inherits; fixed upstream via sInsertedEdges).
        for k in kf_ids:
            par = int(m.kf_parent[k])
            if par >= 0 and par in idx_of:
                add_edge(par, k, logs_pre)
            for le in m.kf_loop_edges.get(k, ()):
                if le in idx_of and le < k:
                    add_edge(le, k, logs_pre)
            w = m.covisibility_weights(k)
            for ok_, wt in w.items():
                if wt >= MIN_FEAT_GRAPH and ok_ in idx_of and ok_ < k \
                        and (ok_, k) not in loop_pairs \
                        and (k, ok_) not in loop_pairs:
                    add_edge(ok_, k, logs_pre)
        if not ei:
            return
        # pad vertices + edges to buckets (bounds jit recompilation)
        from .tracking import bucket
        E = len(ei)
        Ecap = bucket(E, 16)
        Ncap = bucket(N, 8)
        ei = np.concatenate([ei, np.zeros(Ecap - E, np.int32)])
        ej = np.concatenate([ej, np.zeros(Ecap - E, np.int32)])
        meas = np.concatenate([np.stack(meas),
                               np.zeros((Ecap - E, 7))], 0)
        fixed = np.ones(Ncap, bool)       # pad vertices held fixed
        fixed[:N] = False
        fixed[idx_of[loop_kf]] = True
        logs_in = np.concatenate([logs_init, np.zeros((Ncap - N, 7))], 0)
        graph = sim3_opt.EssentialGraph(
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            meas=jnp.asarray(meas),
            valid=jnp.asarray(np.arange(Ecap) < E),
            fixed=jnp.asarray(fixed))
        logs_opt = np.asarray(sim3_opt.optimize_essential_graph(
            jnp.asarray(logs_in), graph, iters=20,
            fix_scale=self.fix_scale))[:N]
        if os.environ.get("MCSLAM_DEBUG"):
            d_rot = np.degrees(np.linalg.norm(
                np.asarray(sim3_log(delta))[:3]))
            d_t = np.linalg.norm(np.asarray(sim3_log(delta))[3:6])
            mv = np.linalg.norm(logs_opt - logs_init, axis=1)
            print(f"  [correct kf={kf} loop={loop_kf}] "
                  f"delta_rot={d_rot:.2f}deg delta_t={d_t:.3f} "
                  f"group={sorted(group)} E={E} N={N} "
                  f"graph_moved max={mv.max():.4f} mean={mv.mean():.4f}",
                  file=sys.stderr, flush=True)
            np.savez("/tmp/mcslam_graph_dump.npz",
                     logs_pre=logs_pre, logs_init=logs_init,
                     logs_opt=logs_opt,
                     edge_i=np.asarray(ei), edge_j=np.asarray(ej),
                     meas=np.asarray(meas), fixed=fixed,
                     kf_ids=np.asarray(kf_ids),
                     group=np.asarray(sorted(group)),
                     pair=np.asarray([kf, loop_kf]), n_edges=E, n_vtx=N)

        # (6) write back poses + remap points via S_opt^-1 o S_init
        for k, i in idx_of.items():
            S_new = sim3_exp(jnp.asarray(logs_opt[i]))
            m.kf_pose[k] = se3_np.hom2cayley(
                np.linalg.inv(np.asarray(S_new.to_se3())))
        by_ref: dict[int, list[int]] = {}
        for p in m.point_ids():
            p = int(p)
            if p in corrected_by:
                by_ref.setdefault(corrected_by[p], []).append(p)
            else:
                obs = m.pt_obs.get(p)
                if obs and obs[0][0] in idx_of:
                    by_ref.setdefault(idx_of[obs[0][0]], []).append(p)
        for i, plist in by_ref.items():
            S_old = sim3_exp(jnp.asarray(logs_init[i]))
            S_new_inv = sim3_exp(jnp.asarray(logs_opt[i])).inverse()
            pts = np.asarray(plist, np.int32)
            Xb = _apply_sim3_np(S_old, m.pt_pos[pts].astype(np.float64))
            m.pt_pos[pts] = _apply_sim3_np(S_new_inv, Xb).astype(np.float32)

        # loop-edge bookkeeping AFTER the graph, mirroring the reference
        # (AddLoopEdge follows OptimizeEssentialGraph): during the
        # optimization the fired pair must appear ONLY as the
        # corrected-measured loop edge — recording it first would let
        # the old-loop-edges section re-add the same pair with a
        # PRE-correction measurement that fights the correction 1:1
        m.kf_loop_edges[kf].add(loop_kf)
        m.kf_loop_edges[loop_kf].add(kf)

        # (7) global BA — beyond the ORB-SLAM1-era reference (it is
        # ORB-SLAM2's RunGlobalBundleAdjustment, the step that makes a
        # loop closure repair the MAP and not just the pose graph). The
        # essential graph can only move what its pose-edge topology
        # reaches: when the covisible group is small and hangs off the
        # trajectory by a thin cut, least squares legitimately parks
        # the loop residual on that cut. After SearchAndFuse, however,
        # keyframes near the loop observe a MIX of corrected
        # (loop-region) and uncorrected landmarks — reprojection
        # constraints the pose graph cannot see — and a full BA uses
        # them to pull the whole neighborhood into the loop-consistent
        # frame.
        if self.global_ba_iters > 0:
            self._global_ba(loop_kf)

    def _global_ba(self, fixed_kf: int):
        """Post-loop global BA through the SHARED routing point
        (models.global_ba.run_global_ba): on a multi-device attachment
        the loop-closer's full-map BA shards over the mesh exactly like
        the System's user-facing one — the loop keyframe is the gauge so
        the corrected region anchors the map."""
        from .global_ba import run_global_ba
        run_global_ba(self.rig, self.map, [fixed_kf], self.scale_factor,
                      iters=self.global_ba_iters)


def _apply_sim3_np(S: Sim3, X: np.ndarray) -> np.ndarray:
    """Vectorized host-side Sim3 apply on (N, 3) numpy points."""
    s = float(np.asarray(S.s))
    R = np.asarray(S.R, np.float64)
    t = np.asarray(S.t, np.float64)
    return s * X @ R.T + t


def _sim3_chi2(rig: Rig, S: Sim3, obs: sim3_opt.Sim3Obs):
    """Bidirectional reprojection chi2 for a hypothesis (device)."""
    Mc_inv = inv_se3(jnp.asarray(rig.M_c))
    cams = jax.tree.map(jnp.asarray, rig.cams)
    Si = S.inverse()

    def one(X1, X2, uv1, uv2, c1, c2):
        x1p = S.apply(X2)
        T1 = Mc_inv[c1]
        cam1 = jax.tree.map(lambda a: a[c1], cams)
        p1 = world_to_img(cam1, T1[:3, :3] @ x1p + T1[:3, 3])
        x2p = Si.apply(X1)
        T2 = Mc_inv[c2]
        cam2 = jax.tree.map(lambda a: a[c2], cams)
        p2 = world_to_img(cam2, T2[:3, :3] @ x2p + T2[:3, 3])
        return (jnp.sum((uv1 - p1) ** 2) * 1.0,
                jnp.sum((uv2 - p2) ** 2) * 1.0)

    c1, c2 = jax.vmap(one)(obs.X1, obs.X2, obs.uv1, obs.uv2,
                           obs.cam1, obs.cam2)
    return c1, c2
