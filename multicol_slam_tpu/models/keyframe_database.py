"""Keyframe database: BoW inverted file + loop/reloc candidate detection
(cMultiKeyFrameDatabase.{h,cpp}).

Reference semantics: inverted file vector<list<MKF*>> by word id (:36-50);
DetectLoopCandidates (:82-211): count shared words with all KFs sharing
>= 1 word (excluding the query's covisible set), keep those above
0.8 * maxCommonWords, score with BoW similarity >= minScore, accumulate
scores over covisibility groups, retain candidates above
0.75 * bestAccScore. DetectRelocalisationCandidates (:213-330) is the
same shape without the covisibility exclusion / minScore.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .map import MapStore
from .vocabulary import bow_score_l1


class KeyFrameDatabase:
    def __init__(self):
        self.inverted: dict[int, list[int]] = defaultdict(list)
        self.kf_bow: dict[int, dict[int, float]] = {}

    def add(self, kf: int, bow: dict[int, float]):
        self.kf_bow[kf] = bow
        for w in bow:
            self.inverted[w].append(kf)

    def erase(self, kf: int):
        bow = self.kf_bow.pop(kf, {})
        for w in bow:
            try:
                self.inverted[w].remove(kf)
            except ValueError:
                pass

    def clear(self):
        """cMultiKeyFrameDatabase::clear (system Reset propagation)."""
        self.inverted.clear()
        self.kf_bow.clear()

    # ------------------------------------------------------------------

    def _shared_word_counts(self, bow: dict[int, float],
                            exclude: set[int]) -> dict[int, int]:
        counts: dict[int, int] = defaultdict(int)
        for w in bow:
            for kf in self.inverted.get(w, ()):
                if kf not in exclude:
                    counts[kf] += 1
        return counts

    def detect_loop_candidates(self, kf: int, bow: dict[int, float],
                               min_score: float, map_store: MapStore,
                               connected: set[int]) -> list[int]:
        """cMultiKeyFrameDatabase::DetectLoopCandidates (:82-211)."""
        exclude = set(connected) | {kf}
        counts = self._shared_word_counts(bow, exclude)
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = []
        for cand, c in counts.items():
            if c <= min_common:
                continue
            s = bow_score_l1(bow, self.kf_bow.get(cand, {}))
            if s >= min_score:
                scored.append((cand, s))
        if not scored:
            return []
        # accumulate over covisibility groups (top-10 covisible each)
        best_acc = 0.0
        groups = []
        for cand, s in scored:
            group = [cand] + map_store.covisible_keyframes(cand, best_n=10)
            acc = 0.0
            best_kf, best_s = cand, s
            smap = dict(scored)
            for g in group:
                gs = smap.get(g)
                if gs is not None:
                    acc += gs
                    if gs > best_s:
                        best_kf, best_s = g, gs
            groups.append((acc, best_kf))
            best_acc = max(best_acc, acc)
        th = 0.75 * best_acc
        out, seen = [], set()
        for acc, best_kf in groups:
            if acc > th and best_kf not in seen:
                seen.add(best_kf)
                out.append(best_kf)
        return out

    def detect_reloc_candidates(self, bow: dict[int, float],
                                map_store: MapStore) -> list[int]:
        """DetectRelocalisationCandidates (:213-330)."""
        counts = self._shared_word_counts(bow, set())
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = [(cand, bow_score_l1(bow, self.kf_bow.get(cand, {})))
                  for cand, c in counts.items() if c > min_common]
        if not scored:
            return []
        best_acc = 0.0
        groups = []
        smap = dict(scored)
        for cand, s in scored:
            group = [cand] + map_store.covisible_keyframes(cand, best_n=10)
            acc, best_kf, best_s = 0.0, cand, s
            for g in group:
                gs = smap.get(g)
                if gs is not None:
                    acc += gs
                    if gs > best_s:
                        best_kf, best_s = g, gs
            groups.append((acc, best_kf))
            best_acc = max(best_acc, acc)
        th = 0.75 * best_acc
        out, seen = [], set()
        for acc, best_kf in groups:
            if acc > th and best_kf not in seen:
                seen.add(best_kf)
                out.append(best_kf)
        return out
