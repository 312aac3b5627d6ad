"""Tests for the native C++ host runtime (and its python fallbacks)."""

import numpy as np
import pytest

from multicol_slam_tpu import runtime


def test_native_lib_builds():
    assert runtime.get_lib() is not None, "libmapcore.so failed to build"


class TestOctree:
    def test_selects_target_spread(self):
        rng = np.random.default_rng(0)
        n = 500
        xs = rng.uniform(0, 640, n).astype(np.float32)
        ys = rng.uniform(0, 480, n).astype(np.float32)
        resp = rng.uniform(1, 100, n).astype(np.float32)
        sel = runtime.octree_distribute(xs, ys, resp, 100)
        assert 80 <= len(sel) <= 110
        assert len(np.unique(sel)) == len(sel)
        # spatial spread: selected points cover many 64px buckets
        bx = (xs[sel] // 64).astype(int)
        by = (ys[sel] // 64).astype(int)
        assert len(set(zip(bx.tolist(), by.tolist()))) > 30

    def test_fewer_than_target_keeps_all(self):
        rng = np.random.default_rng(1)
        xs = rng.uniform(0, 100, 20).astype(np.float32)
        ys = rng.uniform(0, 100, 20).astype(np.float32)
        resp = rng.uniform(0, 1, 20).astype(np.float32)
        sel = runtime.octree_distribute(xs, ys, resp, 50)
        assert len(sel) == 20

    def test_clustered_picks_best(self):
        # two tight clusters + target 2 -> best response of each
        xs = np.asarray([10, 11, 12, 200, 201, 202], np.float32)
        ys = np.asarray([10, 11, 12, 200, 201, 202], np.float32)
        resp = np.asarray([5, 9, 1, 2, 8, 3], np.float32)
        sel = set(runtime.octree_distribute(xs, ys, resp, 2).tolist())
        assert 1 in sel and 4 in sel

    def test_matches_python_fallback_counts(self):
        rng = np.random.default_rng(2)
        n = 300
        xs = rng.uniform(0, 754, n).astype(np.float32)
        ys = rng.uniform(0, 480, n).astype(np.float32)
        resp = rng.uniform(0, 50, n).astype(np.float32)
        native = runtime.octree_distribute(xs, ys, resp, 64)
        # force fallback
        lib = runtime._lib
        runtime._lib, runtime._tried = None, True
        try:
            fallback = runtime.octree_distribute(xs, ys, resp, 64)
        finally:
            runtime._lib, runtime._tried = lib, True
        # same selection philosophy: counts within 20%
        assert abs(len(native) - len(fallback)) <= 0.25 * 64


class TestCovisibility:
    def test_counts(self):
        # points 0,1 shared by kf0/kf1; point 2 by kf0/kf2 twice cams
        obs_pt = np.asarray([0, 0, 1, 1, 2, 2, 2], np.int32)
        obs_kf = np.asarray([0, 1, 0, 1, 0, 2, 2], np.int32)
        ids, counts = runtime.covisibility_counts(obs_pt, obs_kf, 0, 4)
        d = dict(zip(ids.tolist(), counts.tolist()))
        assert d[1] == 2     # kf1 shares pts 0 and 1
        assert d[2] == 2     # kf2 observes pt2 twice (two cameras)

    def test_matches_fallback(self):
        rng = np.random.default_rng(3)
        m = 2000
        obs_pt = rng.integers(0, 300, m).astype(np.int32)
        obs_kf = rng.integers(0, 20, m).astype(np.int32)
        a = runtime.covisibility_counts(obs_pt, obs_kf, 5, 20)
        lib = runtime._lib
        runtime._lib, runtime._tried = None, True
        try:
            b = runtime.covisibility_counts(obs_pt, obs_kf, 5, 20)
        finally:
            runtime._lib, runtime._tried = lib, True
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestDistinctive:
    def test_center_wins(self):
        rng = np.random.default_rng(4)
        base = rng.integers(0, 2 ** 32, 8, dtype=np.uint32)
        descs = [base]
        for nflip in [2, 4, 40, 60]:
            d = base.copy()
            for _ in range(nflip):
                b = rng.integers(0, 256)
                d[b // 32] ^= np.uint32(1 << (b % 32))
            descs.append(d)
        descs = np.stack(descs)
        best = runtime.distinctive_descriptor(descs)
        assert best in (0, 1, 2)  # the center-ish ones

    def test_matches_fallback(self):
        rng = np.random.default_rng(5)
        descs = rng.integers(0, 2 ** 32, (7, 8), dtype=np.uint32)
        a = runtime.distinctive_descriptor(descs)
        lib = runtime._lib
        runtime._lib, runtime._tried = None, True
        try:
            b = runtime.distinctive_descriptor(descs)
        finally:
            runtime._lib, runtime._tried = lib, True
        assert a == b


class TestSharedWords:
    def test_counts_and_exclusion(self):
        # inverted file: word0 -> [0,1], word1 -> [1,2], word2 -> [2]
        inv_start = np.asarray([0, 2, 4, 5], np.int32)
        inv_kf = np.asarray([0, 1, 1, 2, 2], np.int32)
        ids, counts = runtime.shared_word_counts(
            inv_start, inv_kf, np.asarray([0, 1, 2], np.int32),
            np.asarray([0], np.int32), 4)
        d = dict(zip(ids.tolist(), counts.tolist()))
        assert d == {1: 2, 2: 2}
