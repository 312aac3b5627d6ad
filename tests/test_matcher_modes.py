"""Direct unit tests of the matcher search modes (cORBmatcher parity):
window search semantics, fuse gating, descriptor-size threshold
variants (16/32/64 bytes), masked matching."""

import numpy as np
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.models import matcher
from multicol_slam_tpu.models.extractor import Features
from multicol_slam_tpu.ops import hamming as hm


def make_feats(rng, C=2, K=64, words=8, spread=400.0):
    desc = rng.integers(0, 2 ** 32, (C, K, words), dtype=np.uint32)
    xy = rng.uniform(50, 50 + spread, (C, K, 2)).astype(np.float32)
    return Features(
        xy=jnp.asarray(xy),
        level=jnp.zeros((C, K), jnp.int32),
        angle=jnp.zeros((C, K)),
        response=jnp.ones((C, K)),
        ray=jnp.zeros((C, K, 3)),
        desc=jnp.asarray(desc),
        desc_mask=jnp.full((C, K, words), 0xFFFFFFFF, np.uint32),
        valid=jnp.ones((C, K), bool))


class TestWindowSearch:
    def test_finds_shifted_copies(self):
        rng = np.random.default_rng(0)
        f1 = make_feats(rng)
        # f2 = f1 shifted 5 px, same descriptors
        f2 = f1._replace(xy=f1.xy + 5.0)
        sel = jnp.ones(f1.valid.shape, bool)
        m = np.asarray(matcher.window_search(
            f1, f2, sel, matcher.MatchParams(), window=20.0))
        # every slot should match itself
        assert (m == np.arange(64)[None, :]).mean() > 0.95

    def test_window_limits(self):
        rng = np.random.default_rng(1)
        f1 = make_feats(rng)
        f2 = f1._replace(xy=f1.xy + 50.0)   # shifted beyond window
        sel = jnp.ones(f1.valid.shape, bool)
        m = np.asarray(matcher.window_search(
            f1, f2, sel, matcher.MatchParams(), window=20.0))
        assert (m >= 0).mean() < 0.05

    def test_same_octave_gate(self):
        rng = np.random.default_rng(2)
        f1 = make_feats(rng)
        f2 = f1._replace(level=f1.level + 1)  # all different octave
        sel = jnp.ones(f1.valid.shape, bool)
        m = np.asarray(matcher.window_search(
            f1, f2, sel, matcher.MatchParams(), window=1000.0))
        assert (m == -1).all()


class TestDescSizeVariants:
    @pytest.mark.parametrize("desc_bytes,words", [(16, 4), (32, 8), (64, 16)])
    def test_thresholds_scale(self, desc_bytes, words):
        rng = np.random.default_rng(3)
        params = matcher.MatchParams(desc_bytes=desc_bytes)
        assert params.th_high == 3 * desc_bytes
        assert params.th_low == 2 * desc_bytes
        f1 = make_feats(rng, words=words)
        f2 = f1._replace(xy=f1.xy + 2.0)
        sel = jnp.ones(f1.valid.shape, bool)
        m = np.asarray(matcher.window_search(f1, f2, sel, params,
                                             window=10.0))
        assert (m == np.arange(64)[None, :]).mean() > 0.9

    def test_masked_params(self):
        params = matcher.MatchParams(desc_bytes=32, masked=True)
        assert params.th_high == 48 and params.th_low == 32


class TestFrameToFrame:
    def test_scale_window(self):
        """Level gate: last-frame kp at octave L only matches current
        keypoints in [L-1, L+1] (cORBmatcher.cpp:2030-2034)."""
        rng = np.random.default_rng(4)
        f_last = make_feats(rng, C=1, K=32)
        f_cur = f_last._replace(level=f_last.level + 2)  # out of window
        uv_pred = f_last.xy
        ok = jnp.ones((1, 32), bool)
        m = np.asarray(matcher.match_frame_to_frame(
            f_cur, f_last, ok, jnp.zeros((1, 32), bool), uv_pred, ok,
            matcher.MatchParams(), th=50.0))
        assert (m == -1).all()

    def test_occupied_slots_excluded(self):
        rng = np.random.default_rng(5)
        f_last = make_feats(rng, C=1, K=32)
        f_cur = f_last
        uv_pred = f_last.xy
        ok = jnp.ones((1, 32), bool)
        cur_has = jnp.ones((1, 32), bool)   # all slots already own a point
        m = np.asarray(matcher.match_frame_to_frame(
            f_cur, f_last, ok, cur_has, uv_pred, ok,
            matcher.MatchParams(), th=50.0))
        assert (m == -1).all()


class TestFuse:
    def test_fuse_matches_projected_points(self):
        rng = np.random.default_rng(6)
        f = make_feats(rng, C=1, K=48)
        # candidate points whose descriptors equal slots 0..15 and
        # project exactly onto them
        P = 16
        pt_desc = np.asarray(f.desc[0, :P])
        uv_pred = jnp.asarray(np.asarray(f.xy)[:, :P])
        ok = jnp.ones((1, P), bool)
        lvl = jnp.zeros((1, P), jnp.int32)
        m = np.asarray(matcher.fuse_candidates(
            f, jnp.zeros((1, 48), bool), jnp.asarray(pt_desc),
            jnp.full((P, 8), 0xFFFFFFFF, np.uint32), uv_pred, ok, lvl,
            matcher.MatchParams(), th=3.0))
        assert (m[0] == np.arange(P)).all()
