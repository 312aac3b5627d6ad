"""The fused Pallas Hamming-NN kernel must match the XLA reference path
exactly (run in interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multicol_slam_tpu.ops import hamming as hm


def _reference(q, db, gate):
    dist = hm.hamming_matrix(q, db)
    best_idx, best_d, second_d = hm.masked_argmin2(dist, gate)
    best_idx = jnp.where(best_d >= hm.INVALID, -1, best_idx)
    return (np.asarray(best_idx), np.asarray(best_d),
            np.asarray(second_d))


def test_fused_matches_reference():
    from jax.experimental.pallas import tpu as pltpu
    from multicol_slam_tpu.ops.pallas import hamming_nn

    rng = np.random.default_rng(0)
    N, M = 256, 512
    q = jnp.asarray(rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    gate = jnp.asarray(rng.random((N, M)) < 0.7)

    if jax.default_backend() != "tpu":
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        idx, best, second = hamming_nn.fused_hamming_nn(q, db, gate)
    r_idx, r_best, r_second = _reference(q, db, gate)

    np.testing.assert_array_equal(np.asarray(best), r_best)
    np.testing.assert_array_equal(np.asarray(second), r_second)
    # argmin ties may differ in index; distances must agree where matched
    matched = r_idx >= 0
    got = np.asarray(idx)
    assert (got[matched] >= 0).all()
    d = np.asarray(hm.hamming_matrix(q, db))
    np.testing.assert_array_equal(
        d[np.arange(N)[matched], got[matched]], r_best[matched])


def test_fully_gated_rows():
    from jax.experimental.pallas import tpu as pltpu
    from multicol_slam_tpu.ops.pallas import hamming_nn
    import contextlib

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 2 ** 32, (128, 8), dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint32))
    gate = jnp.zeros((128, 256), bool).at[:64].set(True)
    ctx = (pltpu.force_tpu_interpret_mode()
           if jax.default_backend() != "tpu" else contextlib.nullcontext())
    with ctx:
        idx, best, second = hamming_nn.fused_hamming_nn(q, db, gate)
    idx = np.asarray(idx)
    assert (idx[64:] == -1).all()
    assert (idx[:64] >= 0).all()


def test_fuse_candidates_fused_matches_xla():
    """The Pallas-routed fuse must reproduce the XLA fuse exactly."""
    import contextlib
    from jax.experimental.pallas import tpu as pltpu
    from multicol_slam_tpu.models import matcher
    from multicol_slam_tpu.models.extractor import Features

    rng = np.random.default_rng(2)
    C, K, P, W = 2, 300, 256, 8
    feats = Features(
        xy=jnp.asarray(rng.uniform(0, 700, (C, K, 2)).astype(np.float32)),
        level=jnp.asarray(rng.integers(0, 4, (C, K)).astype(np.int32)),
        angle=jnp.zeros((C, K)), response=jnp.zeros((C, K)),
        ray=jnp.zeros((C, K, 3)),
        desc=jnp.asarray(rng.integers(0, 2 ** 32, (C, K, W), dtype=np.int64)
                         .astype(np.uint32)),
        desc_mask=jnp.full((C, K, W), 0xFFFFFFFF, jnp.uint32),
        valid=jnp.asarray(rng.random((C, K)) < 0.9))
    pt_desc = jnp.asarray(
        rng.integers(0, 2 ** 32, (P, W), dtype=np.int64).astype(np.uint32))
    pt_mask = jnp.full((P, W), 0xFFFFFFFF, jnp.uint32)
    uv = jnp.asarray(rng.uniform(0, 700, (C, P, 2)).astype(np.float32))
    ok = jnp.asarray(rng.random((C, P)) < 0.8)
    lvl = jnp.asarray(rng.integers(0, 4, (C, P)).astype(np.int32))
    has = jnp.zeros((C, K), bool)
    params = matcher.MatchParams(desc_bytes=32)

    ref = np.asarray(matcher.fuse_candidates(
        feats, has, pt_desc, pt_mask, uv, ok, lvl, params, th=30.0))
    ctx = (pltpu.force_tpu_interpret_mode()
           if jax.default_backend() != "tpu" else contextlib.nullcontext())
    with ctx:
        got = np.asarray(matcher.fuse_candidates_fused(
            feats, has, pt_desc, pt_mask, uv, ok, lvl, params, th=30.0))
    # ties in random descriptors may pick a different slot at equal
    # distance: require identical matched-set distances
    agree = (ref == got)
    if not agree.all():
        d = [np.asarray(hm.hamming_matrix(pt_desc, feats.desc[c]))
             for c in range(C)]
        for c, p in zip(*np.nonzero(~agree)):
            a, b = ref[c, p], got[c, p]
            assert a >= 0 and b >= 0, (c, p, a, b)
            assert d[c][p, a] == d[c][p, b], (c, p, a, b)


def test_fused_masked_matches_reference():
    """Masked (mdBRIEF) streaming kernel vs the XLA masked path
    (DescriptorDistance64Masked, cORBmatcher.cpp:2455-2476)."""
    import contextlib
    from jax.experimental.pallas import tpu as pltpu
    from multicol_slam_tpu.ops.pallas import hamming_nn

    rng = np.random.default_rng(7)
    N, M = 256, 512
    q = jnp.asarray(rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
    qm = jnp.asarray(rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    dbm = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    gate = jnp.asarray(rng.random((N, M)) < 0.7)

    dist = hm.hamming_matrix_masked(q, db, qm, dbm)
    r_idx, r_best, r_second = hm.masked_argmin2(dist, gate)
    r_idx = np.asarray(jnp.where(r_best >= hm.INVALID, -1, r_idx))

    ctx = (pltpu.force_tpu_interpret_mode()
           if jax.default_backend() != "tpu" else contextlib.nullcontext())
    with ctx:
        idx, best, second = hamming_nn.fused_hamming_nn_masked(
            q, qm, db, dbm, gate)

    np.testing.assert_array_equal(np.asarray(best), np.asarray(r_best))
    np.testing.assert_array_equal(np.asarray(second), np.asarray(r_second))
    matched = r_idx >= 0
    got = np.asarray(idx)
    assert (got[matched] >= 0).all()
    d = np.asarray(dist)
    np.testing.assert_array_equal(
        d[np.arange(N)[matched], got[matched]], np.asarray(r_best)[matched])


def test_masked_fused_exact_vs_integer_reference():
    """End-to-end bit parity of the masked GEMM formulation vs the exact
    integer XOR+popcount reference on random masked descriptors."""
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2 ** 32, (96, 8), dtype=np.uint32))
    ma = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
    mb = jnp.asarray(rng.integers(0, 2 ** 32, (96, 8), dtype=np.uint32))
    np.testing.assert_array_equal(
        np.asarray(hm.hamming_matrix_masked(a, b, ma, mb)),
        np.asarray(hm.hamming_matrix_masked_exact(a, b, ma, mb)))
