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
    db = jnp.asarray(rng.integers(0, 2 ** 32, (128, 8), dtype=np.uint32))
    gate = jnp.zeros((128, 128), bool).at[:64].set(True)
    ctx = (pltpu.force_tpu_interpret_mode()
           if jax.default_backend() != "tpu" else contextlib.nullcontext())
    with ctx:
        idx, best, second = hamming_nn.fused_hamming_nn(q, db, gate)
    idx = np.asarray(idx)
    assert (idx[64:] == -1).all()
    assert (idx[:64] >= 0).all()
