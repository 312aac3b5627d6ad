"""Fused Hamming nearest-neighbour Pallas kernel.

The XLA matcher (ops/hamming.py) materializes the (N, M) f32 distance
matrix plus argmin intermediates, which is ideal at frame scale
(N = M ~ 1e3). At MAP scale (fuse/loop passes project 1e4+ candidate
landmarks into a keyframe) this kernel streams D_TILE database columns
through VMEM per grid step and folds best / second-best / argmin on the
fly — VMEM use is bounded by the tile sizes no matter how large N and M
grow, and the running reduction lives in the revisited output block
(TPU grids execute sequentially, so the carry is safe).

Semantics identical to hamming.masked_argmin2 over hamming_matrix with
a gate: per query row, the best and second-best gated Hamming distance
and the best index (-1 / INVALID when fully gated out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sentinel exactly representable in f32 (2^30; 0x7FFFFFFF rounds to 2^31
# and relies on saturating f32->int conversion)
INVALID = 1 << 30

Q_TILE = 128     # query rows per program
D_TILE = 256     # database columns per program (grid-streamed)


def _kernel(q_ref, dbt_ref, gate_ref, best_ref, second_ref, idx_ref):
    """One (query-tile, db-tile) cell. q_ref: (Q_TILE, B) f32 +-1;
    dbt_ref: (B, D_TILE) f32 +-1 TRANSPOSED block (mosaic wants standard
    (Q,B)x(B,D) matmul layout); gate_ref: (Q_TILE, D_TILE) f32 0/1;
    outputs are WHOLE-ARRAY (n//Q_TILE, Q_TILE) blocks — resident across
    the sequential TPU grid, so row i carries the running reduction over
    the db grid axis j."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    b_bits = q_ref.shape[1]

    q = q_ref[...]
    ip = jnp.dot(q, dbt_ref[...], preferred_element_type=jnp.float32)
    dist = (b_bits - ip) * 0.5                          # (Q, D)
    dist = jnp.where(gate_ref[...] > 0.5, dist, jnp.float32(INVALID))
    # tile-local best & second
    t_best = jnp.min(dist, 1)
    t_arg = jnp.argmin(dist, 1).astype(jnp.int32)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        == t_arg[:, None], jnp.float32(INVALID), dist)
    t_second = jnp.min(masked, 1)
    t_arg = t_arg + j * D_TILE

    @pl.when(j == 0)
    def _init():
        best_ref[i, :] = t_best
        second_ref[i, :] = t_second
        idx_ref[i, :] = t_arg

    @pl.when(j != 0)
    def _merge():
        best = best_ref[i, :]
        second = second_ref[i, :]
        idx = idx_ref[i, :]
        best_ref[i, :] = jnp.minimum(best, t_best)
        idx_ref[i, :] = jnp.where(t_best < best, t_arg, idx)
        second_ref[i, :] = jnp.minimum(jnp.maximum(best, t_best),
                                       jnp.minimum(second, t_second))


def _kernel_masked(q_ref, qm_ref, dbt_ref, dbmt_ref, gate_ref,
                   best_ref, second_ref, idx_ref):
    """Masked-Hamming variant (DescriptorDistance64Masked,
    cORBmatcher.cpp:2455-2476): dist = floor((popcount((a^b)&m_a)
    + popcount((a^b)&m_b)) / 2). Same tiling as _kernel with two GEMMs:
    q_ref = s_a, qm_ref = m_a*s_a, dbt_ref = s_b^T, dbmt_ref = (m_b*s_b)^T.
    The mask popcounts fold back out of the same operands:
    |m_a| = <m_a*s_a, s_a>, |m_b| = <m_b*s_b, s_b> (s^2 = 1)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    q = q_ref[...]
    qm = qm_ref[...]
    dbt = dbt_ref[...]
    dbmt = dbmt_ref[...]
    ip_a = jnp.dot(qm, dbt, preferred_element_type=jnp.float32)
    ip_b = jnp.dot(q, dbmt, preferred_element_type=jnp.float32)
    na = jnp.sum(qm * q, 1)                             # (Q,) = |m_a|
    nb = jnp.sum(dbmt * dbt, 0)                         # (D,) = |m_b|
    cnt_a = (na[:, None] - ip_a) * 0.5
    cnt_b = (nb[None, :] - ip_b) * 0.5
    dist = jnp.floor((cnt_a + cnt_b) * 0.5)            # int division by 2
    dist = jnp.where(gate_ref[...] > 0.5, dist, jnp.float32(INVALID))
    t_best = jnp.min(dist, 1)
    t_arg = jnp.argmin(dist, 1).astype(jnp.int32)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        == t_arg[:, None], jnp.float32(INVALID), dist)
    t_second = jnp.min(masked, 1)
    t_arg = t_arg + j * D_TILE

    @pl.when(j == 0)
    def _init():
        best_ref[i, :] = t_best
        second_ref[i, :] = t_second
        idx_ref[i, :] = t_arg

    @pl.when(j != 0)
    def _merge():
        best = best_ref[i, :]
        second = second_ref[i, :]
        idx = idx_ref[i, :]
        best_ref[i, :] = jnp.minimum(best, t_best)
        idx_ref[i, :] = jnp.where(t_best < best, t_arg, idx)
        second_ref[i, :] = jnp.minimum(jnp.maximum(best, t_best),
                                       jnp.minimum(second, t_second))


@functools.partial(jax.jit, static_argnames=())
def fused_hamming_nn(q_packed: jax.Array, db_packed: jax.Array,
                     gate: jax.Array):
    """Per-query best/second/argmin of gated Hamming distances.

    q_packed: (N, W) uint32; db_packed: (M, W) uint32; gate: (N, M) bool.
    N must be a multiple of 128 and M of 256 (pad with gate=False
    rows/cols). Returns (best_idx (N,), best_d (N,), second_d (N,))
    int32 with INVALID distances where fully gated.
    """
    from ..hamming import to_pm1

    n = q_packed.shape[0]
    m = db_packed.shape[0]
    # f32 +-1 operands: this mosaic toolchain rejects bf16 dot lhs
    # ("Bad lhs type"); +-1 f32 products stay exact on the MXU
    q_pm = to_pm1(q_packed, dtype=jnp.float32)          # (N, B)
    db_pm_t = to_pm1(db_packed, dtype=jnp.float32).T    # (B, M)
    gatef = gate.astype(jnp.float32)  # i8 vector compares unsupported on this target

    grid = (n // Q_TILE, m // D_TILE)
    out_spec = pl.BlockSpec((n // Q_TILE, Q_TILE), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q_TILE, q_pm.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db_pm_t.shape[0], D_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE, D_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.int32),
        ),
    )(q_pm, db_pm_t, gatef)
    from ..hamming import INVALID as XLA_INVALID

    def to_int(d):
        d = d.reshape(n)
        # re-map the f32-exact sentinel to the XLA path's int32 sentinel
        # once values are integers (drop-in semantic parity)
        return jnp.where(d >= jnp.float32(INVALID), XLA_INVALID,
                         d.astype(jnp.int32))

    best = to_int(best)
    second = to_int(second)
    idx = idx.reshape(n)
    idx = jnp.where(best >= XLA_INVALID, -1, idx)
    return idx, best, second


@functools.partial(jax.jit, static_argnames=())
def fused_hamming_nn_masked(q_packed: jax.Array, q_mask: jax.Array,
                            db_packed: jax.Array, db_mask: jax.Array,
                            gate: jax.Array):
    """Masked-descriptor variant of :func:`fused_hamming_nn` for the
    mdBRIEF configuration (the reference's signature descriptor).

    q_mask/db_mask: packed stability masks aligned with the descriptors.
    Same shape rules and return contract as fused_hamming_nn; distances
    follow DescriptorDistance64Masked (cORBmatcher.cpp:2455-2476),
    truncating the final /2 like the integer reference.
    """
    from ..hamming import to_pm1, unpack_bits_u32

    n = q_packed.shape[0]
    m = db_packed.shape[0]
    q_pm = to_pm1(q_packed, dtype=jnp.float32)              # (N, B)
    qm_pm = unpack_bits_u32(q_mask).astype(jnp.float32) * q_pm
    db_pm_t = to_pm1(db_packed, dtype=jnp.float32).T        # (B, M)
    dbm_pm_t = unpack_bits_u32(db_mask).astype(jnp.float32).T * db_pm_t
    gatef = gate.astype(jnp.float32)

    grid = (n // Q_TILE, m // D_TILE)
    out_spec = pl.BlockSpec((n // Q_TILE, Q_TILE), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    B = q_pm.shape[1]
    best, second, idx = pl.pallas_call(
        _kernel_masked,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q_TILE, B), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE, B), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE, D_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.int32),
        ),
    )(q_pm, qm_pm, db_pm_t, dbm_pm_t, gatef)
    from ..hamming import INVALID as XLA_INVALID

    def to_int(d):
        d = d.reshape(n)
        return jnp.where(d >= jnp.float32(INVALID), XLA_INVALID,
                         d.astype(jnp.int32))

    best = to_int(best)
    second = to_int(second)
    idx = idx.reshape(n)
    idx = jnp.where(best >= XLA_INVALID, -1, idx)
    return idx, best, second
