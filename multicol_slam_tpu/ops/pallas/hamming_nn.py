"""Fused Hamming nearest-neighbour Pallas kernel.

The XLA matcher (ops/hamming.py) materializes the (N, M) distance
matrix, which is ideal at frame scale (N = M ~ 1e3). At MAP scale
(fuse/loop passes over 1e4 x 1e5 candidates) the matrix would be
gigabytes; this kernel streams database tiles through VMEM and folds
best / second-best / argmin on the fly — O(N) memory, MXU throughput.

Semantics identical to hamming.masked_argmin2 over hamming_matrix with
a gate: per query row, the best and second-best gated Hamming distance
and the best index (INVALID when gated out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = 0x7FFFFFFF

Q_TILE = 128     # query rows per program
D_TILE = 128     # database rows per inner step


def _kernel(q_ref, dbt_ref, gate_ref, best_ref, second_ref, idx_ref):
    """q_ref: (Q_TILE, B) bf16 +-1; dbt_ref: (B, M) bf16 +-1 TRANSPOSED
    (mosaic wants standard (Q,B)x(B,D) matmul layout); gate_ref:
    (Q_TILE, M) f32 0/1; outputs per query row."""
    m = dbt_ref.shape[1]
    b_bits = q_ref.shape[1]
    n_steps = m // D_TILE

    q = q_ref[...]

    def step(s, carry):
        best, second, idx = carry
        db = dbt_ref[:, pl.ds(s * D_TILE, D_TILE)]
        ip = jnp.dot(q, db, preferred_element_type=jnp.float32)
        dist = (b_bits - ip) * 0.5                       # (Q, D)
        gate = gate_ref[:, pl.ds(s * D_TILE, D_TILE)]
        dist = jnp.where(gate > 0.5, dist, jnp.float32(INVALID))
        # tile-local best & second
        t_best = jnp.min(dist, 1)
        t_arg = jnp.argmin(dist, 1).astype(jnp.int32) + s * D_TILE
        masked = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
            == (t_arg - s * D_TILE)[:, None], jnp.float32(INVALID), dist)
        t_second = jnp.min(masked, 1)
        # merge with running carry
        new_best = jnp.minimum(best, t_best)
        new_idx = jnp.where(t_best < best, t_arg, idx)
        new_second = jnp.minimum(jnp.maximum(best, t_best),
                                 jnp.minimum(second, t_second))
        return new_best, new_second, new_idx

    init = (jnp.full((Q_TILE,), jnp.float32(INVALID)),
            jnp.full((Q_TILE,), jnp.float32(INVALID)),
            jnp.full((Q_TILE,), -1, jnp.int32))
    best, second, idx = jax.lax.fori_loop(0, n_steps, step, init)
    pid = pl.program_id(0)
    best_ref[pid, :] = best.astype(jnp.int32)
    second_ref[pid, :] = second.astype(jnp.int32)
    idx_ref[pid, :] = idx


@functools.partial(jax.jit, static_argnames=())
def fused_hamming_nn(q_packed: jax.Array, db_packed: jax.Array,
                     gate: jax.Array):
    """Per-query best/second/argmin of gated Hamming distances.

    q_packed: (N, W) uint32; db_packed: (M, W) uint32; gate: (N, M) bool.
    N, M must be multiples of 128 (pad with gate=False rows/cols).
    Returns (best_idx (N,), best_d (N,), second_d (N,)) int32 with
    INVALID distances where fully gated.
    """
    from ..hamming import to_pm1

    n = q_packed.shape[0]
    m = db_packed.shape[0]
    # f32 +-1 operands: this mosaic toolchain rejects bf16 dot lhs
    # ("Bad lhs type"); +-1 f32 products stay exact on the MXU
    q_pm = to_pm1(q_packed, dtype=jnp.float32)          # (N, B)
    db_pm_t = to_pm1(db_packed, dtype=jnp.float32).T    # (B, M)
    gatef = gate.astype(jnp.float32)  # i8 vector compares unsupported on this target

    grid = (n // Q_TILE,)
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q_TILE, q_pm.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db_pm_t.shape[0], m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n // Q_TILE, Q_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n // Q_TILE, Q_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n // Q_TILE, Q_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.int32),
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.int32),
            jax.ShapeDtypeStruct((n // Q_TILE, Q_TILE), jnp.int32),
        ),
    )(q_pm, db_pm_t, gatef)
    best = best.reshape(n)
    second = second.reshape(n)
    idx = idx.reshape(n)
    idx = jnp.where(best >= INVALID, -1, idx)
    return idx, best, second
