"""Binary descriptor Hamming distance as MXU popcount-GEMMs.

Behavioral spec: reference src/cORBmatcher.cpp:2439-2476 —
``DescriptorDistance64`` = popcount(xor) over packed 64-bit words, and
``DescriptorDistance64Masked`` = (popcount((a^b)&mask_a) +
popcount((a^b)&mask_b)) // 2. Thresholds scale with descriptor BYTES
(cORBmatcher.cpp:46-65): unmasked TH_HIGH=3*dim / TH_LOW=2*dim, masked
floor(1.5*dim) / floor(dim).

TPU-first design: instead of a scalar popcount loop, the full N x M
distance matrix is ONE matmul on the MXU. With descriptors as +-1
vectors ``s in {-1,+1}^B``:

    hamming(a, b) = (B - <s_a, s_b>) / 2

and the masked variant decomposes into two GEMMs plus row/col mask
popcounts:

    popcount((a^b) & m_a) = (|m_a| - <m_a * s_a, s_b>) / 2

Descriptors are stored packed as uint32 words (N, W); unpacking to
bfloat16 +-1 happens on the fly (cheap VPU work that XLA fuses into the
GEMM prologue). An exact integer XOR+popcount path is kept for golden
tests and small queries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INVALID = jnp.int32(0x7FFFFFFF)  # distance sentinel for masked-out pairs


def thresholds(desc_bytes: int, masked: bool) -> tuple[int, int]:
    """(TH_HIGH, TH_LOW) per cORBmatcher.cpp:52-64."""
    if masked:
        return int(np.floor(1.5 * desc_bytes)), int(np.floor(desc_bytes))
    return 3 * desc_bytes, 2 * desc_bytes


# ---------------------------------------------------------------------------
# Packing helpers
# ---------------------------------------------------------------------------

def pack_bits_u32(bits: jax.Array) -> jax.Array:
    """(..., B) {0,1} -> (..., B//32) uint32, little-endian bit order
    (bit k of word w = descriptor bit 32*w + k, matching byte-wise
    little-endian packing of the reference's cv::Mat rows)."""
    B = bits.shape[-1]
    assert B % 32 == 0
    b = bits.astype(jnp.uint32).reshape(*bits.shape[:-1], B // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits_u32(packed: jax.Array) -> jax.Array:
    """(..., W) uint32 -> (..., W*32) {0,1} int8."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 32).astype(jnp.int8)


def to_pm1(packed: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(..., W) packed -> (..., B) +-1 in ``dtype`` for MXU contraction."""
    bits = unpack_bits_u32(packed).astype(dtype)
    return 2.0 * bits - 1.0


# ---------------------------------------------------------------------------
# Distance matrices
# ---------------------------------------------------------------------------

def hamming_matrix_exact(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact (N, M) int32 Hamming via XOR+popcount (golden/reference path).

    a: (N, W) uint32, b: (M, W) uint32. Materializes (N, M, W) — use only
    for tests/small N*M.
    """
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, M) int32 Hamming distance matrix via one MXU GEMM.

    a: (N, W) uint32 packed, b: (M, W) uint32 packed. Exact: the +-1
    inner product of B-bit vectors is an integer in [-B, B], exactly
    representable in f32 for B <= 2^23 (we use f32 accumulation).
    """
    B = a.shape[-1] * 32
    sa = to_pm1(a)
    sb = to_pm1(b)
    ip = jax.lax.dot_general(
        sa, sb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return ((B - ip) * 0.5).astype(jnp.int32)


def hamming_matrix_masked(a: jax.Array, b: jax.Array,
                          mask_a: jax.Array, mask_b: jax.Array) -> jax.Array:
    """(N, M) int32 masked Hamming (cORBmatcher.cpp:2455-2476 semantics):
    (popcount((a^b)&m_a) + popcount((a^b)&m_b)) // 2, as two MXU GEMMs.

    popcount((a^b)&m) with m fixed per-row:
      = sum_k m_k * (a_k != b_k)
      = sum_k m_k * (1 - s_a s_b)/2  = (|m| - <m*s_a, s_b>) / 2
    """
    sa = to_pm1(a)
    sb = to_pm1(b)
    ma = unpack_bits_u32(mask_a).astype(jnp.bfloat16)
    mb = unpack_bits_u32(mask_b).astype(jnp.bfloat16)
    na = jnp.sum(ma.astype(jnp.float32), -1)  # |m_a| per row   (N,)
    nb = jnp.sum(mb.astype(jnp.float32), -1)  # |m_b| per row   (M,)
    ip_a = jax.lax.dot_general(ma * sa, sb, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ip_b = jax.lax.dot_general(sa, mb * sb, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    cnt_a = (na[:, None] - ip_a) * 0.5
    cnt_b = (nb[None, :] - ip_b) * 0.5
    return ((cnt_a + cnt_b) * 0.5).astype(jnp.int32)  # int division by 2


def hamming_matrix_masked_exact(a, b, mask_a, mask_b):
    """Exact integer masked distance for golden tests."""
    x = a[:, None, :] ^ b[None, :, :]
    da = jnp.sum(jax.lax.population_count(x & mask_a[:, None, :]), -1)
    db = jnp.sum(jax.lax.population_count(x & mask_b[None, :, :]), -1)
    return ((da + db) // 2).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Gated nearest-neighbour matching — the one kernel behind all ~9 search
# modes of cORBmatcher (SURVEY.md §7.3): candidate gating becomes masking
# of the distance matrix.
# ---------------------------------------------------------------------------

def masked_argmin2(dist: jax.Array, valid: jax.Array):
    """Per-row best & second-best over a gated distance matrix.

    dist: (N, M) int32; valid: (N, M) bool. Returns (best_idx, best_d,
    second_d) with INVALID distances where gated out. One pass, no sort.
    """
    d = jnp.where(valid, dist, INVALID)
    best_idx = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(INVALID)
    second_d = jnp.min(d2, axis=1)
    return best_idx.astype(jnp.int32), best_d, second_d


def gated_nn_match(dist: jax.Array, valid: jax.Array, *,
                   max_dist: int, nn_ratio: float | None = None,
                   mutual: bool = False):
    """Generic gated nearest-neighbour matching.

    Implements the shared core of the reference's search modes
    (cORBmatcher.cpp:67-166 SearchByProjection ratio test,
    :326-473 WindowSearch NN-ratio + TH gate, :179-323 SearchByBoW):
      - ``valid`` encodes ALL gating (grid radius, scale window, frustum,
        vocabulary node, same-camera restriction) as a boolean matrix;
      - best match per row with distance <= max_dist;
      - optional Lowe ratio test best < ratio * second;
      - optional mutual (cross-check) consistency.

    Returns (match_idx (N,) int32 with -1 for no match, best_d (N,)).
    """
    best_idx, best_d, second_d = masked_argmin2(dist, valid)
    ok = best_d <= max_dist
    if nn_ratio is not None:
        ok &= best_d.astype(jnp.float32) < nn_ratio * second_d.astype(jnp.float32)
    if mutual:
        dT = jnp.where(valid, dist, INVALID)
        col_best = jnp.argmin(dT, axis=0).astype(jnp.int32)  # (M,)
        ok &= col_best[best_idx] == jnp.arange(dist.shape[0], dtype=jnp.int32)
    return jnp.where(ok, best_idx, -1), best_d


def resolve_duplicate_targets(match_idx: jax.Array, best_d: jax.Array, m: int):
    """Keep only the lowest-distance row per matched column (the
    reference erases a previous match when a better one lands on the
    same target, e.g. cORBmatcher WindowSearch / SearchForInitialization).

    Returns match_idx with losers set to -1.
    """
    n = match_idx.shape[0]
    valid = match_idx >= 0
    cols = jnp.where(valid, match_idx, m)  # m = dump slot
    # min distance per column
    col_min = jnp.full((m + 1,), INVALID, best_d.dtype).at[cols].min(best_d)
    # winner = row achieving the min; break ties by lowest row index
    rows = jnp.arange(n, dtype=jnp.int32)
    is_min = valid & (best_d == col_min[cols])
    win_row = jnp.full((m + 1,), n, jnp.int32).at[cols].min(jnp.where(is_min, rows, n))
    keep = valid & (win_row[cols] == rows)
    return jnp.where(keep, match_idx, -1)
