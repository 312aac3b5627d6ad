"""Dense FAST-9/16 corner detection + spatially-uniform selection (XLA).

Behavioral spec: reference mdBRIEFextractorOct.cpp:863-976
(ComputeKeyPointsOctTree: cv::FAST threshold 20 per 30x30 cell with
threshold-5 fallback, inside the mirror mask, 25px border) and :631-861
(DistributeOctTree: spatially-uniform best-response selection).

TPU-first re-design: instead of per-cell scalar FAST + a pointer-based
octree, we compute a DENSE corner-score map for the whole image (16
shifted views - pure VPU), apply 3x3 non-max suppression, reproduce the
cell-fallback semantics with windowed reductions, and select spatially
uniform keypoints with a bucketed top-k (best corner per bucket, then
top-K buckets) - an O(HW) data-parallel equivalent of the octree's
"subdivide until enough cells, keep best per cell" behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, OpenCV pixel order (clockwise from top).
# (dy, dx) offsets.
CIRCLE = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], np.int32)

# AGAST pixel masks (the reference exposes fastAgastType 0..3,
# mdBRIEFextractorOct.cpp:863-950 via cv::AgastFeatureDetector):
# 5_8 (radius-1.5 8-ring, arc 5) and 7_12 (radius-2 12-ring, arc 7).
CIRCLE_12 = np.array([
    (-2, 0), (-2, 1), (-1, 2), (0, 2), (1, 2), (2, 1),
    (2, 0), (2, -1), (1, -2), (0, -2), (-1, -2), (-2, -1),
], np.int32)
CIRCLE_8 = np.array([
    (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1),
], np.int32)

# mask name -> (circle, arc length, border radius)
DETECTOR_MASKS = {
    "fast_9_16": (CIRCLE, 9, 3),
    "agast_7_12": (CIRCLE_12, 7, 2),
    "agast_5_8": (CIRCLE_8, 5, 1),
}

BORDER = 3  # max circle radius


def _shifted_views(img: jax.Array, circle: np.ndarray,
                   border: int) -> list[jax.Array]:
    """The ring neighbours of every pixel as a PYTHON LIST of (H, W)
    static slices — keeping them unstacked lets XLA fuse the whole
    score computation into one pointwise pass with no (N, H, W)
    intermediates in HBM (a stacked version is ~4x slower)."""
    h, w = img.shape
    pad = jnp.pad(img, border, mode="edge")
    return [pad[border + dy: border + dy + h, border + dx: border + dx + w]
            for dy, dx in circle]


def _ring_min_arc(x: list[jax.Array], arc: int) -> list[jax.Array]:
    """out[k] = min(x[k..k+arc-1] mod N), via log-step list rotations."""
    n = len(x)
    cur = x
    width = 1
    while 2 * width <= arc:
        cur = [jnp.minimum(cur[k], cur[(k + width) % n]) for k in range(n)]
        width *= 2
    rest = arc - width
    if rest:
        partial = _ring_min_arc(x, rest)
        cur = [jnp.minimum(cur[k], partial[(k + width) % n])
               for k in range(n)]
    return cur


def fast_score(img: jax.Array, threshold: float,
               mask: str = "fast_9_16") -> jax.Array:
    """Dense segment-test corner score map (H, W) float32; 0 where not a
    corner. ``mask`` selects the pixel ring + arc: fast_9_16 (cv::FAST),
    agast_7_12 or agast_5_8 (the reference's AGAST options).

    Score = max over arcs of min(d) for bright / min(-d) for dark, minus
    1 (cv::FAST cornerScore semantics): the largest threshold at which
    the pixel remains a corner.
    """
    circle, arc, border = DETECTOR_MASKS[mask]
    views = _shifted_views(img, circle, border)
    d = [v - img for v in views]
    dn = [-v for v in d]
    bright = functools.reduce(jnp.maximum, _ring_min_arc(d, arc))
    dark = functools.reduce(jnp.maximum, _ring_min_arc(dn, arc))
    score = jnp.maximum(bright, dark) - 1.0
    return jnp.where(score >= threshold, score, 0.0)


def harris_score(img: jax.Array, block: int = 7, k: float = 0.04) -> jax.Array:
    """Dense Harris response (ORB HarrisResponses semantics:
    mdBRIEFextractorOct.cpp HarrisResponses - 7x7 block, k=0.04,
    Sobel-free central differences scaled like OpenCV's harris in ORB)."""
    dx = (jnp.pad(img, ((0, 0), (0, 2)), mode="edge")[:, 2:]
          - jnp.pad(img, ((0, 0), (2, 0)), mode="edge")[:, :-2]) * 0.5
    dy = (jnp.pad(img, ((2, 0), (0, 0)), mode="edge")[:-2, :]
          - jnp.pad(img, ((0, 2), (0, 0)), mode="edge")[2:, :]) * -0.5
    r = block // 2

    def bsum(x):
        xp = jnp.pad(x, r, mode="constant")
        acc_h = sum(xp[:, i:i + x.shape[1]] for i in range(block))
        return sum(acc_h[i:i + x.shape[0], :] for i in range(block))

    a, b, c = bsum(dx * dx), bsum(dx * dy), bsum(dy * dy)
    scale = (1.0 / (4 * 255.0 * block)) ** 2  # ORB's 1/(4*blockSize*255) per-deriv scale
    return (a * c - b * b - k * (a + c) ** 2) * (scale * scale)


def nonmax_3x3(score: jax.Array) -> jax.Array:
    """Keep only strict 3x3 local maxima (ties keep the first in raster
    order via epsilon index bias, mirroring cv::FAST nonmax)."""
    h, w = score.shape
    p = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    neigh = jnp.stack([p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                       if not (dy == 0 and dx == 0)], 0)
    is_max = score >= jnp.max(neigh, 0)
    # break plateau ties: keep only the first pixel in raster order by
    # requiring strict > over the 4 raster-earlier neighbours
    earlier = jnp.stack([p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                         for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1))], 0)
    is_max &= score > jnp.max(earlier, 0)
    return jnp.where(is_max, score, 0.0)


def _window_any(x: jax.Array, cell: int) -> jax.Array:
    """Per-cell 'has any nonzero', broadcast back to pixels. x: (H, W)."""
    h, w = x.shape
    hp = -(-h // cell) * cell
    wp = -(-w // cell) * cell
    xp = jnp.pad(x, ((0, hp - h), (0, wp - w)))
    cells = xp.reshape(hp // cell, cell, wp // cell, cell)
    has = jnp.max(cells, axis=(1, 3)) > 0
    back = jnp.repeat(jnp.repeat(has, cell, 0), cell, 1)
    return back[:h, :w]


def fast_with_fallback(img: jax.Array, th_hi: float, th_lo: float,
                       cell: int = 30, mask: str = "fast_9_16") -> jax.Array:
    """FAST/AGAST th_hi per cell, falling back to th_lo in cells with no
    th_hi corner (mdBRIEFextractorOct.cpp:905-940 semantics), then NMS."""
    s_lo = fast_score(img, th_lo, mask)      # superset
    s_hi = jnp.where(s_lo >= th_hi, s_lo, 0.0)
    use_hi = _window_any(s_hi, cell)
    return nonmax_3x3(jnp.where(use_hi, s_hi, s_lo))


@functools.partial(jax.jit, static_argnames=("k", "bucket", "border"))
def select_uniform_topk(score: jax.Array, mask: jax.Array, k: int,
                        bucket: int, border: int = 16):
    """Spatially-uniform top-k corner selection (octree-equivalent).

    1. zero scores outside ``mask`` and within ``border`` px of the edge;
    2. keep only the best corner in each bucket x bucket tile (the
       octree's "one keypoint per leaf");
    3. global top-k over surviving corners by response.

    Returns (yx (k, 2) int32, resp (k,) f32, valid (k,) bool).
    """
    h, w = score.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = ((yy >= border) & (yy < h - border)
                 & (xx >= border) & (xx < w - border))
    s = jnp.where(mask & in_border, score, 0.0)

    # best-per-bucket (the octree's "one keypoint per leaf"), then
    # top-k over the BUCKET array — O(HW) reduce + O(#buckets) top_k
    # instead of a full-image sort. bucket count ~ 3k by construction,
    # so the budget is almost never starved (matching the octree, which
    # keeps everything when it runs out of cells to split).
    hp = -(-h // bucket) * bucket
    wp = -(-w // bucket) * bucket
    sp = jnp.pad(s, ((0, hp - h), (0, wp - w)))
    nby, nbx = hp // bucket, wp // bucket
    tiles = sp.reshape(nby, bucket, nbx, bucket).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(nby * nbx, bucket * bucket)
    bvals = jnp.max(tiles, axis=1)                  # (B,)
    bargs = jnp.argmax(tiles, axis=1)               # first max in raster order

    kk = min(k, nby * nbx)
    resp, bidx = jax.lax.top_k(bvals, kk)
    within = bargs[bidx]
    by, bx = bidx // nbx, bidx % nbx
    dy, dx = within // bucket, within % bucket
    yx = jnp.stack([by * bucket + dy, bx * bucket + dx], -1).astype(jnp.int32)
    valid = resp > 0
    if kk < k:   # pad to the static budget
        pad = k - kk
        yx = jnp.concatenate([yx, jnp.zeros((pad, 2), jnp.int32)], 0)
        resp = jnp.concatenate([resp, jnp.zeros((pad,), resp.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0)
    return yx, resp, valid
