"""Image pyramid + blur for feature extraction (pure XLA).

Behavioral spec: reference mdBRIEFextractorOct.cpp:1158-1201
(ComputePyramid: 8 levels, scale 1.2, bilinear resize) and :1301 (5x5
normalized box filter, BORDER_REFLECT_101) — re-designed as batched
tensor ops: the whole rig's images move through each level as ONE
(n_cams, H_l, W_l) array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def level_sizes(h: int, w: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    """Static per-level sizes: round(dim / scale^level), matching
    cv::resize(size * invScale) rounding (mdBRIEFextractorOct.cpp:1163)."""
    out = []
    for lvl in range(n_levels):
        inv = 1.0 / (scale ** lvl)
        out.append((int(round(h * inv)), int(round(w * inv))))
    return out


def scale_factors(n_levels: int, scale: float) -> list[float]:
    """mvScaleFactor: [1, s, s^2, ...] (mdBRIEFextractorOct.cpp:153-156)."""
    return [scale ** lvl for lvl in range(n_levels)]


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) dense weights for a 1-D antialiased linear resize.

    Reproduces ``jax.image.resize(method='linear')`` along one axis
    (half-pixel centers, triangle kernel scaled by the downsampling
    factor, out-of-range taps dropped and rows renormalized) as an
    explicit host-precomputed matrix, so a 2-D resize becomes two dense
    contractions — the shape the MXU wants. ``jax.image.resize`` builds
    equivalent weights on-device every call and lowers through
    gather-heavy code that measured 47% of extraction time; this is the
    same linear map as a constant-folded GEMM (max abs deviation ~0.01
    intensity on a 0..255 image across all pyramid levels).
    """
    scale = n_out / n_in
    kscale = min(scale, 1.0)                       # antialias when shrinking
    x = (np.arange(n_out) + 0.5) / scale - 0.5     # sample coords, input space
    u = (np.arange(n_in)[None, :] - x[:, None]) * kscale
    wmat = np.maximum(0.0, 1.0 - np.abs(u))
    wmat /= wmat.sum(axis=1, keepdims=True)
    return wmat.astype(np.float32)


def build_pyramid(images: jax.Array, n_levels: int, scale: float) -> list[jax.Array]:
    """(C, H, W) float32 -> list of (C, H_l, W_l) float32.

    Bilinear (half-pixel-centers, antialiased) resize like
    cv::INTER_LINEAR + prefilter. Each level is resized from the
    PREVIOUS level (cascaded, like the reference), which also improves
    antialiasing vs direct resize. Each cascade step is two dense
    matmuls with host-precomputed weights (see ``_resize_matrix``).
    """
    c, h, w = images.shape
    sizes = level_sizes(h, w, n_levels, scale)
    levels = [images]
    for lvl in range(1, n_levels):
        (hp, wp), (hl, wl) = sizes[lvl - 1], sizes[lvl]
        prev = levels[-1]
        mh = jnp.asarray(_resize_matrix(hp, hl))         # (hl, hp)
        mw = jnp.asarray(_resize_matrix(wp, wl).T)       # (wp, wl)
        t = jnp.matmul(prev, mw)                         # (c, hp, wl)
        levels.append(jnp.einsum("hH,cHw->chw", mh, t))  # (c, hl, wl)
    return levels


@functools.partial(jax.jit, static_argnames=("size",))
def box_filter(images: jax.Array, size: int = 5) -> jax.Array:
    """Normalized box filter with reflect-101 border on (..., H, W).

    Matches cv::boxFilter(..., Size(5,5), normalize=true,
    BORDER_REFLECT_101) (mdBRIEFextractorOct.cpp:1301). Separable:
    two 1-D window sums on the VPU.
    """
    r = size // 2
    x = jnp.pad(images, [(0, 0)] * (images.ndim - 2) + [(r, r), (r, r)], mode="reflect")
    # horizontal then vertical window-sum via shifted adds (size is tiny)
    acc_h = sum(x[..., :, i:i + images.shape[-1]] for i in range(size))
    acc = sum(acc_h[..., i:i + images.shape[-2], :] for i in range(size))
    return acc / (size * size)
