"""Oriented binary descriptors: ORB / dBRIEF / mdBRIEF (pure XLA).

Behavioral spec: reference mdBRIEFextractorOct.cpp —
  - IC_Angle intensity-centroid orientation on a 31x31 circular patch
    (:221-248);
  - compute_ORB: rotate the learned pattern by the keypoint angle and
    compare blurred-image intensities (:303-354);
  - compute_dBRIEF: rotate the pattern in the UNDISTORTED image plane
    around the undistorted keypoint, re-distort every test point through
    the camera model, mean-center, round (:250-283, :356-408);
  - compute_mdBRIEF: dBRIEF + per-bit stability mask from patterns
    rotated +-20 degrees; mask bit = 1 iff both rotated tests agree with
    the nominal test (:410-554).

TPU-first design: all keypoints of a level are processed as one batch.
Each keypoint owns a PATCH x PATCH pixel window (one vmapped
dynamic-slice = one gather); pattern tests become a (K, 2*B) gather from
the flattened patches followed by a compare + bit-pack. The pattern
itself is OURS (deterministic Gaussian BRIEF pairs, ORB-style sigma) -
descriptors are framework-internal, so cross-implementation bit
compatibility is not required (and the reference's learned pattern is
licensed data we do not copy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .camera import CameraModel, distort_points
from .hamming import pack_bits_u32

HALF_PATCH = 15           # IC_Angle patch radius (31x31)
PATCH = 48                # descriptor sampling window (covers +-23 px)
PATCH_R = PATCH // 2


# ---------------------------------------------------------------------------
# Test-pair pattern
# ---------------------------------------------------------------------------

@functools.lru_cache()
def make_pattern(n_pairs: int = 512, seed: int = 20160901) -> np.ndarray:
    """(2*n_pairs, 2) int32 test points, BRIEF-II style: i.i.d. Gaussian
    sigma = patch/5, clipped to the radius-15 disc so any rotation stays
    inside the 31x31 window. Deterministic (fixed seed) - the pattern is
    part of the descriptor definition.
    """
    rng = np.random.default_rng(seed)
    pts = np.empty((2 * n_pairs, 2), np.int64)
    got = 0
    while got < 2 * n_pairs:
        cand = np.round(rng.normal(0.0, 31 / 5.0, (4 * n_pairs, 2))).astype(np.int64)
        ok = (cand[:, 0] ** 2 + cand[:, 1] ** 2) <= HALF_PATCH ** 2
        cand = cand[ok]
        take = min(len(cand), 2 * n_pairs - got)
        pts[got:got + take] = cand[:take]
        got += take
    return pts.astype(np.int32)


# ---------------------------------------------------------------------------
# Patch extraction
# ---------------------------------------------------------------------------

def extract_patches(img: jax.Array, yx: jax.Array, radius: int) -> jax.Array:
    """(K, 2r+1-ish, ...) patches centred at integer yx (K, 2) from
    (H, W) img. Uses vmapped dynamic_slice; corners clamp at borders
    (keypoints live >= border px inside, so clamping never distorts
    real extractions).
    """
    size = 2 * radius + 1

    def one(c):
        start = (c[0] - radius, c[1] - radius)
        return jax.lax.dynamic_slice(img, start, (size, size))

    return jax.vmap(one)(yx)


# ---------------------------------------------------------------------------
# Orientation (IC_Angle, mdBRIEFextractorOct.cpp:221-248)
# ---------------------------------------------------------------------------

@functools.lru_cache()
def _ic_weights() -> tuple[np.ndarray, np.ndarray]:
    """(31,31) u- and v-coordinate weights inside the circular patch."""
    v, u = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    # circular mask with the same per-row width rule as ORB's umax
    # (umax[v] = round(sqrt(r^2 - v^2)))
    umax = np.round(np.sqrt(HALF_PATCH ** 2 - np.arange(HALF_PATCH + 1) ** 2.0))
    inside = np.abs(u) <= umax[np.abs(v)]
    return (u * inside).astype(np.float32), (v * inside).astype(np.float32)


def ic_angle_patches(patches: jax.Array) -> jax.Array:
    """IC angle from pre-extracted RAW square patches (K, P, P) with
    P >= 31 (odd); uses the central 31x31 window."""
    p = patches.shape[-1]
    r = (p - 1) // 2
    lo, hi = r - HALF_PATCH, r + HALF_PATCH + 1
    wu, wv = _ic_weights()
    ctr = patches[:, lo:hi, lo:hi]                  # (K, 31, 31)
    m10 = jnp.einsum("kij,ij->k", ctr, jnp.asarray(wu))
    m01 = jnp.einsum("kij,ij->k", ctr, jnp.asarray(wv))
    return jnp.arctan2(m01, m10)


def ic_angle(img: jax.Array, yx: jax.Array) -> jax.Array:
    """Intensity-centroid angle (radians, [-pi, pi]) per keypoint.

    m10 = sum u*I, m01 = sum v*I over the circular 31x31 patch;
    angle = atan2(m01, m10).
    """
    return ic_angle_patches(extract_patches(img, yx, HALF_PATCH))


def blur_patches_valid(patches: jax.Array, size: int = 5) -> jax.Array:
    """'valid'-mode normalized box filter on (K, P, P) -> (K, P-s+1, P-s+1).

    Blurring per-keypoint patches instead of the whole canvas
    (pyramid.box_filter) computes only the pixels descriptors read
    (~2.6M vs ~6M for a 3-cam rig) and lets one RAW patch gather feed
    both IC_Angle and descriptor sampling. Interior values equal the
    full-image reflect-101 filter exactly (keypoints sit >= border px
    inside, so the reflected border is never touched).
    """
    out_w = patches.shape[-1] - size + 1
    acc_h = sum(patches[:, :, i:i + out_w] for i in range(size))
    acc = sum(acc_h[:, i:i + out_w, :] for i in range(size))
    return acc / (size * size)


# ---------------------------------------------------------------------------
# Descriptor sampling core
# ---------------------------------------------------------------------------

def _sample_patch_values(patches: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-keypoint pattern sampling as separable one-hot matmuls.

    patches: (K, P, P); offsets: (K, S, 2) int32 (dy, dx) relative to the
    patch centre. Returns (K, S) sampled values.

    TPU note: a fused double-gather (patch extraction + per-keypoint
    element gather) lowers to the scalar-gather path (~10 ms for 1.2M
    samples); expressing the row/column selection as one-hot bf16
    matmuls runs on the MXU instead (~4x faster end to end).

    Exactness contract: callers pass INTEGER-VALUED patches (the
    extractor rounds the blur output, matching the reference's CV_8U
    blurred level image, mdBRIEFextractorOct.cpp:1301). Integers
    0..255 are exact in bf16's 8 mantissa bits, so the one-hot matmul
    reproduces an exact gather bit-for-bit
    (tests/test_extraction.py::test_bf16_sampling_bit_exactness).
    Do NOT feed un-quantized blur values: their sub-integer residue
    (multiples of 1/25) is beyond bf16 and, worse, makes descriptor
    bits compare near-equal pixels on viewpoint-noise-level signal —
    measured to destabilize tracking end to end.
    """
    k, p, _ = patches.shape
    off = jnp.clip(offsets, -(p // 2) + 1, p // 2 - 1)
    ks = jnp.arange(p)
    oh_y = (off[..., 0:1] + p // 2 == ks[None, None, :]).astype(jnp.bfloat16)
    oh_x = (off[..., 1:2] + p // 2 == ks[None, None, :]).astype(jnp.bfloat16)
    rows = jnp.einsum("kbr,krc->kbc", oh_y, patches.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)   # (K, S, P)
    return jnp.einsum("kbc,kbc->kb", oh_x.astype(jnp.float32), rows)


def _sample_and_pack(patches: jax.Array, offsets: jax.Array) -> jax.Array:
    """patches: (K, P, P); offsets: (K, 2B, 2) int32 (dy, dx) pattern
    offsets relative to patch centre. Returns packed (K, B//32) uint32
    with bit b = I(p0_b) < I(p1_b) (LSB-first, reference byte layout).
    """
    vals = _sample_patch_values(patches, offsets)           # (K, 2B)
    bits = vals[:, 0::2] < vals[:, 1::2]
    return pack_bits_u32(bits)


def rotate_pattern_int(pattern_xy: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate integer pattern points by per-keypoint angle, cvRound.

    pattern_xy: (2B, 2) float (x, y); angle: (K,). Returns (K, 2B, 2)
    int32 as (dy, dx) offsets (compute_ORB rotation semantics
    mdBRIEFextractorOct.cpp:303-354: x' = x cos - y sin, y' = x sin + y cos).
    """
    ax, ay = jnp.cos(angle), jnp.sin(angle)
    x, y = pattern_xy[:, 0], pattern_xy[:, 1]
    xr = jnp.round(x[None] * ax[:, None] - y[None] * ay[:, None]).astype(jnp.int32)
    yr = jnp.round(x[None] * ay[:, None] + y[None] * ax[:, None]).astype(jnp.int32)
    return jnp.stack([yr, xr], -1)


def orb_from_patches(patches_blur: jax.Array, angle: jax.Array,
                     pattern: jax.Array) -> jax.Array:
    """ORB from pre-blurred patches (K, P, P) centred on the keypoint."""
    offsets = rotate_pattern_int(pattern.astype(jnp.float32), angle)
    return _sample_and_pack(patches_blur, offsets)


def compute_orb(img_blur: jax.Array, yx: jax.Array, angle: jax.Array,
                pattern: jax.Array) -> jax.Array:
    """Plain rotated-BRIEF (ORB) descriptors, (K, B//32) uint32."""
    return orb_from_patches(extract_patches(img_blur, yx, PATCH_R),
                            angle, pattern)


# ---------------------------------------------------------------------------
# dBRIEF / mdBRIEF (distortion-aware)
# ---------------------------------------------------------------------------

def distorted_pattern_offsets(cam: CameraModel, undist_kp: jax.Array,
                              pattern: jax.Array, angle: jax.Array) -> jax.Array:
    """Per-keypoint distorted pattern offsets (K, 2B, 2) int32 (dy, dx).

    rotateAndDistortPattern (mdBRIEFextractorOct.cpp:250-283): rotate the
    pattern by the keypoint angle in the undistorted plane, translate to
    the undistorted keypoint, push every point through the camera
    distortion, subtract the mean, round.
    """
    ax, ay = jnp.cos(angle), jnp.sin(angle)  # (K,)
    x, y = pattern[:, 0].astype(jnp.float32), pattern[:, 1].astype(jnp.float32)
    xr = x[None] * ax[:, None] - y[None] * ay[:, None] + undist_kp[:, 0:1]
    yr = x[None] * ay[:, None] + y[None] * ax[:, None] + undist_kp[:, 1:2]
    uv = distort_points(cam, jnp.stack([xr, yr], -1))  # (K, 2B, 2)
    uv = uv - jnp.mean(uv, axis=1, keepdims=True)
    uv = jnp.round(uv).astype(jnp.int32)
    return jnp.stack([uv[..., 1], uv[..., 0]], -1)  # (dy, dx)


def dbrief_from_patches(patches_blur: jax.Array, angle: jax.Array,
                        undist_kp: jax.Array, cam: CameraModel,
                        pattern: jax.Array) -> jax.Array:
    """dBRIEF from pre-blurred patches centred on the keypoint."""
    offsets = distorted_pattern_offsets(cam, undist_kp, pattern, angle)
    return _sample_and_pack(patches_blur, offsets)


def compute_dbrief(img_blur: jax.Array, yx: jax.Array, angle: jax.Array,
                   undist_kp: jax.Array, cam: CameraModel,
                   pattern: jax.Array) -> jax.Array:
    """Distortion-aware BRIEF, (K, B//32) uint32."""
    return dbrief_from_patches(extract_patches(img_blur, yx, PATCH_R),
                               angle, undist_kp, cam, pattern)


def mdbrief_from_patches(patches_blur: jax.Array, angle: jax.Array,
                         undist_kp: jax.Array, cam: CameraModel,
                         pattern: jax.Array) -> tuple[jax.Array, jax.Array]:
    """mdBRIEF (descriptor, stability mask) from pre-blurred patches."""
    rot = jnp.float32(np.deg2rad(20.0))

    def bits_at(a):
        off = distorted_pattern_offsets(cam, undist_kp, pattern, a)
        vals = _sample_patch_values(patches_blur, off)
        return vals[:, 0::2] < vals[:, 1::2]

    b0 = bits_at(angle)
    b1 = bits_at(angle + rot)
    b2 = bits_at(angle - rot)
    stable = (b1 == b0) & (b2 == b0)
    return pack_bits_u32(b0), pack_bits_u32(stable)


def compute_mdbrief(img_blur: jax.Array, yx: jax.Array, angle: jax.Array,
                    undist_kp: jax.Array, cam: CameraModel,
                    pattern: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(descriptor, stability mask) both (K, B//32) uint32.

    Mask bit b = 1 iff the bit-b test result at angle+-20deg equals the
    nominal result (mdBRIEFextractorOct.cpp:460-554).
    """
    return mdbrief_from_patches(extract_patches(img_blur, yx, PATCH_R),
                                angle, undist_kp, cam, pattern)
