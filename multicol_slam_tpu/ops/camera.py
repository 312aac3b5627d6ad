"""Scaramuzza omnidirectional camera model, vectorized for TPU.

Behavioral spec: reference include/cam_model_omni.h + src/cam_model_omni.cpp
(ImgToWorld :29-87, WorldToImg :90-161, mirror masks :181-220,
undistort/distortPointsOcam cam_model_omni.h:127-145).

Design: the camera is a pytree of arrays (``CameraModel``) so a whole rig
stacks into one batched CameraModel (leading camera axis) and a full
MultiFrame projects in ONE fused XLA call — no per-camera host loop.
Polynomials are zero-padded to fixed static lengths (POLY_PAD/INVPOLY_PAD)
so heterogeneous rigs still batch.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import horner

# Static padded polynomial sizes. Lafida uses deg-5 forward (a0..a4) and
# 12-coefficient inverse polys (reference cSystem.cpp:148-155).
POLY_PAD = 8
INVPOLY_PAD = 16
# Per-pyramid-level mirror mask radius offsets (cam_model_omni.cpp:193).
MIRROR_OFFSETS = (22.0, 10.0, 5.0, 1.0)


class CameraModel(NamedTuple):
    """Scaramuzza model parameters as a pytree; batches over leading dims.

    17 optimizable params per camera: [c, d, e, u0, v0, invP(12)]
    (cam_model_omni.h:189-221 toVector).
    """

    c: jax.Array          # affine c
    d: jax.Array          # affine d
    e: jax.Array          # affine e
    u0: jax.Array         # principal point x
    v0: jax.Array         # principal point y
    poly: jax.Array       # (..., POLY_PAD) forward poly a_i, zero padded
    inv_poly: jax.Array   # (..., INVPOLY_PAD) inverse poly, zero padded
    width: jax.Array      # image width (float, static per camera)
    height: jax.Array     # image height
    # per-camera mirrorMask flag (Camera.mirrorMask in the calibration,
    # cSystem.cpp:164-171): 1.0 = fisheye circle applies (frustum gating
    # + extraction masks use the analytic v0+22 circle), 0.0 = full
    # image is valid. Float so the pytree stays homogeneous.
    mirror: jax.Array = np.float32(1.0)

    @property
    def inv_affine(self) -> jax.Array:
        return self.c - self.d * self.e

    @property
    def p1(self) -> jax.Array:
        """First forward poly coefficient a0 (cam_model_omni.h:100)."""
        return self.poly[..., 0]

    def to_vector17(self) -> jax.Array:
        """[c,d,e,u0,v0,invP(12)] — the BA intrinsics vector (h:189-204)."""
        return jnp.concatenate(
            [
                jnp.stack([self.c, self.d, self.e, self.u0, self.v0], -1),
                self.inv_poly[..., :12],
            ],
            -1,
        )

    def with_vector17(self, v: jax.Array) -> "CameraModel":
        inv_poly = self.inv_poly.at[..., :12].set(v[..., 5:17])
        return self._replace(
            c=v[..., 0], d=v[..., 1], e=v[..., 2], u0=v[..., 3], v0=v[..., 4],
            inv_poly=inv_poly,
        )


def make_camera(c, d, e, u0, v0, poly, inv_poly, width, height,
                dtype=jnp.float32, mirror: bool = True) -> CameraModel:
    """Build a CameraModel from python/numpy scalars + coefficient lists.

    Fields are NUMPY arrays: calibration is static host data; keeping it
    off-device avoids dozens of tiny host<->device transfers at load
    time (JAX converts leaves at trace time, where they become jit
    constants anyway).
    """
    p = np.zeros(POLY_PAD, np.float64)
    p[: len(poly)] = np.asarray(poly, np.float64)
    ip = np.zeros(INVPOLY_PAD, np.float64)
    ip[: len(inv_poly)] = np.asarray(inv_poly, np.float64)
    arr = lambda x: np.asarray(x, dtype)
    return CameraModel(
        c=arr(c), d=arr(d), e=arr(e), u0=arr(u0), v0=arr(v0),
        poly=arr(p), inv_poly=arr(ip), width=arr(width), height=arr(height),
        mirror=arr(1.0 if mirror else 0.0),
    )


def stack_cameras(cams: Sequence[CameraModel]) -> CameraModel:
    """Stack N CameraModels into one batched CameraModel (leading axis N)."""
    return jax.tree.map(lambda *xs: np.stack(xs, 0), *cams)


def scale_camera(cam: CameraModel, k: float) -> CameraModel:
    """Rescale a Scaramuzza camera to a k-times-smaller/larger image.

    Pixel coordinates about the principal point scale by ``k``
    (rho' = k*rho), so the rays stay identical when the forward poly
    transforms as a_i' = a_i * k^(1-i) (z' = k*f(rho'/k) keeps the
    direction (x', y', z') parallel to (x, y, z)) and the inverse poly
    simply scales by k (rho' = k*horner(invP, theta)). The affine
    c/d/e stay put since they act on the already-scaled distorted
    coordinates. Used to render cheap low-resolution synthetic
    sequences through a geometrically exact version of the real
    calibration (cam_model_omni.cpp:29-161 is resolution-agnostic).
    """
    k = float(k)
    poly = np.asarray(cam.poly, np.float64).copy()
    exps = np.arange(poly.shape[-1], dtype=np.float64)
    poly = poly * k ** (1.0 - exps)
    dtype = np.asarray(cam.c).dtype
    arr = lambda x: np.asarray(x, dtype)
    return cam._replace(
        u0=arr(np.asarray(cam.u0, np.float64) * k),
        v0=arr(np.asarray(cam.v0, np.float64) * k),
        poly=arr(poly),
        inv_poly=arr(np.asarray(cam.inv_poly, np.float64) * k),
        width=arr(np.rint(np.asarray(cam.width, np.float64) * k)),
        height=arr(np.rint(np.asarray(cam.height, np.float64) * k)),
    )


# ---------------------------------------------------------------------------
# Projection / unprojection  (cam_model_omni.cpp:29-161)
# ---------------------------------------------------------------------------

def img_to_world(cam: CameraModel, uv: jax.Array) -> jax.Array:
    """Pixel (..., 2) -> unit bearing ray (..., 3) (cam_model_omni.cpp:49-67).

    ``cam`` leading dims broadcast against ``uv`` leading dims.
    """
    u_t = uv[..., 0] - cam.u0
    v_t = uv[..., 1] - cam.v0
    inv_aff = cam.inv_affine
    x = (u_t - cam.d * v_t) / inv_aff
    y = (-cam.e * u_t + cam.c * v_t) / inv_aff
    rho = jnp.sqrt(x * x + y * y)
    z = -horner(cam.poly, rho)
    X = jnp.stack([x, y, z], -1)
    return X / jnp.linalg.norm(X, axis=-1, keepdims=True)


def world_to_img(cam: CameraModel, X: jax.Array) -> jax.Array:
    """Camera-frame point (..., 3) -> pixel (..., 2) (cam_model_omni.cpp:146-161)."""
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    norm = jnp.sqrt(x * x + y * y)
    norm = jnp.where(norm == 0.0, 1e-14, norm)
    theta = jnp.arctan2(-z, norm)  # atan(-z/norm); norm>0 so equivalent
    rho = horner(cam.inv_poly, theta)
    uu = x / norm * rho
    vv = y / norm * rho
    u = uu * cam.c + vv * cam.d + cam.u0
    v = uu * cam.e + vv + cam.v0
    return jnp.stack([u, v], -1)


def undistort_points(cam: CameraModel, uv: jax.Array, scale) -> jax.Array:
    """Pixel -> ideal-plane point: -x/z*s, -y/z*s (cam_model_omni.h:127-138).

    ``cam`` fields must broadcast against ``uv[..., 0]`` (vmap over the
    camera axis for batched rigs); ``scale`` is a broadcastable scalar.
    """
    X = img_to_world(cam, uv)
    return -X[..., :2] / X[..., 2:3] * scale


def distort_points(cam: CameraModel, xy: jax.Array) -> jax.Array:
    """Ideal-plane point -> pixel: WorldToImg(x, y, -p1) (cam_model_omni.h:140-145)."""
    z = jnp.broadcast_to(-cam.p1, xy[..., 0].shape)
    X = jnp.stack([xy[..., 0], xy[..., 1], z], -1)
    return world_to_img(cam, X)


# ---------------------------------------------------------------------------
# Mirror masks  (cam_model_omni.cpp:163-220)
# ---------------------------------------------------------------------------

def make_mirror_masks(cam_u0: float, cam_v0: float, width: int, height: int,
                      n_levels: int = 4) -> list[np.ndarray]:
    """Per-pyramid-level circular masks (uint8 0/255), replicating the
    reference exactly — including its u0/v0 swap: the mask center is
    (row=Get_v0, col=Get_u0) and radius Get_v0 + offset
    (cam_model_omni.cpp:185-217). Levels halve via pyrDown size rule.
    """
    masks = []
    u0 = float(cam_v0)  # reference swaps: u0 := Get_v0 (cam_model_omni.cpp:187)
    v0 = float(cam_u0)
    w, h = int(width), int(height)
    for lvl in range(n_levels):
        if lvl != 0:
            # cv::buildPyramid size rule: (w+1)//2
            w = (w + 1) // 2
            h = (h + 1) // 2
            u0 = float(np.ceil(u0 / 2.0))
            v0 = float(np.ceil(v0 / 2.0))
        ii, jj = np.mgrid[0:h, 0:w].astype(np.float32)
        ans = np.sqrt((ii - u0) ** 2 + (jj - v0) ** 2)
        masks.append(np.where(ans < (u0 + MIRROR_OFFSETS[min(lvl, 3)]), 255, 0).astype(np.uint8))
    return masks


def make_extraction_masks(cam_u0: float, cam_v0: float, width: int, height: int,
                          n_levels: int, scale: float) -> list[np.ndarray]:
    """Mirror masks at EXTRACTION pyramid sizes (scale-1.2 levels).

    The reference resizes the level-0 mirror mask together with the
    image pyramid inside the extractor (mvMaskPyramid,
    mdBRIEFextractorOct.cpp:1158-1201); analytically that is the level-0
    circle (center swapped per CreateMirrorMask quirk, radius
    Get_v0 + 22) scaled by 1/scale^level.
    """
    from .pyramid import level_sizes  # local import to avoid cycle

    cy = float(cam_v0)  # reference swap (cam_model_omni.cpp:187-188)
    cx = float(cam_u0)
    r0 = cy + MIRROR_OFFSETS[0]
    masks = []
    for lvl, (h, w) in enumerate(level_sizes(height, width, n_levels, scale)):
        s = 1.0 / (scale ** lvl)
        ii, jj = np.mgrid[0:h, 0:w].astype(np.float32)
        d = np.sqrt((ii - cy * s) ** 2 + (jj - cx * s) ** 2)
        masks.append((d < r0 * s).astype(np.uint8) * 255)
    return masks


def is_in_mirror_mask(mask: jax.Array, uv: jax.Array) -> jax.Array:
    """Vectorized isPointInMirrorMask (cam_model_omni.cpp:163-178).

    ``mask`` is (H, W) uint8; ``uv`` is (..., 2) pixel coords. Rounds like
    cvRound (round-half-to-even), requires 0 < u < W, 0 < v < H and
    mask > 0.
    """
    h, w = mask.shape
    ur = jnp.round(uv[..., 0]).astype(jnp.int32)
    vr = jnp.round(uv[..., 1]).astype(jnp.int32)
    in_bounds = (ur > 0) & (ur < w) & (vr > 0) & (vr < h)
    urc = jnp.clip(ur, 0, w - 1)
    vrc = jnp.clip(vr, 0, h - 1)
    return in_bounds & (mask[vrc, urc] > 0)
