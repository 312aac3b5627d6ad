"""MultiFrame feature extraction: the TPU re-design of mdBRIEFextractorOct
+ cMultiFrame's per-camera OpenMP fan-out.

Reference behavior (mdBRIEFextractorOct.cpp, cMultiFrame.cpp:92-216):
8-level 1.2x pyramid per camera; FAST th=20 (fallback 5) in 30px cells
inside the mirror mask; octree-style uniform selection down to
n_features distributed geometrically across levels (:158-180); IC_Angle
orientation; 5x5 box blur; ORB or dBRIEF/mdBRIEF descriptors; every
keypoint lifted to a unit bearing ray via the camera model
(cMultiFrame.cpp:143-152).

TPU-first: ONE jitted function maps (n_cams, H, W) images -> padded
Features pytree. Cameras are a vmapped batch axis (the reference's
"one OpenMP thread per camera" becomes a tensor dimension); levels are
an unrolled static loop (shapes differ per level); every stage is a
dense batched op from ops/ (no per-keypoint host code at all).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import brief, fast, pyramid
from ..ops.camera import CameraModel, img_to_world, undistort_points


class ExtractorConfig(NamedTuple):
    n_features: int = 400          # per camera (extractor.nFeatures)
    scale_factor: float = 1.2      # extractor.scaleFactor
    n_levels: int = 8              # extractor.nLevels
    fast_th: int = 20              # extractor.fastTh
    fast_th_min: int = 5           # per-cell fallback threshold
    desc_bytes: int = 32           # extractor.descSize (16/32/64)
    use_dbrief: bool = False       # extractor.usemdBRIEF -> dBRIEF path
    learn_masks: bool = False      # extractor.masks -> mdBRIEF masks
    cell: int = 30                 # FAST fallback cell size
    border: int = 26               # keypoint-free border (EDGE_THRESHOLD;
    #                                >= descriptor window 23 + blur 2)
    detector_mask: str = "fast_9_16"  # fast_9_16 | agast_7_12 | agast_5_8
    #                                   (extractor.useAgast/fastAgastType)
    use_harris: bool = False       # extractor.nScoreType 0 -> Harris rank

    @property
    def n_pairs(self) -> int:
        return 8 * self.desc_bytes

    @property
    def n_words(self) -> int:
        return self.desc_bytes // 4


def features_per_level(n_features: int, n_levels: int, scale: float) -> list[int]:
    """Geometric distribution of the feature budget across levels
    (mdBRIEFextractorOct.cpp:168-180): level l gets ~ n*(1-f)/(1-f^L)*f^l
    (f = 1/scale), remainder to the last level."""
    f = 1.0 / scale
    per = n_features * (1 - f) / (1 - f ** n_levels)
    out, acc = [], 0
    for _ in range(n_levels - 1):
        k = int(round(per))
        out.append(k)
        acc += k
        per *= f
    out.append(max(n_features - acc, 0))
    return out


class Features(NamedTuple):
    """Padded per-camera features. All arrays lead with (n_cams, K).

    K = sum of per-level budgets = config.n_features; invalid slots are
    masked by ``valid``. This is the device-resident half of the
    reference's cMultiFrame (keypoints/descriptors/rays); global
    bookkeeping (keypoint_to_cam flattening) is just reshape here.
    """

    xy: jax.Array          # (C, K, 2) float32 level-0 pixel coords
    level: jax.Array       # (C, K) int32 pyramid level
    angle: jax.Array       # (C, K) float32 orientation (radians)
    response: jax.Array    # (C, K) float32 corner response
    ray: jax.Array         # (C, K, 3) float32 unit bearing ray (camera frame)
    desc: jax.Array        # (C, K, W) uint32 packed descriptor
    desc_mask: jax.Array   # (C, K, W) uint32 packed stability mask (mdBRIEF)
    valid: jax.Array       # (C, K) bool

    @property
    def n_cams(self) -> int:
        return self.xy.shape[0]

    @property
    def k_per_cam(self) -> int:
        return self.xy.shape[1]


def _level_buckets(h: int, w: int, k: int) -> int:
    """Bucket edge so that #buckets ~ 3k (octree 'enough leaves' rule)."""
    if k <= 0:
        return 16
    b = int(np.sqrt(h * w / (3.0 * k)))
    return max(8, min(64, b))


def make_extractor(cfg: ExtractorConfig, cams: CameraModel,
                   mirror_masks: Sequence[np.ndarray], image_hw: tuple[int, int]):
    """Build the jitted extraction fn for a rig.

    cams: batched CameraModel (leading dim n_cams).
    mirror_masks: per level, (n_cams, H_l, W_l) uint8 arrays.
    Returns extract(images: (n_cams, H, W) uint8/float32) -> Features.
    """
    h, w = image_hw
    sizes = pyramid.level_sizes(h, w, cfg.n_levels, cfg.scale_factor)
    scales = pyramid.scale_factors(cfg.n_levels, cfg.scale_factor)
    budgets = features_per_level(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    # keep static data as numpy: it becomes a jit constant at trace time
    # (eager jnp.asarray would cost one host->device round trip each)
    pattern = brief.make_pattern(cfg.n_pairs)
    masks = [np.asarray(m) > 0 for m in mirror_masks]
    assert len(masks) >= cfg.n_levels, "need a mirror mask per pyramid level"

    # Canvas layout: all pyramid levels of one camera stacked vertically
    # (padded to W0), so orientation + descriptor sampling for ALL
    # levels run as ONE batched gather pass instead of n_levels small
    # dispatches. Keypoints sit >= border(24) px inside each level, so
    # patch windows (<= +-23) never cross a level seam.
    w0 = sizes[0][1]
    row_off = []
    acc = 0
    for (hl, wl) in sizes:
        row_off.append(acc)
        acc += hl
    canvas_h = acc

    def extract_one_cam(images_lvls, masks_lvls, cam: CameraModel):
        """images_lvls: tuple of (H_l, W_l) float32 for ONE camera."""
        per_level = []
        canvas_rows = []
        for lvl in range(cfg.n_levels):
            img = images_lvls[lvl]
            hl, wl = sizes[lvl]
            canvas_rows.append(jnp.pad(img, ((0, 0), (0, w0 - wl))))
            k_l = budgets[lvl]
            if k_l == 0:
                continue
            score = fast.fast_with_fallback(img, cfg.fast_th, cfg.fast_th_min,
                                            cfg.cell, cfg.detector_mask)
            if cfg.use_harris:
                # rank corners by Harris response (nScoreType 0; ORB's
                # HarrisResponses re-scoring)
                score = jnp.where(score > 0, fast.harris_score(img) + 1e-6,
                                  0.0)
            yx, resp, valid = fast.select_uniform_topk(
                score, masks_lvls[lvl], k=k_l,
                bucket=_level_buckets(hl, wl, k_l), border=cfg.border)
            per_level.append((lvl, yx, resp, valid))
        canvas = jnp.concatenate(canvas_rows, 0)          # (canvas_h, w0)

        # flatten all levels' keypoints into canvas coordinates
        yx_canvas = jnp.concatenate(
            [yx + jnp.asarray([row_off[lvl], 0], jnp.int32)
             for lvl, yx, _, _ in per_level], 0)           # (K, 2)
        resp = jnp.concatenate([r for _, _, r, _ in per_level], 0)
        valid = jnp.concatenate([v for _, _, _, v in per_level], 0)
        level = jnp.concatenate(
            [jnp.full((yx.shape[0],), lvl, jnp.int32)
             for lvl, yx, _, _ in per_level], 0)
        scale_per_kp = jnp.asarray(scales, jnp.float32)[level]
        xy_lvl = jnp.stack([yx_canvas[:, 1],
                            yx_canvas[:, 0]
                            - jnp.asarray(row_off, jnp.int32)[level]], -1)
        xy_full = xy_lvl.astype(jnp.float32) * scale_per_kp[:, None]

        # ONE raw patch gather feeds both orientation and descriptors:
        # IC_Angle reads the raw center 31x31; the 5x5 box blur runs
        # per-patch ('valid' mode — exactly the interior of the
        # reference's full-image boxFilter, mdBRIEFextractorOct.cpp:1301)
        # so only pixels the descriptors actually read are ever blurred.
        patches_raw = brief.extract_patches(canvas, yx_canvas,
                                            brief.PATCH_R + 2)   # (K,53,53)
        angle = brief.ic_angle_patches(patches_raw)
        # quantize the blur output to integers: the reference blurs the
        # CV_8U level image, so its descriptor comparisons see uint8
        # values (mdBRIEFextractorOct.cpp:1301). Beyond parity this is
        # what makes the bits STABLE — near-equal pixels compare on
        # integer values instead of sub-integer blur residue that flips
        # with viewpoint noise (measured: un-quantized sampling loses
        # tracking on the organic-loop episode) — and it makes the
        # bf16 one-hot MXU sampling exact (integers <= 255 are exact
        # in bf16's 8 mantissa bits).
        patches_blur = jnp.round(
            brief.blur_patches_valid(patches_raw))               # (K,49,49)
        if cfg.use_dbrief:
            undist = undistort_points(cam, xy_full, cam.p1)
            if cfg.learn_masks:
                desc, dmask = brief.mdbrief_from_patches(
                    patches_blur, angle, undist, cam, pattern)
            else:
                desc = brief.dbrief_from_patches(
                    patches_blur, angle, undist, cam, pattern)
                dmask = jnp.full_like(desc, 0xFFFFFFFF)
        else:
            desc = brief.orb_from_patches(patches_blur, angle, pattern)
            dmask = jnp.full_like(desc, 0xFFFFFFFF)
        ray = img_to_world(cam, xy_full)
        return Features(xy=xy_full, level=level, angle=angle, response=resp,
                        ray=ray, desc=desc, desc_mask=dmask, valid=valid)

    @jax.jit
    def extract(images: jax.Array) -> Features:
        imgs = images.astype(jnp.float32)
        pyr = tuple(pyramid.build_pyramid(imgs, cfg.n_levels, cfg.scale_factor))
        # vmap over the camera axis: per-level images/masks batch on axis
        # 0 (tuples are pytrees, so in_axes=0 maps every level), and the
        # CameraModel pytree batches on axis 0 too — the reference's
        # "one OpenMP thread per camera" as a tensor dimension.
        return jax.vmap(extract_one_cam)(pyr, tuple(masks), cams)

    return extract
