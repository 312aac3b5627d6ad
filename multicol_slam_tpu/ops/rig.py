"""Multi-camera rig (MCS): body pose x fixed extrinsics x camera models.

Behavioral spec: reference include/cam_system_omni.h:54-199 (cMultiCamSys_).
The reference caches MtMc / MtMc_inv per camera on every Set_M_t; here the
rig is an immutable pytree and the composed transforms are computed inside
the jitted projection call — XLA fuses the 4x4 chains for free.

Conventions: ``M_t`` maps body->world, ``M_c[c]`` maps camera->body, so a
world point projects into camera c via ``X_cam = (M_t M_c)^-1 X_world``
(cam_system_omni.h:104-106 WorldToCamHom_fast).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import camera as cam_ops
from .camera import CameraModel
from .geometry import cayley2hom, hom2cayley, inv_se3


class Rig(NamedTuple):
    """Calibrated multi-camera system (no pose). Leading camera axis N."""

    M_c: jax.Array        # (N, 4, 4) camera-to-body extrinsics
    cams: CameraModel     # batched camera models, leading dim N

    @property
    def n_cams(self) -> int:
        return self.M_c.shape[0]

    @property
    def M_c_min(self) -> jax.Array:
        """(N, 6) cayley+t minimal extrinsics (cam_system_omni.h:76)."""
        return hom2cayley(self.M_c)


import numpy as np


def make_rig(M_c_list: Sequence[jax.Array], cams: Sequence[CameraModel]) -> Rig:
    return Rig(M_c=np.stack([np.asarray(m) for m in M_c_list], 0),
               cams=cam_ops.stack_cameras(cams))


def rig_from_cayley(M_c_min, cams: CameraModel) -> Rig:
    """Build a rig from (N, 6) minimal extrinsics (cSystem.cpp:129-144).

    Pure numpy (host calibration path — no device round trips)."""
    M_c_min = np.asarray(M_c_min)
    out = np.zeros(M_c_min.shape[:-1] + (4, 4), M_c_min.dtype)
    c1, c2, c3 = M_c_min[..., 0], M_c_min[..., 1], M_c_min[..., 2]
    c1s, c2s, c3s = c1 * c1, c2 * c2, c3 * c3
    scale = 1.0 + c1s + c2s + c3s
    out[..., 0, 0] = 1 + c1s - c2s - c3s
    out[..., 0, 1] = 2 * (c1 * c2 - c3)
    out[..., 0, 2] = 2 * (c1 * c3 + c2)
    out[..., 1, 0] = 2 * (c1 * c2 + c3)
    out[..., 1, 1] = 1 - c1s + c2s - c3s
    out[..., 1, 2] = 2 * (c2 * c3 - c1)
    out[..., 2, 0] = 2 * (c1 * c3 - c2)
    out[..., 2, 1] = 2 * (c2 * c3 + c1)
    out[..., 2, 2] = 1 - c1s - c2s + c3s
    out[..., :3, :3] /= scale[..., None, None]
    out[..., :3, 3] = M_c_min[..., 3:6]
    out[..., 3, 3] = 1.0
    return Rig(M_c=out, cams=cams)


def scale_rig(rig: Rig, k: float) -> Rig:
    """Rig with every camera rescaled to a k-times image resolution
    (extrinsics untouched — resolution doesn't move the cameras)."""
    return rig._replace(cams=cam_ops.scale_camera(rig.cams, k))


# ---------------------------------------------------------------------------
# Batched projection through the whole rig
# ---------------------------------------------------------------------------

def mt_mc(M_t: jax.Array, M_c: jax.Array) -> jax.Array:
    """(4,4) x (N,4,4) -> (N,4,4) composed camera-to-world."""
    return jnp.einsum("ij,njk->nik", M_t, M_c)


def world_to_cam_frame(M_t: jax.Array, M_c: jax.Array, X_w: jax.Array) -> jax.Array:
    """World points -> per-camera frames.

    ``X_w``: (..., 3); returns (N, ..., 3): X_cam = (Mt Mc)^-1 X_w for each
    camera (cam_system_omni.h:104-106).
    """
    T = inv_se3(mt_mc(M_t, M_c))  # (N, 4, 4)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    Xc = jnp.einsum("nij,...j->n...i", R, X_w)
    return Xc + t.reshape((T.shape[0],) + (1,) * (X_w.ndim - 1) + (3,))


def world_to_img_rig(rig: Rig, M_t: jax.Array, X_w: jax.Array):
    """Project world points into ALL cameras in one fused call.

    Returns (uv, z_positive): uv (N, ..., 2) pixels and the z>0 validity
    flag per camera (cam_system_omni WorldToCamHom_fast returns z>0).
    """
    Xc = world_to_cam_frame(M_t, rig.M_c, X_w)  # (N, ..., 3)
    uv = jax.vmap(cam_ops.world_to_img)(rig.cams, Xc)
    return uv, Xc[..., 2] > 0.0


def img_to_world_rig(rig: Rig, uv: jax.Array) -> jax.Array:
    """Per-camera pixels (N, ..., 2) -> unit rays in each CAMERA frame."""
    return jax.vmap(cam_ops.img_to_world)(rig.cams, uv)


def rays_to_body(rig: Rig, rays_cam: jax.Array) -> jax.Array:
    """Rotate per-camera rays (N, ..., 3) into the body frame via M_c."""
    R = rig.M_c[:, :3, :3]
    return jnp.einsum("nij,n...j->n...i", R, rays_cam)


def cam_centers_world(M_t: jax.Array, M_c: jax.Array) -> jax.Array:
    """(N, 3) optical centers in world frame: (Mt Mc)[:3, 3]."""
    return mt_mc(M_t, M_c)[:, :3, 3]
