"""SE3 / Cayley / polynomial / triangulation primitives (pure JAX).

Behavioral spec follows MultiCol-SLAM's math utilities
(reference: include/misc.h:115-224, src/misc.cpp:26-85), re-designed as
batched, dtype-polymorphic JAX functions. Every function vmaps/jits
cleanly; shapes are static.

Conventions (matching the reference):
  - Poses are 4x4 homogeneous matrices ``M`` mapping *local* coordinates
    to *world* coordinates: ``x_world = M @ x_local`` (the reference
    stores MKF poses this way and inverts for projection).
  - The minimal 6-vector is ``[c1 c2 c3 t1 t2 t3]`` with the rotation in
    Cayley parametrization (misc.h:132-224).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Cayley <-> rotation  (misc.h:132-224)
# ---------------------------------------------------------------------------

def cayley2rot(c: jax.Array) -> jax.Array:
    """Cayley 3-vector -> 3x3 rotation. Batched over leading dims.

    R = (1/(1+|c|^2)) * [[1+c1^2-c2^2-c3^2, 2(c1c2-c3), 2(c1c3+c2)], ...]
    (misc.h:137-160).
    """
    c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2]
    c1s, c2s, c3s = c1 * c1, c2 * c2, c3 * c3
    scale = 1.0 + c1s + c2s + c3s
    R = jnp.stack(
        [
            jnp.stack([1.0 + c1s - c2s - c3s, 2.0 * (c1 * c2 - c3), 2.0 * (c1 * c3 + c2)], -1),
            jnp.stack([2.0 * (c1 * c2 + c3), 1.0 - c1s + c2s - c3s, 2.0 * (c2 * c3 - c1)], -1),
            jnp.stack([2.0 * (c1 * c3 - c2), 2.0 * (c2 * c3 + c1), 1.0 - c1s - c2s + c3s], -1),
        ],
        -2,
    )
    return R / scale[..., None, None]


def inv3x3(A: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse via the adjugate — batches and fuses on the
    VPU with no LU decomposition (TPU LU lacks f64 and serializes)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def rot2cayley(R: jax.Array) -> jax.Array:
    """3x3 rotation -> Cayley 3-vector: C = (R-I)(R+I)^-1 (misc.h:169-181).

    Closed-form 3x3 inverse; singular at 180-degree rotations (same as
    the reference).
    """
    eye = jnp.eye(3, dtype=R.dtype)
    C = (R - eye) @ inv3x3(R + eye)
    return jnp.stack([-C[..., 1, 2], C[..., 0, 2], -C[..., 0, 1]], -1)


def cayley2hom(c6: jax.Array) -> jax.Array:
    """Minimal 6-vector [cayley(3), t(3)] -> 4x4 homogeneous (misc.h:207-224)."""
    R = cayley2rot(c6[..., :3])
    t = c6[..., 3:6]
    top = jnp.concatenate([R, t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=c6.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def hom2cayley(M: jax.Array) -> jax.Array:
    """4x4 homogeneous -> minimal 6-vector (misc.h:188-201)."""
    return jnp.concatenate([rot2cayley(M[..., :3, :3]), M[..., :3, 3]], -1)


# ---------------------------------------------------------------------------
# Rodrigues (axis-angle) — used for manifold-safe pose graph work
# ---------------------------------------------------------------------------

def rodrigues2rot(w: jax.Array) -> jax.Array:
    """Axis-angle 3-vector -> rotation matrix (exp map, Taylor-safe)."""
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = skew(w)
    K2 = K @ K
    a = jnp.where(theta2 > 1e-16, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > 1e-16, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def rot2rodrigues(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle 3-vector (log map)."""
    tr = jnp.trace(R) if R.ndim == 2 else jnp.einsum("...ii->...", R)
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        -1,
    )
    s = jnp.where(theta > 1e-6, theta / (2.0 * jnp.sin(jnp.where(theta > 1e-6, theta, 1.0))), 0.5)
    return v * s[..., None]


# ---------------------------------------------------------------------------
# SE3 helpers
# ---------------------------------------------------------------------------

def skew(t: jax.Array) -> jax.Array:
    """3-vector -> 3x3 skew matrix (misc.h Skew)."""
    z = jnp.zeros_like(t[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -t[..., 2], t[..., 1]], -1),
            jnp.stack([t[..., 2], z, -t[..., 0]], -1),
            jnp.stack([-t[..., 1], t[..., 0], z], -1),
        ],
        -2,
    )


def inv_se3(M: jax.Array) -> jax.Array:
    """Analytic inverse of a 4x4 SE3 matrix (cConverter.h invMat)."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=M.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


# ---------------------------------------------------------------------------
# Polynomial evaluation (misc.h:115-122)
# ---------------------------------------------------------------------------

def horner(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """Evaluate poly sum_i coeffs[i] * x^i via Horner.

    ``coeffs`` has shape (..., D) (lowest order first, matching the
    reference's coefficient ordering); ``x`` broadcasts against the
    leading dims. Unrolled python loop — D is static and small (<=16).
    """
    res = jnp.zeros_like(x) + coeffs[..., -1]
    for i in range(coeffs.shape[-1] - 2, -1, -1):
        res = res * x + coeffs[..., i]
    return res


# ---------------------------------------------------------------------------
# Two-view geometry (misc.cpp:26-85)
# ---------------------------------------------------------------------------

def triangulate_midpoint(t12: jax.Array, R12: jax.Array, v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Midpoint triangulation of two bearing rays (misc.cpp:26-50).

    Rays ``v1`` from camera 1 (at origin), ``v2`` from camera 2 with pose
    (R12, t12) expressed in camera-1 frame. Returns the 3D point in
    camera-1 frame. Batched over leading dims of v1/v2.
    """
    f2 = jnp.einsum("...ij,...j->...i", R12, v2)
    b0 = jnp.einsum("...i,...i->...", t12, v1)
    b1 = jnp.einsum("...i,...i->...", t12, f2)
    A00 = jnp.einsum("...i,...i->...", v1, v1)
    A10 = jnp.einsum("...i,...i->...", v1, f2)
    A11 = -jnp.einsum("...i,...i->...", f2, f2)
    # A = [[A00, -A10], [A10, A11]]; lambda = A^-1 b (2x2 closed form)
    det = A00 * A11 + A10 * A10
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    l0 = (A11 * b0 + A10 * b1) / det
    l1 = (-A10 * b0 + A00 * b1) / det
    xm = l0[..., None] * v1
    xn = t12 + l1[..., None] * f2
    return (xm + xn) * 0.5


def essential_from_relpose(R12: jax.Array, t12: jax.Array) -> jax.Array:
    """E = [t12/|t12|]_x R12 (misc.h ComputeE(Trel) / misc.cpp:71-85)."""
    tn = t12 / jnp.linalg.norm(t12, axis=-1, keepdims=True)
    return skew(tn) @ R12


def essential_from_poses(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """E12 from two WORLD-TO-CAMERA poses (misc.cpp:71-85 semantics).

    T1, T2 are 4x4 world-to-cam transforms (x_cam = T x_world):
    R12 = R1 R2^T, t12 = -R12 t2 + t1 is camera 2's pose in camera 1's
    frame, so ``ray1^T E12 ray2 = 0`` for corresponding rays (use with
    :func:`epipolar_distance_sq`).
    """
    R1, R2 = T1[..., :3, :3], T2[..., :3, :3]
    t1, t2 = T1[..., :3, 3], T2[..., :3, 3]
    R12 = R1 @ jnp.swapaxes(R2, -1, -2)
    t12 = -jnp.einsum("...ij,...j->...i", R12, t2) + t1
    return essential_from_relpose(R12, t12)


def epipolar_distance_sq(ray1: jax.Array, ray2: jax.Array, E12: jax.Array) -> jax.Array:
    """Squared Sampson-like epipolar distance on bearing rays.

    Reference semantics: misc.cpp:53-69 computes
    (rayB^T E rayA)^2 / (|E rayA|^2 + |E^T rayB|^2). We use the
    *consistent* pairing: for ``E12 = skew(t12) R12`` with (R12, t12)
    the pose of camera 2 in camera 1's frame (x1 = R12 x2 + t12), the
    epipolar identity is ``ray1^T E12 ray2 = 0``.

    NOTE(deviation): the reference's SearchForTriangulationRaw builds its
    E from a mixed world-to-cam/cam-to-world pair
    (cORBmatcher.cpp:993-995) and gates on ray2^T E ray1 — numerically
    that never vanishes for true correspondences, i.e. the reference's
    cross-keyframe epipolar gate is a latent no-op bug. We implement the
    correct gate. Returns +inf where the denominator vanishes
    (reference returns "not ok").
    """
    Ex2 = jnp.einsum("...ij,...j->...i", E12, ray2)
    Etx1 = jnp.einsum("...ji,...j->...i", E12, ray1)
    nom = jnp.einsum("...i,...i->...", ray1, Ex2)
    den = jnp.sum(Ex2 * Ex2, -1) + jnp.sum(Etx1 * Etx1, -1)
    return jnp.where(den > 0.0, nom * nom / jnp.where(den > 0.0, den, 1.0), jnp.inf)


def check_dist_epipolar_line(ray1, ray2, E12, thresh: float = 1e-2):
    """Boolean epipolar gate used by triangulation matching (misc.cpp:53-69)."""
    return epipolar_distance_sq(ray1, ray2, E12) < thresh


# ---------------------------------------------------------------------------
# Quaternion export (for TUM trajectories; cConverter.h:41-91)
# ---------------------------------------------------------------------------

def rot2quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion [qx, qy, qz, qw], Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    qw, qx, qy, qz = case_w(), case_x(), case_y(), case_z()
    use_w = tr > 0.0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(
        use_w[..., None], qw, jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz))
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
