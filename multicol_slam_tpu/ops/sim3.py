"""Sim(3) primitives: Horn closed-form alignment, exp/log maps (JAX).

Reference: cSim3Solver computes the relative Sim3 between two
MultiKeyFrames from 3 point pairs via Horn's 1987 closed-form absolute
orientation (4x4 N-matrix eigendecomposition, cSim3Solver.cpp:286-371);
g2o_MultiCol_sim3_expmap.h defines the Sim3 vertex/edge types whose
error is log(Sij S_i S_j^-1). Both batch perfectly: eigh over (S, 4, 4)
and vectorized log/exp.

A Sim3 is stored as (s, R, t): x' = s R x + t; as a flat 8-tuple
[s, R(9... no] we keep a NamedTuple of arrays for vmap friendliness.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import rodrigues2rot, rot2rodrigues, skew


class Sim3(NamedTuple):
    s: jax.Array   # scalar scale (batchable)
    R: jax.Array   # (..., 3, 3)
    t: jax.Array   # (..., 3)

    def apply(self, X: jax.Array) -> jax.Array:
        return self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, X) + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        """self o other: (s1 R1 (s2 R2 x + t2) + t1)."""
        return Sim3(s=self.s * other.s,
                    R=self.R @ other.R,
                    t=self.s[..., None] * jnp.einsum(
                        "...ij,...j->...i", self.R, other.t) + self.t)

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        si = 1.0 / self.s
        return Sim3(s=si, R=Rt,
                    t=-si[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t))

    def to_se3(self) -> jax.Array:
        """Recover SE3 by dividing t by s (cOptimizerLoopStuff.cpp:480-484)."""
        M = jnp.zeros(self.R.shape[:-2] + (4, 4), self.R.dtype)
        M = M.at[..., :3, :3].set(self.R)
        M = M.at[..., :3, 3].set(self.t / self.s[..., None])
        M = M.at[..., 3, 3].set(1.0)
        return M


def sim3_identity(dtype=jnp.float64) -> Sim3:
    return Sim3(s=jnp.asarray(1.0, dtype), R=jnp.eye(3, dtype=dtype),
                t=jnp.zeros(3, dtype))


def sim3_from_se3(M: jax.Array) -> Sim3:
    return Sim3(s=jnp.ones(M.shape[:-2], M.dtype), R=M[..., :3, :3],
                t=M[..., :3, 3])


# ---------------------------------------------------------------------------
# exp / log (7-vector: [rot(3), trans(3), log_s])
# ---------------------------------------------------------------------------

def sim3_log(S: Sim3) -> jax.Array:
    """Sim3 -> 7-vector [omega, upsilon, sigma] (g2o sim3 convention)."""
    omega = rot2rodrigues(S.R)
    sigma = jnp.log(S.s)
    theta2 = jnp.sum(omega * omega, -1)
    theta = jnp.sqrt(theta2 + 1e-32)
    Om = skew(omega)
    Om2 = Om @ Om
    eye = jnp.eye(3, dtype=S.t.dtype)
    # W = closed-form left-Jacobian-like matrix for sim3 (A I + B Om + C Om2)
    s = S.s
    A, B, C = _sim3_W_coeffs(sigma, theta, s)
    W = A[..., None, None] * Om + B[..., None, None] * Om2 + C[..., None, None] * eye
    from .geometry import inv3x3
    upsilon = jnp.einsum("...ij,...j->...i", inv3x3(W), S.t)
    return jnp.concatenate([omega, upsilon, sigma[..., None]], -1)


def sim3_exp(v: jax.Array) -> Sim3:
    """7-vector -> Sim3 (inverse of sim3_log)."""
    omega = v[..., 0:3]
    upsilon = v[..., 3:6]
    sigma = v[..., 6]
    R = rodrigues2rot(omega)
    s = jnp.exp(sigma)
    theta2 = jnp.sum(omega * omega, -1)
    theta = jnp.sqrt(theta2 + 1e-32)
    Om = skew(omega)
    Om2 = Om @ Om
    eye = jnp.eye(3, dtype=v.dtype)
    A, B, C = _sim3_W_coeffs(sigma, theta, s)
    W = A[..., None, None] * Om + B[..., None, None] * Om2 + C[..., None, None] * eye
    t = jnp.einsum("...ij,...j->...i", W, upsilon)
    return Sim3(s=s, R=R, t=t)


def _sim3_W_coeffs(sigma, theta, s):
    """The A, B, C coefficients of W (g2o sim3 internal math; series-safe
    for small sigma/theta)."""
    eps = 1e-5
    sigma2 = sigma * sigma
    th_small = theta < eps
    sg_small = jnp.abs(sigma) < eps

    # branches (computed everywhere, selected by where)
    # sigma ~ 0:
    A0 = jnp.where(th_small, 0.5, (1.0 - jnp.cos(theta)) / jnp.maximum(theta * theta, eps * eps))
    B0 = jnp.where(th_small, 1.0 / 6.0,
                   (theta - jnp.sin(theta)) / jnp.maximum(theta ** 3, eps ** 3))
    C0 = jnp.ones_like(sigma)
    # sigma != 0:
    Cn = (s - 1.0) / jnp.where(sg_small, 1.0, sigma)
    # theta ~ 0, sigma != 0:
    An_t0 = s * sigma - s + 1.0
    An_t0 = An_t0 / jnp.where(sg_small, 1.0, sigma2)
    Bn_t0 = (0.5 * sigma2 * s - s + 1.0 + sigma * s) / \
        jnp.where(sg_small, 1.0, sigma2 * sigma)
    # hmm: use g2o formulas for theta != 0, sigma != 0:
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    t2 = theta * theta
    c = t2 + sigma2
    An = (a * sigma + (1.0 - b) * theta) / \
        jnp.where(th_small | sg_small, 1.0, theta * c)
    Bn = (Cn - ((b - 1.0) * sigma + a * theta) /
          jnp.where(th_small | sg_small, 1.0, c)) / \
        jnp.where(th_small, 1.0, t2)

    A = jnp.where(sg_small, A0, jnp.where(th_small, An_t0, An))
    B = jnp.where(sg_small, B0, jnp.where(th_small, Bn_t0, Bn))
    C = jnp.where(sg_small, C0, Cn)
    return A, B, C


# ---------------------------------------------------------------------------
# Horn closed-form alignment (cSim3Solver.cpp:286-371)
# ---------------------------------------------------------------------------

def horn_alignment(P1: jax.Array, P2: jax.Array, fix_scale: bool = False) -> Sim3:
    """Closed-form Sim3 with x1 = s R x2 + t from point sets (..., M, 3).

    Horn 1987: quaternion from the max eigenvector of the 4x4 N matrix
    built from the cross-covariance; scale from the symmetric ratio of
    deviations. Batches over leading dims (vmap the RANSAC hypotheses).
    """
    c1 = jnp.mean(P1, -2, keepdims=True)
    c2 = jnp.mean(P2, -2, keepdims=True)
    Q1 = P1 - c1
    Q2 = P2 - c2
    # cross covariance M_ij = sum_m Q2[m,i] Q1[m,j]: this orientation of
    # the N matrix yields the quaternion of R with x1 = s R x2 + t
    M = jnp.einsum("...mi,...mj->...ij", Q2, Q1)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], -2)
    w, V = jnp.linalg.eigh(N)
    q = V[..., :, -1]  # max eigenvalue eigenvector: [qw, qx, qy, qz]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
                   2 * (qx * qz + qy * qw)], -1),
        jnp.stack([2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qx * qw)], -1),
        jnp.stack([2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
                   1 - 2 * (qx * qx + qy * qy)], -1),
    ], -2)
    if fix_scale:
        s = jnp.ones(P1.shape[:-2], P1.dtype)
    else:
        # symmetric scale: sqrt(sum|Q1|^2 / sum|Q2|^2) after rotation-free
        # norm ratio (Horn's symmetric formulation)
        n1 = jnp.sum(Q1 * Q1, (-1, -2))
        n2 = jnp.sum(Q2 * Q2, (-1, -2))
        s = jnp.sqrt(n1 / jnp.maximum(n2, 1e-20))
    t = c1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, c2[..., 0, :])
    return Sim3(s=s, R=R, t=t)
