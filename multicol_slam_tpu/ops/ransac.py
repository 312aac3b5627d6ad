"""Batched RANSAC primitives: hypotheses as a vmap axis.

The reference uses OpenGV's sequential sample-consensus loop
(opengv::sac::Ransac with STEWENIUS 5-pt for initialization,
cMultiInitializer.cpp:131-146, threshold 1e-4, 200 iters; GP3P for
relocalization, cTracking.cpp:1234-1266). TPU-first re-design: draw ALL
minimal samples up front with jax.random, solve every hypothesis in one
vmapped batch, score all hypotheses x all correspondences in one dense
pass, argmax inliers. No data-dependent iteration count - a fixed
hypothesis budget >= the reference's max_iterations bound.

Central relative pose uses the 8-point essential algorithm on bearing
vectors (the reference's Stewenius 5-pt fills the same role; 8-point
batches onto the MXU as one (S, 8, 9) SVD sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import skew, triangulate_midpoint


def sample_minimal_sets(key: jax.Array, n_hyps: int, sample_size: int,
                        n_points: int, weights: jax.Array | None = None):
    """(n_hyps, sample_size) int32 indices drawn iid (with replacement
    across hypotheses; within a hypothesis duplicates are possible but
    merely waste that hypothesis - same robustness model as reference
    RANSAC with a larger budget)."""
    if weights is None:
        return jax.random.randint(key, (n_hyps, sample_size), 0, n_points)
    idx = jax.random.categorical(
        key, jnp.log(weights + 1e-12)[None, :], axis=-1,
        shape=(n_hyps, sample_size))
    return idx


# ---------------------------------------------------------------------------
# Essential matrix: 8-point on bearing vectors
# ---------------------------------------------------------------------------

def essential_8pt(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Central relative pose from >=8 bearing-vector pairs.

    v1, v2: (M, 3) unit rays in camera 1 / camera 2 with constraint
    v1^T E v2 = 0 (E = [t12]x R12, pose of cam2 in cam1 frame - the
    convention of ops/geometry). Returns (3, 3) E (up to scale),
    projected onto the essential manifold (two equal singular values).
    """
    # each pair gives a row kron(v1, v2) . vec(E) = 0
    A = (v1[:, :, None] * v2[:, None, :]).reshape(v1.shape[0], 9)
    # null vector via eigh of A^T A (9x9 symmetric; batched-friendly)
    _, V = jnp.linalg.eigh(A.T @ A)
    E = V[:, 0].reshape(3, 3)
    # project to essential manifold: singular values -> (1, 1, 0)
    U, s, Vt = jnp.linalg.svd(E)
    return (U * jnp.asarray([1.0, 1.0, 0.0])) @ Vt


def essential_5pt(v1: jax.Array, v2: jax.Array, cay0: jax.Array,
                  t0: jax.Array, iters: int = 24):
    """Minimal 5-point central relative pose — the role of OpenGV's
    STEWENIUS solver in initialization RANSAC
    (cMultiInitializer.cpp:131-146).

    TPU-first formulation instead of the Groebner 10x10 action-matrix
    eigendecomposition (which needs an unsymmetric eig TPUs lack): the
    pose is parametrized minimally as (cayley(3), t(3)) with the scale
    gauge ||t||^2 = 1 appended to the five epipolar constraints
    v1^T [t]x R v2 = 0, and the square 6x6 system is solved by damped
    Newton from a given seed. The polynomial's up-to-10 roots are
    recovered across RANSAC samples x multiple seeds — each
    (sample, seed) is one vmap lane, exactly like the GP3P solver above.

    v1, v2: (5, 3) unit bearing pairs; cay0: (3,) rotation seed (cayley);
    t0: (3,) translation-direction seed. Returns (E (3,3), residual).
    """
    x0 = jnp.concatenate([cay0, t0])

    def E_of(x):
        c1, c2, c3 = x[0], x[1], x[2]
        # cayley -> rotation (matches ops/geometry cayley2rot)
        s = 1.0 + c1 * c1 + c2 * c2 + c3 * c3
        R = jnp.asarray([
            [1 + c1 * c1 - c2 * c2 - c3 * c3, 2 * (c1 * c2 - c3),
             2 * (c1 * c3 + c2)],
            [2 * (c1 * c2 + c3), 1 - c1 * c1 + c2 * c2 - c3 * c3,
             2 * (c2 * c3 - c1)],
            [2 * (c1 * c3 - c2), 2 * (c2 * c3 + c1),
             1 - c1 * c1 - c2 * c2 + c3 * c3]]) / s
        t = x[3:6]
        return skew(t[None])[0] @ R

    def F(x):
        E = E_of(x)
        ep = jnp.einsum("ni,ij,nj->n", v1, E, v2)
        gauge = jnp.sum(x[3:6] ** 2) - 1.0
        return jnp.concatenate([ep, gauge[None]])

    def body(_, x):
        r = F(x)
        J = jax.jacfwd(F)(x)
        # Gauss-Newton step via normal equations + Cholesky: TPU-native
        # (batched LU of general square systems compiles poorly on TPU;
        # cho_solve of the damped 6x6 JtJ is cheap and always defined)
        JtJ = J.T @ J + 1e-8 * jnp.eye(6, dtype=x.dtype)
        L = jax.scipy.linalg.cholesky(JtJ, lower=True)
        step = jax.scipy.linalg.cho_solve((L, True), J.T @ r)
        step = jnp.clip(step, -0.5, 0.5)
        return x - step

    x = jax.lax.fori_loop(0, iters, body, x0)
    res = jnp.linalg.norm(F(x))
    return E_of(x), res


# rotation seeds (cayley) x translation-direction seeds: small-motion
# basin first (SLAM init is near identity), then axis directions
ESSENTIAL_SEEDS = (
    ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
    ((0.0, 0.0, 0.0), (-1.0, 0.0, 0.0)),
    ((0.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
    ((0.0, 0.0, 0.0), (0.0, 0.0, 1.0)),
    ((0.05, -0.05, 0.05), (0.577, 0.577, 0.577)),
    ((-0.05, 0.05, -0.05), (-0.577, 0.577, -0.577)),
)


def decompose_essential(E: jax.Array):
    """E -> 4 candidate (R12, t12) with ||t|| = 1 (standard U W V^T
    factorizations)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = U @ W @ Vt * jnp.sign(d)
    Rb = U @ W.T @ Vt * jnp.sign(d)
    t = U[:, 2]
    return (jnp.stack([Ra, Ra, Rb, Rb]),
            jnp.stack([t, -t, t, -t]))


def _epipolar_err(E, v1, v2):
    """Squared epipolar residual per pair (same form the reference uses
    for its ray threshold 1e-4: 1 - cos^2-style algebraic distance)."""
    Ev2 = jnp.einsum("ij,nj->ni", E, v2)
    Etv1 = jnp.einsum("ji,nj->ni", E, v1)
    num = jnp.einsum("ni,ni->n", v1, Ev2)
    den = jnp.sum(Ev2[:, :2] ** 2, -1) + jnp.sum(Etv1[:, :2] ** 2, -1)
    return num * num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("n_hyps", "sample_size"))
def ransac_essential(key: jax.Array, v1: jax.Array, v2: jax.Array,
                     valid: jax.Array, *, threshold: float = 1e-4,
                     n_hyps: int = 256, sample_size: int = 5):
    """Batched essential RANSAC over bearing pairs.

    v1, v2: (N, 3); valid: (N,) bool. Returns (E_best, inlier_mask,
    n_inliers). Matches the role of the reference's STEWENIUS RANSAC
    (threshold 1e-4 on ray residuals, cMultiInitializer.cpp:137-141).

    sample_size=5 (default) draws MINIMAL 5-point hypotheses solved by
    the Newton-from-seeds essential_5pt (one vmap lane per
    (sample, seed)), the same per-hypothesis support as Stewenius —
    robust at inlier ratios where 8-point samples rarely come out
    clean; sample_size=8 uses the linear 8-point solver per hypothesis.
    Either way the winner is refit with 8-point on its inlier set.
    """
    n = v1.shape[0]
    # sample proportional to validity so invalid points never enter
    w = valid.astype(jnp.float32)
    idx = sample_minimal_sets(key, n_hyps, sample_size, n, w)  # (S, k)

    if sample_size == 5:
        cays = jnp.asarray([s[0] for s in ESSENTIAL_SEEDS], v1.dtype)
        ts = jnp.asarray([s[1] for s in ESSENTIAL_SEEDS], v1.dtype)
        ts = ts / jnp.linalg.norm(ts, axis=-1, keepdims=True)

        # convergence tolerance scaled to the dtype's noise floor
        # (f32 ~ 3e-5, f64 ~ 5e-13): non-roots land orders above it
        tol = 250.0 * float(jnp.finfo(v1.dtype).eps)

        def solve_one(i):
            Es, res = jax.vmap(
                lambda c, t: essential_5pt(v1[i], v2[i], c, t))(cays, ts)
            bad = res > tol
            return jnp.where(bad[:, None, None], jnp.inf, Es)

        Es = jax.vmap(solve_one)(idx).reshape(-1, 3, 3)  # (S*seeds, 3, 3)
    else:
        Es = jax.vmap(lambda i: essential_8pt(v1[i], v2[i]))(idx)  # (S, 3, 3)
    errs = jax.vmap(lambda E: _epipolar_err(E, v1, v2))(Es)    # (S, N)
    errs = jnp.where(jnp.isfinite(errs), errs, jnp.inf)
    inl = (errs < threshold) & valid[None, :]
    scores = jnp.sum(inl, 1)
    best = jnp.argmax(scores)
    # all-inlier refit of the winner (the non-minimal polish the
    # reference gets from optimizing over the RANSAC consensus set):
    # weight rows by the inlier mask so the shape stays static
    wbest = inl[best].astype(v1.dtype)[:, None]
    E_ref = essential_8pt(v1 * wbest, v2 * wbest)
    err_ref = _epipolar_err(E_ref, v1, v2)
    inl_ref = (err_ref < threshold) & valid
    better = jnp.sum(inl_ref) >= scores[best]
    E_out = jnp.where(better, E_ref, Es[best])
    inl_out = jnp.where(better, inl_ref, inl[best])
    return E_out, inl_out, jnp.sum(inl_out)


# ---------------------------------------------------------------------------
# Non-central absolute pose (relocalization)
# ---------------------------------------------------------------------------

def gp3p(origins: jax.Array, dirs: jax.Array, X: jax.Array,
         d0: jax.Array, iters: int = 16) -> jax.Array:
    """Minimal 3-point generalized (non-central) absolute pose — the
    role of OpenGV's GP3P in relocalization RANSAC
    (cTracking.cpp:1234-1266).

    TPU-first formulation instead of the Groebner-basis octic: the three
    unknown depths d_i place the points q_i = o_i + d_i f_i in the BODY
    frame; rigidity gives three pairwise-distance equations
    |q_i - q_j|^2 = |X_i - X_j|^2, solved by damped Newton from a given
    depth seed (the octic's up-to-8 roots are recovered across RANSAC
    hypotheses x multiple seeds — each (sample, seed) is one lane of a
    vmap batch). The body<-world pose then follows from Horn's 3-point
    absolute orientation with unit scale.

    origins, dirs, X: (3, 3); d0: (3,) positive depth seed.
    Returns (T world->body (4,4), residual norm of the distance system).
    """
    from .sim3 import horn_alignment

    D2 = jnp.stack([
        jnp.sum((X[0] - X[1]) ** 2),
        jnp.sum((X[0] - X[2]) ** 2),
        jnp.sum((X[1] - X[2]) ** 2)])

    def F(d):
        q = origins + d[:, None] * dirs
        return jnp.stack([
            jnp.sum((q[0] - q[1]) ** 2),
            jnp.sum((q[0] - q[2]) ** 2),
            jnp.sum((q[1] - q[2]) ** 2)]) - D2

    def body(_, d):
        r = F(d)
        J = jax.jacfwd(F)(d)
        # damped Newton step via Cholesky normal equations (batched
        # general LU compiles poorly on TPU); keep depths positive
        JtJ = J.T @ J + 1e-9 * jnp.eye(3, dtype=d.dtype)
        L = jax.scipy.linalg.cholesky(JtJ, lower=True)
        step = jax.scipy.linalg.cho_solve((L, True), J.T @ r)
        step = jnp.clip(step, -0.5 * jnp.abs(d) - 1.0,
                        0.5 * jnp.abs(d) + 1.0)
        return jnp.maximum(d - step, 1e-4)

    d = jax.lax.fori_loop(0, iters, body, d0)
    # scale-relative residual (f32-safe convergence signal)
    res = jnp.linalg.norm(F(d)) / (1.0 + jnp.sum(D2))
    q = origins + d[:, None] * dirs
    S = horn_alignment(q, X, fix_scale=True)   # q = R X + t (world->body)
    T = jnp.eye(4, dtype=X.dtype)
    T = T.at[:3, :3].set(S.R)
    T = T.at[:3, 3].set(S.t)
    return T, res


def gpnp_dlt(origins: jax.Array, dirs: jax.Array, X: jax.Array) -> jax.Array:
    """Generalized-camera absolute pose from >= 6 ray/point pairs.

    The reference relocalizes with OpenGV's GP3P 3-point minimal solver
    + gpnp refinement (cTracking.cpp:1234-1266). The octic-polynomial
    GP3P does not batch well; this DLT fills the same role and
    vectorizes: for body pose (R, t) mapping world->body, each
    correspondence constrains (R X + t - o) x d = 0 — linear in the 12
    entries of [R | t]. Solve by smallest eigenvector of the 12x12
    normal matrix, then project R onto SO(3) and rescale t.

    origins: (M, 3) ray origins in BODY frame (camera centers Mc[:3,3]);
    dirs: (M, 3) unit ray directions in BODY frame; X: (M, 3) world
    points. Returns (4, 4) world->body SE3.
    """
    m = X.shape[0]
    D = skew(dirs)                                 # (M, 3, 3)
    # rows: D @ (R X + t) = D @ o
    # unknown u = [r11 r12 r13 r21 ... r33 t1 t2 t3]
    zeros = jnp.zeros((m, 3, 3), X.dtype)
    blocks = []
    for col in range(3):
        blocks.append(D * X[:, col][:, None, None])  # coefficient of R[:, col]
    # A_i = [D*X_x | D*X_y | D*X_z | D], b_i = D @ o
    A = jnp.concatenate([
        jnp.stack(blocks, 2).reshape(m, 3, 9), D], axis=2)  # (M, 3, 12)
    b = jnp.einsum("mij,mj->mi", D, origins)       # (M, 3)
    Af = A.reshape(-1, 12)
    bf = b.reshape(-1)
    # least squares via normal equations (12x12)
    AtA = Af.T @ Af + 1e-9 * jnp.eye(12, dtype=X.dtype)
    Atb = Af.T @ bf
    u = jnp.linalg.solve(AtA, Atb)
    # u stacks R column-wise ([R[:,0], R[:,1], R[:,2]]): un-stack with a
    # transpose
    Rm = u[:9].reshape(3, 3).T
    # project to SO(3), transfer the DLT scale into t
    U, s, Vt = jnp.linalg.svd(Rm)
    Rproj = U @ Vt
    det = jnp.linalg.det(Rproj)
    Rproj = U @ jnp.diag(jnp.asarray([1.0, 1.0, det], X.dtype)) @ Vt
    scale = jnp.sum(s) / 3.0 * det
    t = u[9:12] / jnp.where(jnp.abs(scale) > 1e-9, scale, 1.0)
    T = jnp.eye(4, dtype=X.dtype)
    T = T.at[:3, :3].set(Rproj)
    T = T.at[:3, 3].set(t)
    return T


def _ray_angle_err(T: jax.Array, origins, dirs, X):
    """1 - cos(angle) between measured rays and predicted directions to
    the transformed points (OpenGV's reprojection-style score)."""
    Y = jnp.einsum("ij,nj->ni", T[:3, :3], X) + T[:3, 3]
    v = Y - origins
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return 1.0 - jnp.einsum("ni,ni->n", v, dirs)


DEPTH_SEEDS = (0.3, 1.0, 3.0, 10.0)


@functools.partial(jax.jit, static_argnames=("n_hyps", "sample_size"))
def ransac_gpnp(key: jax.Array, origins: jax.Array, dirs: jax.Array,
                X: jax.Array, valid: jax.Array, *,
                threshold: float = 1e-4, n_hyps: int = 256,
                sample_size: int = 3):
    """Batched non-central absolute pose RANSAC (the GP3P-RANSAC role,
    threshold 1e-4 on (1-cos) ray residuals like cTracking.cpp:1256).

    sample_size=3 (default) draws MINIMAL GP3P hypotheses, each solved
    from several depth seeds (one vmap lane per (sample, seed) pair) —
    the same per-hypothesis support as the reference's OpenGV GP3P, so
    relocalization works in the sparse-match regime; larger sample
    sizes fall back to the 6+-point DLT. Best hypothesis is refit on its
    inliers with the DLT (the reference's gpnp refinement role).

    Returns (T_body_from_world (4,4), inlier_mask, n_inliers)."""
    n = X.shape[0]
    w = valid.astype(jnp.float32)
    idx = sample_minimal_sets(key, n_hyps, sample_size, n, w)
    if sample_size == 3:
        seeds = jnp.asarray(DEPTH_SEEDS, X.dtype)

        def solve_one(i):
            Ts, res = jax.vmap(
                lambda s: gp3p(origins[i], dirs[i], X[i],
                               jnp.full(3, s, X.dtype)))(seeds)
            # keep only converged roots: non-converged seeds get a pose
            # that scores ~0 inliers anyway, but poison them explicitly
            bad = res > 1e-4
            return jnp.where(bad[:, None, None],
                             jnp.eye(4, dtype=X.dtype) * jnp.inf, Ts)

        Ts = jax.vmap(solve_one)(idx).reshape(-1, 4, 4)
    else:
        Ts = jax.vmap(lambda i: gpnp_dlt(origins[i], dirs[i], X[i]))(idx)
    errs = jax.vmap(lambda T: _ray_angle_err(T, origins, dirs, X))(Ts)
    errs = jnp.where(jnp.isfinite(errs), errs, jnp.inf)
    inl = (errs < threshold) & valid[None, :]
    scores = jnp.sum(inl, 1)
    best = jnp.argmax(scores)
    # non-minimal refit on the best hypothesis' inliers (gpnp refine)
    T_ref = _refit(origins, dirs, X, inl[best])
    err_ref = _ray_angle_err(T_ref, origins, dirs, X)
    inl_ref = (err_ref < threshold) & valid
    better = jnp.sum(inl_ref) >= scores[best]
    T_out = jnp.where(better, T_ref, Ts[best])
    inl_out = jnp.where(better, inl_ref, inl[best])
    return T_out, inl_out, jnp.sum(inl_out)


def _refit(origins, dirs, X, inlier_mask):
    """DLT refit using only inliers (rows weighted by the mask)."""
    w = inlier_mask.astype(X.dtype)[:, None]
    # weight the constraint rows: scale D rows by mask
    m = X.shape[0]
    D = skew(dirs) * w[..., None]
    blocks = [D * X[:, col][:, None, None] for col in range(3)]
    A = jnp.concatenate([jnp.stack(blocks, 2).reshape(m, 3, 9), D], axis=2)
    b = jnp.einsum("mij,mj->mi", D, origins)
    Af = A.reshape(-1, 12)
    bf = b.reshape(-1)
    AtA = Af.T @ Af + 1e-9 * jnp.eye(12, dtype=X.dtype)
    u = jnp.linalg.solve(AtA, Af.T @ bf)
    Rm = u[:9].reshape(3, 3).T
    U, s, Vt = jnp.linalg.svd(Rm)
    det = jnp.linalg.det(U @ Vt)
    Rproj = U @ jnp.diag(jnp.asarray([1.0, 1.0, det], X.dtype)) @ Vt
    scale = jnp.sum(s) / 3.0 * det
    t = u[9:12] / jnp.where(jnp.abs(scale) > 1e-9, scale, 1.0)
    T = jnp.eye(4, dtype=X.dtype)
    T = T.at[:3, :3].set(Rproj)
    T = T.at[:3, 3].set(t)
    return T


def cheirality_counts(R12s: jax.Array, t12s: jax.Array, v1: jax.Array,
                      v2: jax.Array, valid: jax.Array):
    """For each candidate (R, t): triangulate all pairs, count points in
    front of BOTH cameras (the CheckRT vote, cMultiInitializer.cpp:200-307).

    Convention: (R12, t12) = pose of cam2 in cam1 frame; a point X (in
    cam1) is in front of cam2 if (R12^T (X - t12))_z > 0... both
    z-components must be positive along the rays: lambda1, lambda2 > 0.
    Returns (4,) counts and the (4, N, 3) triangulated points.
    """

    def one(R12, t12):
        X = triangulate_midpoint(t12, R12, v1, v2)            # (N, 3) cam1
        z1 = jnp.einsum("ni,ni->n", X, v1)                    # depth along ray1
        X2 = jnp.einsum("ji,nj->ni", R12, X - t12)            # into cam2
        z2 = jnp.einsum("ni,ni->n", X2, v2)
        ok = (z1 > 0) & (z2 > 0) & valid
        return jnp.sum(ok), X

    counts, Xs = jax.vmap(one)(R12s, t12s)
    return counts, Xs
