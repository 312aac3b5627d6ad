"""MultiCol bundle adjustment: Levenberg-Marquardt on TPU.

Replaces the g2o hypergraph back-end of the reference (cOptimizer.cpp:
57-874 + the ~1000-line Matlab-generated symbolic Jacobian mcsJacs1 in
g2o_MultiCol_vertices_edges.cpp:120-1131) with a JAX-native design:

  - residual  r = m - pi_cam((Mt[kf] Mc[cam])^-1 X[pt])   per observation
    (EdgeProjectXYZ2MCS::computeError, g2o_MultiCol_vertices_edges.cpp:26-53);
  - Jacobians by forward-mode autodiff of the closed-form projection
    (replaces mcsJacs1; matches it numerically because the projection
    math is identical);
  - Huber IRLS weights (RobustKernelHuber semantics);
  - damped normal equations with SPARSE SCHUR elimination of the points:
    per-point 3x3 blocks + per-pose 6x6 blocks assembled with
    segment-sums; the reduced camera system is dense (local windows keep
    it small, cOptimizer.cpp:461-874 LocalBundleAdjustment);
  - additive cayley updates (VertexMt_cayley oplus is additive,
    g2o_MultiCol_vertices_edges.h:83-145);
  - LM lambda = tau * max(diag H) with accept/reject halving/doubling
    and gain-threshold termination (SparseOptimizerTerminateAction gain
    1e-6, cOptimizer.cpp:88-92).

Reference tunables carried over: Huber delta = 1.345*stdFrame(=2) for
pose optimization (cOptimizer.cpp:332), outlier gate chi2 > delta^2
after round 1, then re-optimize (cOptimizer.cpp:414-438); Huber
sqrt(5.991) for global BA (cOptimizer.cpp:57-257).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.camera import CameraModel, world_to_img
from ..ops.geometry import cayley2hom, inv_se3
from ..ops.rig import Rig

HUBER_POSE = 1.345 * 2.0         # cOptimizer.cpp:54 stdFrame = 2.0
HUBER_LOCAL = 1.345 * 2.0        # stdRecon = 2.0 (cOptimizer.cpp:54)
HUBER_GLOBAL = 5.991 ** 0.5      # GlobalBundleAdjustment sqrt(5.991)
LM_TAU = 1e-5                    # g2o initial lambda heuristic
GAIN_EPS = 1e-6                  # termination gain threshold


class BAObservations(NamedTuple):
    """Padded observation table. All arrays lead with (K,)."""

    uv: jax.Array          # (K, 2) measured pixel (level-0 coords)
    kf: jax.Array          # (K,) int32 body-pose index
    cam: jax.Array         # (K,) int32 rig camera index
    pt: jax.Array          # (K,) int32 point index
    inv_sigma2: jax.Array  # (K,) information scale (1/scale^(2*octave))
    valid: jax.Array       # (K,) bool


def _project_residual(mt_min: jax.Array, mc_min: jax.Array, X: jax.Array,
                      cam: CameraModel, uv: jax.Array) -> jax.Array:
    """Residual of ONE observation given minimal pose params.

    mt_min: (6,) body pose cayley+t; mc_min: (6,) rig extrinsics;
    X: (3,) world point; uv: (2,) measurement.
    """
    M = cayley2hom(mt_min) @ cayley2hom(mc_min)
    T = inv_se3(M)
    Xc = T[:3, :3] @ X + T[:3, 3]
    return uv - world_to_img(cam, Xc)


def _huber_w(chi2: jax.Array, delta: float) -> jax.Array:
    """IRLS weight rho'(chi2): 1 inside, delta/e outside."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)


# ---------------------------------------------------------------------------
# Pose-only optimization (cOptimizer.cpp:259-458)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iters1", "iters2"))
def pose_optimization(rig: Rig, mt_min0: jax.Array, obs: BAObservations,
                      X_world: jax.Array, *, huber: float = HUBER_POSE,
                      iters1: int = 10, iters2: int = 10):
    """Optimize ONLY the body pose M_t against fixed map points.

    X_world: (P, 3) fixed points, indexed by obs.pt. Two LM rounds with a
    chi2 > delta^2 outlier gate between them, mirroring
    cOptimizer.cpp:412-440. Each round is a while_loop that stops early
    when an accepted step's relative cost gain drops below GAIN_EPS
    (SparseOptimizerTerminateAction gain 1e-6, cOptimizer.cpp:88-92) —
    converged frames don't burn the full iteration budget.
    Returns (mt_min, inlier_mask, n_inliers, n_iterations).
    """
    mc_min = rig.M_c_min
    delta2 = huber * huber

    def residuals(mt_min):
        def one(o_uv, o_cam, o_pt):
            cam = jax.tree.map(lambda a: a[o_cam], rig.cams)
            return _project_residual(mt_min, mc_min[o_cam], X_world[o_pt],
                                     cam, o_uv)
        return jax.vmap(one)(obs.uv, obs.cam, obs.pt)  # (K, 2)

    def chi2_of(mt_min, w_valid):
        r = residuals(mt_min)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        return chi2, jnp.sum(jnp.where(w_valid, jnp.where(
            jnp.sqrt(chi2) <= huber, chi2,
            2 * huber * jnp.sqrt(chi2) - delta2), 0.0))

    def lm_round(mt_min, w_valid, iters):
        def hess(mt):
            r = residuals(mt)                                     # (K,2)
            J = jax.jacfwd(residuals)(mt)                         # (K,2,6)
            chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
            w = _huber_w(chi2, huber) * obs.inv_sigma2
            w = jnp.where(w_valid, w, 0.0)
            H = jnp.einsum("kri,k,krj->ij", J, w, J)
            g = jnp.einsum("kri,k,kr->i", J, w, r)
            return H, g

        _, cost0 = chi2_of(mt_min, w_valid)
        H0, _ = hess(mt_min)
        lam0 = LM_TAU * jnp.max(jnp.diag(H0))

        def cond(state):
            _, _, _, it, done = state
            return (it < iters) & ~done

        def body(state):
            mt, lam, cost, it, _ = state
            H, g = hess(mt)
            Hd = H + lam * jnp.eye(6, dtype=H.dtype)
            # NOTE: J is d(r)/d(mt) of r = m - pi, so the Gauss-Newton
            # step solves H d = -g ... with r convention the update is
            # mt_new = mt - d where H d = g. Keep signs consistent:
            d = jnp.linalg.solve(Hd, g)
            mt_new = mt - d
            _, cost_new = chi2_of(mt_new, w_valid)
            accept = cost_new < cost
            # gain-ratio termination (SparseOptimizerTerminateAction
            # 1e-6, cOptimizer.cpp:88-92): an accepted step that barely
            # improved the cost means convergence — stop
            gain = (cost - cost_new) / jnp.maximum(cost_new, 1e-12)
            done = accept & (gain < GAIN_EPS)
            mt = jnp.where(accept, mt_new, mt)
            cost = jnp.where(accept, cost_new, cost)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return mt, lam, cost, it + 1, done

        mt_min, _, _, n_it, _ = jax.lax.while_loop(
            cond, body,
            (mt_min, lam0, cost0, jnp.int32(0), jnp.bool_(False)))
        return mt_min, n_it

    w_valid = obs.valid
    mt1, it1 = lm_round(mt_min0, w_valid, iters1)
    chi2, _ = chi2_of(mt1, w_valid)
    inlier = w_valid & (chi2 <= delta2)
    mt2, it2 = lm_round(mt1, inlier, iters2)
    chi2b, _ = chi2_of(mt2, w_valid)
    inlier_final = w_valid & (chi2b <= delta2)
    return mt2, inlier_final, jnp.sum(inlier_final), it1 + it2


# ---------------------------------------------------------------------------
# Full MultiCol bundle adjustment with sparse Schur on points
# ---------------------------------------------------------------------------

class BAProblem(NamedTuple):
    """Static-shape BA problem. Host builds index tables; device solves.

    pt_obs: (P, M) int32 indices into the obs arrays listing each
    point's observations, padded with K (a guaranteed-invalid slot);
    M = max observations per point.
    """

    obs: BAObservations       # K+1 rows; row K is a zero/invalid pad slot
    pt_obs: jax.Array         # (P, M) int32
    fixed_kf: jax.Array       # (N,) bool — poses held constant
    fixed_pt: jax.Array       # (P,) bool


def _gather_cam(cams: CameraModel, idx: jax.Array) -> CameraModel:
    return jax.tree.map(lambda a: a[idx], cams)


@functools.partial(jax.jit, static_argnames=("iters", "free_mc",
                                              "early_stop"))
def bundle_adjustment(rig: Rig, mt_min0: jax.Array, X0: jax.Array,
                      problem: BAProblem, *, huber: float = HUBER_GLOBAL,
                      iters: int = 10, free_mc: bool = False,
                      early_stop: bool = True):
    """Joint LM over body poses (N, 6) and points (P, 3) with Schur
    elimination of the points (cOptimizer GlobalBundleAdjustment /
    LocalBundleAdjustment semantics; fixed_kf plays the role of the
    fixed-KF set in the local variant).

    Returns (mt_min (N,6), X (P,3), per-obs chi2 (K+1,)).

    free_mc=True additionally optimizes the rig extrinsics M_c — the
    self-calibrating MultiCol BA (the reference's hyper-graph carries
    VertexMc_cayley for exactly this, g2o_MultiCol_vertices_edges.h:
    83-145, held fixed in normal operation): see
    ``self_calibrating_bundle_adjustment``.
    """
    if free_mc:
        mt, X, mc, chi2 = self_calibrating_bundle_adjustment(
            rig, mt_min0, X0, problem, huber=huber, iters=iters)
        return mt, X, chi2
    obs, pt_obs = problem.obs, problem.pt_obs
    mc_min = rig.M_c_min
    N = mt_min0.shape[0]
    P = X0.shape[0]
    K = obs.uv.shape[0]  # includes pad row

    def one_residual(mt_all, X_all, i):
        o_kf, o_cam, o_pt = obs.kf[i], obs.cam[i], obs.pt[i]
        cam = _gather_cam(rig.cams, o_cam)
        return _project_residual(mt_all[o_kf], mc_min[o_cam], X_all[o_pt],
                                 cam, obs.uv[i])

    def all_residuals(mt_all, X_all):
        return jax.vmap(lambda i: one_residual(mt_all, X_all, i))(
            jnp.arange(K))

    def cost_of(mt_all, X_all):
        r = all_residuals(mt_all, X_all)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        delta2 = huber * huber
        rho = jnp.where(jnp.sqrt(chi2) <= huber, chi2,
                        2 * huber * jnp.sqrt(chi2) - delta2)
        return jnp.sum(jnp.where(obs.valid, rho, 0.0)), chi2

    def build_system(mt_all, X_all):
        """Per-obs Jacobians + weights -> blocks for Schur."""
        r = all_residuals(mt_all, X_all)                      # (K,2)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        w = _huber_w(chi2, huber) * obs.inv_sigma2
        w = jnp.where(obs.valid, w, 0.0)

        def jac_one(i):
            o_kf, o_cam, o_pt = obs.kf[i], obs.cam[i], obs.pt[i]
            cam = _gather_cam(rig.cams, o_cam)
            f_p = lambda mt: _project_residual(mt, mc_min[o_cam],
                                               X_all[o_pt], cam, obs.uv[i])
            f_x = lambda X: _project_residual(mt_all[o_kf], mc_min[o_cam],
                                              X, cam, obs.uv[i])
            return jax.jacfwd(f_p)(mt_all[o_kf]), jax.jacfwd(f_x)(X_all[o_pt])

        Jp, Jx = jax.vmap(jac_one)(jnp.arange(K))             # (K,2,6),(K,2,3)
        Jp = jnp.where(problem.fixed_kf[obs.kf][:, None, None], 0.0, Jp)
        Jx = jnp.where(problem.fixed_pt[obs.pt][:, None, None], 0.0, Jx)

        wJp = Jp * w[:, None, None]
        wJx = Jx * w[:, None, None]
        # pose blocks (N,6,6), gradients
        Hpp = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", wJp, Jp),
                                  obs.kf, N)
        gp = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", wJp, r), obs.kf, N)
        # point blocks (P,3,3)
        Hxx = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", wJx, Jx),
                                  obs.pt, P)
        gx = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", wJx, r), obs.pt, P)
        # cross blocks per obs (K,6,3)
        E = jnp.einsum("kri,krj->kij", wJp, Jx)
        return Hpp, Hxx, E, gp, gx

    def schur_step(mt_all, X_all, lam):
        from ..ops.geometry import inv3x3

        Hpp, Hxx, E, gp, gx = build_system(mt_all, X_all)
        # LM damping: lambda * I on both blocks (g2o-style)
        Hxx_d = Hxx + lam * jnp.eye(3)[None]

        # C^-1 per point (3x3 closed form); fixed points get zero inverse
        Ci = inv3x3(Hxx_d + jnp.eye(3)[None] * 1e-12)
        Ci = jnp.where(problem.fixed_pt[:, None, None], 0.0, Ci)

        # gather per-point obs: E rows + their kf ids
        Epad = E[pt_obs]                                     # (P,M,6,3)
        kf_pad = obs.kf[pt_obs]                              # (P,M)
        ok_pad = obs.valid[pt_obs]                           # (P,M)
        Epad = jnp.where(ok_pad[..., None, None], Epad, 0.0)
        T = jnp.einsum("pmij,pjk->pmik", Epad, Ci)           # (P,M,6,3)

        # Schur S = blockdiag(Hpp + lam I) - sum_p T E^T over kf pairs.
        # Accumulate one obs-row at a time: peak memory (P, M, 6, 6)
        # instead of the (P, M, M, 6, 6) outer product, which at map
        # scale (P=1e4, M=32) would be ~15 GB
        S = jnp.zeros((N, N, 6, 6))
        for mrow in range(T.shape[1]):
            contrib = jnp.einsum("pik,pnjk->pnij", T[:, mrow], Epad)
            S = S.at[kf_pad[:, mrow, None], kf_pad].add(contrib)
        Sd = -S
        Sd = Sd.at[jnp.arange(N), jnp.arange(N)].add(
            Hpp + lam * jnp.eye(6)[None])
        # reduced gradient g_red = gp - scatter_kf(T gx)
        Tg = jnp.einsum("pmik,pk->pmi", T, gx)               # (P,M,6)
        g_red = gp - jnp.zeros((N, 6)).at[kf_pad.reshape(-1)].add(
            Tg.reshape(-1, 6))

        # dense solve of the (6N, 6N) reduced system
        Smat = Sd.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
        gvec = g_red.reshape(6 * N)
        # fixed poses: identity rows/cols, zero gradient
        fixed6 = jnp.repeat(problem.fixed_kf, 6)
        Smat = jnp.where(fixed6[:, None] | fixed6[None, :],
                         jnp.eye(6 * N, dtype=Smat.dtype), Smat)
        gvec = jnp.where(fixed6, 0.0, gvec)
        dp = jnp.linalg.solve(Smat, gvec).reshape(N, 6)

        # back-substitute points: dx = Ci (gx - sum_m E_m^T dp[kf_m])
        Etdp = jnp.einsum("pmij,pmi->pmj", Epad, dp[kf_pad])  # (P,M,3)
        dx = jnp.einsum("pij,pj->pi", Ci, gx - jnp.sum(Etdp, 1))
        # r = m - pi  =>  step is MINUS the solve (same sign convention
        # as pose_optimization)
        return mt_all - dp, X_all - dx

    cost0, _ = cost_of(mt_min0, X0)

    def cond(state):
        _, _, _, _, it, done = state
        return (it < iters) & ~done

    def body(state):
        mt, X, lam, cost, it, _ = state
        mt_new, X_new = schur_step(mt, X, lam)
        cost_new, _ = cost_of(mt_new, X_new)
        accept = cost_new < cost
        # gain-ratio termination (SparseOptimizerTerminateAction 1e-6,
        # cOptimizer.cpp:88-92); early_stop=False pins the iteration
        # count (bench: honest iterations/sec needs a fixed denominator)
        gain = (cost - cost_new) / jnp.maximum(cost_new, 1e-12)
        done = accept & (gain < GAIN_EPS) & jnp.bool_(early_stop)
        mt = jnp.where(accept, mt_new, mt)
        X = jnp.where(accept, X_new, X)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return mt, X, lam, cost, it + 1, done

    mt, X, _, _, _, _ = jax.lax.while_loop(
        cond, body, (mt_min0, X0, jnp.float32(1e-4), cost0,
                     jnp.int32(0), jnp.bool_(False)))
    _, chi2 = cost_of(mt, X)
    return mt, X, chi2


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_intrinsics(rig: Rig, mt_all: jax.Array, X: jax.Array,
                      obs: BAObservations, *, iters: int = 8,
                      huber: float = HUBER_GLOBAL):
    """Optimize the 17-dof omnidirectional intrinsics of every camera
    ([c, d, e, u0, v0, invP(12)] — VertexOmniCameraParameters,
    g2o_MultiCol_vertices_edges.h:41-79, additive update like the
    reference's operator+) with poses and structure held fixed.

    The reference declares this capability but always fixes the IO
    vertices; here it is a usable photometric-calibration refinement.
    Returns (cams', per-camera 17-vectors, final cost).
    """
    C = rig.M_c.shape[0]
    mc_min = jnp.asarray(rig.M_c_min)
    cams0 = jax.tree.map(jnp.asarray, rig.cams)
    v0 = cams0.to_vector17()                       # (C, 17)

    def residuals(v17):
        cams = cams0.with_vector17(v17)

        def one(i):
            o_kf, o_cam, o_pt = obs.kf[i], obs.cam[i], obs.pt[i]
            cam = jax.tree.map(lambda a: a[o_cam], cams)
            return _project_residual(mt_all[o_kf], mc_min[o_cam], X[o_pt],
                                     cam, obs.uv[i])

        return jax.vmap(one)(jnp.arange(obs.uv.shape[0]))

    def cost_of(v17):
        r = residuals(v17)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        rho = jnp.where(jnp.sqrt(chi2) <= huber, chi2,
                        2 * huber * jnp.sqrt(chi2) - huber * huber)
        return jnp.sum(jnp.where(obs.valid, rho, 0.0))

    def step(v17, lam):
        r = residuals(v17)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        w = _huber_w(chi2, huber) * obs.inv_sigma2
        w = jnp.where(obs.valid, w, 0.0)
        J = jax.jacfwd(residuals)(v17)             # (K, 2, C, 17)
        # per-camera block normal equations (cameras are independent)
        H = jnp.einsum("krci,k,krcj->cij", J, w, J)
        g = jnp.einsum("krci,k,kr->ci", J, w, r)
        Hd = H + lam * jnp.eye(17)[None]
        d = jnp.linalg.solve(Hd, g[..., None])[..., 0]
        return v17 - d

    def body(_, state):
        v, lam, cost = state
        v_new = step(v, lam)
        cost_new = cost_of(v_new)
        accept = cost_new < cost
        v = jnp.where(accept, v_new, v)
        return (v, jnp.where(accept, lam * 0.5, lam * 4.0),
                jnp.where(accept, cost_new, cost))

    v17, _, cost = jax.lax.fori_loop(0, iters, body,
                                     (v0, jnp.float32(1e-3), cost_of(v0)))
    return cams0.with_vector17(v17), v17, cost


@functools.partial(jax.jit, static_argnames=("iters",))
def self_calibrating_bundle_adjustment(rig: Rig, mt_min0: jax.Array,
                                       X0: jax.Array, problem: BAProblem, *,
                                       huber: float = HUBER_GLOBAL,
                                       iters: int = 10):
    """MultiCol BA with FREE rig extrinsics: jointly optimizes body
    poses (N, 6), points (P, 3) and extrinsics M_c (C, 6).

    The camera vertices join the reduced camera system as additional
    6-dof blocks (vertex ids N..N+C-1); every observation couples its
    keyframe AND its camera, so the Schur complement gains kf<->cam
    off-diagonal blocks. Gauge: camera 0's extrinsics stay fixed (plus
    whatever fixed_kf the problem sets).

    Returns (mt (N,6), X (P,3), mc (C,6), chi2 (K,)).
    """
    obs, pt_obs = problem.obs, problem.pt_obs
    N = mt_min0.shape[0]
    P = X0.shape[0]
    K = obs.uv.shape[0]
    C = rig.M_c.shape[0]
    NV = N + C
    mc_min0 = jnp.asarray(rig.M_c_min)
    fixed_vert = jnp.concatenate(
        [problem.fixed_kf, jnp.zeros(C, bool).at[0].set(True)], 0)

    def one_residual(mt_all, mc_all, X_all, i):
        o_kf, o_cam, o_pt = obs.kf[i], obs.cam[i], obs.pt[i]
        cam = _gather_cam(rig.cams, o_cam)
        return _project_residual(mt_all[o_kf], mc_all[o_cam], X_all[o_pt],
                                 cam, obs.uv[i])

    def all_residuals(mt_all, mc_all, X_all):
        return jax.vmap(lambda i: one_residual(mt_all, mc_all, X_all, i))(
            jnp.arange(K))

    def cost_of(mt_all, mc_all, X_all):
        r = all_residuals(mt_all, mc_all, X_all)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        delta2 = huber * huber
        rho = jnp.where(jnp.sqrt(chi2) <= huber, chi2,
                        2 * huber * jnp.sqrt(chi2) - delta2)
        return jnp.sum(jnp.where(obs.valid, rho, 0.0)), chi2

    def schur_step(mt_all, mc_all, X_all, lam):
        from ..ops.geometry import inv3x3

        r = all_residuals(mt_all, mc_all, X_all)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        w = _huber_w(chi2, huber) * obs.inv_sigma2
        w = jnp.where(obs.valid, w, 0.0)

        def jac_one(i):
            o_kf, o_cam, o_pt = obs.kf[i], obs.cam[i], obs.pt[i]
            cam = _gather_cam(rig.cams, o_cam)
            f = lambda mt, mc, X: _project_residual(mt, mc, X, cam, obs.uv[i])
            Jp = jax.jacfwd(f, 0)(mt_all[o_kf], mc_all[o_cam], X_all[o_pt])
            Jm = jax.jacfwd(f, 1)(mt_all[o_kf], mc_all[o_cam], X_all[o_pt])
            Jx = jax.jacfwd(f, 2)(mt_all[o_kf], mc_all[o_cam], X_all[o_pt])
            return Jp, Jm, Jx

        Jp, Jm, Jx = jax.vmap(jac_one)(jnp.arange(K))
        vert_p = obs.kf                    # (K,)
        vert_m = N + obs.cam
        Jp = jnp.where(fixed_vert[vert_p][:, None, None], 0.0, Jp)
        Jm = jnp.where(fixed_vert[vert_m][:, None, None], 0.0, Jm)
        Jx = jnp.where(problem.fixed_pt[obs.pt][:, None, None], 0.0, Jx)
        wJp = Jp * w[:, None, None]
        wJm = Jm * w[:, None, None]
        wJx = Jx * w[:, None, None]

        # vertex blocks (NV,6,6): diagonal + kf<->cam coupling
        H = jnp.zeros((NV, NV, 6, 6))
        H = H.at[vert_p, vert_p].add(jnp.einsum("kri,krj->kij", wJp, Jp))
        H = H.at[vert_m, vert_m].add(jnp.einsum("kri,krj->kij", wJm, Jm))
        Hpm = jnp.einsum("kri,krj->kij", wJp, Jm)
        H = H.at[vert_p, vert_m].add(Hpm)
        H = H.at[vert_m, vert_p].add(jnp.swapaxes(Hpm, -1, -2))
        g = jnp.zeros((NV, 6))
        g = g.at[vert_p].add(jnp.einsum("kri,kr->ki", wJp, r))
        g = g.at[vert_m].add(jnp.einsum("kri,kr->ki", wJm, r))

        Hxx = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", wJx, Jx),
                                  obs.pt, P)
        gx = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", wJx, r), obs.pt, P)
        Ep = jnp.einsum("kri,krj->kij", wJp, Jx)   # (K,6,3) kf-point
        Em = jnp.einsum("kri,krj->kij", wJm, Jx)   # (K,6,3) cam-point

        Ci = inv3x3(Hxx + lam * jnp.eye(3)[None] + jnp.eye(3)[None] * 1e-12)
        Ci = jnp.where(problem.fixed_pt[:, None, None], 0.0, Ci)

        # per-point gathered E rows for BOTH vertex kinds: (P, 2M, 6, 3)
        Epad = jnp.concatenate([Ep[pt_obs], Em[pt_obs]], 1)
        vpad = jnp.concatenate([vert_p[pt_obs], vert_m[pt_obs]], 1)
        ok_pad = jnp.concatenate([obs.valid[pt_obs]] * 2, 1)
        Epad = jnp.where(ok_pad[..., None, None], Epad, 0.0)
        T = jnp.einsum("pmij,pjk->pmik", Epad, Ci)
        # row-at-a-time accumulation (see bundle_adjustment: avoids the
        # (P, 2M, 2M, 6, 6) outer product)
        S = jnp.zeros((NV, NV, 6, 6))
        for mrow in range(T.shape[1]):
            contrib = jnp.einsum("pik,pnjk->pnij", T[:, mrow], Epad)
            S = S.at[vpad[:, mrow, None], vpad].add(contrib)
        Sd = -S + H
        Sd = Sd.at[jnp.arange(NV), jnp.arange(NV)].add(lam * jnp.eye(6)[None])
        Tg = jnp.einsum("pmik,pk->pmi", T, gx)
        g_red = g - jnp.zeros((NV, 6)).at[vpad.reshape(-1)].add(
            Tg.reshape(-1, 6))

        Smat = Sd.transpose(0, 2, 1, 3).reshape(6 * NV, 6 * NV)
        gvec = g_red.reshape(6 * NV)
        fixed6 = jnp.repeat(fixed_vert, 6)
        Smat = jnp.where(fixed6[:, None] | fixed6[None, :],
                         jnp.eye(6 * NV, dtype=Smat.dtype), Smat)
        gvec = jnp.where(fixed6, 0.0, gvec)
        d = jnp.linalg.solve(Smat, gvec).reshape(NV, 6)
        dp, dm = d[:N], d[N:]

        Etdp = jnp.einsum("pmij,pmi->pmj", Epad, d[vpad])
        dx = jnp.einsum("pij,pj->pi", Ci, gx - jnp.sum(Etdp, 1))
        return mt_all - dp, mc_all - dm, X_all - dx

    cost0, _ = cost_of(mt_min0, mc_min0, X0)

    def cond(state):
        return (state[5] < iters) & ~state[6]

    def body(state):
        mt, mc, X, lam, cost, it, _ = state
        mt_n, mc_n, X_n = schur_step(mt, mc, X, lam)
        cost_n, _ = cost_of(mt_n, mc_n, X_n)
        accept = cost_n < cost
        gain = (cost - cost_n) / jnp.maximum(cost_n, 1e-12)
        done = accept & (gain < GAIN_EPS)
        sel = lambda a, b: jnp.where(accept, b, a)
        return (sel(mt, mt_n), sel(mc, mc_n), sel(X, X_n),
                jnp.where(accept, lam * 0.5, lam * 4.0),
                jnp.where(accept, cost_n, cost), it + 1, done)

    mt, mc, X, _, _, _, _ = jax.lax.while_loop(
        cond, body, (mt_min0, mc_min0, X0, jnp.float32(1e-4), cost0,
                     jnp.int32(0), jnp.bool_(False)))
    _, chi2 = cost_of(mt, mc, X)
    return mt, X, mc, chi2
