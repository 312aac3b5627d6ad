"""Sim3 refinement + essential-graph optimization (cOptimizerLoopStuff.cpp).

OptimizeSim3 (:58-264): one free Sim3 S12 between two MultiKeyFrames,
bidirectional rig-reprojection residuals over matched landmark pairs,
Huber 1.345*4, iterative with outlier gating. The reference's
camera-aware vertex (VertexSim3Expmap_Multi with cam_map1/2 projecting
through Mc^-1) maps here to batched per-observation camera indices.

OptimizeEssentialGraph (:267-513): Sim3 pose graph over all keyframes —
edges from loop connections + spanning tree + loop edges + strong
covisibility (weight >= 100); residual log(S_meas_ij S_i S_j^-1)
(g2o_MultiCol_sim3_expmap.h:47-111 edgeSim3); solved by Gauss-Newton
with autodiff Jacobians, manifold update S <- exp(delta) o S; SE3
recovery divides t by s (:480-484).

TPU-first: residuals/Jacobians are vmapped over edges; the normal
equations are small & dense (7 dof x N keyframes) — one linear solve
per iteration on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import world_to_img
from ..ops.geometry import inv_se3
from ..ops.rig import Rig
from ..ops.sim3 import Sim3, sim3_exp, sim3_log

HUBER_SIM3 = 1.345 * 4.0   # stdSim = 4.0 (cOptimizerLoopStuff.cpp:55)


class Sim3Obs(NamedTuple):
    """Matched landmark pairs for OptimizeSim3 (padded)."""

    X1: jax.Array        # (K, 3) points in KF1 BODY frame
    X2: jax.Array        # (K, 3) points in KF2 BODY frame
    uv1: jax.Array       # (K, 2) observation of the pair in KF1
    uv2: jax.Array       # (K, 2) observation in KF2
    cam1: jax.Array      # (K,) camera index of obs1
    cam2: jax.Array      # (K,)
    inv_sigma2_1: jax.Array
    inv_sigma2_2: jax.Array
    valid: jax.Array


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(rig: Rig, S12_init: Sim3, obs: Sim3Obs,
                  iters: int = 10, huber: float = HUBER_SIM3,
                  fix_scale: bool = False):
    """LM on the 7-dof S12 (x1_body = S12 x2_body).

    Returns (S12, inlier_mask, n_inliers); inliers gated at chi2 <=
    9.21 * sigma2-ish (the reference gates both directions with
    huber^2-style thresholds after optimization)."""
    Mc_inv = inv_se3(jnp.asarray(rig.M_c))
    cams = jax.tree.map(jnp.asarray, rig.cams)

    def residuals(v7):
        dS = sim3_exp(v7)
        S = dS.compose(S12_init)
        Si = S.inverse()

        def one(X1, X2, uv1, uv2, c1, c2):
            # project S12 * X2 into KF1's camera c1
            x1p = S.apply(X2)
            T1 = Mc_inv[c1]
            cam1 = jax.tree.map(lambda a: a[c1], cams)
            p1 = world_to_img(cam1, T1[:3, :3] @ x1p + T1[:3, 3])
            # project S12^-1 * X1 into KF2's camera c2
            x2p = Si.apply(X1)
            T2 = Mc_inv[c2]
            cam2 = jax.tree.map(lambda a: a[c2], cams)
            p2 = world_to_img(cam2, T2[:3, :3] @ x2p + T2[:3, 3])
            return uv1 - p1, uv2 - p2

        r1, r2 = jax.vmap(one)(obs.X1, obs.X2, obs.uv1, obs.uv2,
                               obs.cam1, obs.cam2)
        return r1, r2

    def chi2_pair(v7):
        r1, r2 = residuals(v7)
        c1 = jnp.sum(r1 * r1, -1) * obs.inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * obs.inv_sigma2_2
        return c1, c2

    def cost_of(v7, w_valid):
        c1, c2 = chi2_pair(v7)

        def rho(c):
            e = jnp.sqrt(jnp.maximum(c, 1e-12))
            return jnp.where(e <= huber, c, 2 * huber * e - huber * huber)

        return jnp.sum(jnp.where(w_valid, rho(c1) + rho(c2), 0.0))

    def step(v7, lam, w_valid):
        def flat_res(v):
            r1, r2 = residuals(v)
            w1 = jnp.sqrt(obs.inv_sigma2_1 * w_valid)
            w2 = jnp.sqrt(obs.inv_sigma2_2 * w_valid)
            return jnp.concatenate([r1 * w1[:, None], r2 * w2[:, None]], 0)

        r = flat_res(v7)
        J = jax.jacfwd(flat_res)(v7)          # (2K, 2, 7)
        r = r.reshape(-1)
        J = J.reshape(-1, 7)
        # Huber IRLS weights on stacked residual pairs
        c1, c2 = chi2_pair(v7)
        c = jnp.concatenate([c1, c2], 0)
        e = jnp.sqrt(jnp.maximum(c, 1e-12))
        w_h = jnp.where(e <= huber, 1.0, huber / e)
        w_h = jnp.repeat(w_h, 2)
        H = J.T @ (J * w_h[:, None])
        g = J.T @ (r * w_h)
        if fix_scale:
            # zero out the scale column/row (reference fix-scale variant)
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        d = jnp.linalg.solve(H + lam * jnp.eye(7), g)
        return v7 - d

    dtype = jnp.float64 if obs.X1.dtype == jnp.float64 else jnp.float32
    th = 9.21  # chi2(2dof, 99%) gate per direction (cSim3Solver gate)

    def lm_rounds(v7, active, n):
        w_valid = active.astype(dtype)
        lam0 = jnp.asarray(1e-4, dtype)
        cost0 = cost_of(v7, active)

        def body(_, state):
            v, lam, cost = state
            v_new = step(v, lam, w_valid)
            cost_new = cost_of(v_new, active)
            accept = cost_new < cost
            v = jnp.where(accept, v_new, v)
            cost = jnp.where(accept, cost_new, cost)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return v, lam, cost

        v7, _, _ = jax.lax.fori_loop(0, n, body, (v7, lam0, cost0))
        return v7

    # round 1 -> outlier gate -> round 2 (cOptimizerLoopStuff.cpp:208-246)
    v7 = lm_rounds(jnp.zeros(7, dtype), obs.valid, iters)
    c1, c2 = chi2_pair(v7)
    active = obs.valid & (c1 <= th) & (c2 <= th)
    v7 = lm_rounds(v7, active, iters)
    c1, c2 = chi2_pair(v7)
    inlier = obs.valid & (c1 <= th) & (c2 <= th)
    S_out = sim3_exp(v7).compose(S12_init)
    return S_out, inlier, jnp.sum(inlier)


# ---------------------------------------------------------------------------
# Essential graph
# ---------------------------------------------------------------------------

class EssentialGraph(NamedTuple):
    """Pose-graph problem over N keyframes (padded edges)."""

    edge_i: jax.Array      # (E,) int32
    edge_j: jax.Array      # (E,)
    meas: jax.Array        # (E, 7) sim3_log of S_meas_ij = S_i S_j^-1 at build
    valid: jax.Array       # (E,) bool
    fixed: jax.Array       # (N,) bool


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_essential_graph(S0_log: jax.Array, graph: EssentialGraph,
                             iters: int = 20, fix_scale: bool = False):
    """Gauss-Newton on the Sim3 pose graph.

    S0_log: (N, 7) initial vertex estimates as sim3_log of S_iw
    (world-to-keyframe sim3). Returns (N, 7) optimized logs. Residual per
    edge: log( S_meas_ij o S_j o S_i^-1 )  == 0 when consistent.

    fix_scale: hold every vertex's scale at its initial value — the
    reference's VertexSim3Expmap_Multi carries exactly this gate
    (g2o_MultiCol_sim3_expmap.h:63-66, oplusImpl zeroes update[6]) but
    never enables it; for a metric multi-camera rig scale IS observable
    and letting it float lets a loop discrepancy be absorbed by a scale
    ramp around the cycle (warping the map) instead of by the rotation/
    translation distribution the correction is for.
    """
    N = S0_log.shape[0]

    def edge_residual(vi_log, vj_log, meas_log):
        Si = sim3_exp(vi_log)
        Sj = sim3_exp(vj_log)
        Sm = sim3_exp(meas_log)
        return sim3_log(Sm.compose(Sj).compose(Si.inverse()))

    def all_residuals(logs):
        return jax.vmap(lambda i, j, m: edge_residual(logs[i], logs[j], m))(
            graph.edge_i, graph.edge_j, graph.meas)

    def gn_step(logs):
        # Jacobians wrt the two endpoint logs (7x7 each) via jacfwd
        def res_ij(vi, vj, m):
            return edge_residual(vi, vj, m)

        r = all_residuals(logs)                              # (E, 7)
        Ji = jax.vmap(jax.jacfwd(res_ij, argnums=0))(
            logs[graph.edge_i], logs[graph.edge_j], graph.meas)  # (E,7,7)
        Jj = jax.vmap(jax.jacfwd(res_ij, argnums=1))(
            logs[graph.edge_i], logs[graph.edge_j], graph.meas)
        w = graph.valid.astype(r.dtype)
        Ji = Ji * w[:, None, None]
        Jj = Jj * w[:, None, None]
        rw = r * w[:, None]

        H = jnp.zeros((N, N, 7, 7), r.dtype)
        g = jnp.zeros((N, 7), r.dtype)
        Hii = jnp.einsum("eri,erj->eij", Ji, Ji)
        Hjj = jnp.einsum("eri,erj->eij", Jj, Jj)
        Hij = jnp.einsum("eri,erj->eij", Ji, Jj)
        H = H.at[graph.edge_i, graph.edge_i].add(Hii)
        H = H.at[graph.edge_j, graph.edge_j].add(Hjj)
        H = H.at[graph.edge_i, graph.edge_j].add(Hij)
        H = H.at[graph.edge_j, graph.edge_i].add(
            jnp.swapaxes(Hij, -1, -2))
        g = g.at[graph.edge_i].add(jnp.einsum("eri,er->ei", Ji, rw))
        g = g.at[graph.edge_j].add(jnp.einsum("eri,er->ei", Jj, rw))

        Hmat = H.transpose(0, 2, 1, 3).reshape(7 * N, 7 * N)
        gvec = g.reshape(7 * N)
        fixed7 = jnp.repeat(graph.fixed, 7)
        if fix_scale:
            # freeze the sigma dof of every vertex (log layout
            # [omega, upsilon, sigma]: component 6)
            fixed7 = fixed7 | (jnp.arange(fixed7.shape[0]) % 7 == 6)
        lam = 1e-6
        Hmat = Hmat + lam * jnp.eye(7 * N, dtype=Hmat.dtype)
        Hmat = jnp.where(fixed7[:, None] | fixed7[None, :],
                         jnp.eye(7 * N, dtype=Hmat.dtype), Hmat)
        gvec = jnp.where(fixed7, 0.0, gvec)
        d = jnp.linalg.solve(Hmat, gvec).reshape(N, 7)
        # manifold-ish update on the log parametrization (additive — the
        # residual is differentiated in the same chart)
        return logs - d

    logs = S0_log
    logs = jax.lax.fori_loop(0, iters, lambda _, l: gn_step(l), logs)
    return logs
