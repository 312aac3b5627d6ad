"""Multi-chip sharded bundle adjustment (jax.sharding + shard_map).

The reference is single-node shared-memory (SURVEY.md §2.3); its "scale
axis" is map size in global BA / essential-graph optimization. The
TPU-native scaling story: OBSERVATIONS are data-parallel across the
device mesh — each chip differentiates and accumulates its shard of the
normal equations, partial blocks meet in one psum over ICI, and the
small reduced camera system is solved replicated.

Communication analysis (why this layout): per LM iteration each chip
ships Hpp (N*36), Hxx (P*9), gradients, and its E shard (K/D * 18
floats) — tiny next to the Jacobian FLOPs, and all of it rides ICI
collectives (psum / all_gather), never the host.

Two entry points:
  make_sharded_ba_step — one damped Schur step (building block / tests);
  make_sharded_ba      — the full LM with accept/reject + lambda
                         schedule, semantics matching
                         models.optimizer.bundle_adjustment so the
                         global/loop BA can route here transparently
                         when more than one device is attached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.optimizer import BAObservations, _huber_w, _project_residual
from ..ops.geometry import inv3x3
from ..ops.rig import Rig

OBS_AXIS = "obs"


def make_obs_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(OBS_AXIS))


def pad_obs_to_multiple(obs: BAObservations, n_devices: int) -> BAObservations:
    """Pad the observation table so K divides the mesh size."""
    k = obs.uv.shape[0]
    k_pad = -(-k // n_devices) * n_devices
    if k_pad == k:
        return obs
    pad = k_pad - k

    def padf(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0)

    return BAObservations(
        uv=padf(obs.uv), kf=padf(obs.kf), cam=padf(obs.cam),
        pt=padf(obs.pt), inv_sigma2=padf(obs.inv_sigma2),
        valid=padf(obs.valid, False))


def _make_kernels(rig: Rig, n_kf: int, n_pt: int, huber: float):
    """Shared per-shard math: residual blocks and robust cost."""
    mc_min = rig.M_c_min
    N, Pn = n_kf, n_pt
    delta2 = huber * huber

    def residuals(mt_all, X_all, obs: BAObservations):
        K = obs.uv.shape[0]

        def one(i):
            o_kf, o_cam, o_pt = obs.kf[i], obs.cam[i], obs.pt[i]
            cam = jax.tree.map(lambda a: a[o_cam], rig.cams)
            return _project_residual(mt_all[o_kf], mc_min[o_cam],
                                     X_all[o_pt], cam, obs.uv[i])

        return jax.vmap(one)(jnp.arange(K))

    def cost_local(mt_all, X_all, obs):
        r = residuals(mt_all, X_all, obs)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        rho = jnp.where(jnp.sqrt(chi2) <= huber, chi2,
                        2 * huber * jnp.sqrt(chi2) - delta2)
        return jnp.sum(jnp.where(obs.valid, rho, 0.0))

    def local_blocks(mt_all, X_all, obs: BAObservations):
        """Per-shard residuals/Jacobians/blocks (runs on each device)."""
        K = obs.uv.shape[0]

        def one(i):
            o_kf, o_cam, o_pt = obs.kf[i], obs.cam[i], obs.pt[i]
            cam = jax.tree.map(lambda a: a[o_cam], rig.cams)
            f = lambda mt, X: _project_residual(mt, mc_min[o_cam], X, cam,
                                                obs.uv[i])
            r = f(mt_all[o_kf], X_all[o_pt])
            Jp = jax.jacfwd(lambda mt: f(mt, X_all[o_pt]))(mt_all[o_kf])
            Jx = jax.jacfwd(lambda X: f(mt_all[o_kf], X))(X_all[o_pt])
            return r, Jp, Jx

        r, Jp, Jx = jax.vmap(one)(jnp.arange(K))
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        w = _huber_w(chi2, huber) * obs.inv_sigma2
        w = jnp.where(obs.valid, w, 0.0)
        rho = jnp.where(jnp.sqrt(chi2) <= huber, chi2,
                        2 * huber * jnp.sqrt(chi2) - delta2)
        cost = jnp.sum(jnp.where(obs.valid, rho, 0.0))

        wJp = Jp * w[:, None, None]
        wJx = Jx * w[:, None, None]
        Hpp = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", wJp, Jp),
                                  obs.kf, N)
        gp = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", wJp, r), obs.kf, N)
        Hxx = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", wJx, Jx),
                                  obs.pt, Pn)
        gx = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", wJx, r), obs.pt, Pn)
        E = jnp.einsum("kri,krj->kij", wJp, Jx)   # (K_shard, 6, 3)
        return Hpp, Hxx, E, gp, gx, cost

    return cost_local, local_blocks


def _sharded_solve(mt_all, X_all, obs, pt_obs, fixed_kf, fixed_pt, lam,
                   local_blocks, n_kf: int):
    """One damped Schur solve inside a shard_map body; returns
    (mt', X', cost-at-input). All collectives ride OBS_AXIS."""
    N = n_kf
    Hpp, Hxx, E_local, gp, gx, cost = local_blocks(mt_all, X_all, obs)
    # partial blocks meet over ICI
    Hpp = jax.lax.psum(Hpp, OBS_AXIS)
    Hxx = jax.lax.psum(Hxx, OBS_AXIS)
    gp = jax.lax.psum(gp, OBS_AXIS)
    gx = jax.lax.psum(gx, OBS_AXIS)
    cost = jax.lax.psum(cost, OBS_AXIS)
    # every device needs all E rows for the per-point Schur gather
    E = jax.lax.all_gather(E_local, OBS_AXIS, tiled=True)
    zero_kf = fixed_kf[:, None, None]
    Hpp = jnp.where(zero_kf, 0.0, Hpp)
    gp = jnp.where(fixed_kf[:, None], 0.0, gp)

    Hxx_d = Hxx + lam * jnp.eye(3)[None]
    Ci = inv3x3(Hxx_d + jnp.eye(3)[None] * 1e-12)
    Ci = jnp.where(fixed_pt[:, None, None], 0.0, Ci)

    kf_full = jax.lax.all_gather(obs.kf, OBS_AXIS, tiled=True)
    pt_valid_full = jax.lax.all_gather(obs.valid, OBS_AXIS, tiled=True)

    Epad = E[pt_obs]
    kf_pad = kf_full[pt_obs]
    ok_pad = pt_valid_full[pt_obs]
    Epad = jnp.where(ok_pad[..., None, None], Epad, 0.0)
    T = jnp.einsum("pmij,pjk->pmik", Epad, Ci)
    # obs-row-at-a-time accumulation: peak (P, M, 6, 6), not the
    # (P, M, M, 6, 6) outer product (see models/optimizer.py)
    S = jnp.zeros((N, N, 6, 6))
    for mrow in range(T.shape[1]):
        contrib = jnp.einsum("pik,pnjk->pnij", T[:, mrow], Epad)
        S = S.at[kf_pad[:, mrow, None], kf_pad].add(contrib)
    Sd = -S
    Sd = Sd.at[jnp.arange(N), jnp.arange(N)].add(
        Hpp + lam * jnp.eye(6)[None])
    Tg = jnp.einsum("pmik,pk->pmi", T, gx)
    g_red = gp - jnp.zeros((N, 6)).at[kf_pad.reshape(-1)].add(
        Tg.reshape(-1, 6))

    Smat = Sd.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    gvec = g_red.reshape(6 * N)
    fixed6 = jnp.repeat(fixed_kf, 6)
    Smat = jnp.where(fixed6[:, None] | fixed6[None, :],
                     jnp.eye(6 * N, dtype=Smat.dtype), Smat)
    gvec = jnp.where(fixed6, 0.0, gvec)
    dp = jnp.linalg.solve(Smat, gvec).reshape(N, 6)

    Etdp = jnp.einsum("pmij,pmi->pmj", Epad, dp[kf_pad])
    dx = jnp.einsum("pij,pj->pi", Ci, gx - jnp.sum(Etdp, 1))
    return mt_all - dp, X_all - dx, cost


def make_sharded_ba_step(mesh: Mesh, rig: Rig, n_kf: int, n_pt: int,
                         huber: float = 5.991 ** 0.5):
    """Build one jitted LM/Schur step with observations sharded over the
    mesh's OBS_AXIS. Signature:
        step(mt_min (N,6), X (P,3), obs [sharded], pt_obs (P,M), fixed_kf,
             fixed_pt, lam) -> (mt_min', X', total_cost)
    """
    # the rig is captured by closure (not a traced argument), so its
    # numpy calibration leaves must become device arrays for dynamic
    # (traced) camera indexing inside the kernel
    rig = jax.tree.map(jnp.asarray, rig)
    _, local_blocks = _make_kernels(rig, n_kf, n_pt, huber)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(OBS_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    def step(mt_all, X_all, obs, pt_obs, fixed_kf, fixed_pt, lam):
        return _sharded_solve(mt_all, X_all, obs, pt_obs, fixed_kf,
                              fixed_pt, lam, local_blocks, n_kf)

    return jax.jit(step)


def make_sharded_ba(mesh: Mesh, rig: Rig, n_kf: int, n_pt: int, *,
                    iters: int = 10, huber: float = 5.991 ** 0.5):
    """Full sharded LM bundle adjustment: the multi-iteration
    accept/reject loop of models.optimizer.bundle_adjustment (lambda
    halved on accept, quadrupled on reject, cOptimizer.cpp:88-92
    semantics) with every iteration's Jacobian work data-parallel over
    the mesh. Signature:
        ba(mt_min (N,6), X (P,3), obs [sharded], pt_obs, fixed_kf,
           fixed_pt) -> (mt_min', X', final_cost)
    """
    rig = jax.tree.map(jnp.asarray, rig)
    cost_local, local_blocks = _make_kernels(rig, n_kf, n_pt, huber)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(OBS_AXIS), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    def ba(mt0, X0, obs, pt_obs, fixed_kf, fixed_pt):
        def cost_of(mt, X):
            return jax.lax.psum(cost_local(mt, X, obs), OBS_AXIS)

        cost0 = cost_of(mt0, X0)

        def cond(state):
            return (state[4] < iters) & ~state[5]

        def body(state):
            mt, X, lam, cost, it, _ = state
            mt_n, X_n, _ = _sharded_solve(mt, X, obs, pt_obs, fixed_kf,
                                          fixed_pt, lam, local_blocks, n_kf)
            cost_n = cost_of(mt_n, X_n)
            accept = cost_n < cost
            # gain-ratio termination — identical schedule to
            # models.optimizer.bundle_adjustment so the sharded and
            # single-device paths stay bit-equivalent
            gain = (cost - cost_n) / jnp.maximum(cost_n, 1e-12)
            done = accept & (gain < 1e-6)
            mt = jnp.where(accept, mt_n, mt)
            X = jnp.where(accept, X_n, X)
            cost = jnp.where(accept, cost_n, cost)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return mt, X, lam, cost, it + 1, done

        mt, X, _, cost, _, _ = jax.lax.while_loop(
            cond, body, (mt0, X0, jnp.float32(1e-4), cost0,
                         jnp.int32(0), jnp.bool_(False)))
        return mt, X, cost

    return jax.jit(ba)
