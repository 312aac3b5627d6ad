"""Shared global bundle adjustment entry (cOptimizer::GlobalBundleAdjustment,
cOptimizer.cpp:57-257): joint LM over ALL keyframe poses + points with a
caller-chosen gauge keyframe set.

One routing point for every full-map BA in the framework — the System's
user-facing ``global_bundle_adjustment`` AND the loop closer's post-loop
global BA (ORB-SLAM2's RunGlobalBundleAdjustment role) call here, so the
multi-chip story is uniform: when more than one device is attached the
observation table is sharded over the device mesh and each LM
iteration's Jacobian work runs data-parallel with psum/all_gather over
ICI (parallel/ba_sharding.make_sharded_ba); single-chip falls back to
the in-process segment-sum Schur adjuster.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..ops.rig import Rig


def run_global_ba(rig: Rig, m, fixed_ids: Sequence[int],
                  scale_factor: float, *, iters: int = 10,
                  huber: Optional[float] = None) -> float:
    """Assemble + solve the full-map BA and write the result back into
    the MapStore. ``fixed_ids``: keyframe ids held fixed as the gauge
    (the reference fixes KF0, cOptimizer.cpp:96-99; the loop closer
    fixes the loop keyframe so the corrected region anchors the map).
    Returns the final robust cost (-1.0 if the problem is degenerate)."""
    import jax
    import jax.numpy as jnp

    from . import optimizer as opt
    from .local_mapping import assemble_ba_problem

    if huber is None:
        huber = opt.HUBER_GLOBAL
    kfs = [int(k) for k in m.keyframe_ids().tolist()]
    if len(kfs) < 2:
        return -1.0
    fixed_set = set(int(k) for k in fixed_ids)
    fixed_mask = np.asarray([k in fixed_set for k in kfs])
    if not fixed_mask.any():
        fixed_mask[int(np.argmin(kfs))] = True
    built = assemble_ba_problem(m, kfs, fixed_mask, scale_factor)
    if built is None:
        return -1.0
    problem, mt0, X0, pts, _ = built

    devices = jax.devices()
    if len(devices) > 1:
        from jax.sharding import Mesh

        from ..parallel import ba_sharding
        mesh = Mesh(np.array(devices), (ba_sharding.OBS_AXIS,))
        obs = ba_sharding.pad_obs_to_multiple(problem.obs, len(devices))
        ba = ba_sharding.make_sharded_ba(
            mesh, rig, n_kf=mt0.shape[0], n_pt=X0.shape[0],
            iters=iters, huber=huber)
        mt, X, cost = ba(jnp.asarray(mt0), jnp.asarray(X0), obs,
                         problem.pt_obs, problem.fixed_kf,
                         problem.fixed_pt)
        cost = float(cost)
    else:
        mt, X, chi2 = opt.bundle_adjustment(
            rig, jnp.asarray(mt0), jnp.asarray(X0), problem,
            huber=huber, iters=iters)
        chi2 = np.asarray(chi2)
        cost = float(chi2[np.asarray(problem.obs.valid)].sum())

    mt = np.asarray(mt)
    for i, k in enumerate(kfs):
        if not fixed_mask[i]:
            m.kf_pose[k] = mt[i]
    m.pt_pos[pts] = np.asarray(X, np.float32)[:len(pts)]
    return cost
