"""Chunked device-scan tracking (the throughput mode): B steady-state
WORKING frames per dispatch via tracking.working_scan_chunk /
MultiColSLAM.track_batch must produce the SAME trajectory quality as
the per-frame path on the same sequence, with keyframes still created
and mapped. The per-frame path (cTracking.cpp:237-346 semantics) stays
the latency-parity reference; the chunk path's documented deviations
are snapshot staleness bounded by the chunk and <B-frame keyframe
insertion lag — both of the same order the async mapper already
introduces (cSystem.cpp:96-110).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.ops import rig as rig_ops
from multicol_slam_tpu.utils import config_io, synthetic
from multicol_slam_tpu.utils.trajectory import ate_rmse

CALIB_DIR = "/root/reference/Examples/Lafida"
N = 44


def _run(batched: bool):
    full_rig, _ = config_io.load_mcs(CALIB_DIR, dtype=np.float32)
    rig = rig_ops.scale_rig(full_rig, 0.5)
    settings = config_io.SlamSettings(n_features=300, n_levels=4, fps=8.0)
    with jax.enable_x64(False):
        slam = MultiColSLAM(settings=settings, rig=rig,
                            capacity_pts=25000, capacity_kfs=64)
        render = synthetic.make_renderer(rig)
        gt = synthetic.bench_trajectory(N, radius=0.7)
        frames = render(jnp.asarray(np.stack(gt), jnp.float32))
        ts = [t / 8.0 for t in range(N)]
        if batched:
            res = slam.track_batch(frames, ts, chunk=8)
        else:
            res = [slam.track(frames[t], ts[t]) for t in range(N)]
        state = slam.state.name
        n_kf, n_pt = slam.map.n_keyframes(), slam.map.n_points()
        disp = list(slam.tracker.dispatches_per_frame)
        slam.shutdown()
    used = [i for i, M in enumerate(res) if M is not None]
    est = np.stack([res[i][:3, 3] for i in used])
    gtp = np.stack([gt[i][:3, 3] for i in used])
    return dict(state=state, used=used, ate=float(ate_rmse(est, gtp)),
                n_kf=n_kf, n_pt=n_pt, res=res, disp=disp)


def test_chunked_matches_per_frame_quality():
    a = _run(batched=False)
    b = _run(batched=True)
    assert a["state"] == "WORKING" and b["state"] == "WORKING"
    # same frames tracked (init handled by the per-frame fallback)
    assert b["used"] == a["used"], (a["used"], b["used"])
    # trajectory quality matches the per-frame path
    assert b["ate"] < max(2.0 * a["ate"], 0.02), (a["ate"], b["ate"])
    # keyframes still created and mapped through the chunk walk
    assert b["n_kf"] >= 0.6 * a["n_kf"], (a["n_kf"], b["n_kf"])
    assert b["n_pt"] >= 0.5 * a["n_pt"], (a["n_pt"], b["n_pt"])
    # per-frame poses stay in the same basin where both tracked. The
    # two runs legitimately differ (keyframe timing shifts which frames
    # anchor the map; measured ~13 vs ~17 KFs with the CHUNKED run's
    # ATE the better of the two), so the contract is a loose pairwise
    # bound plus the tight ATE bound above — not bitwise equivalence.
    for i in b["used"]:
        d = np.linalg.norm(a["res"][i][:3, 3] - b["res"][i][:3, 3])
        assert d < 0.15, f"frame {i}: pose diverged {d:.3f} m"
    # the fast path actually engaged: most steady-state frames ran
    # inside a chunk dispatch (0 dispatches recorded on follower frames)
    steady = b["disp"][b["used"][0] + 2:]
    assert steady.count(0) >= len(steady) // 3, steady
