"""Benchmark: the honest numbers, on real TPU hardware.

Prints ONE JSON line. The primary metric is the cross-round headline
3cam_tracking_fps — since round 4 measured through the PRODUCTION
tracker jaxprs: a lax.scan whose body is exactly the WORKING-frame
computation the system dispatches (extraction + motion tracking +
local-map tracking, fused into ONE dispatch by working_track_step,
tracking.py) against a real map built by the system itself, at the
real 754x480 Lafida resolution and feature budget. Device-timed (one dispatch tracks every frame), so the number
is pure device throughput — immune to host contention and tunnel RTT.
Baseline = the reference's de-facto bar of 25 fps 3-camera real-time
tracking (BASELINE.md; Slam_Settings fps=25,
mult_col_slam_lafida.cpp:134-143 paces frames at 1/fps).

"extra" carries the FULL honest picture (VERDICT round 1, item 3):
  system_fps / working_frac / ate_m / stage_ms
      — the COMPLETE pipeline (keyframe policy, local mapping incl.
        triangulation + local BA + culling, loop-closer bookkeeping)
        over the synthetic benchmark sequence (bench_trajectory: a
        deliberate init opening + smooth arc, like the reference's
        Lafida run starting at frame 25). NOTE: the tracker
        synchronizes with the host between stages for map bookkeeping,
        so through this harness's REMOTE-TPU tunnel each frame pays
        several dispatch round-trips; dispatch_rtt_ms below is that
        measured per-call latency floor. On a locally attached chip
        the same path pays microseconds, not hundreds of ms.
  dispatch_rtt_ms       — measured round-trip of a trivial jit call on
                          this backend (the per-dispatch latency floor
                          every host-synchronous stage pays)
  extract_match_*       — extraction+matching timed on this host's CPU
                          backend vs TPU (the >10x north star of
                          BASELINE.md). Since round 4 the primary
                          comparison is DEVICE-TIMED on BOTH backends
                          (lax.scan over a frame batch — neither side
                          pays per-dispatch tunnel RTT); the
                          dispatch-inclusive numbers are kept alongside
                          (extract_match_*_host_ms).
  kernel_loop_fps       — the round-1..3 synthetic stand-in hot loop
                          (ground-truth landmark refresh, no local-map
                          stage), kept for cross-round continuity
  ba_chi2_ratio         — Schur BA final chi2 / chi2 of the noise-only
                          optimum on a synthetic ground-truth problem
                          (the g2o-parity proxy: g2o converges to the
                          same statistical optimum; it is not buildable
                          in this image, so parity is asserted against
                          the attainable optimum, not g2o binaries)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

CALIB = "/root/reference/Examples/Lafida"
N_LEVELS, N_FEATURES = 8, 400

# Wall-clock budget for the WHOLE bench (the driver kills long runs; a
# partial JSON beats a dead one — round 2's lesson: rc=124 with NOTHING
# printed). Compiles through a remote-TPU tunnel can cost minutes per
# jit bucket on a cold cache, so (a) the headline JSON is printed and
# flushed the moment the hot loop finishes, (b) every secondary stage
# checks the remaining budget and degrades gracefully, (c) a second,
# enriched JSON line with the SAME metric is printed at the end — the
# driver's last-complete-line parse accepts either.
BUDGET_S = float(os.environ.get("MCSLAM_BENCH_BUDGET_S", 570))
_T_START = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T_START)


# ---------------------------------------------------------------------------
# shared setup
# ---------------------------------------------------------------------------

def _ring_rig(n_cams=8):
    """8 Lafida-0 cameras on a 30cm ring yawed 45deg apart
    (BASELINE.json configs[4] stretch shape; mirrors
    tests/test_eight_camera.py)."""
    import jax
    from multicol_slam_tpu.ops import rig as rig_ops
    from multicol_slam_tpu.ops.camera import stack_cameras
    from multicol_slam_tpu.utils import config_io

    base, _ = config_io.load_mcs(CALIB, dtype=np.float32)
    cam0 = jax.tree.map(lambda x: x[0], base.cams)
    cams = stack_cameras([cam0] * n_cams)
    mc = np.zeros((n_cams, 6))
    for c in range(n_cams):
        ang = 2 * np.pi * c / n_cams
        mc[c, 1] = np.tan(ang / 2.0)
        mc[c, 3] = 0.3 * np.sin(ang)
        mc[c, 5] = 0.3 * np.cos(ang)
    return rig_ops.rig_from_cayley(mc.astype(np.float32), cams)


def _make_extract_and_frames(n_frames=12, rig=None, use_mdbrief=False):
    import jax
    import jax.numpy as jnp
    from multicol_slam_tpu.models import extractor as ext
    from multicol_slam_tpu.ops.camera import make_extraction_masks
    from multicol_slam_tpu.utils import config_io, synthetic

    if rig is None:
        rig, _ = config_io.load_mcs(CALIB, dtype=np.float32)
    masks = []
    for c in range(rig.n_cams):
        cam = jax.tree.map(lambda x: x[c], rig.cams)
        masks.append(make_extraction_masks(float(cam.u0), float(cam.v0),
                                           754, 480, N_LEVELS, 1.2))
    masks_lvl = [np.stack([m[l] for m in masks]) for l in range(N_LEVELS)]
    cfg = ext.ExtractorConfig(n_features=N_FEATURES, n_levels=N_LEVELS,
                              use_dbrief=use_mdbrief,
                              learn_masks=use_mdbrief)
    extract = ext.make_extractor(cfg, rig.cams, masks_lvl, (480, 754))
    render = synthetic.make_renderer(rig)
    gt = synthetic.smooth_trajectory(100, radius=0.6)
    # frames stay DEVICE-RESIDENT and render as ONE batched dispatch:
    # fetching rendered frames to host and re-uploading them costs two
    # ~4.3MB trips per frame through the device link — through this
    # harness's remote-TPU tunnel, the device->host direction stalls
    # for tens of seconds at a time (measured: the 12-frame fetch alone
    # cost 50..700s run-to-run, dwarfing every compile in the stage) —
    # and every separate dispatch risks a stall of its own.
    frames = list(render(jnp.asarray(gt[:n_frames], jnp.float32)))
    jax.block_until_ready(frames[-1])
    return rig, extract, frames, gt


# ---------------------------------------------------------------------------
# (a) full-system fps: the primary metric
# ---------------------------------------------------------------------------

def bench_full_system(n_frames=90, async_mapping=True, chunk=1,
                      warm=True):
    """Run the COMPLETE pipeline (keyframes, mapping, BA, loop closer)
    twice over the same synthetic sequence: pass 1 warms every jit
    bucket, pass 2 is timed end to end.

    async_mapping=True exercises the production pipeline split: local
    mapping runs on the worker thread with the reference's
    AcceptMultiKeyFrames/InterruptBA backpressure (cSystem.cpp:96-110,
    cTracking.cpp:922-935), so keyframe frames no longer stall the
    tracker for a full mapping pass. mapping_ms_median reports the
    concurrent mapping pass cost alongside.

    chunk>1 feeds frames through MultiColSLAM.track_batch — the chunked
    device-scan throughput mode (working_scan_chunk: one dispatch + one
    fetch per chunk of steady WORKING frames); per-frame times are then
    the amortized per-chunk wall time, so system_fps_steady measures the
    pipeline's sustained throughput at +chunk frames of latency.

    warm=False skips the warm pass entirely: bench_production_tracker's
    map build already compiled the per-frame buckets (and the
    persistent compile cache carries them across runs), so when the
    production headline succeeded the timed pass may hit at most a few
    cold buckets — the MEDIAN-based steady figure is robust to that,
    and the budget saved keeps the later stages alive (VERDICT r4:
    no starved stages).

    The sequence is bench_trajectory: a deliberate lateral opening for
    bootstrap parallax, then the smooth arc — mirroring the reference's
    own protocol (Lafida evaluation starts at frame 25, after the
    operator's init motion; Slam_Settings_indoor1.yaml:54-56). On the
    bare arc initialization needs ~30 frames and the bench measured a
    system that spent the run initializing (BENCH_r03, VERDICT r3 #1).

    Deadline-aware: if the warm pass is eating the budget (cold compile
    cache through a slow tunnel), the sequence is truncated at the last
    warmed frame — the timed pass then replays exactly that prefix, so
    it hits only warm buckets and still measures the full pipeline."""
    import jax
    import jax.numpy as jnp
    from multicol_slam_tpu.models.system import MultiColSLAM
    from multicol_slam_tpu.utils import config_io, synthetic
    from multicol_slam_tpu.utils.trajectory import ate_rmse

    settings = config_io.SlamSettings(
        n_features=N_FEATURES, n_levels=N_LEVELS, fps=25.0)

    gt = synthetic.bench_trajectory(n_frames, radius=0.8)
    # leave at least this much budget for the timed pass + secondaries
    warm_deadline = _remaining() * 0.55

    def one_pass(timed, upto):
        slam = MultiColSLAM(CALIB, settings=settings,
                            capacity_pts=30000, capacity_kfs=128,
                            async_mapping=async_mapping)
        render = synthetic.make_renderer(slam.rig)
        # device-resident frames, chunk-batched renders: see
        # _make_extract_and_frames (chunks bound device memory)
        frames = []
        for s in range(0, upto, 24):
            frames.extend(render(jnp.asarray(gt[s:min(s + 24, upto)],
                                             jnp.float32)))
        jax.block_until_ready(frames[-1])
        times = []
        est, used = [], []
        done = upto
        t_start = time.perf_counter()
        t = 0
        while t < upto:
            t0 = time.perf_counter()
            if chunk > 1 and upto - t >= chunk:
                Ms = slam.track_batch(
                    jnp.stack(frames[t:t + chunk]),
                    [x / 25.0 for x in range(t, t + chunk)], chunk=chunk)
            else:
                Ms = [slam.track(frames[t], t / 25.0)]
            dt = (time.perf_counter() - t0) / len(Ms)
            for j, M in enumerate(Ms):
                times.append(dt)
                if M is not None:
                    est.append(M)
                    used.append(t + j)
            t += len(Ms)
            if t % 10 < len(Ms):
                print(f"# bench: {'timed' if timed else 'warm'} pass "
                      f"frame {t}/{upto} "
                      f"({time.perf_counter() - t_start:.0f}s)",
                      file=sys.stderr, flush=True)
            if not timed and t >= 12 \
                    and time.perf_counter() - t_start > warm_deadline:
                done = t          # truncate: enough buckets warmed
                break
        total = time.perf_counter() - t_start
        slam.shutdown()     # drains the worker (<=1 keyframe in flight)
        if not timed:
            return done
        stage = {k: round(v["median_ms"], 2)
                 for k, v in slam.tracker.timers.summary().items()}
        map_ms = slam.mapping_ms
        ate = -1.0
        if len(est) > 3:
            ep = np.stack([M[:3, 3] for M in est])
            gp = np.stack([gt[i][:3, 3] for i in used])
            ate = float(ate_rmse(ep, gp))
        med = float(np.median(times))
        lm_it = slam.tracker.lm_iters
        return dict(
            system_fps=round(done / total, 2),
            # fraction of frames that tracked (WORKING + pose returned):
            # the "is it actually doing SLAM" gate (VERDICT r3 #1 asks
            # >= 0.9 over >= 60 frames)
            working_frac=round(len(est) / max(done, 1), 3),
            # the same fraction measured from the FIRST tracked frame on
            # — the reference's own protocol (Lafida evaluation runs
            # frames 25-759, AFTER the operator's init motion,
            # Slam_Settings_indoor1.yaml:54-56): initialization frames
            # are part of any monocular-bootstrap SLAM run and the
            # reference excludes them from its numbers too
            working_frac_eval=round(
                len(est) / max(done - used[0], 1), 3) if used else 0.0,
            # pose-LM iterations actually run (gain-ratio early stop,
            # cOptimizer.cpp:88-92); fixed budget is 20
            lm_iters_median=(round(float(np.median(lm_it)), 1)
                             if lm_it else -1),
            # device dispatches per frame (fused WORKING path target: 1 —
            # working_track_step chains extraction + motion tracking +
            # local-map tracking on-device; each synchronous dispatch
            # pays the tunnel RTT on a remote accelerator)
            dispatches_median=(round(float(np.median(
                slam.tracker.dispatches_per_frame)), 1)
                if slam.tracker.dispatches_per_frame else -1),
            # steady-state rate (1/median frame time): robust to the
            # occasional cold jit bucket the timed pass can still hit
            # when its map evolution crosses a bucket boundary the warm
            # pass didn't (a multi-minute remote compile in ONE frame
            # otherwise dominates the wall-clock fps)
            system_fps_steady=round(1.0 / med, 2) if med > 0 else -1,
            system_frames=done,
            median_track_ms=round(med * 1e3, 2),
            p90_track_ms=round(float(np.percentile(times, 90)) * 1e3, 2),
            # the same figures over the EVALUATION window (from the
            # first tracked frame on — the reference's own protocol
            # starts at frame 25, after the operator's init motion):
            # bootstrap frames run the 4-dispatch init path and dominate
            # the all-frames p90, exactly like they would for the
            # reference
            median_track_eval_ms=round(float(np.median(
                times[used[0]:])) * 1e3, 2) if used else -1,
            p90_track_eval_ms=round(float(np.percentile(
                times[used[0]:], 90)) * 1e3, 2) if used else -1,
            n_keyframes=slam.map.n_keyframes(),
            n_points=slam.map.n_points(),
            ate_m=round(ate, 4),
            stage_ms=stage,
            # which path each frame took (explains p90: the non-fused
            # fallback costs ~4 dispatches vs the fused path's 1)
            frame_path_counts={
                k: slam.tracker.frame_path.count(k)
                for k in dict.fromkeys(slam.tracker.frame_path)},
            async_mapping=async_mapping,
            # concurrent local-mapping pass cost (triangulation + fuse +
            # local BA + culling, now batched dispatches)
            mapping_ms_median=(round(float(np.median(map_ms)), 1)
                               if map_ms else -1),
            mapping_ms_p90=(round(float(np.percentile(map_ms, 90)), 1)
                            if map_ms else -1))

    warmed = one_pass(timed=False, upto=n_frames) if warm else n_frames
    return one_pass(timed=True, upto=warmed)


# ---------------------------------------------------------------------------
# (b) hot-loop fps (round-1 headline, kept for continuity)
# ---------------------------------------------------------------------------

def bench_hot_loop(rig=None, n_reps=4, use_mdbrief=False):
    """Device-TIMED tracking hot loop: a lax.scan over the frame batch
    runs extraction + frame-to-frame matching + pose LM for EVERY frame
    inside ONE dispatch, so the measured fps is pure device throughput —
    independent of host Python speed, tunnel RTT and box contention
    (round-2 weakness: the host-dispatched loop measured this 1-core
    box's Python as much as the TPU). The host-dispatched variant is
    also measured and reported alongside (hot_loop_host_fps)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multicol_slam_tpu.models import matcher
    from multicol_slam_tpu.models import optimizer as opt
    from multicol_slam_tpu.ops import geometry as geo
    from multicol_slam_tpu.ops.geometry import inv_se3
    from multicol_slam_tpu.ops.camera import world_to_img
    from multicol_slam_tpu.ops.rig import mt_mc
    from multicol_slam_tpu.utils import synthetic

    rig, extract, frames, gt = _make_extract_and_frames(
        rig=rig, use_mdbrief=use_mdbrief)
    params = matcher.MatchParams(desc_bytes=32, masked=use_mdbrief)
    K_OBS = 1024
    n_frames = len(frames)
    frames = [jnp.asarray(f) for f in frames]

    def scene_points(M_t, feats):
        T = mt_mc(M_t, rig.M_c)
        rays_w = jnp.einsum("nij,nkj->nki", T[:, :3, :3], feats.ray)
        t = synthetic._ray_box_exit(T[:, None, :3, 3], rays_w)
        return T[:, None, :3, 3] + t[..., None] * rays_w

    @jax.jit
    def frame_step(images, last, last_pts, mt_min):
        feats = extract(images)
        M_pred = geo.cayley2hom(mt_min)
        Tinv = inv_se3(mt_mc(M_pred, rig.M_c))
        Xc = jnp.einsum("cij,ckj->cki", Tinv[:, :3, :3], last_pts) \
            + Tinv[:, None, :3, 3]
        uv_pred = jax.vmap(world_to_img)(rig.cams, Xc)
        ok = Xc[..., 2] > 0
        m = matcher.match_frame_to_frame(
            feats, last, last.valid, jnp.zeros_like(feats.valid),
            uv_pred, ok, params, th=15.0)
        C, K = m.shape
        flat_m = m.reshape(-1)
        cam_ids = jnp.repeat(jnp.arange(C, dtype=jnp.int32), K)
        sel = jnp.nonzero(flat_m >= 0, size=K_OBS, fill_value=0)[0]
        got = (flat_m >= 0)[sel]
        cam_sel = cam_ids[sel]
        cur_idx = jnp.clip(flat_m[sel], 0)
        uv = feats.xy[cam_sel, cur_idx]
        X = last_pts.reshape(-1, 3)[sel]
        obs = opt.BAObservations(
            uv=uv, kf=jnp.zeros(K_OBS, jnp.int32), cam=cam_sel,
            pt=jnp.arange(K_OBS, dtype=jnp.int32),
            inv_sigma2=jnp.ones(K_OBS), valid=got)
        mt, _, n_in, _ = opt.pose_optimization(rig, mt_min, obs, X)
        new_pts = scene_points(geo.cayley2hom(mt), feats)
        return feats, new_pts, mt, n_in

    @jax.jit
    def device_loop(stacked, f0, pts0, mt0):
        """All frames tracked inside ONE dispatch (lax.scan over the
        frame axis): device-clock throughput, no host in the loop."""
        def body(carry, img):
            f_prev, pts_prev, mt = carry
            f, p, mt, n_in = frame_step(img, f_prev, pts_prev, mt)
            return (f, p, mt), n_in
        (f, p, mt), n_ins = lax.scan(body, (f0, pts0, mt0), stacked)
        return mt, n_ins

    f_prev = extract(frames[0])
    pts_prev = jax.jit(scene_points)(jnp.asarray(gt[0], jnp.float32), f_prev)
    mt_est = jnp.asarray(geo.hom2cayley(jnp.asarray(gt[0], jnp.float32)))
    f_prev, pts_prev, mt_est, n_in = frame_step(frames[1], f_prev, pts_prev,
                                                mt_est)
    jax.block_until_ready(mt_est)

    # host-dispatched loop (round-1/2 continuity number): one dispatch
    # per frame, async pipelined, throttled by host python + tunnel
    t0 = time.time()
    n_loops = 0
    for rep in range(n_reps):
        for t in range(1, n_frames):
            f_prev, pts_prev, mt_est, n_in = frame_step(
                frames[t], f_prev, pts_prev, mt_est)
            n_loops += 1
    jax.block_until_ready(mt_est)
    host_fps = round(n_loops / (time.time() - t0), 2)

    # device-timed loop: scan body reuses frame_step's jaxpr; warm once.
    # CACHE-BUSTING: every timed rep perturbs the initial pose by an
    # epsilon (same shapes -> no recompile; different values -> a real
    # re-execution). This harness's remote-accelerator client DEDUPES a
    # repeated computation on identical inputs and returns the cached
    # buffers instantly — timing identical reps measures the cache, not
    # the device (measured: "0.00 ms/frame" for the full extraction
    # scan). The result is fetched (np.asarray), not just awaited.
    stacked = jnp.stack(frames[1:])
    out = device_loop(stacked, f_prev, pts_prev, mt_est)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [device_loop(stacked, f_prev, pts_prev,
                        mt_est + np.float64((rep + 1) * 1e-7))
            for rep in range(n_reps)]
    for o in outs:
        np.asarray(o[1])     # fetch ALL reps: every one really executed
    dev_fps = round(n_reps * (n_frames - 1) / (time.time() - t0), 2)
    return dev_fps, host_fps


def bench_dynamic_scene(n_frames=36):
    """Dynamic-scene robustness extra (the reference's benchmark
    sequence is Lafida "indoor dynamic" — moving people): the full
    pipeline over the bench trajectory with three moving rigid
    distractors whose texture rides the object
    (utils/synthetic.make_renderer distractors). Reports the tracked
    fraction and ATE under dynamic content; jit buckets are warm after
    bench_full_system (same settings and shapes), so the pass costs one
    sequence, not a compile storm."""
    import jax
    import jax.numpy as jnp
    from multicol_slam_tpu.models.system import MultiColSLAM
    from multicol_slam_tpu.utils import config_io, synthetic
    from multicol_slam_tpu.utils.trajectory import ate_rmse

    settings = config_io.SlamSettings(
        n_features=N_FEATURES, n_levels=N_LEVELS, fps=25.0)
    slam = MultiColSLAM(CALIB, settings=settings,
                        capacity_pts=30000, capacity_kfs=128,
                        async_mapping=True)
    distractors = [
        dict(center=(1.1, 0.1, 1.0), velocity=(-0.05, 0.0, -0.03),
             radius=0.25),
        dict(center=(-1.2, -0.2, 0.7), velocity=(0.07, 0.01, 0.0),
             radius=0.2),
        dict(center=(0.2, 0.4, -1.2), velocity=(0.0, -0.02, 0.06),
             radius=0.28),
    ]
    render = synthetic.make_renderer(slam.rig, distractors=distractors)
    gt = synthetic.bench_trajectory(n_frames, radius=0.8)
    frames = render(jnp.asarray(np.stack(gt), jnp.float32),
                    time=jnp.arange(n_frames, dtype=jnp.float32))
    jax.block_until_ready(frames)
    est, used = [], []
    for t in range(n_frames):
        M = slam.track(frames[t], t / 25.0)
        if M is not None:
            est.append(M)
            used.append(t)
    n_culled = int((~slam.map.pt_valid[:slam.map._next_pt]).sum())
    false_loop = (slam.loop_closer is not None
                  and slam.loop_closer.last_loop_kf >= 0)
    slam.shutdown()
    if not used:
        return dict(dynamic_working_frac=0.0)
    ate = -1.0
    if len(est) > 3:
        ep = np.stack([M[:3, 3] for M in est])
        gp = np.stack([gt[i][:3, 3] for i in used])
        ate = float(ate_rmse(ep, gp))
    return dict(
        dynamic_working_frac=round(
            len(est) / max(n_frames - used[0], 1), 3),
        dynamic_ate_m=round(ate, 4),
        dynamic_n_culled=n_culled,
        dynamic_false_loop=bool(false_loop))


def bench_eight_cam():
    """The 8-camera surround stretch config through the SAME hot loop
    (extraction + frame-to-frame match + pose LM) — the figure
    BASELINE.json's stretch row was missing."""
    fps8, host8 = bench_hot_loop(rig=_ring_rig(8), n_reps=2)
    return dict(eight_cam_tracking_fps=fps8, eight_cam_host_fps=host8)


# ---------------------------------------------------------------------------
# (b2) PRODUCTION tracker throughput: the round-4 headline
# ---------------------------------------------------------------------------

def bench_production_tracker(n_build=40, snap_at=24, n_scan=20, n_reps=4):
    """Device-timed throughput of the PRODUCTION WORKING-frame path:
    a lax.scan whose body CALLS tracking.working_track_step — the exact
    fused dispatch the system issues per WORKING frame (extraction +
    motion-model match + pose LM + frustum check + local-map match +
    pose LM, including the on-device candidate-exclusion mask) — against
    a REAL map built by the system itself on the bench trajectory.
    Nothing is synthetic and nothing is approximated: same jaxpr, same
    thresholds (motion_th=15, local_map_th=3), same map content; the
    scan carries the slot->local-point table so the exclusion input
    (lp_slot) is reconstructed on-device exactly as the host builds it.

    Protocol: run the full system for n_build frames (this also warms
    the system's jit buckets for the later full_system stage), snapshot
    the tracker's slot associations + pose + velocity at frame snap_at,
    freeze the final map as the local-map snapshot, then scan the
    production body over frames snap_at+1..snap_at+n_scan.

    Returns (fps, diag dict). Raises if the build never reaches steady
    WORKING tracking — the caller falls back to the kernel loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multicol_slam_tpu.models import matcher, tracking
    from multicol_slam_tpu.models.system import MultiColSLAM
    from multicol_slam_tpu.ops import geometry as geo
    from multicol_slam_tpu.utils import config_io, synthetic

    settings = config_io.SlamSettings(
        n_features=N_FEATURES, n_levels=N_LEVELS, fps=25.0)
    slam = MultiColSLAM(CALIB, settings=settings,
                        capacity_pts=30000, capacity_kfs=128)
    tr = slam.tracker
    cfg = tr.cfg
    rig = slam.rig
    render = synthetic.make_renderer(rig)
    n_total = n_build + n_scan + 2
    gt = synthetic.bench_trajectory(n_total, radius=0.8)
    # device-resident frames, chunk-batched renders: see
    # _make_extract_and_frames
    frames = []
    for s in range(0, n_total, 24):
        frames.extend(render(jnp.asarray(gt[s:min(s + 24, n_total)],
                                         jnp.float32)))
    jax.block_until_ready(frames[-1])

    snap = None
    build_deadline = _remaining() * 0.6
    t_start = time.perf_counter()
    # build through track_batch: init frames fall back per-frame inside,
    # steady frames ride the chunk scan — through a degraded tunnel the
    # per-frame build cost inflates ~10x while chunks amortize, and the
    # snapshot state at a chunk boundary is exactly the rolled tracker
    # state the per-frame loop would leave (tests/test_chunked_tracking)
    t = 0
    while t < n_build:
        n = min(8, n_build - t)
        if n == 8:
            slam.track_batch(jnp.stack(frames[t:t + n]),
                             [x / 25.0 for x in range(t, t + n)], chunk=8)
        else:
            for j in range(t, t + n):
                slam.track(frames[j], j / 25.0)
        t += n
        print(f"# bench: production map build frame {t}/{n_build} "
              f"({time.perf_counter() - t_start:.0f}s)",
              file=sys.stderr, flush=True)
        if (snap is None and t > snap_at
                and tr.state == tracking.TrackState.WORKING
                and tr.velocity is not None):
            snap = (tr.cur_pt.copy(), tr.cur_mt.copy(), tr.velocity.copy(),
                    tr.cur_feats)
        if snap is not None and time.perf_counter() - t_start \
                > build_deadline:
            break
    if snap is None:
        slam.shutdown()
        raise RuntimeError("production bench: system never reached "
                           "steady WORKING state at snapshot frame")
    snap_pt, snap_mt, snap_V, snap_feats = snap
    m = slam.map

    # freeze the map as the local-map snapshot (on this single-room
    # bench scene the tracker's covisibility-voted local map IS
    # essentially the whole map; production pads to the same buckets)
    ids = np.nonzero(m.pt_valid)[0]
    P = len(ids)
    cap = tracking.bucket(P, 256)
    pad = lambda a, fill=0: np.concatenate(
        [a, np.full((cap - P,) + a.shape[1:], fill, a.dtype)], 0)
    X_loc = jnp.asarray(pad(m.pt_pos[ids]))
    normal = jnp.asarray(pad(m.pt_normal[ids]))
    mind = jnp.asarray(pad(m.pt_min_dist[ids]))
    maxd = jnp.asarray(pad(m.pt_max_dist[ids], 1.0))
    desc = jnp.asarray(pad(m.pt_desc[ids]))
    dmask = jnp.asarray(pad(m.pt_desc_mask[ids]))
    cand_ok = jnp.asarray(np.arange(cap) < P)

    # snapshot slot state -> positions in the FINAL map (follow merges)
    snap_pt = m.resolve_points(snap_pt)
    C, K = snap_pt.shape
    has0 = snap_pt >= 0
    alive = np.zeros((C, K), bool)
    alive[has0] = m.pt_valid[snap_pt[has0]]
    slot_X0 = np.zeros((C, K, 3), np.float32)
    slot_X0[alive] = m.pt_pos[snap_pt[alive]]
    # slot -> index into the frozen local map (the production host keeps
    # this as cur_pt landmark ids; by-index here so the device never
    # needs the id tables)
    id_to_lp = np.full(m.pt_pos.shape[0], -1, np.int32)
    id_to_lp[ids] = np.arange(P, dtype=np.int32)
    slot_lp0 = np.full((C, K), -1, np.int32)
    slot_lp0[alive] = id_to_lp[snap_pt[alive]]
    n_kf, n_pts = m.n_keyframes(), m.n_points()
    slam.shutdown()

    params = tr.params
    extract = tr.extract

    def scatter_slots(tgt, vals, fill):
        """Scatter per-camera through the match (the host's
        cur_pt[c, match[c, sel]] = last_pt[c, sel] roll); indices already
        dumped past the end where not kept."""
        def one(t, v):
            sx = jnp.full((K + 1,) + v.shape[1:], fill, v.dtype) \
                .at[t].set(v, mode="drop")
            return sx[:K]
        return jax.vmap(one)(tgt, vals)

    def body(carry, img):
        last_feats, slot_X, slot_lp, slot_has, mt, V = carry
        M_last = geo.cayley2hom(mt)
        mt_pred = geo.hom2cayley(M_last @ V)
        # lp_slot (cap, C): local-point -> last-frame slot, the inverse
        # of the carried slot_lp — the same table the host hands the
        # fused dispatch for on-device candidate exclusion
        def inv_one(lp_c):
            idx = jnp.where(lp_c >= 0, lp_c, cap)
            return jnp.full((cap + 1,), -1, jnp.int32).at[idx].set(
                jnp.arange(K, dtype=jnp.int32), mode="drop")[:cap]
        lp_slot = jax.vmap(inv_one)(slot_lp).T        # (cap, C)
        out = tracking.working_track_step(
            extract, rig, img, mt_pred, slot_X, slot_has, last_feats,
            lp_slot, X_loc, normal, mind, maxd, cand_ok, desc, dmask,
            params, th_motion=cfg.motion_th, th_local=cfg.local_map_th,
            n_levels=cfg.n_levels, scale_factor=cfg.scale_factor)
        (cur, match1, mt1, inl1, n_in1, n_m1, it1,
         fr_ok, match2, mt2, inl_slot, inl_new, n_in2, it2) = out
        # roll the slot state exactly like the host bookkeeping
        keep = (match1 >= 0) & inl1 & slot_has
        tgt1 = jnp.where(keep, jnp.clip(match1, 0), K)
        sX1 = scatter_slots(tgt1, slot_X, 0.0)
        slp1 = scatter_slots(tgt1, slot_lp, -1)
        sh1 = scatter_slots(tgt1, keep, False)
        got2 = (match2 >= 0) & inl_new
        tgt2 = jnp.where(got2, jnp.clip(match2, 0), K)
        src_X = jnp.broadcast_to(X_loc[None], (C,) + X_loc.shape)
        src_lp = jnp.broadcast_to(
            jnp.arange(cap, dtype=jnp.int32)[None], (C, cap))
        sX2 = scatter_slots(tgt2, src_X, 0.0)
        slp2 = scatter_slots(tgt2, src_lp, -1)
        sh2 = scatter_slots(tgt2, got2, False)
        keep_slot = sh1 & inl_slot
        nxt_X = jnp.where(keep_slot[..., None], sX1, sX2)
        nxt_lp = jnp.where(keep_slot, slp1, slp2)
        nxt_has = keep_slot | sh2
        M_cur = geo.cayley2hom(mt2)
        V_new = geo.inv_se3(M_last) @ M_cur
        return (cur, nxt_X, nxt_lp, nxt_has, mt2, V_new), n_in2

    @jax.jit
    def device_loop(stacked, carry0):
        return lax.scan(body, carry0, stacked)

    stacked = jnp.stack([jnp.asarray(f)
                         for f in frames[snap_at + 1:snap_at + 1 + n_scan]])
    carry0 = (snap_feats, jnp.asarray(slot_X0), jnp.asarray(slot_lp0),
              jnp.asarray(alive), jnp.asarray(snap_mt, jnp.float32),
              jnp.asarray(snap_V, jnp.float32))
    (carry, n_ins) = device_loop(stacked, carry0)
    jax.block_until_ready(n_ins)
    n_ins = np.asarray(n_ins)
    if int((n_ins >= cfg.min_inliers_local).sum()) < int(0.9 * n_scan):
        raise RuntimeError(
            f"production bench: scan lost tracking (inliers {n_ins})")
    # cache-busting reps + fetch-all: see bench_hot_loop — identical
    # repeated calls are deduped by the remote client and time ~0
    def _carry_eps(rep):
        f, sx, slp, sh, mt, V = carry0
        return (f, sx, slp, sh, mt + jnp.float32((rep + 1) * 1e-7), V)
    t0 = time.time()
    outs = [device_loop(stacked, _carry_eps(rep)) for rep in range(n_reps)]
    for o in outs:
        np.asarray(o[1])
    fps = round(n_reps * n_scan / (time.time() - t0), 2)
    return fps, dict(
        prod_scan_frames=n_scan,
        prod_inliers_median=int(np.median(n_ins)),
        prod_map_keyframes=n_kf,
        prod_map_points=n_pts,
        prod_local_map_bucket=int(cap))


# ---------------------------------------------------------------------------
# (c) extraction+matching: TPU vs CPU (the >10x north star)
# ---------------------------------------------------------------------------

def _extract_match_time(n_timed=4, n_frames=6, device_timed=True):
    """Seconds per frame for extraction + frame-to-frame matching on
    whatever backend this process runs.

    device_timed=True (the round-4 protocol, VERDICT r3 item 5): a
    lax.scan runs the step for the whole frame batch inside ONE
    dispatch, so NEITHER backend pays per-dispatch overhead — on this
    harness's remote-TPU tunnel a host-synchronous dispatch costs ~30ms
    RTT, which understates the device by an order of magnitude (the
    recorded r3 number measured tunnel+transfer, not compute).
    device_timed=False is the r1-3 host-dispatched protocol, kept
    alongside as extract_match_*_host_ms."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multicol_slam_tpu.models import matcher

    rig, extract, frames, _ = _make_extract_and_frames(n_frames=n_frames)
    params = matcher.MatchParams(desc_bytes=32)

    def step(images, last):
        feats = extract(images)
        uv_pred = feats.xy          # stand-in prediction: same-frame coords
        ok = feats.valid
        m = matcher.match_frame_to_frame(
            feats, last, last.valid, jnp.zeros_like(feats.valid),
            uv_pred, ok, params, th=15.0)
        return feats, m

    jstep = jax.jit(step)
    last = extract(jnp.asarray(frames[0]))
    jax.block_until_ready(last.desc)

    if device_timed:
        @jax.jit
        def batch(stacked, last0, eps):
            # eps: cache-busting input (see bench_hot_loop) — folded
            # into the image batch so every timed rep is a distinct
            # computation on both backends
            def body(last, img):
                feats, m = step(img, last)
                return feats, jnp.sum(m >= 0)
            return lax.scan(body, last0, stacked + eps)
        stacked = jnp.stack([jnp.asarray(f) for f in frames[1:]])
        T = stacked.shape[0]
        out = batch(stacked, last, jnp.float32(0.0))   # compile + warm
        jax.block_until_ready(out[1])
        ts = []
        for rep in range(n_timed):
            t0 = time.perf_counter()
            out = batch(stacked, last, jnp.float32((rep + 1) * 1e-6))
            np.asarray(out[1])
            ts.append((time.perf_counter() - t0) / T)
        return float(np.median(ts))

    last, m = jstep(jnp.asarray(frames[1]), last)   # compile
    jax.block_until_ready(m)
    ts = []
    for t in range(2, 2 + n_timed):
        last, m = jstep(jnp.asarray(frames[t % n_frames]), last)
        t0 = time.perf_counter()
        last, m = jstep(jnp.asarray(frames[(t + 1) % n_frames]), last)
        np.asarray(m)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_cpu_compare():
    """Extraction+matching TPU vs CPU (the >10x north star of
    BASELINE.md). Primary numbers are DEVICE-TIMED on both backends
    (lax.scan over the frame batch — one dispatch, no per-frame host
    round-trips on either side); the host-dispatched numbers are kept
    alongside for r1-3 continuity. The CPU side runs as a subprocess
    because the platform choice is process-global."""
    tpu_s = _extract_match_time(device_timed=True)
    tpu_host_s = _extract_match_time(n_timed=3, device_timed=False)
    env = dict(os.environ, JAX_PLATFORMS="cpu", MCSLAM_BENCH_CPU_PROBE="1")
    cpu_s = cpu_host_s = -1.0
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-probe"],
            env=env, capture_output=True, text=True,
            timeout=max(120.0, min(1800.0, _remaining() - 60)))
        probe = json.loads(out.stdout.strip().splitlines()[-1])
        cpu_s = float(probe["cpu_s"])
        cpu_host_s = float(probe.get("cpu_host_s", -1.0))
    except Exception as e:
        print(f"# bench: cpu probe failed: {e!r}", file=sys.stderr,
              flush=True)
    return dict(
        extract_match_method="device_timed_scan",
        extract_match_tpu_ms=round(tpu_s * 1e3, 2),
        extract_match_cpu_ms=round(cpu_s * 1e3, 2) if cpu_s > 0 else -1,
        extract_match_speedup_vs_cpu=(
            round(cpu_s / tpu_s, 2) if cpu_s > 0 else -1),
        extract_match_tpu_host_ms=round(tpu_host_s * 1e3, 2),
        extract_match_cpu_host_ms=(
            round(cpu_host_s * 1e3, 2) if cpu_host_s > 0 else -1))


def cpu_probe():
    import jax
    jax.config.update("jax_platforms", "cpu")
    # device-timed scan (primary) + host-dispatched (continuity); small
    # rep counts — CPU extraction at full res costs ~2s/frame
    dev = _extract_match_time(n_timed=1, n_frames=4, device_timed=True)
    host = _extract_match_time(n_timed=1, n_frames=4, device_timed=False)
    print(json.dumps({"cpu_s": dev, "cpu_host_s": host}))


# ---------------------------------------------------------------------------
# (d) BA chi2 parity proxy
# ---------------------------------------------------------------------------

def bench_chi2_parity():
    """Synthetic ground-truth BA: perturb poses+points, optimize, and
    compare the robust cost to the cost at the noise-only optimum (the
    ground-truth parameters). g2o's LM converges to the same optimum;
    ratio <= 1.01 is the 'chi2 within 1% of g2o' claim, stated as a
    proxy because g2o itself is not buildable in this image."""
    import jax
    import jax.numpy as jnp
    from multicol_slam_tpu.models import optimizer as opt
    from multicol_slam_tpu.ops.camera import world_to_img
    from multicol_slam_tpu.ops.geometry import cayley2hom, inv_se3
    from multicol_slam_tpu.ops.rig import mt_mc
    from multicol_slam_tpu.utils import config_io

    rig, _ = config_io.load_mcs(CALIB, dtype=np.float64)
    rng = np.random.default_rng(0)
    P = 400
    X = rng.standard_normal((P, 3))
    X = X / np.linalg.norm(X, axis=1, keepdims=True) * rng.uniform(
        2.0, 5.0, (P, 1))
    mt_all = np.stack([np.zeros(6)] + [
        np.concatenate([rng.standard_normal(3) * 0.02,
                        rng.standard_normal(3) * 0.3]) for _ in range(5)])
    NOISE = 0.5  # px

    rows = []
    for kf, mt in enumerate(mt_all):
        T = np.asarray(inv_se3(mt_mc(cayley2hom(jnp.asarray(mt)),
                                     jnp.asarray(rig.M_c))))
        for c in range(rig.n_cams):
            Xc = X @ T[c, :3, :3].T + T[c, :3, 3]
            uv = np.asarray(world_to_img(
                jax.tree.map(lambda a: jnp.asarray(a[c]), rig.cams),
                jnp.asarray(Xc)))
            ok = (Xc[:, 2] > 0.3) & (uv[:, 0] > 40) & (uv[:, 0] < 714) \
                & (uv[:, 1] > 40) & (uv[:, 1] < 440)
            for p in np.nonzero(ok)[0]:
                rows.append((uv[p] + rng.normal(0, NOISE, 2), kf, c, p))
    K = len(rows)
    uv = np.zeros((K + 1, 2))
    kf = np.zeros(K + 1, np.int32)
    cam = np.zeros(K + 1, np.int32)
    pt = np.zeros(K + 1, np.int32)
    valid = np.zeros(K + 1, bool)
    for i, (m, f, c, p) in enumerate(rows):
        uv[i], kf[i], cam[i], pt[i], valid[i] = m, f, c, p, True
    obs = opt.BAObservations(
        uv=jnp.asarray(uv), kf=jnp.asarray(kf), cam=jnp.asarray(cam),
        pt=jnp.asarray(pt), inv_sigma2=jnp.ones(K + 1),
        valid=jnp.asarray(valid))
    lists = [[] for _ in range(P)]
    for i, (_, f, c, p) in enumerate(rows):
        lists[p].append(i)
    M = max(len(l) for l in lists)
    pt_obs = np.full((P, M), K, np.int32)
    for p, l in enumerate(lists):
        pt_obs[p, :len(l)] = l
    problem = opt.BAProblem(
        obs=obs, pt_obs=jnp.asarray(pt_obs),
        fixed_kf=jnp.asarray([True] + [False] * 5),
        fixed_pt=jnp.zeros(P, bool))

    def total_chi2(mt0, X0, iters):
        _, _, chi2 = opt.bundle_adjustment(
            rig, jnp.asarray(mt0), jnp.asarray(X0), problem, iters=iters)
        return float(np.asarray(chi2)[np.asarray(obs.valid)].sum())

    # the attainable optimum: start AT ground truth, polish
    chi2_opt = total_chi2(mt_all, X, iters=8)
    # the benchmark: start from a real perturbation
    mt0 = mt_all + rng.standard_normal(mt_all.shape) * 0.01
    mt0[0] = mt_all[0]
    X0 = X + rng.standard_normal(X.shape) * 0.05
    chi2_ba = total_chi2(mt0, X0, iters=20)
    return dict(ba_chi2_ratio=round(chi2_ba / chi2_opt, 4),
                ba_chi2_final=round(chi2_ba, 1),
                ba_n_obs=K)


# ---------------------------------------------------------------------------
# (e) the remaining BASELINE.json headline metrics
# ---------------------------------------------------------------------------

def bench_extraction_rate(n_reps=2, n_frames=8):
    """BASELINE.json 'Mkeypoints/sec extraction': device-timed lax.scan
    of the PRODUCTION extractor (pyramid + FAST + bucketed top-k +
    IC_Angle + ORB descriptors, 3 cams x 754x480 x 8 levels) over the
    frame batch; keypoints = valid detections after selection."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rig, extract, frames, _ = _make_extract_and_frames(n_frames=n_frames)
    stacked = jnp.stack([jnp.asarray(f) for f in frames])
    T = stacked.shape[0]

    @jax.jit
    def batch(stk, eps):
        def body(c, img):
            f = extract(img + eps)     # eps: cache-buster (see hot loop)
            return c, jnp.sum(f.valid)
        return lax.scan(body, jnp.int32(0), stk)[1]

    counts = batch(stacked, jnp.float32(0.0))
    jax.block_until_ready(counts)
    ts = []
    for rep in range(n_reps):
        t0 = time.perf_counter()
        counts = np.asarray(batch(stacked, jnp.float32((rep + 1) * 1e-6)))
        ts.append(time.perf_counter() - t0)
    sec = float(np.median(ts))
    kps = float(counts.sum())
    return dict(mkeypoints_per_sec=round(kps / sec / 1e6, 3),
                extraction_kps_per_frame=round(kps / T, 1),
                extraction_ms_per_frame=round(sec / T * 1e3, 3))


def bench_ba_rate(n_reps=3, n_kf=16, n_pt=2048):
    """BASELINE.json 'BA iterations/sec': device-timed sparse-Schur LM
    at LOCAL-BA scale (n_kf keyframes x n_pt points x <=8 obs/pt — the
    cOptimizer::LocalBundleAdjustment workload shape) with early
    termination disabled so the iteration denominator is exact."""
    import jax
    import jax.numpy as jnp
    from multicol_slam_tpu.models import optimizer as opt
    from multicol_slam_tpu.utils import config_io, synthetic

    rig, _ = config_io.load_mcs(CALIB, dtype=np.float32)
    mt, X, uv, kf, cam, pt, valid, pt_obs = synthetic.make_ba_problem(
        rig, n_kf, n_pt)
    obs = opt.BAObservations(
        uv=jnp.asarray(uv), kf=jnp.asarray(kf), cam=jnp.asarray(cam),
        pt=jnp.asarray(pt), inv_sigma2=jnp.ones(len(uv)),
        valid=jnp.asarray(valid))
    problem = opt.BAProblem(
        obs=obs, pt_obs=jnp.asarray(pt_obs),
        fixed_kf=jnp.asarray([True] + [False] * (n_kf - 1)),
        fixed_pt=jnp.zeros(n_pt, bool))
    rng = np.random.default_rng(1)
    mt0 = mt + rng.standard_normal(mt.shape) * 0.01
    mt0[0] = mt[0]
    X0 = X + rng.standard_normal(X.shape) * 0.05
    ITERS = 10

    def run(eps):
        return opt.bundle_adjustment(
            rig, jnp.asarray(mt0) + eps, jnp.asarray(X0), problem,
            iters=ITERS, early_stop=False)

    out = run(0.0)
    jax.block_until_ready(out)
    ts = []
    for rep in range(n_reps):
        t0 = time.perf_counter()
        np.asarray(run((rep + 1) * 1e-7)[2])
        ts.append(time.perf_counter() - t0)
    per_iter = float(np.median(ts)) / ITERS
    return dict(ba_iters_per_sec=round(1.0 / per_iter, 1),
                ba_iter_ms=round(per_iter * 1e3, 2),
                ba_rate_n_obs=int(len(uv) - 1),
                ba_rate_shape=f"{n_kf}kf x {n_pt}pt")


def bench_mdbrief(n_reps=2):
    """mdBRIEF-enabled hot-loop variant (use_mdbrief + learned masks,
    mdBRIEFextractorOct.cpp:250-554): the 2-3x heavier descriptor path
    the north star names, through the same extraction + masked-Hamming
    matching + pose-LM loop."""
    fps, host = bench_hot_loop(n_reps=n_reps, use_mdbrief=True)
    return dict(mdbrief_loop_fps=fps, mdbrief_loop_host_fps=host)


def bench_pallas_threshold(n_reps=3):
    """Justify matcher.PALLAS_MIN_CANDIDATES (VERDICT r4 housekeeping):
    time the dense-XLA fuse path vs the streaming Pallas kernel at the
    production candidate-bucket sizes."""
    import jax
    import jax.numpy as jnp
    from multicol_slam_tpu.models import matcher
    from multicol_slam_tpu.models.tracking import frustum_check
    from multicol_slam_tpu.utils import config_io

    if jax.default_backend() != "tpu":
        return {}
    rig, _ = config_io.load_mcs(CALIB, dtype=np.float32)
    rng = np.random.default_rng(0)
    params = matcher.MatchParams(desc_bytes=32)
    C, K = 3, 1024
    from multicol_slam_tpu.models.extractor import Features
    W = 8
    feats = Features(
        xy=jnp.asarray(rng.uniform(0, 700, (C, K, 2)), jnp.float32),
        level=jnp.asarray(rng.integers(0, 8, (C, K)), jnp.int32),
        angle=jnp.zeros((C, K), jnp.float32),
        response=jnp.zeros((C, K), jnp.float32),
        ray=jnp.zeros((C, K, 3), jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2**32, (C, K, W), np.uint32)),
        desc_mask=jnp.full((C, K, W), 0xFFFFFFFF, jnp.uint32),
        valid=jnp.ones((C, K), bool))
    out = {}
    for P in (512, 1024, 2048):
        pt_desc = jnp.asarray(rng.integers(0, 2**32, (P, W), np.uint32))
        pt_mask = jnp.full((P, W), 0xFFFFFFFF, jnp.uint32)
        uv = jnp.asarray(rng.uniform(0, 700, (C, P, 2)), jnp.float32)
        ok = jnp.ones((C, P), bool)
        lvl = jnp.asarray(rng.integers(0, 8, (C, P)), jnp.int32)
        occ = jnp.zeros((C, K), bool)
        for name, fn in (("dense", matcher.fuse_candidates),
                         ("pallas", matcher.fuse_candidates_fused)):
            try:
                r = fn(feats, occ, pt_desc, pt_mask, uv, ok, lvl, params)
                jax.block_until_ready(r)
                ts = []
                for rep in range(n_reps):
                    uv_r = uv + jnp.float32((rep + 1) * 1e-4)
                    t0 = time.perf_counter()
                    np.asarray(fn(feats, occ, pt_desc, pt_mask, uv_r, ok,
                                  lvl, params))
                    ts.append(time.perf_counter() - t0)
                out[f"fuse_{name}_{P}_ms"] = round(
                    float(np.median(ts)) * 1e3, 3)
            except Exception as e:
                out[f"fuse_{name}_{P}_ms"] = -1.0
                print(f"# bench: fuse {name} P={P} failed: {e!r}",
                      file=sys.stderr, flush=True)
    return out


# ---------------------------------------------------------------------------

def bench_dispatch_rtt():
    """Median round-trip of a trivial jit call: the latency floor every
    host-synchronous dispatch pays on this backend (≈µs locally, can be
    hundreds of ms through a remote-TPU tunnel)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(8)
    jax.block_until_ready(f(x))
    ts = []
    for rep in range(20):
        # distinct input per rep: identical repeated computations are
        # deduped by the remote client (see bench_hot_loop)
        xr = x + float(rep)
        t0 = time.perf_counter()
        np.asarray(f(xr))
        ts.append(time.perf_counter() - t0)
    return dict(dispatch_rtt_ms=round(float(np.median(ts)) * 1e3, 3))


def _emit(fps, extra):
    """One complete headline JSON line, flushed immediately so a later
    kill cannot destroy it."""
    print(json.dumps({
        "metric": "3cam_tracking_fps",
        "value": fps,
        "unit": "frames/sec",
        "vs_baseline": round(fps / 25.0, 2),
        "extra": extra,
    }), flush=True)


def _link_probe(timeout_s=150.0):
    """Probe the accelerator link with a trivial jit in a SUBPROCESS
    (so a hung tunnel cannot wedge the bench before it prints anything).
    Returns the probe's wall seconds, or -1 when the link is dead or
    degraded beyond timeout_s. Measured healthy floor: ~1-10 s incl.
    interpreter+jax import; an unhealthy tunnel has been observed to
    take >120 s for the SAME trivial jit."""
    code = ("import sys, time; sys.path.insert(0, %r); t0=time.time(); "
            "import jax, jax.numpy as jnp; "
            "y = jax.jit(lambda a: (a*2).sum())(jnp.arange(64.0)); "
            "print('PROBE_OK', float(y), time.time()-t0)"
            % os.path.dirname(os.path.abspath(__file__)))
    t0 = time.monotonic()
    try:
        r = subprocess.run([sys.executable, "-u", "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        if "PROBE_OK" in r.stdout:
            return round(time.monotonic() - t0, 1)
    except subprocess.TimeoutExpired:
        pass
    return -1.0


def main():
    if "--cpu-probe" in sys.argv or os.environ.get("MCSLAM_BENCH_CPU_PROBE"):
        cpu_probe()
        return
    # a hung accelerator tunnel must never leave the artifact EMPTY:
    # probe the link in a subprocess first and emit a provisional line
    # (the driver keeps the LAST complete line, so any stage that
    # completes later overwrites this one)
    probe_s = _link_probe(timeout_s=60.0)
    _emit(-1, {"status": "startup",
               "link_probe_s": probe_s,
               "link_status": "ok" if probe_s >= 0 else
               "dead_or_degraded"})
    # secondary stages run only while budget remains; each failure or
    # skip degrades that metric to an empty dict, never kills the line.
    # The probe result rides every later line too: host-timed figures
    # swing ~4x with the tunnel's health (measured same-commit), so the
    # artifact must carry its own health reading.
    extra = {"link_probe_s": probe_s}

    def stage(fn, min_budget_s, label):
        if _remaining() < min_budget_s:
            print(f"# bench: skipping {label} ({_remaining():.0f}s "
                  f"budget left)", file=sys.stderr, flush=True)
            return {}
        t0 = time.monotonic()
        try:
            out = fn()
        except Exception as e:      # pragma: no cover - defensive
            print(f"# bench: {label} failed: {e!r}", file=sys.stderr,
                  flush=True)
            return {}
        print(f"# bench: {label} done in {time.monotonic() - t0:.0f}s",
              file=sys.stderr, flush=True)
        return out

    # host 1-min load BEFORE the run: host-dispatched loops are
    # throttled by host python speed, so on this 1-core box a
    # concurrent CPU job (e.g. a pytest run) cuts those numbers ~3x.
    # Recording the load makes a contention-skewed number identifiable.
    extra["host_load1"] = round(os.getloadavg()[0], 2)
    # THE headline: the production tracker jaxprs over a real map
    # (VERDICT r3 item 6). It runs FIRST — stage ordering is budget
    # triage, and through this harness's erratic remote-TPU tunnel (a
    # fixed stage measured 70..790s run-to-run purely from link stalls)
    # whatever runs late may never run. Priority: headline, then
    # full_system (the only stage that proves the framework IS a SLAM
    # system: working_frac + ATE), then the cheap diagnostics, then the
    # comparison/continuity stages. Every step re-emits the enriched
    # line so a kill at ANY point leaves everything completed so far
    # (round-2 lesson: a killed run must still leave a JSON line).
    fps = None
    try:
        t0 = time.monotonic()
        fps, diag = bench_production_tracker()
        print(f"# bench: production tracker done in "
              f"{time.monotonic() - t0:.0f}s", file=sys.stderr, flush=True)
        extra.update(diag)
        extra["headline_method"] = "production_tracker_scan"
        _emit(fps, dict(extra))
    except Exception as e:
        # insurance: the r1-3 synthetic kernel loop (known-good)
        print(f"# bench: production headline failed ({e!r}); falling "
              f"back to the kernel stand-in", file=sys.stderr, flush=True)
        fps, khost = bench_hot_loop()
        extra["kernel_loop_fps"] = fps
        extra["kernel_loop_host_fps"] = khost
        extra["headline_method"] = "kernel_standin"
        _emit(fps, dict(extra))
    # when the production headline ran, its map build + the persistent
    # compile cache already warmed the per-frame buckets: skip the warm
    # pass so the remaining stages stay funded (VERDICT r4 item 3)
    prod_ok = extra.get("headline_method") == "production_tracker_scan"
    extra.update(stage(
        lambda: bench_full_system(90, warm=not prod_ok),
        100, "full_system"))
    _emit(fps, dict(extra))

    # the chunked throughput mode (track_batch / working_scan_chunk):
    # the sustained-rate figure at +chunk frames of latency
    def _chunked():
        out = bench_full_system(96, chunk=8, warm=not prod_ok)
        keep = ("system_fps", "system_fps_steady", "median_track_ms",
                "p90_track_ms", "median_track_eval_ms",
                "p90_track_eval_ms", "working_frac", "working_frac_eval",
                "ate_m", "n_keyframes", "n_points", "system_frames")
        return {f"chunked_{k}": v for k, v in out.items() if k in keep}
    extra.update(stage(_chunked, 80, "full_system_chunked"))
    _emit(fps, dict(extra))
    # cheap diagnostics + the two remaining BASELINE.json headline
    # metrics run BEFORE the comparison stages so the official artifact
    # always carries them (VERDICT r4 items 2-3: no skipped stages)
    extra.update(stage(bench_dispatch_rtt, 10, "dispatch_rtt"))
    extra.update(stage(bench_extraction_rate, 25, "extraction_rate"))
    extra.update(stage(bench_ba_rate, 25, "ba_rate"))
    _emit(fps, dict(extra))
    # the 8-cam stretch figure (BASELINE.json configs[4])
    extra.update(stage(bench_eight_cam, 40, "eight_cam"))
    _emit(fps, dict(extra))
    extra.update(stage(bench_dynamic_scene, 35, "dynamic_scene"))
    extra.update(stage(bench_chi2_parity, 30, "chi2_parity"))
    extra.update(stage(bench_mdbrief, 40, "mdbrief"))
    _emit(fps, dict(extra))
    extra.update(stage(bench_pallas_threshold, 20, "pallas_threshold"))
    extra.update(stage(bench_cpu_compare, 60, "cpu_compare"))
    _emit(fps, dict(extra))
    if "kernel_loop_fps" not in extra:
        def _kernel_continuity():
            kfps, khost = bench_hot_loop(n_reps=2)
            return dict(kernel_loop_fps=kfps, kernel_loop_host_fps=khost)
        extra.update(stage(_kernel_continuity, 45, "kernel_loop"))
    # same metric, now enriched — last complete line wins either way
    _emit(fps, extra)


if __name__ == "__main__":
    main()
