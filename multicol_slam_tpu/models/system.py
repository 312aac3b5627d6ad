"""System orchestration (cSystem.{h,cpp}): wire tracking + local mapping
(+ loop closing once present), load calibration, expose the per-frame
API and trajectory export.

Reference: cSystem spawns mapping/loop-closing/viewer threads
(cSystem.cpp:96-110) because CPU cores were the scaling resource. Here
device batching does the heavy lifting, so the default mode runs the
mapper synchronously on keyframe insertion (deterministic, testable);
``async_mapping=True`` moves it to a worker thread with the same
producer/consumer contract as the reference (mlNewMultiKeyFrames deque,
cLocalMapping.cpp:131-151).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from ..ops.camera import make_extraction_masks
from ..utils import config_io
from ..utils.trajectory import save_tum
from . import matcher
from .extractor import ExtractorConfig, make_extractor
from .local_mapping import LocalMapper
from .map import MapStore
from .tracking import Tracker, TrackerConfig, TrackState


class MultiColSLAM:
    """The cSystem equivalent: construct from a calibration directory +
    settings, feed synchronized image sets, read back poses."""

    def __init__(self, calib_dir: Optional[str] = None,
                 settings_path: Optional[str] = None,
                 settings: Optional[config_io.SlamSettings] = None,
                 async_mapping: bool = False,
                 capacity_pts: int = 30000, capacity_kfs: int = 256,
                 enable_loop_closing: bool = True,
                 vocabulary_path: Optional[str] = None,
                 rig=None):
        self.settings = settings or (
            config_io.load_settings(settings_path) if settings_path
            else config_io.SlamSettings())
        s = self.settings
        if rig is not None:
            # caller-supplied rig (custom/synthetic/rescaled systems);
            # mirror masks are derived analytically below either way
            self.rig, self.mirror_masks = rig, None
        else:
            self.rig, self.mirror_masks = config_io.load_mcs(calib_dir)
        C = self.rig.n_cams
        w = int(float(self.rig.cams.width[0]))
        h = int(float(self.rig.cams.height[0]))

        # extraction masks at pyramid sizes — the fisheye circle only for
        # cameras whose calibration sets mirrorMask (cSystem.cpp:164-171)
        masks = []
        for c in range(C):
            if float(np.asarray(self.rig.cams.mirror).reshape(-1)[c]) > 0.5:
                masks.append(make_extraction_masks(
                    float(self.rig.cams.u0[c]), float(self.rig.cams.v0[c]),
                    w, h, s.n_levels, s.scale_factor))
            else:
                from ..ops.pyramid import level_sizes
                masks.append([np.full(sz, 255, np.uint8) for sz in
                              level_sizes(h, w, s.n_levels, s.scale_factor)])
        masks_lvl = [np.stack([m[l] for m in masks]) for l in range(s.n_levels)]

        # extractor.useAgast + fastAgastType -> detector mask
        # (cv::AgastFeatureDetector types 0..3; 3 = OAST_9_16 ~ FAST)
        if s.use_agast:
            mask = {0: "agast_5_8", 1: "agast_7_12", 2: "agast_7_12",
                    3: "fast_9_16"}.get(s.fast_agast_type, "fast_9_16")
        else:
            mask = "fast_9_16"
        ecfg = ExtractorConfig(
            n_features=s.n_features, scale_factor=s.scale_factor,
            n_levels=s.n_levels, fast_th=s.fast_th,
            desc_bytes=s.desc_size, use_dbrief=s.use_mdbrief,
            learn_masks=s.learn_masks, detector_mask=mask,
            use_harris=s.score_harris)
        self.extract = make_extractor(ecfg, self.rig.cams, masks_lvl, (h, w))
        # init extractor: 2x features, FAST threshold 5 (cTracking.cpp:206-235)
        ecfg_init = ecfg._replace(n_features=2 * s.n_features, fast_th=5)
        self.extract_init = make_extractor(ecfg_init, self.rig.cams,
                                           masks_lvl, (h, w))

        self.map = MapStore(capacity_pts=capacity_pts,
                            capacity_kfs=capacity_kfs, n_cams=C,
                            k_per_cam=2 * s.n_features,
                            desc_words=s.desc_size // 4)

        tcfg = TrackerConfig(
            n_features=s.n_features, desc_bytes=s.desc_size,
            masked=s.use_mdbrief and s.learn_masks,
            scale_factor=s.scale_factor, n_levels=s.n_levels, fps=s.fps,
            use_motion_model=s.use_motion_model)
        self.tracker = Tracker(self.rig, self._extract_padded,
                               self._extract_init_padded, self.map, tcfg)
        params = matcher.MatchParams(
            desc_bytes=s.desc_size,
            masked=s.use_mdbrief and s.learn_masks,
            scale_factor=s.scale_factor)
        self.mapper = LocalMapper(self.rig, self.map, params,
                                  scale_factor=s.scale_factor,
                                  n_levels=s.n_levels)
        # loop closing: vocabulary is loaded from ``vocabulary_path`` or
        # trained lazily from the first keyframe's descriptors (the
        # reference ships a pre-trained 2MB vocabulary; ours is
        # self-bootstrapping by default)
        self.loop_closer = None
        self._loop_params = params
        self._enable_loops = enable_loop_closing
        self._vocabulary_path = vocabulary_path
        # corpus accumulated for the vocabulary retrain: the bootstrap
        # vocabulary is trained from ONE multi-frame (most words empty,
        # idf from a single image); once VOCAB_RETRAIN_KFS keyframes
        # exist the tree is retrained on all of them with per-document
        # idf and every BoW cache is rebuilt (LoopCloser.set_vocabulary)
        self._voc_corpus: list[np.ndarray] = []
        self._voc_retrained = False

        self.async_mapping = async_mapping
        # wall-clock of each local-mapping pass (observability: the
        # reference prints per-stage mapping progress banners)
        self.mapping_ms: list[float] = []
        self._kf_queue: "queue.Queue[int]" = queue.Queue()
        self._mapper_thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._interrupt_ba = False
        if async_mapping:
            self._mapper_thread = threading.Thread(
                target=self._mapper_loop, daemon=True)
            self._mapper_thread.start()
            self.tracker.on_new_keyframe = self._enqueue_kf
            # AcceptMultiKeyFrames: the tracker only inserts keyframes
            # while no multikeyframe is queued or being processed
            # (cTracking.cpp:922-935); otherwise it signals InterruptBA
            # and the running mapping pass yields its BA/fuse stages
            # (cLocalMapping.cpp:512-515)
            self.tracker.mapper_idle_fn = \
                lambda: self._kf_queue.unfinished_tasks == 0
            self.tracker.interrupt_ba_fn = self._request_ba_interrupt
            self.mapper.interrupt_check = (
                lambda: not self._kf_queue.empty() or self._interrupt_ba)
        else:
            self.tracker.on_new_keyframe = self._process_kf
        # the two bootstrap keyframes are always mapped inline in the
        # tracking thread (cTracking::CreateInitialMap does the same,
        # cTracking.cpp:439-722): their first BA fixes the metric scale,
        # which must land before the tracker's next frame
        self.tracker.on_init_keyframes = self._process_init_kfs
        self.tracker.on_reset = self._on_reset

    # ------------------------------------------------------------------

    def _pad_features(self, feats, k_target):
        """Pad a Features batch to the map's slot capacity so init
        (2x features) and normal frames share one slot space."""
        import jax.numpy as jnp
        k = feats.xy.shape[1]
        if k == k_target:
            return feats
        pad = k_target - k

        def padf(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((a.shape[0], pad) + a.shape[2:], fill, a.dtype)], 1)

        return feats._replace(
            xy=padf(feats.xy), level=padf(feats.level), angle=padf(feats.angle),
            response=padf(feats.response), ray=padf(feats.ray),
            desc=padf(feats.desc), desc_mask=padf(feats.desc_mask),
            valid=padf(feats.valid, False))

    def _extract_padded(self, images):
        return self._pad_features(self.extract(images),
                                  self.map.kf_pt.shape[2])

    def _extract_init_padded(self, images):
        return self._pad_features(self.extract_init(images),
                                  self.map.kf_pt.shape[2])

    # ------------------------------------------------------------------

    def _ensure_loop_closer(self, kf: int):
        if self.loop_closer is not None or not self._enable_loops:
            return
        from .keyframe_database import KeyFrameDatabase
        from .loop_closing import LoopCloser
        from . import vocabulary as vocab_mod
        if self._vocabulary_path:
            # DBoW2 OpenCV-YAML (the reference's shipped vocabulary,
            # cSystem.cpp:60-63) or our own npz format, by extension
            if self._vocabulary_path.endswith((".yml", ".yaml")):
                voc = vocab_mod.load_dbow2_yaml(self._vocabulary_path)
            else:
                voc = vocab_mod.load_vocabulary(self._vocabulary_path)
        else:
            f = self.map.kf_features[kf]
            desc = np.asarray(f.desc).reshape(-1, f.desc.shape[-1])
            valid = np.asarray(f.valid).reshape(-1)
            # k=10 x 4 levels = 10^4 leaves, scaled-down from the
            # reference's shipped small_orb_omni_voc_9_6.yml (k=9, L=6,
            # ~531k words; cSystem.cpp:60-63).
            # Resolution matters for PLACE DISCRIMINATION: with a coarse
            # tree (512 words) every ~900-descriptor multi-frame fills
            # most of the word space and all pairwise L1 scores flatten
            # to ~0.6 +- 0.04 regardless of place; at 10^4 words
            # same-place pairs score ~0.10 above different-place pairs
            # and DetectLoop's ranking actually ranks places.
            voc = vocab_mod.train_vocabulary(desc[valid], k=10, levels=4)
        # the multi-camera rig is metric, so Sim3 scale is observable:
        # hold it in OptimizeSim3 AND the essential graph (the
        # reference's vertex type defines exactly this gate but never
        # enables it, g2o_MultiCol_sim3_expmap.h:63-66; free scale lets
        # a loop discrepancy be absorbed as a scale ramp around the
        # cycle instead of the rotation/translation distribution)
        self.loop_closer = LoopCloser(self.rig, self.map, voc,
                                      KeyFrameDatabase(), self._loop_params,
                                      fix_scale=True,
                                      fuser=self.mapper,
                                      scale_factor=self.settings.scale_factor,
                                      n_levels=self.settings.n_levels)
        self.loop_closer.on_loop = self._after_loop
        # cMultiKeyFrame::SetBadFlag -> KeyFrameDatabase::erase
        self.map.on_kf_removed = self.loop_closer.forget_keyframe
        self.tracker.reloc_candidates_fn = self._reloc_candidates
        self.tracker.reloc_bow_match_fn = self.loop_closer.bow_match_frame

    def _reloc_candidates(self, feats):
        """BoW relocalization candidates (DetectRelocalisationCandidates,
        cMultiKeyFrameDatabase.cpp:213-330) from the live inverted file."""
        from . import vocabulary as vocab_mod
        import jax.numpy as jnp
        lc = self.loop_closer
        if lc is None or not lc.db.kf_bow:
            return []
        desc = jnp.reshape(feats.desc, (-1, feats.desc.shape[-1]))
        valid = jnp.reshape(feats.valid, (-1,))
        words, _ = vocab_mod.transform_words(lc.voc, desc, valid)
        bow = vocab_mod.bow_vector(lc.voc, np.asarray(words))
        return lc.db.detect_reloc_candidates(bow, self.map)

    def _on_reset(self):
        """Reset fan-out (cTracking::Reset clears mapper, loop closer,
        KF database + id counters, cTracking.cpp:1327-1375): runs on
        both explicit System.reset and the tracker's internal young-map
        reset, so reused keyframe/point ids never meet stale entries."""
        if self.async_mapping:
            try:
                while True:
                    self._kf_queue.get_nowait()
                    self._kf_queue.task_done()
            except queue.Empty:
                pass
        self.mapper.reset()
        if self.loop_closer is not None:
            self.loop_closer.reset()

    def _after_loop(self, kf: int, loop_kf: int):
        # the map moved under the tracker (cLoopClosing calls
        # ForceRelocalisation on the tracker, cLoopClosing.cpp:575)
        self.tracker.force_reloc = True
        self.tracker.map_dirty = True

    def _process_init_kfs(self, kf0: int, kf1: int):
        self._process_kf(kf0)
        self._process_kf(kf1)

    # keyframes of corpus before the vocabulary retrain (>= 20 so the
    # idf weights come from a spread of views, not one image)
    VOCAB_RETRAIN_KFS = 20

    def _maybe_retrain_vocabulary(self, kf: int):
        """Accumulate each keyframe's descriptors; at VOCAB_RETRAIN_KFS
        keyframes retrain the vocabulary on the whole corpus with
        per-document idf and rebuild the loop closer's BoW state. The
        reference's vocabulary is trained offline on a large corpus
        (cSystem.cpp:60-63) — a tree quantized from one frame cannot
        rank places reliably across the viewpoint change a loop must
        bridge."""
        if self._vocabulary_path or self._voc_retrained:
            return
        f = self.map.kf_features[kf]
        if f is None:
            return
        desc = np.asarray(f.desc).reshape(-1, f.desc.shape[-1])
        valid = np.asarray(f.valid).reshape(-1)
        self._voc_corpus.append(desc[valid])
        if len(self._voc_corpus) < self.VOCAB_RETRAIN_KFS:
            return
        from . import vocabulary as vocab_mod
        corpus = np.concatenate(self._voc_corpus, 0)
        doc_ids = np.concatenate([
            np.full(len(d), i, np.int32)
            for i, d in enumerate(self._voc_corpus)])
        voc = vocab_mod.train_vocabulary(corpus, k=10, levels=4,
                                         doc_ids=doc_ids)
        self.loop_closer.set_vocabulary(voc)
        self._voc_retrained = True
        self._voc_corpus.clear()

    def _process_kf(self, kf: int):
        import time
        t0 = time.perf_counter()
        self.mapper.process_keyframe(kf)
        self.mapping_ms.append((time.perf_counter() - t0) * 1e3)
        # the mapping pass mutated the map (triangulation, fusion, local
        # BA moved positions): invalidate the tracker's device-resident
        # local-map snapshot cache
        self.tracker.map_dirty = True
        if self._enable_loops:
            self._ensure_loop_closer(kf)
            if self.loop_closer is not None:
                self._maybe_retrain_vocabulary(kf)
                self.loop_closer.insert_keyframe(kf)

    def _enqueue_kf(self, kf: int):
        self._kf_queue.put(kf)

    def _request_ba_interrupt(self):
        self._interrupt_ba = True

    def _mapper_loop(self):
        while not self._stop.is_set():
            try:
                kf = self._kf_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                if kf is None:    # shutdown sentinel
                    break
                try:
                    self._process_kf(kf)
                except Exception:
                    import traceback
                    traceback.print_exc()
            finally:
                self._interrupt_ba = False
                self._kf_queue.task_done()

    # ------------------------------------------------------------------

    def track(self, images, timestamp: float) -> Optional[np.ndarray]:
        """cSystem::TrackMultiColSLAM equivalent."""
        M = self.tracker.track(images, timestamp)
        if getattr(self, "keep_last_frame", False):
            # frame publisher snapshot (cMultiFramePublisher::Update):
            # the viewer thread renders from this copy, never from the
            # tracker's live state
            tr = self.tracker
            self.last_frame = (np.asarray(images), tr.cur_feats,
                               None if tr.cur_pt is None else tr.cur_pt.copy(),
                               tr.state.name)
        return M

    def track_batch(self, images, timestamps, chunk: int = 8):
        """Track a batch of CONSECUTIVE frames, preferring the chunked
        device-scan fast path (tracker.track_chunk: one dispatch + one
        fetch per ``chunk`` steady-state WORKING frames) and falling
        back to per-frame ``track()`` wherever the streaming
        preconditions fail (initialization, relocalization, a frame
        below the tracking-quality floors, or fewer than ``chunk``
        frames left). The throughput mode of the production pipeline;
        per-frame ``track()`` remains the latency-parity mode.

        ``images``: (B, C, H, W) array (device-resident preferred);
        ``timestamps``: sequence of B floats. Returns a list of B
        entries — (4, 4) body pose or None."""
        n = int(images.shape[0])
        if len(timestamps) != n:
            raise ValueError("timestamps length must match batch size")
        out: list = []
        i = 0
        while i < n:
            if n - i >= chunk:
                r = self.tracker.track_chunk(
                    images[i:i + chunk], list(timestamps[i:i + chunk]))
                if r is not None:
                    acc, poses = r
                    out.extend(poses)
                    i += acc
                    if acc == chunk:
                        continue
                    # the frame that broke the chunk replays per-frame
            out.append(self.track(images[i], timestamps[i]))
            i += 1
        return out

    def attach_viewer(self, out_dir: str = ".", period_s: float = 1.0):
        """Start the live viewer loop (cSystem spawns cViewer::Run,
        cSystem.cpp:96-110). Returns the running Viewer; stop it via
        viewer.stop() or shutdown()."""
        from ..utils.viz import Viewer
        self._viewer = Viewer(self, out_dir=out_dir, period_s=period_s)
        return self._viewer.start()

    @property
    def state(self) -> TrackState:
        return self.tracker.state

    def reset(self):
        """cSystem/cTracking::Reset (cTracking.cpp:1327-1375): clears the
        map AND the mapper's probation lists AND the loop closer's
        database/caches, so a re-initialized map's reused ids are clean."""
        self.tracker.reset()   # on_reset fans out to mapper + loop closer

    def shutdown(self):
        """cSystem::Shutdown: stop the worker and wait for it to finish
        in-flight work (the reference polls isFinished, cSystem.cpp:
        242-258) — joining fully avoids killing a thread mid-XLA-call."""
        if getattr(self, "_viewer", None) is not None:
            self._viewer.stop()
            self._viewer = None
        if self._mapper_thread is not None:
            self._kf_queue.put(None)           # drain, then exit
            self._mapper_thread.join(timeout=120)
        self._stop.set()

    def save_trajectory(self, path: str):
        """cSystem::SaveMKFTrajectoryLAFIDA (TUM format)."""
        save_tum(path, self.tracker.timestamps, self.tracker.all_poses)

    # ------------------------------------------------------------------

    def global_bundle_adjustment(self, iters: int = 10) -> float:
        """cOptimizer::GlobalBundleAdjustment (cOptimizer.cpp:57-257):
        joint LM over ALL keyframe poses + points, KF0 fixed as gauge.

        When more than one device is attached, the observation table is
        sharded over a device mesh and each LM iteration's Jacobian work
        runs data-parallel with psum/all_gather over ICI
        (parallel/ba_sharding.make_sharded_ba); single-chip falls back to
        the in-process Schur adjuster. Returns the final robust cost.
        """
        from .global_ba import run_global_ba

        m = self.map
        kfs = m.keyframe_ids().tolist()
        if len(kfs) < 2:
            return 0.0
        cost = run_global_ba(self.rig, m, [min(kfs)],
                             self.settings.scale_factor, iters=iters)
        if cost < 0:
            return 0.0
        # refresh cached viewing-ray / scale-invariance stats staled by
        # the adjustment (cMapPoint::UpdateNormalAndDepth role)
        pts = np.nonzero(m.pt_valid)[0]
        m.update_point_stats(np.asarray(pts, np.int64),
                             self.tracker._M_c_np,
                             self.settings.scale_factor,
                             self.settings.n_levels)
        return cost
