"""Reset propagation + InterruptBA contracts (cTracking.cpp:1327-1375,
cLocalMapping.cpp:512-515)."""

import queue

import numpy as np
import pytest

from multicol_slam_tpu.models import matcher
from multicol_slam_tpu.models import vocabulary as vocab
from multicol_slam_tpu.models.keyframe_database import KeyFrameDatabase
from multicol_slam_tpu.models.local_mapping import LocalMapper
from multicol_slam_tpu.models.loop_closing import LoopCloser
from multicol_slam_tpu.models.map import MapStore
from multicol_slam_tpu.models.system import MultiColSLAM
from multicol_slam_tpu.utils import config_io

CALIB_DIR = "/root/reference/Examples/Lafida"


@pytest.fixture(scope="module")
def rig():
    r, _ = config_io.load_mcs(CALIB_DIR)
    return r


class TestInterruptBA:
    def _mapper_with_recorder(self, rig):
        m = MapStore(capacity_pts=64, capacity_kfs=4, n_cams=3,
                     k_per_cam=16)
        m.alloc_keyframe(np.zeros(6), None, 0)
        mapper = LocalMapper(rig, m, matcher.MatchParams(desc_bytes=32))
        calls = []
        for name in ["_update_point_stats_for_kf", "_cull_map_points",
                     "_create_new_map_points", "_create_cross_camera_points",
                     "_fuse_in_neighbors", "_local_bundle_adjustment",
                     "_cull_keyframes"]:
            setattr(mapper, name,
                    (lambda n: lambda kf: calls.append(n))(name))
        return mapper, calls

    def test_uninterrupted_runs_all_stages(self, rig):
        mapper, calls = self._mapper_with_recorder(rig)
        mapper.process_keyframe(0)
        assert "_local_bundle_adjustment" in calls
        assert "_fuse_in_neighbors" in calls

    def test_pending_keyframe_aborts_ba(self, rig):
        """A queued keyframe interrupts the expensive tail stages, like
        the reference's mbAbortBA (cTracking.cpp:931)."""
        mapper, calls = self._mapper_with_recorder(rig)
        mapper.interrupt_check = lambda: True
        mapper.process_keyframe(0)
        assert "_create_new_map_points" in calls       # front always runs
        assert "_fuse_in_neighbors" not in calls
        assert "_local_bundle_adjustment" not in calls
        assert "_cull_keyframes" not in calls


class TestResetPropagation:
    def test_reset_clears_mapper_loopcloser_and_queue(self, rig):
        settings = config_io.SlamSettings(n_features=64, n_levels=2)
        slam = MultiColSLAM(CALIB_DIR, settings=settings, capacity_pts=256,
                            capacity_kfs=8, enable_loop_closing=True,
                            async_mapping=True)
        try:
            # fabricate stale state from a "previous map"
            slam.mapper.recent_pts.extend([(3, 0), (5, 1)])
            rng = np.random.default_rng(0)
            voc = vocab.train_vocabulary(
                rng.integers(0, 2 ** 32, (64, 8)).astype(np.uint32),
                k=4, levels=2)
            slam.loop_closer = LoopCloser(
                slam.rig, slam.map, voc, KeyFrameDatabase(),
                slam._loop_params)
            slam.loop_closer.db.add(0, {1: 0.5, 2: 0.25})
            slam.loop_closer.kf_words[0] = np.zeros(4, np.int32)
            slam.loop_closer.consistent_groups.append(({0}, 2))
            slam.loop_closer.last_loop_kf = 7
            slam._kf_queue.put(3)

            slam.reset()

            assert slam.mapper.recent_pts == []
            assert slam.loop_closer.db.kf_bow == {}
            assert slam.loop_closer.kf_words == {}
            assert slam.loop_closer.consistent_groups == []
            assert slam.loop_closer.last_loop_kf < 0
            with pytest.raises(queue.Empty):
                slam._kf_queue.get_nowait()
            assert slam.map.n_keyframes() == 0
        finally:
            slam.shutdown()
