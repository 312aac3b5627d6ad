"""MapStore bookkeeping invariants: incremental covisibility vs brute
recount, replace-forwarding, duplicate-observation rules, checkpoint
path normalization."""

import numpy as np
import pytest

from multicol_slam_tpu.models.map import MapStore


def brute_covis(m: MapStore, kf: int) -> dict[int, int]:
    """Distinct-shared-landmark recount straight from pt_obs (the
    reference's UpdateConnections definition, cMultiKeyFrame.cpp:406-500)."""
    counts: dict[int, int] = {}
    for pt, lst in m.pt_obs.items():
        kfs = {o[0] for o in lst}
        if kf in kfs:
            for other in kfs - {kf}:
                counts[other] = counts.get(other, 0) + 1
    return {k: v for k, v in counts.items() if m.kf_valid[k]}


def make_map(n_kf=6, n_pt=120, seed=0):
    rng = np.random.default_rng(seed)
    m = MapStore(capacity_pts=n_pt + 32, capacity_kfs=n_kf + 2,
                 n_cams=2, k_per_cam=n_pt)
    for k in range(n_kf):
        m.alloc_keyframe(np.zeros(6), None, k)
    ids = m.alloc_points(n_pt)
    slot = np.zeros((n_kf, 2), int)
    for p in ids:
        for k in rng.choice(n_kf, rng.integers(1, 5), replace=False):
            c = int(rng.integers(0, 2))
            m.add_observation(int(p), int(k), c, int(slot[k, c]))
            slot[k, c] += 1
    return m, ids, rng


class TestIncrementalCovisibility:
    def test_matches_brute_recount_after_mutations(self):
        m, ids, rng = make_map()
        # mutate: erase some observations, replace some points, drop a KF
        for p in rng.choice(ids, 20, replace=False):
            obs = list(m.pt_obs.get(int(p), []))
            if obs:
                kf, cam, slot = obs[0]
                m.erase_observation(int(p), kf, cam, slot)
        live = [int(p) for p in ids if m.pt_valid[p]]
        for a, b in zip(live[:10], live[10:20]):
            m.replace_point(a, b)
        m.remove_keyframe(3)
        for k in range(6):
            if m.kf_valid[k]:
                assert m.covisibility_weights(k) == brute_covis(m, k), \
                    f"kf {k} incremental covisibility diverged"

    def test_recompute_matches_incremental(self):
        m, _, _ = make_map(seed=1)
        live = {k: dict(m._covis[k]) for k in list(m._covis)}
        m.recompute_covisibility()
        rebuilt = {k: dict(m._covis[k]) for k in list(m._covis)}
        assert {k: v for k, v in live.items() if v} == \
               {k: v for k, v in rebuilt.items() if v}


class TestReplaceForwarding:
    def test_no_duplicate_observation_on_replace(self):
        """cMapPoint::Replace (cMapPoint.cpp:231-239): when the merge
        target is already observed in the same (kf, cam), the old match
        is erased, never double-observed."""
        m = MapStore(capacity_pts=8, capacity_kfs=2, n_cams=1, k_per_cam=8)
        m.alloc_keyframe(np.zeros(6), None, 0)
        m.alloc_keyframe(np.zeros(6), None, 1)
        a, b = (int(i) for i in m.alloc_points(2))
        m.add_observation(a, 0, 0, 0)
        m.add_observation(a, 1, 0, 0)
        m.add_observation(b, 0, 0, 1)   # b already in (kf0, cam0), slot 1
        m.add_observation(b, 1, 0, 1)
        m.replace_point(a, b)
        per_kf_cam = {}
        for kf, cam, slot in m.pt_obs[b]:
            per_kf_cam[(kf, cam)] = per_kf_cam.get((kf, cam), 0) + 1
        assert max(per_kf_cam.values()) == 1, m.pt_obs[b]
        assert m.kf_pt[0, 0, 0] == -1      # old slot cleared
        assert m.kf_pt[0, 0, 1] == b

    def test_resolve_points_follows_chains(self):
        m = MapStore(capacity_pts=16, capacity_kfs=4, n_cams=1, k_per_cam=16)
        for k in range(3):
            m.alloc_keyframe(np.zeros(6), None, k)
        p = [int(i) for i in m.alloc_points(3)]
        for i, q in enumerate(p):
            for k in range(3):
                m.add_observation(q, k, 0, 3 * k + i)
        m.replace_point(p[0], p[1])
        m.replace_point(p[1], p[2])
        arr = np.asarray([p[0], p[1], p[2], -1], np.int32)
        out = m.resolve_points(arr)
        np.testing.assert_array_equal(out, [p[2], p[2], p[2], -1])


def test_checkpoint_path_without_npz_suffix(tmp_path):
    from multicol_slam_tpu.utils import checkpoint
    m, _, _ = make_map(seed=2)
    path = str(tmp_path / "session.ckpt")     # no .npz suffix
    checkpoint.save_map(path, m)
    m2, _ = checkpoint.load_map(path)
    assert m2.n_points() == m.n_points()
    assert m2.covisibility_weights(0) == m.covisibility_weights(0)


class TestKeyFrameCullingScale:
    """KeyFrameCulling's finer-or-equal-scale condition
    (cLocalMapping.cpp:517-593): redundancy only counts observations at
    level <= own level + 1."""

    def _build(self, other_level: int):
        import jax.numpy as jnp
        from multicol_slam_tpu.models.extractor import Features
        from multicol_slam_tpu.models.local_mapping import LocalMapper
        from multicol_slam_tpu.models import matcher
        from multicol_slam_tpu.utils import config_io

        rig, _ = config_io.load_mcs("/root/reference/Examples/Lafida")
        # maxNrObs=5 other observers (cLocalMapping.cpp:522) -> need 6 KFs
        n_pt, n_kf = 40, 6
        m = MapStore(capacity_pts=n_pt + 8, capacity_kfs=n_kf + 1,
                     n_cams=3, k_per_cam=n_pt)

        def feats(level):
            C, K = 3, n_pt
            return Features(
                xy=jnp.zeros((C, K, 2)), level=jnp.full((C, K), level,
                                                        jnp.int32),
                angle=jnp.zeros((C, K)), response=jnp.zeros((C, K)),
                ray=jnp.zeros((C, K, 3)),
                desc=jnp.zeros((C, K, 8), jnp.uint32),
                desc_mask=jnp.zeros((C, K, 8), jnp.uint32),
                valid=jnp.ones((C, K), bool))

        # kf 1 = culling candidate at level 0; all points also seen by
        # kfs 2..4 at `other_level`
        for k in range(n_kf):
            m.alloc_keyframe(np.zeros(6), feats(other_level if k != 1
                                                else 0), k)
        ids = m.alloc_points(n_pt)
        for i, p in enumerate(ids):
            for k in range(n_kf):
                m.add_observation(int(p), k, 0, i)
        mapper = LocalMapper(rig, m, matcher.MatchParams(desc_bytes=32))
        return m, mapper

    def test_culls_when_seen_finer_elsewhere(self):
        m, mapper = self._build(other_level=0)
        mapper._cull_keyframes(0)
        assert not m.kf_valid[1], "fully-redundant KF must be culled"

    def test_keeps_when_only_seen_coarser(self):
        m, mapper = self._build(other_level=5)
        mapper._cull_keyframes(0)
        assert m.kf_valid[1], \
            "KF whose points are only seen coarsely elsewhere must survive"


class TestPoolGrowth:
    """Pools grow instead of raising MemoryError mid-track (the
    reference's map is an unbounded pointer set, cMap.h:42-89)."""

    def test_point_pool_grows_and_forwarding_survives(self):
        m = MapStore(capacity_pts=8, capacity_kfs=2, n_cams=1, k_per_cam=64)
        m.alloc_keyframe(np.zeros(6), None, 0)
        m.alloc_keyframe(np.zeros(6), None, 1)
        first = m.alloc_points(6)
        for i, p in enumerate(first):
            m.add_observation(int(p), 0, 0, i)
            m.add_observation(int(p), 1, 0, i + 8)
        m.replace_point(int(first[0]), int(first[1]))
        # allocation beyond capacity must grow, not raise
        more = m.alloc_points(30)
        assert m.capacity_pts >= 36
        assert len(more) == 30 and m.pt_valid[more].all()
        # forwarding set up before the growth still resolves
        resolved = m.resolve_points(np.asarray([int(first[0])]))
        assert resolved[0] == int(first[1])
        # new tail ids forward to themselves
        assert (m.pt_forward[more] == more).all()
        # and covisibility bookkeeping survived intact
        assert m.covisibility_weights(0) == brute_covis(m, 0)

    def test_keyframe_pool_grows(self):
        m = MapStore(capacity_pts=8, capacity_kfs=2, n_cams=2, k_per_cam=4)
        for k in range(9):
            assert m.alloc_keyframe(np.zeros(6), None, k) == k
        assert m.capacity_kfs >= 9
        assert m.kf_pt.shape == (m.capacity_kfs, 2, 4)
        assert (m.kf_pt[2:] == -1).all()

    def test_long_run_allocation_never_fails(self):
        """2000 rounds of alloc/cull churn on tiny initial capacities:
        the map must degrade (grow) instead of dying (VERDICT r2 #4)."""
        rng = np.random.default_rng(0)
        m = MapStore(capacity_pts=64, capacity_kfs=4, n_cams=1,
                     k_per_cam=32)
        live: list[int] = []
        for step in range(2000):
            kf = m.alloc_keyframe(np.zeros(6), None, step) \
                if step % 50 == 0 else None
            ids = m.alloc_points(8)
            live.extend(int(p) for p in ids)
            if len(live) > 200:
                for p in live[:100]:
                    m.remove_point(p)
                live = live[100:]
        assert m.n_points() == len(live)


class TestBatchedDistinctiveDescriptor:
    def test_batch_matches_single(self):
        from multicol_slam_tpu import runtime
        rng = np.random.default_rng(3)
        packed = []
        offsets = [0]
        for _ in range(17):
            o = int(rng.integers(1, 9))
            packed.append(rng.integers(0, 2 ** 32, (o, 8), dtype=np.uint32))
            offsets.append(offsets[-1] + o)
        table = np.concatenate(packed, 0)
        best = runtime.distinctive_descriptors_batch(
            table, np.asarray(offsets, np.int32))
        for i, seg in enumerate(packed):
            assert best[i] == runtime.distinctive_descriptor(seg)
