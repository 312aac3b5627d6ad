"""Tests: popcount-GEMM Hamming == exact XOR+popcount (the reference
semantics of cORBmatcher.cpp:2439-2476), plus gated-NN matching."""

import numpy as np
import jax.numpy as jnp

from multicol_slam_tpu.ops import hamming as hm


def rand_desc(rng, n, words):
    return jnp.asarray(rng.integers(0, 2**32, (n, words), dtype=np.uint32))


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, (7, 256), dtype=np.uint8))
        packed = hm.pack_bits_u32(bits)
        assert packed.shape == (7, 8)
        np.testing.assert_array_equal(hm.unpack_bits_u32(packed), bits)

    def test_to_pm1(self):
        rng = np.random.default_rng(1)
        packed = rand_desc(rng, 4, 8)
        pm = np.asarray(hm.to_pm1(packed).astype(np.float32))
        bits = np.asarray(hm.unpack_bits_u32(packed))
        np.testing.assert_array_equal(pm, 2.0 * bits - 1.0)


class TestHammingGemm:
    def test_matches_exact_256bit(self):
        """32-byte descriptors (Lafida default, Slam_Settings: descSize 32)."""
        rng = np.random.default_rng(2)
        a, b = rand_desc(rng, 300, 8), rand_desc(rng, 400, 8)
        exact = np.asarray(hm.hamming_matrix_exact(a, b))
        gemm = np.asarray(hm.hamming_matrix(a, b))
        np.testing.assert_array_equal(gemm, exact)

    def test_matches_exact_512bit(self):
        rng = np.random.default_rng(3)
        a, b = rand_desc(rng, 100, 16), rand_desc(rng, 120, 16)
        np.testing.assert_array_equal(hm.hamming_matrix(a, b),
                                      hm.hamming_matrix_exact(a, b))

    def test_zero_distance_self(self):
        rng = np.random.default_rng(4)
        a = rand_desc(rng, 50, 8)
        d = np.asarray(hm.hamming_matrix(a, a))
        np.testing.assert_array_equal(np.diag(d), np.zeros(50, np.int32))

    def test_known_distance(self):
        a = jnp.asarray([[0b1011, 0]], jnp.uint32)
        b = jnp.asarray([[0b0010, 0]], jnp.uint32)
        assert int(hm.hamming_matrix(a, b)[0, 0]) == 2  # bits 0 and 3 differ

    def test_masked_matches_exact(self):
        """Masked semantics: ((a^b)&m_a + (a^b)&m_b) // 2
        (cORBmatcher.cpp:2455-2476)."""
        rng = np.random.default_rng(5)
        a, b = rand_desc(rng, 64, 8), rand_desc(rng, 96, 8)
        ma, mb = rand_desc(rng, 64, 8), rand_desc(rng, 96, 8)
        exact = np.asarray(hm.hamming_matrix_masked_exact(a, b, ma, mb))
        gemm = np.asarray(hm.hamming_matrix_masked(a, b, ma, mb))
        np.testing.assert_array_equal(gemm, exact)

    def test_thresholds(self):
        assert hm.thresholds(32, masked=False) == (96, 64)
        assert hm.thresholds(32, masked=True) == (48, 32)
        assert hm.thresholds(16, masked=False) == (48, 32)
        assert hm.thresholds(64, masked=True) == (96, 64)


class TestGatedNN:
    def test_simple_nn(self):
        rng = np.random.default_rng(6)
        b = rand_desc(rng, 100, 8)
        # queries = noisy copies of targets 3, 17, 42 (flip a few bits)
        idxs = [3, 17, 42]
        a_np = np.asarray(b)[idxs].copy()
        a_np[0, 0] ^= 0b111  # 3 bit flips
        a = jnp.asarray(a_np)
        dist = hm.hamming_matrix(a, b)
        valid = jnp.ones(dist.shape, bool)
        match, d = hm.gated_nn_match(dist, valid, max_dist=96)
        np.testing.assert_array_equal(match, idxs)
        assert int(d[0]) == 3 and int(d[1]) == 0

    def test_gating_blocks(self):
        rng = np.random.default_rng(7)
        b = rand_desc(rng, 10, 8)
        a = jnp.asarray(np.asarray(b)[[2]])
        dist = hm.hamming_matrix(a, b)
        valid = jnp.ones(dist.shape, bool).at[0, 2].set(False)
        match, _ = hm.gated_nn_match(dist, valid, max_dist=5)
        assert int(match[0]) == -1  # true NN gated out, others too far

    def test_ratio_test(self):
        # two nearly-equidistant targets -> ratio test rejects
        a = jnp.asarray([[0b1111, 0]], jnp.uint32)
        b = jnp.asarray([[0b1110, 0], [0b0111, 0]], jnp.uint32)  # both dist 1
        dist = hm.hamming_matrix(a, b)
        valid = jnp.ones(dist.shape, bool)
        m_no, _ = hm.gated_nn_match(dist, valid, max_dist=10)
        m_ratio, _ = hm.gated_nn_match(dist, valid, max_dist=10, nn_ratio=0.9)
        assert int(m_no[0]) == 0 and int(m_ratio[0]) == -1

    def test_mutual(self):
        rng = np.random.default_rng(8)
        b = rand_desc(rng, 20, 8)
        # a0 and a1 both closest to b[5]; mutual keeps only the better one
        a_np = np.asarray(b)[[5, 5]].copy()
        a_np[1, 0] ^= 0b1  # a1 one bit away
        a = jnp.asarray(a_np)
        dist = hm.hamming_matrix(a, b)
        valid = jnp.ones(dist.shape, bool)
        m, _ = hm.gated_nn_match(dist, valid, max_dist=96, mutual=True)
        assert int(m[0]) == 5 and int(m[1]) == -1

    def test_resolve_duplicates(self):
        match = jnp.asarray([4, 4, 2, -1], jnp.int32)
        d = jnp.asarray([10, 3, 1, 0], jnp.int32)
        out = np.asarray(hm.resolve_duplicate_targets(match, d, m=8))
        np.testing.assert_array_equal(out, [-1, 4, 2, -1])
