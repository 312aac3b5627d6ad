"""Tests for the vocabulary tree + BoW + keyframe database."""

import numpy as np
import jax
import jax.numpy as jnp

from multicol_slam_tpu.models import vocabulary as vocab


def rand_descs(rng, n, words=8):
    return rng.integers(0, 2 ** 32, (n, words), dtype=np.uint32)


def clustered_descs(rng, n_clusters, per_cluster, words=8, flip_bits=12):
    """Cluster centers + noisy members (flip a few bits each)."""
    centers = rand_descs(rng, n_clusters, words)
    out, labels = [], []
    for ci, c in enumerate(centers):
        for _ in range(per_cluster):
            d = c.copy()
            for _ in range(flip_bits):
                b = rng.integers(0, 32 * words)
                d[b // 32] ^= np.uint32(1 << (b % 32))
            out.append(d)
            labels.append(ci)
    return np.stack(out), np.asarray(labels), centers


class TestTraining:
    def test_train_and_transform(self):
        rng = np.random.default_rng(0)
        descs, labels, centers = clustered_descs(rng, 20, 30)
        voc = vocab.train_vocabulary(descs, k=5, levels=2, seed=1)
        words, node_up = vocab.transform_words(
            voc, jnp.asarray(descs), jnp.ones(len(descs), bool))
        words = np.asarray(words)
        assert (words >= 0).all() and (words < voc.n_words).all()
        # same-cluster descriptors should mostly share a word
        same = 0
        for c in range(20):
            w = words[labels == c]
            same += (w == np.bincount(w).argmax()).mean()
        assert same / 20 > 0.7, "clusters don't map to consistent words"

    def test_transform_deterministic_and_batched(self):
        rng = np.random.default_rng(1)
        descs = rand_descs(rng, 200)
        voc = vocab.train_vocabulary(descs, k=4, levels=3, seed=2)
        w1, n1 = vocab.transform_words(voc, jnp.asarray(descs),
                                       jnp.ones(200, bool))
        w2, n2 = vocab.transform_words(voc, jnp.asarray(descs),
                                       jnp.ones(200, bool))
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(n1, n2)

    def test_invalid_marked(self):
        rng = np.random.default_rng(2)
        descs = rand_descs(rng, 50)
        voc = vocab.train_vocabulary(descs, k=3, levels=2)
        valid = np.ones(50, bool)
        valid[10:20] = False
        w, _ = vocab.transform_words(voc, jnp.asarray(descs),
                                     jnp.asarray(valid))
        w = np.asarray(w)
        assert (w[10:20] == -1).all() and (w[:10] >= 0).all()

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        descs = rand_descs(rng, 100)
        voc = vocab.train_vocabulary(descs, k=3, levels=2)
        p = str(tmp_path / "voc.npz")
        vocab.save_vocabulary(voc, p)
        voc2 = vocab.load_vocabulary(p)
        w1, _ = vocab.transform_words(voc, jnp.asarray(descs),
                                      jnp.ones(100, bool))
        w2, _ = vocab.transform_words(voc2, jnp.asarray(descs),
                                      jnp.ones(100, bool))
        np.testing.assert_array_equal(w1, w2)


class TestBow:
    def test_self_score_is_one(self):
        rng = np.random.default_rng(4)
        descs = rand_descs(rng, 300)
        voc = vocab.train_vocabulary(descs, k=5, levels=2)
        w, _ = vocab.transform_words(voc, jnp.asarray(descs[:50]),
                                     jnp.ones(50, bool))
        v = vocab.bow_vector(voc, np.asarray(w))
        assert abs(vocab.bow_score_l1(v, v) - 1.0) < 1e-9

    def test_similar_scores_higher(self):
        rng = np.random.default_rng(5)
        descs, labels, _ = clustered_descs(rng, 30, 20)
        voc = vocab.train_vocabulary(descs, k=6, levels=2, seed=6)

        def bow_of(d):
            w, _ = vocab.transform_words(voc, jnp.asarray(d),
                                         jnp.ones(len(d), bool))
            return vocab.bow_vector(voc, np.asarray(w))

        # two overlapping subsets vs a disjoint random set
        a = bow_of(descs[:200])
        b = bow_of(descs[100:300])
        c = bow_of(rand_descs(rng, 200))
        assert vocab.bow_score_l1(a, b) > vocab.bow_score_l1(a, c) + 0.1


class TestKeyFrameDatabase:
    def test_loop_candidates(self):
        from multicol_slam_tpu.models.keyframe_database import KeyFrameDatabase
        from multicol_slam_tpu.models.map import MapStore

        rng = np.random.default_rng(6)
        descs, labels, _ = clustered_descs(rng, 50, 20)
        voc = vocab.train_vocabulary(descs, k=6, levels=2, seed=7)
        db = KeyFrameDatabase()
        m = MapStore(capacity_pts=10, capacity_kfs=16, n_cams=3,
                     k_per_cam=8, desc_words=8)

        def bow_of(d):
            w, _ = vocab.transform_words(voc, jnp.asarray(d),
                                         jnp.ones(len(d), bool))
            return vocab.bow_vector(voc, np.asarray(w))

        # 5 keyframes: 0 and 4 see the same content
        sets = [descs[0:200], descs[200:400], descs[400:600],
                descs[600:800], descs[0:200]]
        for kf, d in enumerate(sets):
            db.add(kf, bow_of(d))
        cands = db.detect_loop_candidates(
            4, bow_of(sets[4]), min_score=0.05, map_store=m,
            connected={3})
        assert 0 in cands
        assert 3 not in cands  # excluded (connected)

    def test_erase(self):
        from multicol_slam_tpu.models.keyframe_database import KeyFrameDatabase
        db = KeyFrameDatabase()
        db.add(1, {5: 0.5, 7: 0.5})
        db.erase(1)
        assert 1 not in db.kf_bow
        assert all(1 not in lst for lst in db.inverted.values())


class TestDBoW2Loader:
    def test_load_reference_vocabulary(self):
        """Parse the reference's shipped 2MB DBoW2 vocabulary and run the
        batched transform through it."""
        voc = vocab.load_dbow2_yaml(
            "/root/reference/Examples/small_orb_omni_voc_9_6.yml")
        assert voc.k == 9 and voc.levels == 6
        assert voc.n_words > 100
        assert voc.centroids.shape[1] == 8  # 32-byte ORB descriptors
        rng = np.random.default_rng(9)
        descs = rand_descs(rng, 300)
        w, nup = vocab.transform_words(voc, jnp.asarray(descs),
                                       jnp.ones(300, bool))
        w = np.asarray(w)
        assert (w >= 0).all() and (w < voc.n_words).all()
        # deterministic
        w2, _ = vocab.transform_words(voc, jnp.asarray(descs),
                                      jnp.ones(300, bool))
        np.testing.assert_array_equal(w, np.asarray(w2))
        # words spread over the tree (not all descriptors in one word)
        assert len(np.unique(w)) > 50

    def test_bow_scoring_with_loaded_vocab(self):
        voc = vocab.load_dbow2_yaml(
            "/root/reference/Examples/small_orb_omni_voc_9_6.yml")
        rng = np.random.default_rng(10)
        descs = rand_descs(rng, 200)
        w, _ = vocab.transform_words(voc, jnp.asarray(descs),
                                     jnp.ones(200, bool))
        v = vocab.bow_vector(voc, np.asarray(w))
        assert abs(vocab.bow_score_l1(v, v) - 1.0) < 1e-9
