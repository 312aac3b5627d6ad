"""Binary-descriptor vocabulary: hierarchical k-medians tree + batched
BoW transform (the DBoW2 replacement, SURVEY.md §2.2).

Reference usage: TemplatedVocabulary::transform maps each descriptor to
a leaf word (greedy descent by Hamming distance,
ThirdParty/DBoW2/TemplatedVocabulary.h:135-160) and records the node id
at ``levelsup`` above the leaves for feature-constrained matching
(cMultiKeyFrame.cpp:112 uses levelsup=4); FORB::meanValue is the
bit-majority centroid; scoring is L1 (ScoringObject.cpp).

TPU-first: the tree is COMPLETE k-ary with implicit child indexing, so
the whole transform is L static gather+popcount steps over ALL
descriptors of a MultiFrame at once — no per-descriptor recursion.
Training is host-side numpy (one-off, k-medians with bit-majority
means), or load a trained tree from disk.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    """Complete k-ary tree, levels L. Node layout: level l occupies
    [(k^l - 1)/(k - 1), (k^(l+1) - 1)/(k - 1)); children of node n are
    n*k + 1 ... n*k + k. Leaves (level L) are the words."""

    centroids: jax.Array    # (n_nodes, W) uint32, level>=1 nodes (root excluded? included, unused)
    k: int
    levels: int
    weights: jax.Array      # (n_words,) float32 idf weights
    valid_node: jax.Array   # (n_nodes,) bool — False for padded empty clusters

    @property
    def n_words(self) -> int:
        return self.k ** self.levels

    def node_offset(self, level: int) -> int:
        return (self.k ** level - 1) // (self.k - 1)


def _bit_majority(descs: np.ndarray) -> np.ndarray:
    """FORB::meanValue: per-bit majority vote over (N, W) uint32."""
    bits = np.unpackbits(descs.view(np.uint8), axis=1)
    mean = bits.mean(0) >= 0.5
    return np.packbits(mean.astype(np.uint8)).view(np.uint32)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, W) x (M, W) -> (N, M) int hamming (numpy popcount)."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8).reshape(x.shape[0], x.shape[1], -1),
                         axis=2).sum(2)


def train_vocabulary(descriptors: np.ndarray, k: int = 10, levels: int = 4,
                     seed: int = 0, kmeans_iters: int = 8) -> Vocabulary:
    """Hierarchical binary k-medians (DBoW2 create semantics): split the
    descriptor set recursively into k clusters per node, levels deep;
    centroids are bit-majority means; empty clusters are padded (marked
    invalid). idf weights from the training set."""
    rng = np.random.default_rng(seed)
    W = descriptors.shape[1]
    n_nodes = (k ** (levels + 1) - 1) // (k - 1)
    centroids = np.zeros((n_nodes, W), np.uint32)
    valid = np.zeros(n_nodes, bool)
    valid[0] = True

    # recursive split
    assignments = {0: descriptors}
    for level in range(levels):
        next_assign = {}
        for node, descs in assignments.items():
            if len(descs) == 0:
                continue
            kk = min(k, len(descs))
            # k-medians init: random distinct picks
            idx = rng.choice(len(descs), kk, replace=False)
            cents = descs[idx].copy()
            for _ in range(kmeans_iters):
                d = _hamming_np(descs, cents)
                lab = d.argmin(1)
                new = []
                for c in range(kk):
                    sel = descs[lab == c]
                    new.append(_bit_majority(sel) if len(sel) else cents[c])
                new = np.stack(new)
                if (new == cents).all():
                    break
                cents = new
            d = _hamming_np(descs, cents)
            lab = d.argmin(1)
            for c in range(kk):
                child = node * k + 1 + c
                centroids[child] = cents[c]
                valid[child] = True
                next_assign[child] = descs[lab == c]
            # pad empty children with far-away random codes (never win)
            for c in range(kk, k):
                child = node * k + 1 + c
                centroids[child] = rng.integers(0, 2 ** 32, W, dtype=np.uint32)
                valid[child] = False
        assignments = next_assign

    # idf weights over leaf words
    n_words = k ** levels
    first_leaf = (k ** levels - 1) // (k - 1)
    word_counts = np.zeros(n_words, np.int64)
    # assign training descriptors to words using the finished tree
    voc_tmp = Vocabulary(centroids=jnp.asarray(centroids), k=k, levels=levels,
                         weights=jnp.ones(n_words, jnp.float32),
                         valid_node=jnp.asarray(valid))
    words = np.asarray(transform_words(
        voc_tmp, jnp.asarray(descriptors),
        jnp.ones(len(descriptors), bool))[0])
    np.add.at(word_counts, words, 1)
    n_docs = max(len(descriptors), 1)
    idf = np.log(n_docs / np.maximum(word_counts, 1)).astype(np.float32)
    idf[word_counts == 0] = 0.0
    return Vocabulary(centroids=jnp.asarray(centroids), k=k, levels=levels,
                      weights=jnp.asarray(idf), valid_node=jnp.asarray(valid))


@functools.partial(jax.jit, static_argnames=("voc_k", "voc_levels", "levelsup"))
def _transform_impl(centroids, valid_node, desc, valid, voc_k: int,
                    voc_levels: int, levelsup: int):
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)
    node_up = jnp.zeros(n, jnp.int32)
    for level in range(voc_levels):
        child0 = node * voc_k + 1                        # (N,)
        idx = child0[:, None] + jnp.arange(voc_k)[None]  # (N, k)
        cents = centroids[idx]                           # (N, k, W)
        x = cents ^ desc[:, None, :]
        d = jnp.sum(jax.lax.population_count(x), axis=-1)  # (N, k)
        d = jnp.where(valid_node[idx], d, 1 << 20)
        best = jnp.argmin(d, 1).astype(jnp.int32)
        node = child0 + best
        if level == voc_levels - levelsup - 1:
            node_up = node
    first_leaf = (voc_k ** voc_levels - 1) // (voc_k - 1)
    word = node - first_leaf
    word = jnp.where(valid, word, -1)
    return word, node_up


def transform_words(voc: Vocabulary, desc: jax.Array, valid: jax.Array,
                    levelsup: int = 2):
    """(N, W) packed descriptors -> (word_id (N,), node_at_levelsup (N,)).

    One fused descent for the whole batch. node_at_levelsup plays the
    role of DBoW2's FeatureVector grouping (reference levelsup=4 of a
    6-level tree ~ here scaled to the trained depth).
    """
    return _transform_impl(voc.centroids, voc.valid_node, desc, valid,
                           voc.k, voc.levels, min(levelsup, voc.levels - 1))


def bow_vector(voc: Vocabulary, words: np.ndarray) -> dict[int, float]:
    """Sparse L1-normalized tf-idf BoW vector (DBoW2 TF_IDF + L1)."""
    words = np.asarray(words)
    words = words[words >= 0]
    if len(words) == 0:
        return {}
    ids, counts = np.unique(words, return_counts=True)
    w = counts.astype(np.float64) * np.asarray(voc.weights)[ids]
    total = w.sum()
    if total <= 0:
        return {}
    return {int(i): float(v / total) for i, v in zip(ids, w) if v > 0}


def bow_score_l1(v1: dict[int, float], v2: dict[int, float]) -> float:
    """DBoW2 L1 score: 2 * sum_i min(|v1_i|, |v2_i|) ... equivalently
    1 - 0.5*|v1 - v2|_1 for L1-normalized vectors (ScoringObject.cpp)."""
    if not v1 or not v2:
        return 0.0
    s = 0.0
    for k_, a in v1.items():
        b = v2.get(k_)
        if b is not None:
            s += abs(a) + abs(b) - abs(a - b)
    return 0.5 * s


def save_vocabulary(voc: Vocabulary, path: str):
    np.savez_compressed(
        path, centroids=np.asarray(voc.centroids), k=voc.k,
        levels=voc.levels, weights=np.asarray(voc.weights),
        valid_node=np.asarray(voc.valid_node))


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    return Vocabulary(centroids=jnp.asarray(z["centroids"]),
                      k=int(z["k"]), levels=int(z["levels"]),
                      weights=jnp.asarray(z["weights"]),
                      valid_node=jnp.asarray(z["valid_node"]))
