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
    """k-ary descriptor tree with an EXPLICIT child table, so both our
    trained complete trees and loaded DBoW2 trees (incomplete, leaves at
    varying depth) share one batched descent.

    children[n] lists node n's children (-1 padded); word_of_node maps
    leaf nodes to word ids (-1 for interior nodes)."""

    centroids: jax.Array     # (n_nodes, W) uint32
    children: jax.Array      # (n_nodes, k) int32, -1 padded
    word_of_node: jax.Array  # (n_nodes,) int32
    k: int
    levels: int
    n_words_: int
    weights: jax.Array       # (n_words,) float32 idf weights

    @property
    def n_words(self) -> int:
        return self.n_words_


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
                     seed: int = 0, kmeans_iters: int = 8,
                     doc_ids: np.ndarray | None = None) -> Vocabulary:
    """Hierarchical binary k-medians (DBoW2 create semantics): split the
    descriptor set recursively into k clusters per node, levels deep;
    centroids are bit-majority means; empty clusters are padded (marked
    invalid). idf weights from the training set.

    ``doc_ids`` (N,) assigns each descriptor to a training document
    (image); idf is then the DBoW2 definition log(n_docs / n_docs
    containing the word) (TemplatedVocabulary::setNodeWeights). Without
    it every descriptor counts as its own document (the single-image
    bootstrap fallback)."""
    rng = np.random.default_rng(seed)
    W = descriptors.shape[1]
    n_nodes = (k ** (levels + 1) - 1) // (k - 1)
    centroids = np.zeros((n_nodes, W), np.uint32)
    children = np.full((n_nodes, k), -1, np.int32)
    word_of_node = np.full(n_nodes, -1, np.int32)

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
                children[node, c] = child
                next_assign[child] = descs[lab == c]
        assignments = next_assign

    # words = deepest-level nodes that were created
    first_leaf = (k ** levels - 1) // (k - 1)
    leaf_nodes = [n for n in assignments.keys()]
    leaf_nodes.sort()
    for w, n in enumerate(leaf_nodes):
        word_of_node[n] = w
    n_words = len(leaf_nodes)

    word_counts = np.zeros(n_words, np.int64)
    voc_tmp = Vocabulary(centroids=jnp.asarray(centroids),
                         children=jnp.asarray(children),
                         word_of_node=jnp.asarray(word_of_node),
                         k=k, levels=levels, n_words_=n_words,
                         weights=jnp.ones(n_words, jnp.float32))
    words = np.asarray(transform_words(
        voc_tmp, jnp.asarray(descriptors),
        jnp.ones(len(descriptors), bool))[0])
    got = words >= 0
    if doc_ids is None:
        np.add.at(word_counts, words[got], 1)
        n_docs = max(len(descriptors), 1)
    else:
        doc_ids = np.asarray(doc_ids)
        # count DOCUMENTS containing each word, not occurrences
        pairs = np.unique(np.stack([words[got], doc_ids[got]], 1), axis=0)
        np.add.at(word_counts, pairs[:, 0], 1)
        n_docs = max(len(np.unique(doc_ids)), 1)
    idf = np.log(n_docs / np.maximum(word_counts, 1)).astype(np.float32)
    idf[word_counts == 0] = 0.0
    return voc_tmp._replace(weights=jnp.asarray(idf))


@functools.partial(jax.jit, static_argnames=("voc_k", "voc_levels", "levelsup"))
def _transform_impl(centroids, children, word_of_node, desc, valid,
                    voc_k: int, voc_levels: int, levelsup: int):
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)
    node_up = jnp.zeros(n, jnp.int32)
    for level in range(voc_levels):
        idx = children[node]                             # (N, k)
        has_child = idx >= 0
        idx_safe = jnp.clip(idx, 0)
        cents = centroids[idx_safe]                      # (N, k, W)
        x = cents ^ desc[:, None, :]
        d = jnp.sum(jax.lax.population_count(x), axis=-1)  # (N, k)
        d = jnp.where(has_child, d, 1 << 20)
        best = jnp.argmin(d, 1)
        nxt = jnp.take_along_axis(idx_safe, best[:, None], 1)[:, 0]
        node = jnp.where(has_child.any(1), nxt, node).astype(jnp.int32)
        if level == voc_levels - levelsup - 1:
            node_up = node
    word = word_of_node[node]
    word = jnp.where(valid, word, -1)
    return word, node_up


def transform_words(voc: Vocabulary, desc: jax.Array, valid: jax.Array,
                    levelsup: int = 2):
    """(N, W) packed descriptors -> (word_id (N,), node_at_levelsup (N,)).

    One fused descent for the whole batch. node_at_levelsup plays the
    role of DBoW2's FeatureVector grouping (reference levelsup=4 of a
    6-level tree ~ here scaled to the trained depth).
    """
    return _transform_impl(voc.centroids, voc.children, voc.word_of_node,
                           desc, valid, voc.k, voc.levels,
                           min(levelsup, voc.levels - 1))


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
        path, centroids=np.asarray(voc.centroids),
        children=np.asarray(voc.children),
        word_of_node=np.asarray(voc.word_of_node), k=voc.k,
        levels=voc.levels, n_words=voc.n_words_,
        weights=np.asarray(voc.weights))


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    return Vocabulary(centroids=jnp.asarray(z["centroids"]),
                      children=jnp.asarray(z["children"]),
                      word_of_node=jnp.asarray(z["word_of_node"]),
                      k=int(z["k"]), levels=int(z["levels"]),
                      n_words_=int(z["n_words"]),
                      weights=jnp.asarray(z["weights"]))


def load_dbow2_yaml(path: str) -> Vocabulary:
    """Load a DBoW2 OpenCV-YAML vocabulary (the reference ships
    Examples/small_orb_omni_voc_9_6.yml; cSystem.cpp:60-63 loads it with
    cv::FileStorage). Parses nodeId/parentId/weight/descriptor entries
    and rebuilds the explicit child table; words are the leaf nodes in
    file order (DBoW2 createWords semantics: leaves enumerated by node
    id)."""
    import re

    with open(path) as f:
        text = f.read()
    k = int(re.search(r"^\s*k:\s*(\d+)", text, re.M).group(1))
    L = int(re.search(r"^\s*L:\s*(\d+)", text, re.M).group(1))
    node_pat = re.compile(
        r"nodeId:\s*(\d+),\s*parentId:\s*(\d+),\s*weight:\s*([0-9.eE+-]+),"
        r"\s*descriptor:\s*\"([0-9 ]+)\"", re.S)
    nodes = []
    for mm in node_pat.finditer(text):
        nid, pid = int(mm.group(1)), int(mm.group(2))
        wt = float(mm.group(3))
        dbytes = np.asarray([int(b) for b in mm.group(4).split()], np.uint8)
        nodes.append((nid, pid, wt, dbytes))
    n_nodes = max(n[0] for n in nodes) + 1
    W = len(nodes[0][3]) // 4
    centroids = np.zeros((n_nodes, W), np.uint32)
    weights_by_node = np.zeros(n_nodes, np.float32)
    children = np.full((n_nodes, k), -1, np.int32)
    child_count = np.zeros(n_nodes, np.int32)
    for nid, pid, wt, dbytes in nodes:
        centroids[nid] = dbytes.view(np.uint32)
        weights_by_node[nid] = wt
        if child_count[pid] < k:
            children[pid, child_count[pid]] = nid
            child_count[pid] += 1
    # leaves -> words (in node-id order, matching DBoW2's enumeration)
    is_leaf = child_count == 0
    is_leaf[0] = False
    word_of_node = np.full(n_nodes, -1, np.int32)
    leaf_ids = np.nonzero(is_leaf)[0]
    word_of_node[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    weights = weights_by_node[leaf_ids]
    return Vocabulary(centroids=jnp.asarray(centroids),
                      children=jnp.asarray(children),
                      word_of_node=jnp.asarray(word_of_node),
                      k=k, levels=L, n_words_=len(leaf_ids),
                      weights=jnp.asarray(weights))
