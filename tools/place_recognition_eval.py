#!/usr/bin/env python
"""Place-recognition evaluation at scale (VERDICT r4 item 7).

The reference ships a ~531k-word DBoW2 vocabulary trained offline
(Examples/small_orb_omni_voc_9_6.yml, cSystem.cpp:60-63); this
framework defaults to a 10^4-word tree self-trained from the session's
own keyframes. This tool measures whether either vocabulary actually
RANKS places on a 100+ keyframe map, independently of the SLAM loop:

  1. render a long tour of the two-room baffle world (place-distinctive
     texture) at half resolution — ~N database frames spread over the
     world, poses known exactly;
  2. extract production features; build BoW vectors under (a) a
     vocabulary trained on the database descriptors and (b) the
     reference's shipped vocabulary (if readable);
  3. query with REVISIT frames: the same tour re-rendered with pose
     jitter (0.08 m, ~4 deg yaw) — a true revisit sees the place from a
     nearby-but-different view;
  4. score recall@K / mean reciprocal rank: a hit = a retrieved
     database frame within 0.45 m of the query pose (excluding the
     query's temporal neighbours, like DetectLoop's covisibility
     exclusion).

Usage: python tools/place_recognition_eval.py [--n 120] [--half 0.5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def tour_poses(n: int) -> np.ndarray:
    """A long weaving tour of the baffle world's two rooms (z<0 and
    z>1), visiting distinct stations in both rooms."""
    from multicol_slam_tpu.utils import synthetic
    return synthetic.baffle_revisit_trajectory(n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120,
                    help="database frames (>=100 for the scale claim)")
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--n-queries", type=int, default=40)
    ap.add_argument("--voc-words", type=int, default=10,
                    help="branching k (k^levels leaves)")
    ap.add_argument("--voc-levels", type=int, default=4)
    ap.add_argument("--pos-radius", type=float, default=0.45)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from multicol_slam_tpu.models import extractor as ext
    from multicol_slam_tpu.models import vocabulary as vocab
    from multicol_slam_tpu.ops import rig as rig_ops
    from multicol_slam_tpu.ops.pyramid import level_sizes
    from multicol_slam_tpu.utils import config_io, synthetic

    t0 = time.time()
    full_rig, _ = config_io.load_mcs("/root/reference/Examples/Lafida",
                                     dtype=np.float32)
    rig = rig_ops.scale_rig(full_rig, args.scale)
    h = int(float(rig.cams.height[0]))
    w = int(float(rig.cams.width[0]))
    n_levels = 4
    masks = [[np.full(sz, 255, np.uint8)
              for sz in level_sizes(h, w, n_levels, 1.2)]
             for _ in range(rig.n_cams)]
    masks_lvl = [np.stack([m[l] for m in masks]) for l in range(n_levels)]
    cfg = ext.ExtractorConfig(n_features=300, n_levels=n_levels)
    extract = jax.jit(ext.make_extractor(cfg, rig.cams, masks_lvl, (h, w)))
    render = synthetic.make_renderer(
        rig, room_half=synthetic.BAFFLE_ROOM_HALF,
        door_wall=list(synthetic.BAFFLE_WALLS), place_texture=True)

    gt = tour_poses(args.n)

    def features_of(poses):
        out = []
        for M in poses:
            f = extract(render(jnp.asarray(M, jnp.float32)))
            out.append((np.asarray(f.desc).reshape(-1, f.desc.shape[-1]),
                        np.asarray(f.valid).reshape(-1)))
        return out

    db_feats = features_of(gt)
    print(f"# extracted {args.n} db frames in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    # queries: revisit frames with pose jitter
    rng = np.random.default_rng(0)
    q_idx = np.linspace(5, args.n - 6, args.n_queries).astype(int)
    q_poses = []
    for i in q_idx:
        M = gt[i].copy()
        yaw = rng.normal(0, 0.07)
        c, s = np.cos(yaw), np.sin(yaw)
        Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        M[:3, :3] = M[:3, :3] @ Ry
        M[:3, 3] += rng.normal(0, 0.08, 3)
        q_poses.append(M)
    q_feats = features_of(q_poses)

    vocabularies = {}
    corpus = np.concatenate([d[v] for d, v in db_feats], 0)
    doc_ids = np.concatenate([np.full(int(v.sum()), i, np.int32)
                              for i, (d, v) in enumerate(db_feats)])
    vocabularies["self_trained"] = vocab.train_vocabulary(
        corpus, k=args.voc_words, levels=args.voc_levels, doc_ids=doc_ids)
    ref_yml = "/root/reference/Examples/small_orb_omni_voc_9_6.yml"
    if os.path.exists(ref_yml):
        try:
            vocabularies["reference_dbow2"] = vocab.load_dbow2_yaml(ref_yml)
        except Exception as e:
            print(f"# reference vocab load failed: {e!r}", file=sys.stderr)

    results = {}
    for name, voc in vocabularies.items():
        def bow_of(d, v):
            words, _ = vocab.transform_words(
                voc, jnp.asarray(d), jnp.asarray(v))
            return vocab.bow_vector(voc, np.asarray(words))

        db_bows = [bow_of(d, v) for d, v in db_feats]
        hits1 = hits5 = 0
        mrr = 0.0
        for qi, (d, v) in zip(q_idx, q_feats):
            qb = bow_of(d, v)
            scores = np.array([vocab.bow_score_l1(qb, b) for b in db_bows])
            # exclude temporal neighbours (DetectLoop's covisible-group
            # exclusion analogue)
            scores[max(0, qi - 4):qi + 5] = -1.0
            order = np.argsort(-scores)
            dist = np.linalg.norm(gt[order][:, :3, 3]
                                  - gt[qi][:3, 3][None], axis=1)
            pos = dist < args.pos_radius
            if pos[0]:
                hits1 += 1
            if pos[:5].any():
                hits5 += 1
            first = np.nonzero(pos)[0]
            if len(first):
                mrr += 1.0 / (first[0] + 1)
        nq = len(q_idx)
        results[name] = dict(
            recall_at_1=round(hits1 / nq, 3),
            recall_at_5=round(hits5 / nq, 3),
            mrr=round(mrr / nq, 3),
            n_words=int(voc.n_words))

    print(json.dumps(dict(
        n_db_frames=args.n, n_queries=len(q_idx),
        pos_radius_m=args.pos_radius, results=results,
        wall_s=round(time.time() - t0, 1)), indent=None), flush=True)


if __name__ == "__main__":
    main()
