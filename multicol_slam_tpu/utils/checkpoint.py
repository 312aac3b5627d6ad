"""Map + session checkpointing (save/load/resume).

The reference has NO persistence beyond the final trajectory file
(SURVEY.md §5.4: no map save/load, no resume). Because this framework's
map is arrays-of-structs, a checkpoint is one compressed npz: point
pools, keyframe pools, observation table, per-keyframe features — plus
the tracker's pose state. Loading restores a live, trackable session.
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np

from ..models.extractor import Features
from ..models.map import MapStore


def _normalize(path: str) -> str:
    """np.savez_compressed appends '.npz' when missing; normalize so
    save_map(p) / load_map(p) agree for any user-supplied path."""
    return path if path.endswith(".npz") else path + ".npz"


def save_map(path: str, m: MapStore, extra: dict | None = None) -> None:
    arrays = {
        "pt_valid": m.pt_valid, "pt_pos": m.pt_pos, "pt_desc": m.pt_desc,
        "pt_desc_mask": m.pt_desc_mask, "pt_normal": m.pt_normal,
        "pt_min_dist": m.pt_min_dist, "pt_max_dist": m.pt_max_dist,
        "pt_visible": m.pt_visible, "pt_found": m.pt_found,
        "pt_first_kf": m.pt_first_kf,
        "kf_valid": m.kf_valid, "kf_pose": m.kf_pose, "kf_pt": m.kf_pt,
        "kf_parent": m.kf_parent, "kf_frame_id": m.kf_frame_id,
        "_next": np.asarray([m._next_pt, m._next_kf]),
    }
    # observation lists -> flat table
    obs_rows = []
    for p, lst in m.pt_obs.items():
        for kf, cam, slot in lst:
            obs_rows.append((p, kf, cam, slot))
    arrays["obs_table"] = (np.asarray(obs_rows, np.int32)
                           if obs_rows else np.empty((0, 4), np.int32))
    repl = np.asarray([[a, b] for a, b in m.pt_replaced.items()], np.int32) \
        if m.pt_replaced else np.empty((0, 2), np.int32)
    arrays["pt_replaced"] = repl
    loop_rows = []
    for kf, eds in m.kf_loop_edges.items():
        for e in eds:
            loop_rows.append((kf, e))
    arrays["loop_edges"] = (np.asarray(loop_rows, np.int32)
                            if loop_rows else np.empty((0, 2), np.int32))
    # keyframe features
    for kf in np.nonzero(m.kf_valid)[0]:
        f = m.kf_features[kf]
        if f is None:
            continue
        for name, val in f._asdict().items():
            arrays[f"kf{kf}_feat_{name}"] = np.asarray(val)
    meta = dict(capacity_pts=m.capacity_pts, capacity_kfs=m.capacity_kfs,
                n_cams=m.n_cams, k_per_cam=m.k_per_cam,
                desc_words=m.desc_words, extra=extra or {})
    arrays["_meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(_normalize(path), **arrays)


def load_map(path: str) -> tuple[MapStore, dict]:
    z = np.load(_normalize(path), allow_pickle=False)
    meta = json.loads(bytes(z["_meta_json"]).decode())
    m = MapStore(capacity_pts=meta["capacity_pts"],
                 capacity_kfs=meta["capacity_kfs"], n_cams=meta["n_cams"],
                 k_per_cam=meta["k_per_cam"], desc_words=meta["desc_words"])
    for name in ["pt_valid", "pt_pos", "pt_desc", "pt_desc_mask",
                 "pt_normal", "pt_min_dist", "pt_max_dist", "pt_visible",
                 "pt_found", "pt_first_kf", "kf_valid", "kf_pose", "kf_pt",
                 "kf_parent", "kf_frame_id"]:
        getattr(m, name)[...] = z[name]
    m._next_pt, m._next_kf = (int(v) for v in z["_next"])
    for p, kf, cam, slot in z["obs_table"]:
        m.pt_obs[int(p)].append((int(kf), int(cam), int(slot)))
    m.rebuild_obs_log()
    for a, b in z["pt_replaced"]:
        m.pt_replaced[int(a)] = int(b)
        m.pt_forward[int(a)] = int(b)
    m.recompute_covisibility()
    for kf, e in z["loop_edges"]:
        m.kf_loop_edges[int(kf)].add(int(e))
    feat_fields = list(Features._fields)
    for kf in np.nonzero(m.kf_valid)[0]:
        key0 = f"kf{kf}_feat_xy"
        if key0 not in z:
            continue
        vals = {name: z[f"kf{kf}_feat_{name}"] for name in feat_fields}
        m.kf_features[kf] = Features(**vals)
    return m, meta.get("extra", {})
