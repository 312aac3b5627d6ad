"""ctypes bindings to the native host runtime (libmapcore.so).

Builds the shared library on first import if the toolchain is present;
every entry point has a pure-python/numpy fallback so the framework
works without a compiler. See mapcore.cpp for what lives natively and
the reference citations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libmapcore.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    stale = (os.path.exists(_LIB_PATH)
             and os.path.getmtime(_LIB_PATH)
             < os.path.getmtime(os.path.join(_HERE, "mapcore.cpp")))
    if (not os.path.exists(_LIB_PATH) or stale) and not _build() and stale:
        # stale binary + no toolchain: refuse to run old native code
        return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.octree_distribute.restype = ctypes.c_int
    lib.octree_distribute.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_float,
                                      ctypes.c_float, ctypes.c_float,
                                      ctypes.c_float, i32p]
    lib.covisibility_counts.restype = ctypes.c_int
    lib.covisibility_counts.argtypes = [i32p, i32p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int, i32p, i32p]
    lib.distinctive_descriptor.restype = ctypes.c_int
    lib.distinctive_descriptor.argtypes = [u64p, ctypes.c_int, ctypes.c_int]
    lib.distinctive_descriptors_batch.restype = ctypes.c_int
    lib.distinctive_descriptors_batch.argtypes = [u64p, i32p, ctypes.c_int,
                                                  ctypes.c_int, i32p]
    lib.shared_word_counts.restype = ctypes.c_int
    lib.shared_word_counts.argtypes = [i32p, i32p, ctypes.c_int, i32p,
                                       ctypes.c_int, i32p, ctypes.c_int,
                                       ctypes.c_int, i32p, i32p]
    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# API with fallbacks
# ---------------------------------------------------------------------------

def octree_distribute(xs: np.ndarray, ys: np.ndarray, resp: np.ndarray,
                      target: int, bounds=None) -> np.ndarray:
    """Exact DistributeOctTree selection (returns selected indices)."""
    n = len(xs)
    if n == 0:
        return np.empty(0, np.int32)
    if bounds is None:
        bounds = (float(xs.min()), float(xs.max()) + 1.0,
                  float(ys.min()), float(ys.max()) + 1.0)
    lib = get_lib()
    if lib is not None:
        out = np.empty(n, np.int32)
        k = lib.octree_distribute(
            np.ascontiguousarray(xs, np.float32),
            np.ascontiguousarray(ys, np.float32),
            np.ascontiguousarray(resp, np.float32), n, int(target),
            bounds[0], bounds[1], bounds[2], bounds[3], out)
        return out[:k].copy()
    # python fallback: recursive quad splitting
    import heapq
    nodes = [(bounds[0], bounds[1], bounds[2], bounds[3],
              list(range(n)))]
    while len(nodes) < target:
        # split the node with the most points
        nodes.sort(key=lambda nd: -len(nd[4]))
        if len(nodes[0][4]) <= 1:
            break
        x0, x1, y0, y1, idx = nodes.pop(0)
        cx, cy = 0.5 * (x0 + x1), 0.5 * (y0 + y1)
        kids = [[], [], [], []]
        for i in idx:
            kids[(xs[i] >= cx) + 2 * (ys[i] >= cy)].append(i)
        boxes = [(x0, cx, y0, cy), (cx, x1, y0, cy),
                 (x0, cx, cy, y1), (cx, x1, cy, y1)]
        for b, kid in zip(boxes, kids):
            if kid:
                nodes.append((*b, kid))
    out = []
    for *_, idx in nodes:
        out.append(max(idx, key=lambda i: resp[i]))
    out = np.asarray(out, np.int32)
    if len(out) > target:
        out = out[np.argsort(-resp[out])][:target]
    return out


def covisibility_counts(obs_pt: np.ndarray, obs_kf: np.ndarray,
                        query_kf: int, max_kf: int):
    """(kf_ids, counts) of keyframes sharing landmarks with query_kf."""
    lib = get_lib()
    m = len(obs_pt)
    if lib is not None and m:
        out_kf = np.empty(max_kf + 1, np.int32)
        out_ct = np.empty(max_kf + 1, np.int32)
        k = lib.covisibility_counts(
            np.ascontiguousarray(obs_pt, np.int32),
            np.ascontiguousarray(obs_kf, np.int32), m, int(query_kf),
            int(max_kf), out_kf, out_ct)
        return out_kf[:k].copy(), out_ct[:k].copy()
    # numpy fallback
    from collections import defaultdict
    by_pt = defaultdict(list)
    for p, kf in zip(obs_pt, obs_kf):
        by_pt[int(p)].append(int(kf))
    counts: dict[int, int] = defaultdict(int)
    for p, kf in zip(obs_pt, obs_kf):
        if kf != query_kf:
            continue
        for okf in by_pt[int(p)]:
            if okf != query_kf:
                counts[okf] += 1
    if not counts:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    ids = np.asarray(sorted(counts), np.int32)
    return ids, np.asarray([counts[int(i)] for i in ids], np.int32)


def distinctive_descriptor(descs_u32: np.ndarray) -> int:
    """Index of the min-median-Hamming descriptor among (O, W) uint32."""
    o = len(descs_u32)
    if o == 0:
        return -1
    if o == 1:
        return 0
    lib = get_lib()
    if lib is not None:
        d64 = np.ascontiguousarray(descs_u32).view(np.uint64)
        return int(lib.distinctive_descriptor(d64, o, d64.shape[1]))
    bits = np.unpackbits(descs_u32.view(np.uint8), axis=1)
    ham = (bits[:, None, :] != bits[None, :, :]).sum(-1)
    return int(np.argmin(np.median(ham, axis=1)))


def distinctive_descriptors_batch(descs_u32: np.ndarray,
                                  offsets: np.ndarray) -> np.ndarray:
    """Per-segment min-median-Hamming selection over a packed (obs, W)
    uint32 table; segment p = rows [offsets[p], offsets[p+1]). Returns
    segment-relative best indices (-1 for empty segments)."""
    n_pts = len(offsets) - 1
    if n_pts <= 0:
        return np.empty(0, np.int32)
    descs_u32 = np.ascontiguousarray(descs_u32, np.uint32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    lib = get_lib()
    if lib is not None and descs_u32.shape[1] % 2 == 0:
        d64 = descs_u32.view(np.uint64)
        out = np.empty(n_pts, np.int32)
        lib.distinctive_descriptors_batch(d64, offsets, n_pts,
                                          d64.shape[1], out)
        return out
    out = np.empty(n_pts, np.int32)
    for p in range(n_pts):
        seg = descs_u32[offsets[p]:offsets[p + 1]]
        out[p] = distinctive_descriptor(seg)
    return out


def shared_word_counts(inv_start: np.ndarray, inv_kf: np.ndarray,
                       query_words: np.ndarray, exclude: np.ndarray,
                       max_kf: int):
    lib = get_lib()
    if lib is not None:
        out_kf = np.empty(max_kf + 1, np.int32)
        out_ct = np.empty(max_kf + 1, np.int32)
        k = lib.shared_word_counts(
            np.ascontiguousarray(inv_start, np.int32),
            np.ascontiguousarray(inv_kf, np.int32), len(inv_start) - 1,
            np.ascontiguousarray(query_words, np.int32), len(query_words),
            np.ascontiguousarray(exclude, np.int32), len(exclude),
            int(max_kf), out_kf, out_ct)
        return out_kf[:k].copy(), out_ct[:k].copy()
    from collections import defaultdict
    excl = set(int(e) for e in exclude)
    counts: dict[int, int] = defaultdict(int)
    for w in query_words:
        if w < 0 or w >= len(inv_start) - 1:
            continue
        for j in range(inv_start[w], inv_start[w + 1]):
            kf = int(inv_kf[j])
            if kf not in excl:
                counts[kf] += 1
    if not counts:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    ids = np.asarray(sorted(counts), np.int32)
    return ids, np.asarray([counts[int(i)] for i in ids], np.int32)
