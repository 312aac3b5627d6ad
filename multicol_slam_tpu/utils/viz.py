"""Headless visualization (the cViewer / cMapPublisher /
cMultiFramePublisher equivalents, SURVEY.md §2 L10).

The reference renders a live Pangolin GL window (map points, keyframe
frusta for all rig cameras, covisibility graph, current pose;
cMapPublisher.h:50-61) plus a per-camera keypoint overlay mosaic
(cMultiFramePublisher.h:44-55). Here the same content renders headless
to PNG via matplotlib — suited to server/TPU environments; a live
window is just a refresh loop over the same draw calls.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _require_plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def draw_map(map_store, rig, current_pose: Optional[np.ndarray] = None,
             trajectory: Optional[list] = None, path: str = "map.png",
             draw_covisibility: bool = True):
    """Top-down (x-z) map render: points, keyframe rig frusta,
    covisibility graph, trajectory, current pose."""
    plt = _require_plt()

    from ..ops import se3_np

    fig, ax = plt.subplots(figsize=(9, 9))
    pts = map_store.pt_pos[map_store.pt_valid]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1, c="#333333", alpha=0.5,
                   label=f"{len(pts)} map points")

    kf_ids = map_store.keyframe_ids()
    centers = {}
    for kf in kf_ids:
        M = se3_np.cayley2hom(map_store.kf_pose[kf])
        centers[int(kf)] = M[:3, 3]
        # rig frusta: a short axis line per camera
        for c in range(rig.n_cams):
            Mc = M @ np.asarray(rig.M_c[c], np.float64)
            o = Mc[:3, 3]
            d = Mc[:3, :3] @ np.array([0, 0, 0.12])
            ax.plot([o[0], o[0] + d[0]], [o[2], o[2] + d[2]],
                    c="tab:blue", lw=0.8)
        ax.scatter([M[0, 3]], [M[2, 3]], s=14, c="tab:blue")

    if draw_covisibility and len(kf_ids) > 1:
        for kf in kf_ids:
            for okf, w in map_store.covisibility_weights(int(kf)).items():
                if w >= 30 and okf > kf and okf in centers:
                    a, b = centers[int(kf)], centers[okf]
                    ax.plot([a[0], b[0]], [a[2], b[2]], c="tab:green",
                            lw=0.5, alpha=0.5)

    if trajectory:
        tr = np.stack([M[:3, 3] for M in trajectory])
        ax.plot(tr[:, 0], tr[:, 2], c="tab:red", lw=1.2, label="trajectory")
    if current_pose is not None:
        ax.scatter([current_pose[0, 3]], [current_pose[2, 3]], s=60,
                   c="tab:red", marker="*", label="current")

    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def draw_frame_mosaic(images: np.ndarray, feats, frame_pt=None,
                      path: str = "frame.png", state_text: str = ""):
    """Per-camera keypoint overlay mosaic (cMultiFramePublisher):
    tracked keypoints (with landmark) green, untracked blue."""
    plt = _require_plt()
    C = images.shape[0]
    fig, axes = plt.subplots(1, C, figsize=(5 * C, 4))
    if C == 1:
        axes = [axes]
    xy = np.asarray(feats.xy)
    valid = np.asarray(feats.valid)
    for c in range(C):
        ax = axes[c]
        ax.imshow(np.asarray(images[c]), cmap="gray", vmin=0, vmax=255)
        v = valid[c]
        if frame_pt is not None:
            tracked = v & (frame_pt[c] >= 0)
            ax.scatter(xy[c, tracked, 0], xy[c, tracked, 1], s=6,
                       facecolors="none", edgecolors="lime", lw=0.8)
            un = v & ~tracked
        else:
            un = v
        ax.scatter(xy[c, un, 0], xy[c, un, 1], s=4, facecolors="none",
                   edgecolors="deepskyblue", lw=0.5)
        ax.set_title(f"cam {c}")
        ax.axis("off")
    if state_text:
        fig.suptitle(state_text)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


class Viewer:
    """Live viewer loop — the cViewer::Run equivalent (cViewer.cpp:72-144).

    The reference spins a Pangolin GL window redrawing the map publisher
    + frame publisher at ~30 Hz until RequestFinish. On a headless TPU
    host the same loop republishes both renders as atomically-swapped
    PNGs (``live_map.png``, ``live_frame.png``) at a fixed period, so
    any file watcher / web view becomes the window; with an interactive
    matplotlib backend the draw calls open real figures instead.

    Reads are snapshot-by-copy: the worker copies the map arrays before
    drawing, so the tracker is never blocked and torn reads never reach
    the renderer (the reference takes mMutexCamera/mCSMap for the same
    reason, cViewer.cpp:84-120).
    """

    def __init__(self, slam, out_dir: str = ".", period_s: float = 1.0):
        import threading

        self.slam = slam
        self.out_dir = out_dir
        self.period_s = period_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self.n_refreshes = 0
        slam.keep_last_frame = True     # tracker retains images for us

    def start(self) -> "Viewer":
        self._thread.start()
        return self

    def stop(self):
        """cViewer::RequestFinish + join."""
        self._stop.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------

    def _atomic(self, draw_fn, name):
        import os
        tmp = os.path.join(self.out_dir, "." + name + ".tmp.png")
        final = os.path.join(self.out_dir, name)
        draw_fn(tmp)
        os.replace(tmp, final)

    def _run(self):
        import os

        os.makedirs(self.out_dir, exist_ok=True)
        while not self._stop.wait(self.period_s):
            self.refresh()

    def refresh(self):
        """One redraw of both publishers (callable directly in tests)."""
        slam = self.slam
        tr = slam.tracker
        pose = tr.all_poses[-1] if tr.all_poses else None
        try:
            self._atomic(
                lambda p: draw_map(slam.map, slam.rig, current_pose=pose,
                                   trajectory=list(tr.all_poses), path=p),
                "live_map.png")
            snap = getattr(slam, "last_frame", None)
            if snap is not None:
                images, feats, frame_pt, state = snap
                self._atomic(
                    lambda p: draw_frame_mosaic(images, feats, frame_pt,
                                                path=p, state_text=state),
                    "live_frame.png")
            self.n_refreshes += 1
        except Exception:     # a torn frame must never kill the viewer
            import traceback
            traceback.print_exc()
