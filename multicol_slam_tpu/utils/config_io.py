"""Config IO: OpenCV-FileStorage-style YAML parsing + typed SLAM settings.

Behavioral spec: reference cSystem::LoadMCS (cSystem.cpp:125-180) — loads
`MultiCamSys_Calibration.yaml` (N cameras x 6 cayley extrinsics) and
`InteriorOrientationFisheye{c}.yaml` (Scaramuzza intrinsics + mirror-mask
flag) — and cTracking's settings parsing (cTracking.cpp:87-165).

The reference uses cv::FileStorage; these files are flat `key: value`
scalar maps with a `%YAML:1.0` header, so a dependency-free parser
suffices (no cv2 required).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Dict, List

import numpy as np

from ..ops.camera import CameraModel, make_camera, make_mirror_masks, stack_cameras
from ..ops.rig import Rig, rig_from_cayley


def load_opencv_yaml(path: str) -> Dict[str, float]:
    """Parse a flat cv::FileStorage YAML of scalar `key: value` entries."""
    out: Dict[str, float] = {}
    pat = re.compile(r"^\s*([A-Za-z0-9_.]+)\s*:\s*(\S+)")
    with open(path) as f:
        for line in f:
            if line.lstrip().startswith(("%", "#")):
                continue
            m = pat.match(line)
            if not m:
                continue
            key, val = m.group(1), m.group(2)
            try:
                out[key] = float(val)
            except ValueError:
                out[key] = val  # keep strings (rare)
    return out


# ---------------------------------------------------------------------------
# Typed settings (Slam_Settings_*.yaml; cTracking.cpp:87-165)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SlamSettings:
    fps: float = 25.0
    rgb: bool = True
    use_mdbrief: bool = False      # extractor.usemdBRIEF (0->ORB, 1->dBRIEF/mdBRIEF)
    learn_masks: bool = False      # extractor.masks
    use_agast: bool = False        # extractor.useAgast
    fast_agast_type: int = 2       # extractor.fastAgastType
    desc_size: int = 32            # descriptor bytes: 16/32/64
    n_features: int = 400          # per camera
    scale_factor: float = 1.2
    n_levels: int = 8
    fast_th: int = 20
    score_harris: bool = True      # nScoreType 0 -> Harris
    use_motion_model: bool = True
    start_frame: int = 0
    end_frame: int = -1
    # Keyframe rates derived from fps (cTracking.cpp:93-94)
    @property
    def min_frames(self) -> int:
        return int(self.fps / 3.0)

    @property
    def max_frames(self) -> int:
        return int(2.0 * self.fps / 3.0)


def load_settings(path: str) -> SlamSettings:
    d = load_opencv_yaml(path)
    g = lambda k, dflt: d.get(k, dflt)
    return SlamSettings(
        fps=float(g("Camera.fps", 25.0)),
        rgb=bool(int(g("Camera.RGB", 1))),
        use_mdbrief=bool(int(g("extractor.usemdBRIEF", 0))),
        learn_masks=bool(int(g("extractor.masks", 0))),
        use_agast=bool(int(g("extractor.useAgast", 0))),
        fast_agast_type=int(g("extractor.fastAgastType", 2)),
        desc_size=int(g("extractor.descSize", 32)),
        n_features=int(g("extractor.nFeatures", 400)),
        scale_factor=float(g("extractor.scaleFactor", 1.2)),
        n_levels=int(g("extractor.nLevels", 8)),
        fast_th=int(g("extractor.fastTh", 20)),
        score_harris=int(g("extractor.nScoreType", 0)) == 0,
        use_motion_model=bool(int(g("UseMotionModel", 1))),
        start_frame=int(g("traj.StartFrame", 0)),
        end_frame=int(g("traj.EndFrame", -1)),
    )


# ---------------------------------------------------------------------------
# Rig calibration loading (cSystem.cpp:125-180)
# ---------------------------------------------------------------------------

def load_interior_orientation(path: str, dtype=np.float32) -> tuple[CameraModel, bool]:
    """Load one InteriorOrientationFisheye{c}.yaml -> (CameraModel, mirror flag)."""
    d = load_opencv_yaml(path)
    n_pol = int(d["Camera.nrpol"])
    n_inv = int(d["Camera.nrinvpol"])
    poly = [d[f"Camera.a{i}"] for i in range(n_pol)]
    inv_poly = [d[f"Camera.pol{i}"] for i in range(n_inv)]
    want_mask = bool(int(d.get("Camera.mirrorMask", 0)))
    cam = make_camera(
        c=d["Camera.c"], d=d["Camera.d"], e=d["Camera.e"],
        u0=d["Camera.u0"], v0=d["Camera.v0"],
        poly=poly, inv_poly=inv_poly,
        width=d["Camera.Iw"], height=d["Camera.Ih"], dtype=dtype,
        mirror=want_mask,
    )
    return cam, want_mask


def load_mcs(calib_dir: str, dtype=np.float32, n_mask_levels: int = 4):
    """Load a full rig: MultiCamSys_Calibration.yaml + per-camera interior
    orientations. Returns (Rig, mirror_masks) where mirror_masks is a list
    of per-level (N, H_l, W_l) uint8 numpy arrays (empty mask list if no
    camera requests one). Mirrors cSystem::LoadMCS (cSystem.cpp:125-180).
    """
    d = load_opencv_yaml(os.path.join(calib_dir, "MultiCamSys_Calibration.yaml"))
    n_cams = int(d["CameraSystem.nrCams"])
    m_c_min = np.zeros((n_cams, 6), np.float64)
    for c in range(n_cams):
        for p in range(6):
            m_c_min[c, p] = d[f"CameraSystem.cam{c + 1}_{p + 1}"]

    cams: List[CameraModel] = []
    masks_per_cam = []
    for c in range(n_cams):
        cam, want_mask = load_interior_orientation(
            os.path.join(calib_dir, f"InteriorOrientationFisheye{c}.yaml"), dtype)
        cams.append(cam)
        w, h = int(float(cam.width)), int(float(cam.height))
        if want_mask:
            masks_per_cam.append(make_mirror_masks(float(cam.u0), float(cam.v0),
                                                   w, h, n_mask_levels))
        else:
            ones = []
            for l in range(n_mask_levels):
                if l:
                    w, h = (w + 1) // 2, (h + 1) // 2
                ones.append(np.full((h, w), 255, np.uint8))
            masks_per_cam.append(ones)

    rig = rig_from_cayley(np.asarray(m_c_min, dtype), stack_cameras(cams))
    # Re-group masks as per-level stacks (all cameras share image size).
    masks_by_level = [np.stack([masks_per_cam[c][l] for c in range(n_cams)], 0)
                      for l in range(n_mask_levels)]
    return rig, masks_by_level
