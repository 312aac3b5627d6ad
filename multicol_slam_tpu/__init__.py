"""MultiCol-SLAM-TPU: a TPU-native multi-fisheye-camera SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of MultiCol-SLAM
(urbste/MultiCol-SLAM): MultiKeyFrame-based multi-camera tracking, local
mapping, and loop closing over generic Scaramuzza omnidirectional cameras,
with mdBRIEF binary features and a MultiCol bundle adjuster.

Architecture (TPU-first, not a port):
  - ``ops/``      pure batched device kernels: camera model, SE3/cayley,
                  feature extraction (FAST + mdBRIEF), Hamming matching,
                  RANSAC solvers, triangulation.
  - ``models/``   the SLAM subsystems composed from ops: extractor,
                  matcher, LM bundle adjuster, tracker state machine,
                  local mapping, loop closing, vocabulary/BoW.
  - ``parallel/`` jax.sharding mesh utilities for sharded bundle
                  adjustment and batched multi-stream serving.
  - ``utils/``    config IO (OpenCV-YAML rig calibrations), trajectory IO,
                  timing.
  - ``runtime/``  native C++ host runtime pieces (grid binning, inverted
                  file) exposed through ctypes.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# SLAM geometry is precision-critical: pose chains, essential-matrix
# nullspaces and LM normal equations break under the TPU's default
# bf16-decomposed f32 matmuls (pixel-level residuals with sub-pixel
# thresholds). Force true-f32 matmuls framework-wide; the descriptor
# popcount-GEMMs use +-1 bf16 operands whose products are exact at any
# precision setting, so the hot path keeps full MXU throughput.
_jax.config.update("jax_default_matmul_precision", "highest")

# A SLAM session jits ~a dozen kernel signatures; persist compiled
# executables across processes so cold starts pay compile cost once per
# machine, not once per run (override dir with MCSLAM_COMPILE_CACHE;
# set it empty to disable).
_cache = _os.environ.get("MCSLAM_COMPILE_CACHE",
                         _os.path.expanduser("~/.cache/mcslam_jax"))
if _cache:
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimization, never a failure
        pass
