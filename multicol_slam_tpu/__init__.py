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


def _host_fingerprint() -> str:
    """Short hash of this host's CPU capabilities. XLA:CPU AOT results
    are NOT portable across microarchitectures (loading an executable
    compiled with e.g. +prefer-no-gather on a host without it risks
    SIGILL); scoping the cache directory by fingerprint makes entries
    machine-local even when the filesystem moves between hosts."""
    import hashlib
    import platform

    tags = [platform.machine()]
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                # collect model name AND the full feature flags (one
                # copy each): same-model VMs can still expose different
                # feature sets, and an executable AOT-compiled for the
                # richer set can SIGILL on the poorer one
                if key in ("flags", "Features", "model name") \
                        and key not in seen:
                    seen.add(key)
                    tags.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        tags.append(platform.processor())
    return hashlib.sha256("|".join(tags).encode()).hexdigest()[:12]


if _cache:
    try:
        _cache = _os.path.join(_cache, _host_fingerprint())
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        # MCSLAM_COMPILE_CACHE_MIN_S raises the caching threshold so
        # only expensive compiles touch the cache (fewer entry
        # serializations/loads — the XLA:CPU AOT load path has been
        # observed to segfault intermittently on some hosts)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ.get("MCSLAM_COMPILE_CACHE_MIN_S", 2.0)))
    except Exception:  # cache is an optimization, never a failure
        pass
