"""Test harness config: force CPU with a virtual 8-device mesh.

Tests run on CPU so sharding logic is exercised without multi-chip TPU
hardware; float64 is enabled for golden-value geometry tests (production
TPU path runs float32 — geometry fns are dtype-polymorphic).
"""

import os

# Force CPU: the ambient environment may register a remote-TPU PJRT plugin
# (which sets jax_platforms via config, trumping the env var) — tests must
# be hermetic and fast, so override at the config level too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# keep the suite's persistent compile cache APART from the bench/TPU
# processes' cache and cache only genuinely expensive compiles: the
# XLA:CPU AOT executable load path has been observed to segfault
# intermittently (jax compilation_cache get_executable_and_time) when
# the dir accumulates many small entries written by concurrent
# processes; an isolated dir + a high threshold shrinks that surface
# while keeping the multi-minute kernels cached across runs.
os.environ.setdefault("MCSLAM_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/mcslam_jax_tests"))
os.environ.setdefault("MCSLAM_COMPILE_CACHE_MIN_S", "15")

# The full suite compiles hundreds of XLA:CPU executables in one
# process; each costs dozens of memory mappings and the process crosses
# the kernel's default vm.max_map_count (65530) around test ~120, at
# which point the NEXT compile's mmap fails inside LLVM's memory
# manager and the interpreter segfaults (measured: map count grows
# ~7k -> 36k within the first 12 minutes; three suite runs all died at
# the same position in backend_compile_and_load). Raise the limit when
# we can (root containers); otherwise the suite may need to run in
# parts on long configurations.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1_000_000:
            _f.seek(0)
            _f.write("1048576")
except (OSError, ValueError, PermissionError):
    pass

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
