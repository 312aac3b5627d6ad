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

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
