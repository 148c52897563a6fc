"""Test configuration: run everything on a virtual 8-device CPU mesh with
fp64 enabled, so sharding/collective paths are exercised without TPU
hardware and numerics match the reference's double-precision MEX solvers.

Must set env vars before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config update below does force the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Hermetic auto-backend probe cache: the on-disk cache (api._auto_backend,
# VERDICT r4 next-#7) must not leak probe decisions between test sessions
# or into the user's real cache.
import tempfile  # noqa: E402

os.environ["SPCIES_AUTO_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="spcies_auto_cache_test_")
