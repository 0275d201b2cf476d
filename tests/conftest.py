import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the TPU path).
# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
# so the platform must be forced via jax.config before backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NO persistent compile cache for the CPU suite: XLA:CPU AOT executable
# (de)serialization is unreliable on this image — segfaults observed in
# backend_compile_and_load (round-4 judge machine, stale cross-machine
# entry) AND in _cache_read on a fresh same-process cache dir (round 5).
# The suite costs ~13 min uncached; a crash costs the whole signal.
# The env var is irgs_tpu's off-switch — set BEFORE any test imports the
# package, or its import would re-enable the cache.
os.environ["IRGS_TPU_COMPILE_CACHE"] = ""
jax.config.update("jax_compilation_cache_dir", None)
