"""Test configuration: force CPU with a virtual 8-device mesh.

NOTE: this image's sitecustomize imports jax at interpreter startup to
register the remote-TPU ("axon") PJRT plugin, so JAX_PLATFORMS set via
os.environ here is TOO LATE. jax.config.update("jax_platforms", ...) still
works because backends initialize lazily on first use; XLA_FLAGS is also read
lazily (at PJRT client creation), so setting it here is effective as long as
no test module touches a backend at import time.
"""

import os

# No network in CI: never let transformers/huggingface_hub attempt downloads.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

# The unit suite must be hermetic, fast, and able to fake an 8-device mesh —
# never the tunneled single TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache makes repeated test runs much faster on CPU.
jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + str(jax.devices()))
assert jax.device_count() == 8, (
    "expected 8 virtual CPU devices for mesh tests; check that no test "
    "imports initialized a backend before conftest ran")
