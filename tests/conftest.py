"""Test config: force JAX onto a virtual 8-device CPU mesh before first import.

Mirrors the driver's multichip dry-run environment: multi-device sharding
logic is exercised without TPU hardware.
"""

import os

# The ambient environment pre-imports jax via sitecustomize and pins
# JAX_PLATFORMS to the axon TPU tunnel, which would route every test compile
# through the remote chip (~30 s per compile).  Env vars are too late (jax's
# config was read at interpreter start), so override through jax.config
# before any jax operation runs.  Tests always run on the virtual CPU mesh.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA compiles entirely
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
