"""Test config: force an 8-device virtual CPU platform so sharding/mesh tests
run anywhere (the real TPU is a single chip under the driver, and the axon
plugin ignores the JAX_PLATFORMS env var — use jax.config instead)."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
