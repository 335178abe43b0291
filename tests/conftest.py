"""Test config: force an 8-device virtual CPU platform so sharding/mesh tests
run anywhere (the real TPU is a single chip under the driver)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("JAX_ENABLE_X64", "0")
