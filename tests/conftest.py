import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. Note: this machine's sitecustomize imports jax at
# interpreter startup (before conftest), so setting os.environ alone is not
# enough -- use jax.config.update, which works any time before first backend
# use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
