"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware."""

import os

# Force CPU even when an accelerator plugin (axon TPU tunnel) is registered
# at interpreter boot: the env var alone is overridden by the plugin's
# sitecustomize, so set the jax config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
