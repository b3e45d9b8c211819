"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere. Multi-chip sharding tests use the
8 virtual devices; everything else just runs on CPU so CI needs no TPU.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon sitecustomize registers the TPU platform in every interpreter and
# overrides JAX_PLATFORMS from the environment; force CPU explicitly so CI
# needs no TPU and gets the 8 virtual devices above
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
