"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of unit-testing the core data structure
independently of hardware (se_core/test/), plus multi-device sharding tests
that the reference (single-process OpenMP) could not express.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
