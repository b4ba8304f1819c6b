"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of unit-testing the core data structure
independently of hardware (se_core/test/), plus multi-device sharding tests
that the reference (single-process OpenMP) could not express.

IMPORTANT: in this environment ``sitecustomize`` imports jax at interpreter
boot with ``JAX_PLATFORMS=axon`` (a serialized remote-TPU tunnel), so env
vars set inside conftest come too late.  If the backend is wrong we re-exec
pytest with a corrected environment.
"""

import os
import sys

_WANT = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def _ensure_cpu():
    import jax
    if jax.default_backend() == "cpu" and len(jax.devices()) >= 8:
        return
    env = dict(os.environ)
    env.update(_WANT)
    # drop the axon relay hookup entirely for CPU test runs
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]],
               env)


_ensure_cpu()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
