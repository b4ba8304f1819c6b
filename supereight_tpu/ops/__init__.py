"""Pallas TPU kernels for the hot ops.

The XLA paths in `pipeline/` are the reference implementations; kernels
here replace them where fusing in VMEM beats XLA's materialization
(`fused_integrate`: patches + one-hot lookups + field update in one pass).
Every kernel has an `available()` gate and the pipeline falls back to the
XLA path when Pallas can't compile on the current backend.
"""

from . import integrate_kernel  # noqa: F401
