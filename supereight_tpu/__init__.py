"""supereight_tpu: a TPU-native dense volumetric SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of supereight
(octree-based TSDF / occupancy SLAM, RA-L 2018).  The pointer octree becomes a
Morton-keyed flat block table; every per-pixel/per-voxel OpenMP loop becomes a
batched XLA computation; multi-chip scaling uses `jax.sharding` collectives.
"""

__version__ = "0.1.0"

from supereight_tpu.config import Configuration  # noqa: F401
