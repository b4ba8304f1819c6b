"""Multi-chip map-space sharding over a jax device mesh.

The reference is a single-process OpenMP program (SURVEY.md section 2.4) —
there is nothing to port.  This module is the *scale-out design* the
BASELINE.json north star asks for: shard the voxel-block table across
devices, keep the (tiny) dense block index + node pyramid replicated, and
let pjit/GSPMD insert the collectives:

* block table ``voxels[name] f32[capacity, 512]``, ``keys``, ``active``:
  sharded on the capacity axis ("map").  Integration updates are elementwise
  over that axis -> fully local to each shard, zero communication.
* ``block_index`` (int32[B^3], <=128 KB) and the node pyramid (<3 MB):
  replicated; allocation writes to them are identical on every device.
* depth / image buffers: replicated (tracking's 6x6 normal-equation
  reduction becomes a psum when images are sharded later).
* raycast gathers voxel rows by slot id -> GSPMD turns the cross-shard rows
  into an all-gather over ICI; a Pallas ring-gather is the planned upgrade.

``shard_state``/``mesh_for`` are used by tests and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supereight_tpu.pipeline.system import FrameState

MAP_AXIS = "map"


def make_mesh(n_devices: Optional[int] = None, axis: str = MAP_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def map_sharding(mesh: Mesh):
    """Shardings for the VoxelMap pytree: block table on the map axis."""
    shard_cap = NamedSharding(mesh, P(MAP_AXIS))
    shard_cap2 = NamedSharding(mesh, P(MAP_AXIS, None))
    repl = NamedSharding(mesh, P())

    def spec(m):
        return m.replace(
            block_index=jax.device_put(m.block_index, repl),
            keys=jax.device_put(m.keys, shard_cap),
            n_blocks=jax.device_put(m.n_blocks, repl),
            part_counts=jax.device_put(m.part_counts, repl),
            active=jax.device_put(m.active, shard_cap),
            overflow=jax.device_put(m.overflow, repl),
            voxels={k: jax.device_put(v, shard_cap2)
                    for k, v in m.voxels.items()},
            node_values=[{k: jax.device_put(v, repl) for k, v in lv.items()}
                         for lv in m.node_values],
            node_alloc=[jax.device_put(a, repl) for a in m.node_alloc],
        )
    return spec


def shard_state(state: FrameState, mesh: Mesh) -> FrameState:
    """Place a FrameState on the mesh: map sharded, everything else
    replicated."""
    check_divisible(state.map.capacity, mesh)
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    return state.replace(map=map_sharding(mesh)(state.map))


def check_divisible(capacity: int, mesh: Mesh):
    n = mesh.devices.size
    if capacity % n:
        raise ValueError(
            f"block capacity {capacity} not divisible by {n} devices")
