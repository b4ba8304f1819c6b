"""Map checkpoint / resume: save and load the whole VoxelMap.

Reference: `se_core/include/se/io/se_serialise.hpp:53-98` +
`Octree::save/load` (`octree.hpp:897-950`) write nodes and blocks as binary
records and rebuild topology by re-insertion.  Our map already *is* flat
arrays, so a checkpoint is a single compressed .npz of the pytree
(SURVEY.md section 5, checkpoint/resume).  Loading restores bit-identical
state, including the node pyramid.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import octree
from supereight_tpu.core.octree import ChannelSpec, VoxelMap

_FORMAT_VERSION = 1


def save_map(path: str, m: VoxelMap):
    arrays = {
        "block_index": np.asarray(m.block_index),
        "keys": np.asarray(m.keys),
        "n_blocks": np.asarray(m.n_blocks),
        "active": np.asarray(m.active),
        "overflow": np.asarray(m.overflow),
        "part_counts": np.asarray(m.part_counts),
    }
    for name, arr in m.voxels.items():
        arrays[f"voxel:{name}"] = np.asarray(arr)
    for level, (vals, alloc) in enumerate(zip(m.node_values, m.node_alloc)):
        arrays[f"nodealloc:{level}"] = np.asarray(alloc)
        for name, arr in vals.items():
            arrays[f"nodeval:{level}:{name}"] = np.asarray(arr)
    meta = dict(version=_FORMAT_VERSION, size=m.size, dim=m.dim,
                capacity=m.capacity, partitions=m.partitions,
                channels=[(c.name, np.dtype(c.dtype).name, c.init, c.empty)
                          for c in m.channels])
    arrays["meta"] = np.frombuffer(repr(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> VoxelMap:
    import ast
    z = np.load(path, allow_pickle=False)
    meta = ast.literal_eval(bytes(z["meta"]).decode())
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported map version {meta['version']}")
    channels = tuple(
        ChannelSpec(name=n, dtype=jnp.dtype(d), init=i, empty=e)
        for n, d, i, e in meta["channels"])
    m = octree.init(meta["size"], meta["dim"], channels,
                    capacity=meta["capacity"],
                    partitions=meta.get("partitions", 1))
    node_values = []
    node_alloc = []
    for level in range(m.block_level + 1):
        node_alloc.append(jnp.asarray(z[f"nodealloc:{level}"]))
        node_values.append({c.name: jnp.asarray(z[f"nodeval:{level}:{c.name}"])
                            for c in channels})
    return m.replace(
        block_index=jnp.asarray(z["block_index"]),
        keys=jnp.asarray(z["keys"]),
        n_blocks=jnp.asarray(z["n_blocks"]),
        part_counts=jnp.asarray(z["part_counts"]) if "part_counts" in z
        else jnp.asarray(z["n_blocks"]).reshape(1),
        active=jnp.asarray(z["active"]),
        overflow=jnp.asarray(z["overflow"]),
        voxels={c.name: jnp.asarray(z[f"voxel:{c.name}"]) for c in channels},
        node_values=node_values,
        node_alloc=node_alloc,
    )
