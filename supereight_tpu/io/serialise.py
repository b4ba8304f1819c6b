"""Map checkpoint / resume: save and load the whole VoxelMap.

Reference: `se_core/include/se/io/se_serialise.hpp:53-98` +
`Octree::save/load` (`octree.hpp:897-950`) write nodes and blocks as binary
records and rebuild topology by re-insertion.  Our map already *is* flat
arrays, so a checkpoint is a single compressed .npz of the pytree
(SURVEY.md section 5, checkpoint/resume).  Loading restores bit-identical
state, including the node pyramid.

Round 4 adds the REFERENCE'S binary format (:func:`save_se` /
:func:`load_se`): the exact byte layout `Octree::save` writes
(`octree.hpp:897-913`: int32 size, f32 dim, u64 node count, node records
{u64 code, i32 side, value_type value_[8]}, u64 block count, block
records {u64 code, i32[3] coords, value_type voxel_block_[512]}), with
the SDF ({f32 x, f32 y}, 8 B) and OFusion ({f32 x, pad, f64 y}, 16 B)
`voxel_traits` layouts of `volume_traits.hpp:41-71`.  This is the map
interchange format (the `test.bin` every reference benchmark run dumps,
`benchmark.cpp:179-181`) and the input to the fusion differential oracle
(`scripts/fuse_oracle.py`).
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


# ----------------------------------------------------------------------
# Reference binary format (`Octree::save/load`, se_serialise.hpp)
# ----------------------------------------------------------------------

# voxel_traits value_type layouts (`volume_traits.hpp:41-71`); the OFusion
# struct {float x; double y;} has a 4-byte alignment hole before y
_SE_SDF = np.dtype({"names": ["x", "y"], "formats": ["<f4", "<f4"],
                    "offsets": [0, 4], "itemsize": 8})
_SE_OFUSION = np.dtype({"names": ["x", "y"], "formats": ["<f4", "<f8"],
                        "offsets": [0, 8], "itemsize": 16})
_SE_LAYOUTS = {("tsdf", "weight"): _SE_SDF,
               ("occupancy", "timestamp"): _SE_OFUSION}
_MAX_BITS = 21                   # reference octree_defines.h:39
_SCALE_MASK = np.uint64(0x1FF)


def _se_layout(channels):
    names = tuple(c.name for c in channels)
    if names not in _SE_LAYOUTS:
        raise ValueError(f"no reference voxel_traits layout for channel "
                         f"set {names}")
    return _SE_LAYOUTS[names]


def _expand3(v):
    """Reference `morton_utils.hpp:37-45` bit expansion (uint64)."""
    x = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | x << np.uint64(32)) & np.uint64(0x1F00000000FFFF)
    x = (x | x << np.uint64(16)) & np.uint64(0x1F0000FF0000FF)
    x = (x | x << np.uint64(8)) & np.uint64(0x100F00F00F00F00F)
    x = (x | x << np.uint64(4)) & np.uint64(0x10C30C30C30C30C3)
    x = (x | x << np.uint64(2)) & np.uint64(0x1249249249249249)
    return x


def _compact3(v):
    x = v.astype(np.uint64) & np.uint64(0x1249249249249249)
    x = (x | x >> np.uint64(2)) & np.uint64(0x10C30C30C30C30C3)
    x = (x | x >> np.uint64(4)) & np.uint64(0x100F00F00F00F00F)
    x = (x | x >> np.uint64(8)) & np.uint64(0x1F0000FF0000FF)
    x = (x | x >> np.uint64(16)) & np.uint64(0x1F00000000FFFF)
    x = (x | x >> np.uint64(32)) & np.uint64(0x1FFFFF)
    return x


def _se_encode_key(x, y, z, level: int, max_depth: int):
    """`keyops::encode` (`octant_ops.hpp:49-53`): morton code masked to the
    octant's level prefix, with the level in the low SCALE_MASK bits."""
    code = _expand3(np.asarray(x)) | (_expand3(np.asarray(y)) << np.uint64(1)) \
        | (_expand3(np.asarray(z)) << np.uint64(2))
    # MASK[offset] keeps the morton bits of the coarsest offset+1 levels
    # (MASK[0] = 0x7000000000000000, octree_defines.h:48-66)
    offset = _MAX_BITS - max_depth + level - 1
    keep = np.uint64(0)
    top = np.uint64(0x7000000000000000)
    for i in range(offset + 1):
        keep |= top >> np.uint64(3 * i)
    return (code & keep) | np.uint64(level)


def save_se(path: str, m: VoxelMap):
    """Write the map in the reference's `Octree::save` binary format.

    Nodes are emitted level-major (parents first): every octant that has
    an allocated block or node-pyramid value anywhere beneath it — exactly
    the internal nodes the reference's `insert` would have materialized
    on the way to those leaves (`octree.hpp:480-530`).  A node's
    ``value_[8]`` child slots (childid = x + 2y + 4z,
    `octree.hpp:506-507`) come from our dense node pyramid.
    """
    layout = _se_layout(m.channels)
    max_depth = m.max_depth
    block_level = m.block_level
    B = m.blocks_per_edge
    names = [c.name for c in m.channels]

    bi = np.asarray(m.block_index)

    with open(path, "wb") as fh:
        fh.write(np.int32(m.size).tobytes())
        fh.write(np.float32(m.dim).tobytes())

        # ---- nodes: level 0 .. block_level-1, flat order within a level.
        # A node at level l exists iff a block or a marked node-value cell
        # lives anywhere beneath it; a marked cell at level s is a value
        # slot OF its parent node at s-1, not a subtree fill, so the
        # cascade ORs each level's own marks in before downsampling.
        recs = []
        exists_per_level = {}
        ex = (bi >= 0) | np.asarray(m.node_alloc[block_level])
        for level in range(block_level - 1, -1, -1):
            s = 1 << (level + 1)
            ex = ex.reshape(s // 2, 2, s // 2, 2, s // 2, 2).any((1, 3, 5))
            exists_per_level[level] = ex
            if level >= 1:
                # marked cells at this grid are value slots of the NEXT
                # coarser level's nodes: they feed the next downsample
                ex = ex | np.asarray(m.node_alloc[level])
        for level in range(block_level):
            ex = exists_per_level[level]
            nx, ny, nz = np.nonzero(ex)
            if nx.size == 0:
                continue
            store = level + 1
            sv = {n: np.asarray(m.node_values[store][n]) for n in names}
            shift = max_depth - level
            keys = _se_encode_key(nx << shift, ny << shift, nz << shift,
                                  level, max_depth)
            rec = np.zeros(nx.size, dtype=np.dtype([
                ("code", "<u8"), ("side", "<i4"), ("value", layout, (8,))]))
            rec["code"] = keys
            rec["side"] = m.size >> level
            for cid in range(8):
                cx = 2 * nx + (cid & 1)
                cy = 2 * ny + ((cid >> 1) & 1)
                cz = 2 * nz + ((cid >> 2) & 1)
                rec["value"]["x"][:, cid] = sv[names[0]][cx, cy, cz]
                rec["value"]["y"][:, cid] = sv[names[1]][cx, cy, cz]
            recs.append(rec)
        n_nodes = sum(r.size for r in recs)
        fh.write(np.uint64(n_nodes).tobytes())
        for r in recs:
            fh.write(r.tobytes())

        # ---- blocks: live slots in slot order
        live = np.asarray(octree.slot_mask(m))
        slots = np.nonzero(live)[0]
        bc = np.asarray(octree.block_coords_table(m))[slots]
        vx = bc[:, 0] * 8
        vy = bc[:, 1] * 8
        vz = bc[:, 2] * 8
        rec = np.zeros(slots.size, dtype=np.dtype([
            ("code", "<u8"), ("coords", "<i4", (3,)),
            ("voxels", layout, (512,))]))
        rec["code"] = _se_encode_key(vx, vy, vz, block_level, max_depth)
        rec["coords"][:, 0] = vx
        rec["coords"][:, 1] = vy
        rec["coords"][:, 2] = vz
        rec["voxels"]["x"] = np.asarray(m.voxels[names[0]])[slots]
        rec["voxels"]["y"] = np.asarray(m.voxels[names[1]])[slots]
        fh.write(np.uint64(slots.size).tobytes())
        fh.write(rec.tobytes())


def load_se(path: str, channels, capacity: int | None = None) -> VoxelMap:
    """Read a reference `Octree::save` binary (e.g. the `test.bin` a
    reference benchmark run leaves behind) into a VoxelMap.

    ``channels`` picks the voxel_traits layout (pass ``field.channels``).
    Node records land in the dense node pyramid; a child slot is marked
    allocated when its stored value differs from the channel init pair
    (the reference cannot distinguish a pass-through node created on the
    way to a deeper leaf from a value-carrying one, and for both field
    types init == the value multiscale ``get`` would fall back to, so
    behaviour is preserved).
    """
    channels = tuple(channels)
    layout = _se_layout(channels)
    names = [c.name for c in channels]
    with open(path, "rb") as fh:
        buf = fh.read()
    off = 0
    size = int(np.frombuffer(buf, "<i4", 1, off)[0]); off += 4
    dim = float(np.frombuffer(buf, "<f4", 1, off)[0]); off += 4
    n_nodes = int(np.frombuffer(buf, "<u8", 1, off)[0]); off += 8
    node_dt = np.dtype([("code", "<u8"), ("side", "<i4"),
                        ("value", layout, (8,))])
    nodes = np.frombuffer(buf, node_dt, n_nodes, off)
    off += n_nodes * node_dt.itemsize
    n_blocks = int(np.frombuffer(buf, "<u8", 1, off)[0]); off += 8
    blk_dt = np.dtype([("code", "<u8"), ("coords", "<i4", (3,)),
                       ("voxels", layout, (512,))])
    blocks = np.frombuffer(buf, blk_dt, n_blocks, off)

    if capacity is None:
        capacity = max(1024, 1 << int(np.ceil(np.log2(max(n_blocks, 1)))))
    m = octree.init(size, dim, channels, capacity=capacity)
    max_depth = m.max_depth

    # ---- blocks -> table slots 0..n-1 (file order)
    if n_blocks > capacity:
        raise ValueError(f"{n_blocks} blocks > capacity {capacity}")
    bc = (blocks["coords"] >> 3).astype(np.int32)
    block_index = np.asarray(m.block_index).copy()
    block_index[bc[:, 0], bc[:, 1], bc[:, 2]] = \
        np.arange(n_blocks, dtype=np.int32)
    keys = np.asarray(m.keys).copy()
    from supereight_tpu.core import morton as _morton
    keys[:n_blocks] = np.asarray(_morton.block_key(
        jnp.asarray(bc[:, 0], jnp.uint32), jnp.asarray(bc[:, 1], jnp.uint32),
        jnp.asarray(bc[:, 2], jnp.uint32)))
    vox = {n: np.asarray(m.voxels[n]).copy() for n in names}
    vox[names[0]][:n_blocks] = blocks["voxels"]["x"]
    vox[names[1]][:n_blocks] = blocks["voxels"]["y"]
    active = np.asarray(m.active).copy()
    active[:n_blocks] = True

    # ---- nodes -> dense pyramid
    node_values = [{n: np.asarray(v).copy() for n, v in lv.items()}
                   for lv in m.node_values]
    node_alloc = [np.asarray(a).copy() for a in m.node_alloc]
    init = (channels[0].init, channels[1].init)
    levels = (nodes["code"] & _SCALE_MASK).astype(np.int32)
    codes = nodes["code"] & ~_SCALE_MASK
    nx = _compact3(codes)
    ny = _compact3(codes >> np.uint64(1))
    nz = _compact3(codes >> np.uint64(2))
    for level in np.unique(levels):
        store = int(level) + 1
        if store > m.block_level:
            continue
        sel = levels == level
        shift = max_depth - int(level)
        ox = (nx[sel] >> np.uint64(shift)).astype(np.int32)
        oy = (ny[sel] >> np.uint64(shift)).astype(np.int32)
        oz = (nz[sel] >> np.uint64(shift)).astype(np.int32)
        vals = nodes["value"][sel]
        for cid in range(8):
            cx = 2 * ox + (cid & 1)
            cy = 2 * oy + ((cid >> 1) & 1)
            cz = 2 * oz + ((cid >> 2) & 1)
            vx_ = vals[:, cid]["x"]
            vy_ = vals[:, cid]["y"]
            node_values[store][names[0]][cx, cy, cz] = vx_
            node_values[store][names[1]][cx, cy, cz] = \
                vy_.astype(node_values[store][names[1]].dtype)
            meaningful = (vx_ != init[0]) | (vy_ != init[1])
            node_alloc[store][cx, cy, cz] |= meaningful

    return m.replace(
        block_index=jnp.asarray(block_index),
        keys=jnp.asarray(keys),
        n_blocks=jnp.asarray(n_blocks, jnp.int32),
        part_counts=jnp.asarray([n_blocks], jnp.int32),
        active=jnp.asarray(active),
        voxels={n: jnp.asarray(v) for n, v in vox.items()},
        node_values=[{n: jnp.asarray(v) for n, v in lv.items()}
                     for lv in node_values],
        node_alloc=[jnp.asarray(a) for a in node_alloc],
    )
