"""Sparse voxel map: the TPU-native replacement for ``se::Octree<T>``.

Reference: `se_core/include/se/octree.hpp:89-273` (pointer octree of Nodes and
8^3 VoxelBlocks, atomic memory pools, per-level parallel insertion).

Design (NOT a port).  On TPU a pointer octree is hostile to vectorization, so
the same information is held in flat, statically-shaped device arrays:

* ``block_index``: dense ``int32[B,B,B]`` (B = size/8) mapping a voxel-block
  coordinate to its slot in the block table, or -1.  This replaces the whole
  root->node->block pointer walk of `octree.hpp:441-478` with one gather.
* block table: ``keys`` (Morton codes), per-channel voxel bricks
  ``{name: dtype[capacity, 512]}`` (struct-of-arrays, brick-major so
  integration touches contiguous memory), an ``active`` flag per slot and a
  bump count ``n_blocks``.  This mirrors what the reference's MemoryPool
  already is (`utils/memory_pool.hpp:64-76`): a flat iterable array of blocks.
* node pyramid: coarse octree levels stored as small dense mip arrays
  ``{name: dtype[2^l,2^l,2^l]}`` for l = 0..block_level plus an allocation
  mask per level.  These carry the per-level ``Node::value_[8]`` child slots
  of `node.hpp:45-87` (used by multi-scale occupancy fusion) without any
  pointers: a reference Node at tree level l-1 stores values for its 8
  children at granularity 2^l, so our level-l array holds exactly those child
  slots, and allocating a node at level l-1 marks the 8 covered cells of
  level l.  Even at size=2048 the whole pyramid is < 3 MB.

Allocation (`octree.hpp:793-856` sort + unique_multiscale + parallel insert)
becomes: scatter candidate block coords into a dense "wanted" mask, AND with
unallocated, compact with a prefix sum, append to the table.  No sort, no
atomics; duplicate keys are deduped by the dense mask for free.

All functions are pure: they take and return a :class:`VoxelMap` pytree and
are jit/vmap/shard_map friendly.  Voxel brick layout matches the reference's
``VoxelBlock::data`` ordering: linear index = x + y*8 + z*64
(`node.hpp:140-165`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import morton

BLOCK_SIDE = 8            # voxels per block edge (reference octree_defines.h:38)
BLOCK_VOXELS = BLOCK_SIDE ** 3
BLOCK_BITS = 3


def _log2i(v: int) -> int:
    l = v.bit_length() - 1
    if (1 << l) != v:
        raise ValueError(f"size must be a power of two, got {v}")
    return l


class ChannelSpec(struct.PyTreeNode):
    """Per-channel voxel field description (the ``voxel_traits`` analog).

    Reference: `se_core/include/se/voxel_traits.hpp:36-37` and the SDF /
    OFusion specializations in `se_denseslam/include/se/volume_traits.hpp`.
    ``empty`` is the value returned for *unallocated* space, ``init`` the
    value freshly-allocated voxels start with.
    """

    name: str = struct.field(pytree_node=False)
    dtype: Any = struct.field(pytree_node=False)
    init: float = struct.field(pytree_node=False)
    empty: float = struct.field(pytree_node=False)


class VoxelMap(struct.PyTreeNode):
    """Flat-array sparse voxel map over a ``size^3`` cube of extent ``dim`` m."""

    # --- static configuration ---
    size: int = struct.field(pytree_node=False)          # voxels per edge
    dim: float = struct.field(pytree_node=False)         # metric extent (m)
    capacity: int = struct.field(pytree_node=False)      # max blocks
    channels: Tuple[ChannelSpec, ...] = struct.field(pytree_node=False)

    # --- device arrays ---
    block_index: jnp.ndarray          # int32[B,B,B], slot or -1
    keys: jnp.ndarray                 # uint32[capacity], block morton codes
    n_blocks: jnp.ndarray             # int32[], bump counter
    active: jnp.ndarray               # bool[capacity]
    overflow: jnp.ndarray             # int32[], dropped allocations (table full)
    voxels: Dict[str, jnp.ndarray]    # {name: dtype[capacity, 512]}
    node_values: List[Dict[str, jnp.ndarray]]   # per level 0..block_level-1
    node_alloc: List[jnp.ndarray]     # per level bool[2^l,2^l,2^l]

    # --- multi-device ownership (parallel/sharding.py) ---
    #: number of owner partitions of the slot space.  1 = single bump
    #: allocator (default).  D > 1 splits the capacity into D contiguous
    #: slot ranges; blocks are assigned to the partition owning their
    #: x-slab of block coordinates (a Morton-range partition under the
    #: x-major curve order), so a capacity-sharded table over a D-device
    #: mesh allocates and fuses each block on its owner device only.
    partitions: int = struct.field(pytree_node=False, default=1)
    #: int32[partitions]: per-partition bump counters (sum == n_blocks)
    part_counts: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------
    @property
    def blocks_per_edge(self) -> int:
        return self.size // BLOCK_SIDE

    @property
    def max_depth(self) -> int:
        """Level of single voxels; root is level 0 (octree.hpp convention)."""
        return _log2i(self.size)

    @property
    def block_level(self) -> int:
        """Tree level at which 8^3 blocks live."""
        return self.max_depth - BLOCK_BITS

    @property
    def voxel_size(self) -> float:
        return self.dim / self.size

    @property
    def inverse_voxel_size(self) -> float:
        return self.size / self.dim


def init(size: int, dim: float, channels: Tuple[ChannelSpec, ...],
         capacity: int | None = None, partitions: int = 1) -> VoxelMap:
    """Create an empty map (reference ``Octree::init``, `octree.hpp:428-438`).

    ``partitions`` > 1 enables owner-partitioned slot assignment for
    multi-device maps (see :class:`VoxelMap`); requires the block grid edge
    and the capacity to be divisible by it.
    """
    B = size // BLOCK_SIDE
    if capacity is None:
        capacity = min(B * B * B, max(4096, (B * B * B) // 4))
    if partitions > 1:
        if B % partitions or capacity % partitions:
            raise ValueError(
                f"partitions={partitions} must divide the block grid edge "
                f"({B}) and the capacity ({capacity})")
    block_level = _log2i(size) - BLOCK_BITS
    node_values = []
    node_alloc = []
    for level in range(block_level + 1):
        s = 1 << level
        node_values.append({
            c.name: jnp.full((s, s, s), c.init, dtype=c.dtype) for c in channels
        })
        node_alloc.append(jnp.zeros((s, s, s), dtype=bool))
    return VoxelMap(
        size=size, dim=float(dim), capacity=capacity, channels=tuple(channels),
        block_index=jnp.full((B, B, B), -1, dtype=jnp.int32),
        keys=jnp.zeros((capacity,), dtype=jnp.uint32),
        n_blocks=jnp.zeros((), dtype=jnp.int32),
        active=jnp.zeros((capacity,), dtype=bool),
        overflow=jnp.zeros((), dtype=jnp.int32),
        voxels={c.name: jnp.full((capacity, BLOCK_VOXELS), c.init, dtype=c.dtype)
                for c in channels},
        node_values=node_values,
        node_alloc=node_alloc,
        partitions=partitions,
        part_counts=jnp.zeros((partitions,), dtype=jnp.int32),
    )


# ----------------------------------------------------------------------
# Lookup / fetch
# ----------------------------------------------------------------------

def fetch(m: VoxelMap, vx, vy, vz):
    """Slot of the block containing voxel (vx,vy,vz); -1 if unallocated or
    out of bounds.  Reference ``Octree::fetch`` (`octree.hpp:441-460`)."""
    bx, by, bz = vx >> BLOCK_BITS, vy >> BLOCK_BITS, vz >> BLOCK_BITS
    B = m.blocks_per_edge
    inb = ((vx >= 0) & (vx < m.size) & (vy >= 0) & (vy < m.size)
           & (vz >= 0) & (vz < m.size))
    bxc = jnp.clip(bx, 0, B - 1)
    byc = jnp.clip(by, 0, B - 1)
    bzc = jnp.clip(bz, 0, B - 1)
    slot = m.block_index[bxc, byc, bzc]
    return jnp.where(inb, slot, -1)


def _voxel_linear(vx, vy, vz):
    """Linear index inside a brick, matching `node.hpp:140-165` ordering."""
    lx = vx & (BLOCK_SIDE - 1)
    ly = vy & (BLOCK_SIDE - 1)
    lz = vz & (BLOCK_SIDE - 1)
    return lx + ly * BLOCK_SIDE + lz * BLOCK_SIDE * BLOCK_SIDE


def get(m: VoxelMap, channel: str, vx, vy, vz):
    """Voxel value at integer coords; ``empty`` outside allocated blocks.

    Equivalent to reference ``Octree::get_fine`` (`octree.hpp:370-408`) for
    leaf data: the hot path used by raycasting via ``Volume::get``.
    """
    spec = _channel(m, channel)
    slot = fetch(m, vx, vy, vz)
    lin = _voxel_linear(vx, vy, vz)
    safe_slot = jnp.maximum(slot, 0)
    val = m.voxels[channel][safe_slot, lin]
    return jnp.where(slot >= 0, val, jnp.asarray(spec.empty, spec.dtype))


def get_multiscale(m: VoxelMap, channel: str, vx, vy, vz):
    """Value of the *deepest allocated octant* containing the voxel.

    Reference ``Octree::get`` (`octree.hpp:313-368`): descends until a child
    is missing and returns that octant's stored value.  Here: start from the
    block value and successively fall back through the dense node pyramid.
    """
    spec = _channel(m, channel)
    val = jnp.full(jnp.shape(vx), spec.empty, dtype=spec.dtype)
    # Coarse levels, coarsest first, get overwritten by finer data when present.
    for level in range(1, m.block_level + 1):
        shift = m.max_depth - level
        ox, oy, oz = vx >> shift, vy >> shift, vz >> shift
        s = 1 << level
        oxc = jnp.clip(ox, 0, s - 1)
        oyc = jnp.clip(oy, 0, s - 1)
        ozc = jnp.clip(oz, 0, s - 1)
        lv = m.node_values[level][channel][oxc, oyc, ozc]
        la = m.node_alloc[level][oxc, oyc, ozc]
        val = jnp.where(la, lv, val)
    slot = fetch(m, vx, vy, vz)
    lin = _voxel_linear(vx, vy, vz)
    leaf = m.voxels[channel][jnp.maximum(slot, 0), lin]
    return jnp.where(slot >= 0, leaf, val)


def set_voxels(m: VoxelMap, channel: str, vx, vy, vz, values) -> VoxelMap:
    """Scatter values into voxels (no allocation; writes to missing blocks are
    dropped).  Reference ``Octree::set`` (`octree.hpp:313-330`)."""
    slot = fetch(m, vx, vy, vz)
    lin = _voxel_linear(vx, vy, vz)
    ok = slot >= 0
    flat = m.voxels[channel].reshape(-1)
    idx = jnp.where(ok, jnp.maximum(slot, 0) * BLOCK_VOXELS + lin, flat.shape[0])
    flat = flat.at[idx].set(values, mode="drop")
    vox = dict(m.voxels)
    vox[channel] = flat.reshape(m.voxels[channel].shape)
    return m.replace(voxels=vox)


def _channel(m: VoxelMap, name: str) -> ChannelSpec:
    for c in m.channels:
        if c.name == name:
            return c
    raise KeyError(name)


# ----------------------------------------------------------------------
# Allocation
# ----------------------------------------------------------------------

def allocate_blocks(m: VoxelMap, block_coords, valid) -> VoxelMap:
    """Allocate voxel blocks for ``block_coords`` int32[N,3] where ``valid``.

    Replaces ``Octree::allocate`` (`octree.hpp:793-856`).  The reference
    sorts + uniques the key list then inserts serially per level; here the
    dense ``wanted`` scatter dedupes in O(B^3) and a cumsum assigns slots.
    Already-allocated touched blocks are marked active, matching
    `kfusion/alloc_impl.hpp:108-110`.
    """
    B = m.blocks_per_edge
    bx = jnp.clip(block_coords[:, 0], 0, B - 1)
    by = jnp.clip(block_coords[:, 1], 0, B - 1)
    bz = jnp.clip(block_coords[:, 2], 0, B - 1)
    inb = ((block_coords >= 0).all(axis=1)
           & (block_coords < B).all(axis=1) & valid)

    wanted = jnp.zeros((B, B, B), dtype=bool)
    wanted = wanted.at[bx, by, bz].max(inb)
    return allocate_block_mask(m, wanted)


def allocate_block_mask(m: VoxelMap, wanted) -> VoxelMap:
    """Allocate every block where ``wanted`` bool[B,B,B] is set (and mark
    touched blocks active).  The dense-mask core of ``Octree::allocate``.

    With ``m.partitions == D > 1`` the slot space is split into D contiguous
    ranges and each x-slab of the block grid allocates into its own range
    with an independent prefix-sum counter — the multi-device layout where
    each mesh device owns one slot range and the blocks of one spatial slab
    (no cross-device slot contention; the reference's atomic fetch_add
    becomes D independent prefix sums).
    """
    B = m.blocks_per_edge
    D = m.partitions
    allocated = m.block_index >= 0
    # group the flat order by owner partition (x-slab); for D == 1 this is
    # the plain flat order
    new = (wanted & ~allocated).reshape(D, -1)
    per_cap = m.capacity // D

    # Prefix-sum slot assignment per partition (replaces the atomic
    # fetch_add of `memory_pool.hpp:71`).
    order = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
    counts = m.part_counts if m.part_counts is not None \
        else m.n_blocks[None]
    slots_local = counts[:, None] + order
    total_new = order[:, -1] + 1
    fits = new & (slots_local < per_cap)
    slots = slots_local + per_cap * jnp.arange(D, dtype=jnp.int32)[:, None]

    flat_lin = jnp.arange(B * B * B, dtype=jnp.int32)
    gx, gy, gz = jnp.unravel_index(flat_lin, (B, B, B))

    # New-and-fitting cells get their fresh slot; everything else keeps its
    # old entry (-1 for new blocks that did not fit: they stay unallocated).
    flat_old = m.block_index.reshape(D, -1)
    flat_new = jnp.where(fits, slots, flat_old)
    block_index = flat_new.reshape((B, B, B))

    tgt = jnp.where(fits, slots, m.capacity)  # capacity -> dropped by scatter
    new_keys = morton.block_key(gx.astype(jnp.uint32),
                                gy.astype(jnp.uint32),
                                gz.astype(jnp.uint32))
    keys = m.keys.at[tgt.reshape(-1)].set(new_keys, mode="drop")

    # Mark every *touched* block (newly allocated or pre-existing) active.
    touched_slot = jnp.where(wanted.reshape(D, -1) & (flat_new >= 0),
                             flat_new, m.capacity).reshape(-1)
    active = m.active.at[touched_slot].set(True, mode="drop")

    new_counts = jnp.minimum(counts + total_new, per_cap)
    overflow = m.overflow + jnp.sum(
        jnp.maximum(counts + total_new - per_cap, 0))
    return m.replace(block_index=block_index, keys=keys,
                     n_blocks=jnp.sum(new_counts),
                     part_counts=new_counts,
                     active=active, overflow=overflow)


def allocate_octants(m: VoxelMap, coords, levels, valid) -> VoxelMap:
    """Allocate octants at arbitrary tree levels (multi-scale occupancy).

    Coords are voxel coordinates, ``levels`` the requested tree level per
    candidate; anything at or below the block level becomes a block, coarser
    requests flip the corresponding dense node-pyramid mask.  Reference:
    ``buildOctantList`` consumers / ``Octree::allocate_level``
    (`octree.hpp:819-856`).
    """
    block_level = m.block_level
    as_block = levels >= block_level
    m = allocate_blocks(m, coords >> BLOCK_BITS, valid & as_block)

    # A node request at level l creates the node's 8 child value slots at
    # granularity l+1 (reference Node::value_[8], projective node updates).
    # Marking the slot that contains `coords` and its 7 siblings == marking
    # the parent octant's full 2x2x2 child group.
    node_alloc = list(m.node_alloc)
    for level in range(block_level):
        store = level + 1
        s = 1 << store
        shift = m.max_depth - store
        sel = valid & (levels == level)
        # parent-aligned child-group origin, then all 8 siblings
        ox = jnp.clip((coords[:, 0] >> shift) & ~1, 0, s - 1)
        oy = jnp.clip((coords[:, 1] >> shift) & ~1, 0, s - 1)
        oz = jnp.clip((coords[:, 2] >> shift) & ~1, 0, s - 1)
        for cid in range(8):
            node_alloc[store] = node_alloc[store].at[
                ox + (cid & 1), oy + ((cid >> 1) & 1), oz + ((cid >> 2) & 1)
            ].max(sel)
    return m.replace(node_alloc=node_alloc)


# ----------------------------------------------------------------------
# Interpolation and gradient
# ----------------------------------------------------------------------

def interp(m: VoxelMap, channel: str, pos):
    """Trilinear interpolation at fractional voxel coords ``pos``[..., 3].

    Matches ``Octree::interp`` (`octree.hpp:542-563`): base = floor(pos),
    corners gathered from leaf data (empty outside).  The reference's
    block-boundary crossing masks (`interpolation/interp_gather.hpp:105-237`)
    vanish: the flat gather is uniform regardless of block crossings.
    """
    base = jnp.floor(pos).astype(jnp.int32)
    factor = pos - base
    lower = jnp.maximum(base, 0)

    offs = _corner_offsets()
    corner = lower[..., None, :] + offs          # [..., 8, 3]
    vals = get(m, channel, corner[..., 0], corner[..., 1], corner[..., 2])
    vals = vals.astype(jnp.float32)
    return _trilinear(vals, factor)


def _corner_offsets():
    o = jnp.arange(8, dtype=jnp.int32)
    return jnp.stack([o & 1, (o >> 1) & 1, (o >> 2) & 1], axis=-1)  # [8,3]


def _trilinear(vals, factor):
    fx = factor[..., 0]
    fy = factor[..., 1]
    fz = factor[..., 2]
    wx = jnp.stack([1 - fx, fx], axis=-1)          # [..., 2]
    wy = jnp.stack([1 - fy, fy], axis=-1)
    wz = jnp.stack([1 - fz, fz], axis=-1)
    # corner i has x-bit i&1, y-bit (i>>1)&1, z-bit (i>>2)&1
    w = (wx[..., jnp.array([0, 1, 0, 1, 0, 1, 0, 1])]
         * wy[..., jnp.array([0, 0, 1, 1, 0, 0, 1, 1])]
         * wz[..., jnp.array([0, 0, 0, 0, 1, 1, 1, 1])])
    return jnp.sum(vals * w, axis=-1)


def interp_multiscale(m: VoxelMap, channel: str, pos):
    """Trilinear interpolation whose corners fall back to the deepest
    allocated node value where leaf blocks are missing.

    Parity with the reference's gather fallback for partially-allocated
    neighbourhoods (`interpolation/interp_gather.hpp:105-237` fetches via
    the octree and coarse octants when a neighbour block is absent).
    """
    base = jnp.floor(pos).astype(jnp.int32)
    factor = pos - base
    lower = jnp.maximum(base, 0)
    offs = _corner_offsets()
    corner = lower[..., None, :] + offs
    vals = get_multiscale(m, channel, corner[..., 0], corner[..., 1],
                          corner[..., 2]).astype(jnp.float32)
    return _trilinear(vals, factor)


def grad(m: VoxelMap, channel: str, pos):
    """Trilinearly-blended central-difference gradient, [..., 3].

    Matches ``Octree::grad`` (`octree.hpp:566-737`): per-corner central
    differences with border clamping, blended by the interpolation weights
    and scaled by ``0.5 * dim / size``.
    """
    base = jnp.floor(pos).astype(jnp.int32)
    factor = pos - base
    lower = jnp.maximum(base, 0)
    offs = _corner_offsets()                      # [8,3]
    corner = lower[..., None, :] + offs           # [..., 8, 3]

    grads = []
    for axis in range(3):
        hi = corner.at[..., axis].add(1)
        lo = corner.at[..., axis].add(-1)
        hi = jnp.clip(hi, 0, m.size - 1)
        lo = jnp.clip(lo, 0, m.size - 1)
        v_hi = get(m, channel, hi[..., 0], hi[..., 1], hi[..., 2]).astype(jnp.float32)
        v_lo = get(m, channel, lo[..., 0], lo[..., 1], lo[..., 2]).astype(jnp.float32)
        grads.append(_trilinear(v_hi - v_lo, factor))
    g = jnp.stack(grads, axis=-1)
    return g * (0.5 * m.dim / m.size)


# ----------------------------------------------------------------------
# Introspection (reference `octree.hpp:952` leavesCount / nodeCount)
# ----------------------------------------------------------------------

def leaves_count(m: VoxelMap):
    return m.n_blocks


def nodes_count(m: VoxelMap):
    """Allocated node count: each fully-marked 2x2x2 child group at level l
    is one node at level l-1 (alloc always marks whole sibling groups)."""
    n = jnp.zeros((), jnp.int32)
    for level in range(1, m.block_level + 1):
        n = n + jnp.sum(m.node_alloc[level].astype(jnp.int32)) // 8
    return n + m.n_blocks


def block_coords_table(m: VoxelMap):
    """Decode all block keys into int32[capacity, 3] block coordinates."""
    x, y, z = morton.block_key_decode(m.keys)
    return jnp.stack([x, y, z], axis=-1)


def slot_mask(m: VoxelMap):
    """bool[capacity]: which table slots hold live blocks.  Live slots are a
    prefix of each partition's slot range (one range == the whole table for
    the default partitions == 1)."""
    if m.partitions == 1:
        return jnp.arange(m.capacity, dtype=jnp.int32) < m.n_blocks
    per_cap = m.capacity // m.partitions
    idx = jnp.arange(m.capacity, dtype=jnp.int32)
    return (idx % per_cap) < m.part_counts[idx // per_cap]


def allocate_octant_masks(m: VoxelMap, masks: List[jnp.ndarray]) -> VoxelMap:
    """Allocate octants from per-level dense request masks.

    ``masks[l]`` bool[2^l]^3 requests a *node* at level l (l < block_level)
    or a block (l == block_level).  Dense analog of :func:`allocate_octants`
    for mask-producing allocators.
    """
    m = allocate_block_mask(m, masks[m.block_level])
    node_alloc = list(m.node_alloc)
    for level in range(m.block_level):
        store = level + 1
        req = masks[level]
        # a node at level l materializes its 2x2x2 child value slots
        up = jnp.repeat(jnp.repeat(jnp.repeat(req, 2, 0), 2, 1), 2, 2)
        node_alloc[store] = node_alloc[store] | up
    return m.replace(node_alloc=node_alloc)


def axis_aligned_map(m: VoxelMap, fn) -> VoxelMap:
    """Apply ``fn(values_dict, coords) -> values_dict`` to every voxel of
    every allocated block.

    Reference: the axis-aligned functor (`se_core/include/se/functors/
    axis_aligned_functor.hpp:57-131`), used to initialize test fields and
    for whole-map transforms.  ``coords`` is int32[capacity, 512, 3].
    """
    bc = block_coords_table(m) * BLOCK_SIDE                  # [cap, 3]
    i = jnp.arange(BLOCK_VOXELS, dtype=jnp.int32)
    offs = jnp.stack([i % BLOCK_SIDE, (i // BLOCK_SIDE) % BLOCK_SIDE,
                      i // (BLOCK_SIDE * BLOCK_SIDE)], axis=-1)
    coords = bc[:, None, :] + offs[None, :, :]
    new_vals = fn(dict(m.voxels), coords)
    live = slot_mask(m)[:, None]
    vox = {name: jnp.where(live, new_vals[name], m.voxels[name])
           for name in m.voxels}
    return m.replace(voxels=vox)


def pack_tiled(m: VoxelMap, channel: str) -> jnp.ndarray:
    """Materialize one channel as brick-tiled rows ``dtype[B^3, 512]`` with
    ``empty`` baked into unallocated rows — the dense volume in tiled
    layout, skipping :func:`pack_dense`'s 6D untiling transpose (whose
    tile-padded intermediate costs 16x memory: 34 GB at 1024^3).  Sampling
    uses (row, col) = (block linear, brick linear) indexing instead of
    (x, y, z)."""
    spec = _channel(m, channel)
    B = m.blocks_per_edge
    bc = block_coords_table(m)
    live = slot_mask(m)
    lin = bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2]
    tgt = jnp.where(live, lin, B * B * B)
    flat = jnp.full((B * B * B, BLOCK_VOXELS), spec.empty, dtype=spec.dtype)
    return flat.at[tgt].set(m.voxels[channel], mode="drop")


def pack_dense(m: VoxelMap, channel: str) -> jnp.ndarray:
    """Materialize one channel as a dense ``dtype[S, S, S]`` volume with
    ``empty`` baked into unallocated space.

    This is the raycaster's read view: a scatter of ``capacity`` fat block
    rows (2 KB each) — row-descriptor bound, ~sub-ms at 256^3 — after which
    all sampling is plain dense indexing with no block indirection.
    """
    spec = _channel(m, channel)
    B = m.blocks_per_edge
    S = m.size
    bc = block_coords_table(m)                     # [cap, 3]
    live = slot_mask(m)
    # single-axis fat-row scatter (13.5 ms -> 0.05 ms vs a 3-index scatter
    # of [8,8,8] windows on the v5e), then one dense 6D transpose
    lin = bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2]
    tgt = jnp.where(live, lin, B * B * B)          # last row -> dropped
    flat = jnp.full((B * B * B, BLOCK_VOXELS), spec.empty, dtype=spec.dtype)
    flat = flat.at[tgt].set(m.voxels[channel], mode="drop")
    # brick linear index is x + y*8 + z*64 (`node.hpp:140-165`), so the
    # trailing 512 unpacks as (lz, ly, lx)
    d6 = flat.reshape(B, B, B, BLOCK_SIDE, BLOCK_SIDE, BLOCK_SIDE)
    return d6.transpose(0, 5, 1, 4, 2, 3).reshape(S, S, S)


def pack_dense_multiscale(m: VoxelMap, channel: str) -> jnp.ndarray:
    """Like :func:`pack_dense` but unallocated space reads the deepest
    allocated node-pyramid value instead of ``empty`` — the dense equivalent
    of the reference's multiscale ``Octree::get`` (`octree.hpp:313-368`),
    used by the occupancy raycaster through coarse free space."""
    spec = _channel(m, channel)
    S = m.size
    base = jnp.full((S, S, S), spec.empty, dtype=spec.dtype)
    for level in range(1, m.block_level + 1):
        f = S >> level
        vals = m.node_values[level][channel]
        mask = m.node_alloc[level]
        up_v = jnp.repeat(jnp.repeat(jnp.repeat(vals, f, 0), f, 1), f, 2)
        up_m = jnp.repeat(jnp.repeat(jnp.repeat(mask, f, 0), f, 1), f, 2)
        base = jnp.where(up_m, up_v, base)
    leaf = pack_dense(m, channel)
    leaf_mask = jnp.repeat(jnp.repeat(jnp.repeat(
        m.block_index >= 0, BLOCK_SIDE, 0), BLOCK_SIDE, 1), BLOCK_SIDE, 2)
    return jnp.where(leaf_mask, leaf, base)


def node_fill(m: VoxelMap, channel: str) -> jnp.ndarray:
    """``dtype[B^3]``: the deepest allocated node-pyramid value over each
    block-grid cell (``empty`` where no ancestor octant is allocated) —
    the per-cell show-through of the reference's multiscale ``get``
    (`octree.hpp:313-368`).  Coarse octants are always block-sized or
    larger, so this is exact at block granularity and costs only ``B^3``
    work (32k cells at 256^3)."""
    spec = _channel(m, channel)
    B = m.blocks_per_edge
    fill = jnp.full((B, B, B), spec.empty, dtype=spec.dtype)
    for level in range(1, m.block_level + 1):
        rep = B >> level                     # blocks per node edge
        vals = m.node_values[level][channel]
        mask = m.node_alloc[level]
        up_v = jnp.repeat(jnp.repeat(jnp.repeat(vals, rep, 0), rep, 1),
                          rep, 2)
        up_m = jnp.repeat(jnp.repeat(jnp.repeat(mask, rep, 0), rep, 1),
                          rep, 2)
        fill = jnp.where(up_m, up_v, fill)
    return fill.reshape(B * B * B)


def pack_tiled_multiscale(m: VoxelMap, channel: str) -> jnp.ndarray:
    """Brick-tiled rows ``dtype[B^3, 512]`` where unallocated rows read the
    deepest allocated node-pyramid value for their cell — the tiled
    equivalent of :func:`pack_dense_multiscale` (reference multiscale
    ``Octree::get``, `octree.hpp:313-368`), built from :func:`node_fill`
    so the view build is one row scatter + one dense select instead of
    :func:`pack_dense_multiscale`'s ``block_level`` full ``S^3`` upsample
    passes plus the 6D untiling transpose."""
    spec = _channel(m, channel)
    B = m.blocks_per_edge
    fill = node_fill(m, channel)
    bc = block_coords_table(m)
    live = slot_mask(m)
    lin = bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2]
    tgt = jnp.where(live, lin, B * B * B)
    # constant-fill scatter (same form as pack_tiled — a scatter whose
    # operand is a broadcast of a computed array wedged the TPU backend's
    # compile for >55 min), then one dense select applies the node fill
    flat = jnp.full((B * B * B, BLOCK_VOXELS), spec.empty, dtype=spec.dtype)
    flat = flat.at[tgt].set(m.voxels[channel], mode="drop")
    has_leaf = (m.block_index >= 0).reshape(-1)
    return jnp.where(has_leaf[:, None], flat, fill[:, None])


def unpack_dense(m: VoxelMap, channel: str, dense: jnp.ndarray) -> VoxelMap:
    """Write a dense ``[S, S, S]`` volume back into the block table (gather
    of fat rows; inverse of :func:`pack_dense`)."""
    B = m.blocks_per_edge
    # dense (bx,lx,by,ly,bz,lz) -> (bx,by,bz, lz,ly,lx) -> [B^3, 512] rows
    d6 = dense.reshape(B, BLOCK_SIDE, B, BLOCK_SIDE, B, BLOCK_SIDE) \
              .transpose(0, 2, 4, 5, 3, 1)
    flat = d6.reshape(B * B * B, BLOCK_VOXELS)
    bc = block_coords_table(m)
    lin = jnp.clip(bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2],
                   0, B * B * B - 1)
    bricks = flat[lin]                             # fat-row gather
    live = slot_mask(m)[:, None]
    vox = dict(m.voxels)
    vox[channel] = jnp.where(live, bricks.astype(vox[channel].dtype),
                             vox[channel])
    return m.replace(voxels=vox)
