"""Vectorized Morton (Z-order) codes and octant-key algebra.

TPU-native replacement for the reference's scalar 64-bit Morton utilities
(`se_core/include/se/utils/morton_utils.hpp:37-72` and
`se_core/include/se/octant_ops.hpp:41-183`).  Instead of one key at a time we
operate on whole uint32 arrays so XLA can keep everything on the VPU.

Key layout (uint32):

    [ morton(x, y, z) : 30 bits | level : 5 bits ]  -- packed as (morton << 5) | level

* Coordinates are octant-origin voxel coordinates, 10 bits per axis (supports
  cubes up to 1024^3 voxels directly; block-granularity keys extend this to
  8192^3 voxels since blocks are 8^3).
* ``level`` counts from the root: level 0 is the root (side = size), level
  ``max_depth = log2(size)`` is a single voxel.  This mirrors the reference's
  convention (`octant_ops.hpp:50-58`), but the level lives in the low 5 bits
  of the packed key instead of a 9-bit SCALE_MASK.
* Bit interleave order matches the reference (`morton_utils.hpp:63-72`):
  x occupies bit 0, y bit 1, z bit 2 of each triplet, so ``child_id`` bit 0
  selects x, bit 1 selects y, bit 2 selects z.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_COORD_BITS = 10            # bits per axis in a 30-bit morton code
LEVEL_BITS = 5
LEVEL_MASK = jnp.uint32((1 << LEVEL_BITS) - 1)
MORTON_MASK = jnp.uint32(((1 << 30) - 1))


def expand_bits(v):
    """Spread the low 10 bits of ``v`` so each lands 3 positions apart."""
    v = jnp.asarray(v, jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def compact_bits(v):
    """Inverse of :func:`expand_bits`: collect every 3rd bit into the low 10."""
    v = jnp.asarray(v, jnp.uint32) & jnp.uint32(0x09249249)
    v = (v ^ (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v ^ (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v ^ (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v ^ (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def encode_morton(x, y, z):
    """Interleave three coordinate arrays into 30-bit morton codes (uint32)."""
    return expand_bits(x) | (expand_bits(y) << 1) | (expand_bits(z) << 2)


def decode_morton(code):
    """Inverse of :func:`encode_morton`; returns (x, y, z) int32 arrays."""
    code = jnp.asarray(code, jnp.uint32)
    x = compact_bits(code)
    y = compact_bits(code >> 1)
    z = compact_bits(code >> 2)
    return x.astype(jnp.int32), y.astype(jnp.int32), z.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Octant keys: (morton << 5) | level
# ---------------------------------------------------------------------------

def check_key_capacity(max_depth) -> None:
    """Voxel-level octant keys carry 10 bits/axis: cubes beyond 1024^3
    voxels would silently truncate (the reference widens to 21 bits/axis,
    `octree_defines.h:38-44`; block-granularity keys here already reach
    8192^3 since blocks are 8^3).  Static shapes make this checkable at
    trace time — fail loudly instead."""
    if isinstance(max_depth, int) and max_depth > MAX_COORD_BITS:
        raise ValueError(
            f"voxel-level morton keys support max_depth <= {MAX_COORD_BITS} "
            f"(1024^3 voxels); got max_depth={max_depth}. Use block-"
            f"granularity keys (block_key) for larger volumes.")


def key_encode(x, y, z, level, max_depth):
    """Build octant keys from voxel coordinates at ``level``.

    Coordinates are truncated to the octant grid of that level, mirroring the
    prefix masking of the reference encoder (`octant_ops.hpp:50-55`).
    """
    check_key_capacity(max_depth)
    level = jnp.asarray(level, jnp.uint32)
    shift = jnp.uint32(max_depth) - level
    x = (jnp.asarray(x, jnp.uint32) >> shift) << shift
    y = (jnp.asarray(y, jnp.uint32) >> shift) << shift
    z = (jnp.asarray(z, jnp.uint32) >> shift) << shift
    return (encode_morton(x, y, z) << LEVEL_BITS) | level


def key_morton(key):
    """The 30-bit morton code of a key (level stripped)."""
    return (jnp.asarray(key, jnp.uint32) >> LEVEL_BITS) & MORTON_MASK


def key_level(key):
    """The level stored in a key's low bits."""
    return (jnp.asarray(key, jnp.uint32) & LEVEL_MASK).astype(jnp.int32)


def key_decode(key):
    """Voxel coordinates of a key's octant origin: (x, y, z) int32 arrays."""
    return decode_morton(key_morton(key))


def key_parent(key, max_depth):
    """Key of the parent octant (one level up); reference `octant_ops.hpp:100-104`."""
    key = jnp.asarray(key, jnp.uint32)
    level = key_level(key).astype(jnp.uint32)
    parent_level = level - 1
    shift = 3 * (jnp.uint32(max_depth) - parent_level)
    morton = (key_morton(key) >> shift) << shift
    return (morton << LEVEL_BITS) | parent_level


def key_child_id(key, max_depth):
    """Index of the octant within its sibling group (0..7).

    Bit 0 selects x, bit 1 y, bit 2 z — same as `octant_ops.hpp:112-118`.
    """
    key = jnp.asarray(key, jnp.uint32)
    level = key_level(key).astype(jnp.uint32)
    shift = 3 * (jnp.uint32(max_depth) - level)
    return ((key_morton(key) >> shift) & jnp.uint32(7)).astype(jnp.int32)


def key_siblings(key, max_depth):
    """All 8 keys of the sibling group containing ``key`` (appends an axis)."""
    key = jnp.asarray(key, jnp.uint32)
    level = key_level(key).astype(jnp.uint32)
    shift = 3 * (jnp.uint32(max_depth) - level)
    base = ((key_morton(key) >> (shift + 3)) << (shift + 3))
    ids = jnp.arange(8, dtype=jnp.uint32)
    morton = base[..., None] | (ids << shift[..., None])
    return (morton << LEVEL_BITS) | level[..., None]


def key_is_descendant(key, ancestor, max_depth):
    """True where ``key``'s octant lies inside ``ancestor``'s octant.

    Parity with reference `octant_ops.hpp:81-89`.
    """
    anc_level = key_level(ancestor).astype(jnp.uint32)
    shift = 3 * (jnp.uint32(max_depth) - anc_level)
    pref_k = (key_morton(key) >> shift) << shift
    pref_a = key_morton(ancestor)
    deeper = key_level(key) >= key_level(ancestor)
    return (pref_k == pref_a) & deeper


def key_far_corner(key, max_depth):
    """The corner of the octant not shared with any sibling.

    Parity with reference `octant_ops.hpp:126-135`.
    """
    x, y, z = key_decode(key)
    level = key_level(key)
    side = jnp.int32(1) << (max_depth - level)
    cid = key_child_id(key, max_depth)
    return (
        x + (cid & 1) * side,
        y + ((cid >> 1) & 1) * side,
        z + ((cid >> 2) & 1) * side,
    )


def key_face_neighbour(key, face, max_depth):
    """Origin coordinates of the face-adjacent octant (may be out of bounds).

    ``face``: 0:-x 1:+x 2:-y 3:+y 4:-z 5:+z, as `octant_ops.hpp:64-75`.
    """
    x, y, z = key_decode(key)
    level = key_level(key)
    side = jnp.int32(1) << (max_depth - level)
    face = jnp.asarray(face, jnp.int32)
    dx = jnp.where(face == 0, -side, jnp.where(face == 1, side, 0))
    dy = jnp.where(face == 2, -side, jnp.where(face == 3, side, 0))
    dz = jnp.where(face == 4, -side, jnp.where(face == 5, side, 0))
    return x + dx, y + dy, z + dz


def block_key(bx, by, bz):
    """Morton key for a voxel-block coordinate (no level bits; blocks only)."""
    return encode_morton(bx, by, bz)


def block_key_decode(key):
    return decode_morton(key)
