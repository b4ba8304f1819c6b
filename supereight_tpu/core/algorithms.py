"""Key-list algorithms: unique / ancestor filtering / multiscale dedup.

Reference: `se_core/include/se/algorithms/unique.hpp:36-79` (serial scans
over sorted Morton key lists used by ``Octree::allocate``) and the
active-list filter (`se_core/include/se/algorithms/filter.hpp:37-117`).

The TPU allocator itself dedupes through a dense mask
(`octree.allocate_block_mask`), but these list-space primitives remain part
of the public API (planning / key-exchange between hosts) — implemented as
vectorized one-pass operations over sorted key arrays instead of serial
scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import morton, octree


def _as_keys(keys):
    """Keys keep their dtype (uint64 for >512^3 octant keys, see
    morton.key_dtype); anything else defaults to uint32."""
    k = jnp.asarray(keys)
    if k.dtype not in (jnp.uint32, jnp.uint64):
        k = k.astype(jnp.uint32)
    return k


def sort_keys(keys):
    """Parallel key sort (reference uses __gnu_parallel::sort,
    `octree.hpp:795-799`)."""
    return jnp.sort(_as_keys(keys))


def unique(keys_sorted, n_valid=None):
    """Mask of the first occurrence of each key in a sorted array
    (`unique.hpp:36-49`).  Returns (mask, count)."""
    k = _as_keys(keys_sorted)
    with jax.enable_x64(True):
        prev = jnp.concatenate([~k[:1], k[:-1]])
    mask = k != prev
    if n_valid is not None:
        mask = mask & (jnp.arange(k.shape[0]) < n_valid)
    return mask, jnp.sum(mask.astype(jnp.int32))


def filter_ancestors(keys_sorted, max_depth, n_valid=None):
    """Drop keys that are ancestors of their successor (`unique.hpp:51-63`):
    in a sorted list, a key whose octant contains the next key is redundant
    (the deeper one implies allocation of the whole branch)."""
    k = _as_keys(keys_sorted)
    nxt = jnp.concatenate([k[1:], k[-1:]])
    is_anc = morton.key_is_descendant(nxt, k, max_depth) & (nxt != k)
    keep = ~is_anc
    last = k.shape[0] - 1
    keep = keep.at[last].set(True)
    if n_valid is not None:
        keep = keep & (jnp.arange(k.shape[0]) < n_valid)
    return keep


def unique_multiscale(keys_sorted, max_depth, n_valid=None):
    """Among equal-morton keys at different levels keep the deepest
    (`unique.hpp:65-79`): first occurrence wins after sorting because the
    level lives in the low bits — here we explicitly keep the max level per
    morton prefix."""
    k = _as_keys(keys_sorted)
    code = morton.key_morton(k)
    level = morton.key_level(k)
    with jax.enable_x64(True):
        nxt_code = jnp.concatenate([code[1:],
                                    code[-1:] ^ jnp.asarray(1, code.dtype)])
    nxt_level = jnp.concatenate([level[1:], level[-1:]])
    # sorted by (code, level): the last entry of each code run is deepest
    keep = (code != nxt_code) | (level > nxt_level)
    last = k.shape[0] - 1
    keep = keep.at[last].set(True)
    if n_valid is not None:
        keep = keep & (jnp.arange(k.shape[0]) < n_valid)
    return keep


# ----------------------------------------------------------------------
# Active-list filtering (`filter.hpp`)
# ----------------------------------------------------------------------

def in_frustum(m: octree.VoxelMap, pose, K, frame_hw):
    """bool[capacity]: block centre projects into the camera frustum
    (`filter.hpp:37-49`)."""
    import jax.numpy as jnp
    H, W = frame_hw
    bc = octree.block_coords_table(m).astype(jnp.float32)
    centers = (bc + 0.5) * (octree.BLOCK_SIDE * m.voxel_size)
    T_cw = jnp.linalg.inv(pose)
    cam = jnp.einsum("ij,nj->ni", T_cw[:3, :3], centers) + T_cw[:3, 3]
    hom = jnp.einsum("ij,nj->ni", K[:3, :3], cam)
    z = jnp.where(hom[:, 2] == 0, 1.0, hom[:, 2])
    px = hom[:, 0] / z
    py = hom[:, 1] / z
    return ((cam[:, 2] > 0) & (px >= 0) & (px < W) & (py >= 0) & (py < H))


def filter_blocks(m: octree.VoxelMap, *predicates):
    """bool[capacity] slots satisfying every predicate and live
    (`algorithms::filter` + variadic ``satisfies``, `filter.hpp:51-117`).
    Predicates are bool[capacity] arrays or callables of the map."""
    mask = octree.slot_mask(m)
    for p in predicates:
        mask = mask & (p(m) if callable(p) else p)
    return mask


def block_list(m: octree.VoxelMap, active_only: bool = False):
    """Block coordinates of live slots (``Octree::getBlockList``,
    `octree.hpp:858-895`).  Returns (coords int32[capacity, 3],
    mask bool[capacity])."""
    mask = octree.slot_mask(m)
    if active_only:
        mask = mask & m.active
    return octree.block_coords_table(m), mask
