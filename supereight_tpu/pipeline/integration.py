"""Allocation + projective map fusion: the TPU rebuild of integration().

Reference call stack (`DenseSLAMSystem.cpp:206-268`):
  buildAllocationList / buildOctantList -> Octree::allocate ->
  projective_map(sdf_update | bfusion_update).

TPU design (not a port):
* Allocation candidates: every pixel marches a fixed, data-independent step
  schedule along its ray band, yielding a dense [H*W, S, 3] candidate array +
  validity mask.  The reference's atomic list append + sort/unique
  (`kfusion/alloc_impl.hpp:54-118`, `octree.hpp:793-817`) is replaced by the
  dense-mask dedupe inside :func:`core.octree.allocate_blocks`.
* Fusion: one batched update over the whole block table
  ``[capacity, 512]`` — decode keys, compute camera-space voxel positions,
  project, gather depth, apply the field's update rule, masked by the active
  flags the reference maintains (`projective_functor.hpp:54-111`).  Per-block
  visibility re-derives the ``active`` flag exactly like ``update_block``'s
  ``is_visible`` (`projective_functor.hpp:73-111`).
* Node (coarse) updates: dense per-level arrays updated the same way
  (`projective_functor.hpp:113-137` samples each node's 8 child corners).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import octree
from supereight_tpu.core.octree import BLOCK_SIDE, BLOCK_VOXELS, VoxelMap


# ----------------------------------------------------------------------
# Allocation
# ----------------------------------------------------------------------

def band_allocation_coords(depth: jnp.ndarray, pose: jnp.ndarray,
                           K: jnp.ndarray, size: int, voxel_size: float,
                           band: float, num_steps: int):
    """Per-pixel voxel candidates in a +/- band/2 strip around the surface.

    Mirrors `kfusion/alloc_impl.hpp:73-113`: world vertex from depth, march
    ``num_steps`` equal steps of the band toward the camera side.  Returns
    (coords int32[H*W*num_steps, 3], valid bool[H*W*num_steps]).
    """
    H, W = depth.shape
    inv_K = jnp.linalg.inv(K)
    k_pose = pose @ inv_K

    x = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    y = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    d = depth
    # homogeneous pixel ray scaled by depth, mapped to world
    px = jnp.broadcast_to(x, (H, W)) * d
    py = jnp.broadcast_to(y, (H, W)) * d
    hom = jnp.stack([px, py, d, jnp.ones_like(d)], axis=-1)   # [H,W,4]
    world = jnp.einsum("ij,hwj->hwi", k_pose, hom)[..., :3]

    cam = pose[:3, 3]
    direction = cam[None, None, :] - world
    dn = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / jnp.maximum(dn, 1e-12)
    origin = world - (band * 0.5) * direction
    step = direction * (band / num_steps)

    t = jnp.arange(num_steps, dtype=jnp.float32).reshape(1, 1, num_steps, 1)
    pos = origin[:, :, None, :] + step[:, :, None, :] * t      # [H,W,S,3]
    vox = jnp.floor(pos / voxel_size).astype(jnp.int32)
    inb = ((vox >= 0) & (vox < size)).all(axis=-1)
    valid = inb & (d[..., None] > 0)
    return vox.reshape(-1, 3), valid.reshape(-1)


def allocate_sdf(m: VoxelMap, depth, pose, K, band: float,
                 num_steps: int) -> VoxelMap:
    coords, valid = band_allocation_coords(
        depth, pose, K, m.size, m.voxel_size, band, num_steps)
    return octree.allocate_blocks(m, coords >> octree.BLOCK_BITS, valid)


def ofusion_step_schedule(band: float, voxel_size: float, max_dist: float,
                          max_depth: int, block_level: int):
    """Host-side precomputation of the bfusion allocation march.

    The reference's adaptive step (`bfusion/alloc_impl.hpp:84-125`) depends
    only on distance travelled, never on data — so the (travelled, level)
    sequence is identical for every ray and can be tabulated statically.
    Returns (travelled float32[S], levels int32[S]).
    """
    travelled, levels = [], []
    t = 0.0
    stepsize = voxel_size
    tree_depth = max_depth
    while t < max_dist:
        travelled.append(t)
        levels.append(min(tree_depth, block_level))
        # post-step update, as alloc_impl.hpp:116-124
        half = band * 0.5
        if t < band:
            stepsize = voxel_size
        elif t < band + half:
            stepsize = 10.0 * voxel_size
        else:
            stepsize = 30.0 * voxel_size
        tree_depth = int(np.floor(np.log2(voxel_size / stepsize))) + max_depth
        t += stepsize
    return (np.asarray(travelled, np.float32), np.asarray(levels, np.int32))


def allocate_ofusion(m: VoxelMap, depth, pose, K, band: float,
                     schedule: Tuple[np.ndarray, np.ndarray]) -> VoxelMap:
    """Multi-scale occupancy allocation (`bfusion/alloc_impl.hpp:56-129`):
    march from behind the surface toward the camera, coarsening with
    distance; cells at/below block level become blocks, coarser ones flip
    the node-pyramid masks."""
    H, W = depth.shape
    travelled, levels = schedule
    S = travelled.shape[0]
    inv_K = jnp.linalg.inv(K)
    k_pose = pose @ inv_K

    x = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    y = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    d = depth
    hom = jnp.stack([jnp.broadcast_to(x, (H, W)) * d,
                     jnp.broadcast_to(y, (H, W)) * d, d,
                     jnp.ones_like(d)], axis=-1)
    world = jnp.einsum("ij,hwj->hwi", k_pose, hom)[..., :3]
    cam = pose[:3, 3]
    direction = cam[None, None, :] - world
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
    origin = world - (band * 0.5) * direction
    dist = jnp.linalg.norm(cam[None, None, :] - origin, axis=-1)   # [H,W]

    tt = jnp.asarray(travelled).reshape(1, 1, S, 1)
    pos = origin[:, :, None, :] + direction[:, :, None, :] * tt
    vox = jnp.floor(pos / m.voxel_size).astype(jnp.int32)
    inb = ((vox >= 0) & (vox < m.size)).all(axis=-1)
    valid = inb & (d[..., None] > 0) & (tt[..., 0] < dist[..., None])

    lv = jnp.broadcast_to(jnp.asarray(levels).reshape(1, 1, S), (H, W, S))
    return octree.allocate_octants(m, vox.reshape(-1, 3),
                                   lv.reshape(-1), valid.reshape(-1))


# ----------------------------------------------------------------------
# Projective fusion
# ----------------------------------------------------------------------

def _local_offsets():
    """Static [512, 3] voxel offsets inside a block, x-fastest
    (`node.hpp:140-165` ordering)."""
    i = jnp.arange(BLOCK_VOXELS, dtype=jnp.int32)
    return jnp.stack([i % BLOCK_SIDE, (i // BLOCK_SIDE) % BLOCK_SIDE,
                      i // (BLOCK_SIDE * BLOCK_SIDE)], axis=-1)


def _project(T_cw, K, pos_world):
    """World -> (camera pos, pixel coords + 0.5) as `projective_functor.hpp:88-101`."""
    pos_cam = jnp.einsum("ij,...j->...i", T_cw[:3, :3], pos_world) + T_cw[:3, 3]
    hom = jnp.einsum("ij,...j->...i", K[:3, :3], pos_cam)
    z = hom[..., 2]
    zsafe = jnp.where(z == 0, 1.0, z)
    pix = jnp.stack([hom[..., 0] / zsafe + 0.5, hom[..., 1] / zsafe + 0.5],
                    axis=-1)
    return pos_cam, pix


def _pixel_valid(pix, pos_cam, frame_hw):
    H, W = frame_hw
    return ((pos_cam[..., 2] >= 1e-4)
            & (pix[..., 0] >= 0.5) & (pix[..., 0] <= W - 1.5)
            & (pix[..., 1] >= 0.5) & (pix[..., 1] <= H - 1.5))


def _sample_depth(depth, pix, valid):
    """Nearest depth sample at int(pixel), like `mapping_impl.hpp:41-42`."""
    H, W = depth.shape
    ix = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
    d = depth[iy, ix]
    return jnp.where(valid, d, 0.0)


def integrate(m: VoxelMap, field, depth: jnp.ndarray, pose: jnp.ndarray,
              K: jnp.ndarray, timestamp=0.0) -> VoxelMap:
    """Fuse one depth frame into the map (projective_map equivalent).

    Updates every allocated+active block's 512 voxels and every allocated
    node-pyramid cell, then refreshes block ``active`` flags from visibility
    (`projective_functor.hpp:73-137`).
    """
    T_cw = jnp.linalg.inv(pose)
    voxel_size = m.voxel_size

    # ---- blocks ----
    bc = octree.block_coords_table(m)                  # [cap, 3] block coords
    base_voxel = (bc * BLOCK_SIDE).astype(jnp.float32)
    offs = _local_offsets().astype(jnp.float32)        # [512, 3]
    # voxel corner positions in world space (pix * voxel_size, functor :88-95)
    pos_world = (base_voxel[:, None, :] + offs[None, :, :]) * voxel_size
    pos_cam, pix = _project(T_cw, K, pos_world)        # [cap,512,3], [cap,512,2]

    live = octree.slot_mask(m) & m.active              # [cap]
    pvalid = _pixel_valid(pix, pos_cam, depth.shape) & live[:, None]
    dsample = _sample_depth(depth, pix, pvalid)

    data = {name: arr for name, arr in m.voxels.items()}
    new_data = field.update(data, pos_cam, dsample, pvalid, timestamp)
    voxels = {name: jnp.where(live[:, None], new_data[name], data[name])
              for name in data}

    # visibility refresh (`projective_functor.hpp:96-111`): a block stays
    # active iff any voxel projected into the frame
    visible = jnp.any(_pixel_valid(pix, pos_cam, depth.shape), axis=1)
    active = jnp.where(octree.slot_mask(m) & m.active, visible, m.active)

    m = m.replace(voxels=voxels, active=active)

    # ---- node pyramid (`projective_functor.hpp:113-137`) ----
    node_values = list(m.node_values)
    for level in range(1, m.block_level + 1):
        s = 1 << level
        side_vox = m.size // s
        g = jnp.arange(s, dtype=jnp.float32)
        gx, gy, gz = jnp.meshgrid(g, g, g, indexing="ij")
        corners = jnp.stack([gx, gy, gz], axis=-1) * (side_vox * voxel_size)
        pos_cam_n, pix_n = _project(T_cw, K, corners)
        ok = _pixel_valid(pix_n, pos_cam_n, depth.shape) & m.node_alloc[level]
        ds = _sample_depth(depth, pix_n, ok)
        vals = dict(m.node_values[level])
        new_vals = field.update(vals, pos_cam_n, ds, ok, timestamp)
        node_values[level] = {
            name: jnp.where(m.node_alloc[level], new_vals[name], vals[name])
            for name in vals}
    return m.replace(node_values=node_values)
