"""Collision queries: AABB tests against the voxel map (planning hook).

Reference: `se_core/include/se/geometry/aabb_collision.hpp:36-74` (axis
half-plane tests) and `octree_collision.hpp:40-172` (stack traversal over
the octree returning occupied / unseen / empty with the priority state
machine empty < unseen < occupied).

TPU design: the stack traversal collapses to a batched evaluation — every
voxel of the box is classified in one vectorized pass (occupied wins over
unseen wins over empty, i.e. a max-reduce over an ordered status code),
with unallocated regions consulting the node pyramid exactly like the
reference's "child == NULL -> test(parent value)" fallback.
"""

from __future__ import annotations

from enum import IntEnum
from typing import Callable

import jax.numpy as jnp

from . import octree
from .octree import VoxelMap


class CollisionStatus(IntEnum):
    """Priority-ordered status (update_status, `octree_collision.hpp:49-66`)."""
    empty = 0
    unseen = 1
    occupied = 2


def axis_overlap(a, a_edge, b, b_edge):
    """Half-plane interval overlap (`aabb_collision.hpp:36-50`)."""
    ac = a + a_edge / 2
    bc = b + b_edge / 2
    return jnp.abs(bc - ac) <= (a_edge + b_edge) / 2


def aabb_aabb_collision(a, a_edge, b, b_edge):
    """AABB overlap test; int voxel boxes ([..,3])."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a_edge = jnp.asarray(a_edge)
    b_edge = jnp.asarray(b_edge)
    hits = [axis_overlap(a[..., i], a_edge[..., i], b[..., i], b_edge[..., i])
            for i in range(3)]
    return hits[0] & hits[1] & hits[2]


def aabb_aabb_inclusion(a, a_edge, b, b_edge):
    """Box a strictly contains box b (`aabb_collision.hpp:67-74`)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a_edge = jnp.asarray(a_edge)
    b_edge = jnp.asarray(b_edge)
    ok = [( a[..., i] < b[..., i])
          & ((a[..., i] + a_edge[..., i]) > (b[..., i] + b_edge[..., i]))
          for i in range(3)]
    return ok[0] & ok[1] & ok[2]


def collides_with(m: VoxelMap, bbox, side,
                  test: Callable[[dict], jnp.ndarray]) -> jnp.ndarray:
    """Collision status of the axis-aligned box [bbox, bbox+side) (voxels).

    ``test`` maps a dict of channel values to a CollisionStatus code array
    (e.g. SDF: occupied if x < 0 and seen, empty if x > 0 and seen, unseen
    otherwise).  Parity with `octree_collision.hpp:107-171`: allocated
    voxels use leaf data; unallocated space consults the deepest allocated
    node value; wholly unallocated space is unseen.
    Returns an int32 scalar CollisionStatus code.
    """
    bbox = jnp.asarray(bbox, jnp.int32)
    side = jnp.asarray(side, jnp.int32)
    # static iteration bounds: clamp the query box to <= map size
    import numpy as np
    side_c = np.asarray(side)
    nx, ny, nz = (int(min(int(v), m.size)) for v in side_c)
    xs = bbox[0] + jnp.arange(nx)
    ys = bbox[1] + jnp.arange(ny)
    zs = bbox[2] + jnp.arange(nz)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")

    slot = octree.fetch(m, gx, gy, gz)
    leaf_vals = {c.name: octree.get(m, c.name, gx, gy, gz)
                 for c in m.channels}
    node_vals = {c.name: octree.get_multiscale(m, c.name, gx, gy, gz)
                 for c in m.channels}

    # node-pyramid coverage at any level?
    covered = slot >= 0
    for level in range(1, m.block_level + 1):
        shift = m.max_depth - level
        s = 1 << level
        oxc = jnp.clip(gx >> shift, 0, s - 1)
        oyc = jnp.clip(gy >> shift, 0, s - 1)
        ozc = jnp.clip(gz >> shift, 0, s - 1)
        covered = covered | m.node_alloc[level][oxc, oyc, ozc]

    leaf_status = test(leaf_vals).astype(jnp.int32)
    node_status = test(node_vals).astype(jnp.int32)
    status = jnp.where(slot >= 0, leaf_status, node_status)
    status = jnp.where(covered, status,
                       jnp.int32(CollisionStatus.unseen))
    inb = (gx >= 0) & (gx < m.size) & (gy >= 0) & (gy < m.size) \
        & (gz >= 0) & (gz < m.size)
    status = jnp.where(inb, status, jnp.int32(CollisionStatus.unseen))
    return jnp.max(status)


def sdf_collision_test(vals):
    """Canonical SDF test: seen & inside -> occupied; seen & outside ->
    empty; unseen (weight <= 0) -> unseen."""
    seen = vals["weight"] > 0
    inside = vals["tsdf"] < 0
    return jnp.where(~seen, jnp.int32(CollisionStatus.unseen),
                     jnp.where(inside, jnp.int32(CollisionStatus.occupied),
                               jnp.int32(CollisionStatus.empty)))


def ofusion_collision_test(vals):
    seen = vals["timestamp"] > 0
    inside = vals["occupancy"] > 0
    return jnp.where(~seen, jnp.int32(CollisionStatus.unseen),
                     jnp.where(inside, jnp.int32(CollisionStatus.occupied),
                               jnp.int32(CollisionStatus.empty)))
