"""Distributed allocation: image-sharded band march + collective key
exchange + owner-local slot assignment.

The multi-device allocation protocol (SURVEY.md section 2.4 north star,
VERDICT r1 item 4):

1. each device marches the allocation rays of ITS strip of the depth image
   (the reference's per-pixel ``buildAllocationList`` split across devices);
2. the per-device partial block-request masks are OR-combined with ONE
   collective (``psum`` of the bool mask over the mesh) — the "all-gather of
   newly allocated keys": afterwards every device knows every requested
   block, exactly like the reference's shared allocation list;
3. each device then bump-allocates ONLY the requested blocks inside its own
   Morton-range slab into its own slot range (``octree.allocate_block_mask``
   with ``partitions == n_devices``) — no cross-device slot contention, and
   the per-slot table updates (keys / bricks / active) land on the shard
   that owns them.

Equality with the single-device allocator is tested in
tests/test_sharding.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from supereight_tpu.pipeline import integration

MAP_AXIS = "map"


def sharded_sdf_wanted_mask(mesh: Mesh, H: int, W: int, *, size: int,
                            dim: float, band: float, axis: str = MAP_AXIS):
    """Returns ``mask_fn(depth, pose, K) -> bool[B,B,B]`` where the band
    march runs sharded over image-row strips and the partial masks merge
    with one psum (step 1+2 of the protocol).

    Full-resolution rays (decim=1) so the strip split cannot change the
    result: the OR of per-strip masks equals the full-frame mask exactly.
    """
    n_dev = mesh.devices.size
    if H % n_dev:
        raise ValueError(f"image height {H} not divisible by {n_dev}")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=P(),
    )
    def mask_fn(depth_strip, pose, K):
        row0 = jax.lax.axis_index(axis) * (H // n_dev)
        partial = integration.sdf_wanted_mask(
            depth_strip, pose, K, size=size, dim=dim, band=band, decim=1,
            row0=row0)
        # ONE collective: every device learns every newly requested block
        return jax.lax.psum(partial.astype(jnp.int32), axis) > 0

    return mask_fn
