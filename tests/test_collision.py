"""Collision query tests (reference: `se_core/test/geometry/
octree_collision_unittest.cpp` semantics: status on allocated/unseen/empty
regions)."""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import collision, octree
from supereight_tpu.core.collision import CollisionStatus
from supereight_tpu.core.octree import ChannelSpec

CHANS = (ChannelSpec(name="tsdf", dtype=jnp.float32, init=1.0, empty=1.0),
         ChannelSpec(name="weight", dtype=jnp.float32, init=0.0, empty=-1.0))


def make_map_with_wall():
    """Map with a seen wall at x in [16, 20) (occupied), seen free space
    x in [8, 16), everything else unallocated."""
    m = octree.init(64, 4.8, CHANS, capacity=512)
    r = np.arange(1, 3)   # blocks x=1..2 -> voxels 8..24
    bx, by, bz = np.meshgrid(r, np.arange(8), np.arange(8), indexing="ij")
    coords = np.stack([bx, by, bz], -1).reshape(-1, 3).astype(np.int32)
    m = octree.allocate_blocks(m, jnp.asarray(coords),
                               jnp.ones((coords.shape[0],), bool))

    def fill(vals, coords):
        x = coords[..., 0]
        inside = (x >= 16) & (x < 20)
        seen = (x >= 8) & (x < 20)     # x in [20,24): allocated, never fused
        tsdf = jnp.where(inside, -0.5, 1.0)
        weight = jnp.where(seen, 10.0, 0.0)
        return {"tsdf": tsdf, "weight": weight}

    return octree.axis_aligned_map(m, fill)


class TestAABB:
    def test_overlap(self):
        assert bool(collision.aabb_aabb_collision(
            jnp.array([0, 0, 0]), jnp.array([4, 4, 4]),
            jnp.array([3, 3, 3]), jnp.array([2, 2, 2])))
        assert not bool(collision.aabb_aabb_collision(
            jnp.array([0, 0, 0]), jnp.array([4, 4, 4]),
            jnp.array([5, 0, 0]), jnp.array([2, 2, 2])))

    def test_inclusion(self):
        assert bool(collision.aabb_aabb_inclusion(
            jnp.array([0, 0, 0]), jnp.array([10, 10, 10]),
            jnp.array([2, 2, 2]), jnp.array([3, 3, 3])))
        assert not bool(collision.aabb_aabb_inclusion(
            jnp.array([0, 0, 0]), jnp.array([10, 10, 10]),
            jnp.array([8, 8, 8]), jnp.array([3, 3, 3])))


class TestCollidesWith:
    def test_occupied_region(self):
        m = make_map_with_wall()
        st = int(collision.collides_with(m, (17, 2, 2), (2, 2, 2),
                                         collision.sdf_collision_test))
        assert st == CollisionStatus.occupied

    def test_empty_region(self):
        m = make_map_with_wall()
        st = int(collision.collides_with(m, (9, 2, 2), (4, 4, 4),
                                         collision.sdf_collision_test))
        assert st == CollisionStatus.empty

    def test_unseen_region(self):
        m = make_map_with_wall()
        # unallocated space far from the wall
        st = int(collision.collides_with(m, (40, 40, 40), (4, 4, 4),
                                         collision.sdf_collision_test))
        assert st == CollisionStatus.unseen

    def test_mixed_prefers_occupied(self):
        m = make_map_with_wall()
        # box spanning empty + occupied -> occupied wins (update_status)
        st = int(collision.collides_with(m, (12, 2, 2), (8, 4, 4),
                                         collision.sdf_collision_test))
        assert st == CollisionStatus.occupied

    def test_allocated_but_unseen(self):
        m = make_map_with_wall()
        # allocated blocks exist at x in [20, 24) with weight 0 -> unseen
        st = int(collision.collides_with(m, (21, 2, 2), (2, 2, 2),
                                         collision.sdf_collision_test))
        assert st == CollisionStatus.unseen


class TestOFusionPredicate:
    def test_ofusion_collision_status(self):
        """Occupancy-field collision predicate (log-odds > 0 = occupied,
        fused free space = empty, timestamp 0 = unseen)."""
        OCH = (ChannelSpec(name="occupancy", dtype=jnp.float32,
                           init=0.0, empty=0.0),
               ChannelSpec(name="timestamp", dtype=jnp.float32,
                           init=0.0, empty=0.0))
        m = octree.init(64, 4.8, OCH, capacity=128)
        coords = np.stack(np.meshgrid(np.arange(1, 3), [0], [0],
                                      indexing="ij"), -1).reshape(-1, 3)
        m = octree.allocate_blocks(m, jnp.asarray(coords, jnp.int32),
                                   jnp.ones((coords.shape[0],), bool))

        def fill(vals, coords):
            x = coords[..., 0]
            occ = jnp.where((x >= 16) & (x < 20), 5.0, -5.0)
            ts = jnp.where((x >= 8) & (x < 20), 3.0, 0.0)
            return {"occupancy": occ, "timestamp": ts}

        m = octree.axis_aligned_map(m, fill)
        occ = int(collision.collides_with(m, (17, 2, 2), (2, 2, 2),
                                          collision.ofusion_collision_test))
        emp = int(collision.collides_with(m, (9, 2, 2), (2, 2, 2),
                                          collision.ofusion_collision_test))
        uns = int(collision.collides_with(m, (21, 2, 2), (2, 2, 2),
                                          collision.ofusion_collision_test))
        assert occ == int(CollisionStatus.occupied)
        assert emp == int(CollisionStatus.empty)
        assert uns == int(CollisionStatus.unseen)
