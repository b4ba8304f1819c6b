"""Key-list algorithm tests (reference `se_core/test/algorithms` +
`alloc_unittest.cpp` patterns: random Morton samples, dedup invariants)."""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import algorithms, morton


class TestUnique:
    def test_unique_counts(self):
        keys = jnp.asarray(np.array([1, 1, 2, 5, 5, 5, 9], np.uint32))
        mask, count = algorithms.unique(keys)
        assert int(count) == 4
        np.testing.assert_array_equal(
            np.asarray(mask), [True, False, True, True, False, False, True])

    def test_random_roundtrip(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1000, 256).astype(np.uint32)
        s = algorithms.sort_keys(jnp.asarray(vals))
        mask, count = algorithms.unique(s)
        assert int(count) == len(np.unique(vals))


class TestFilterAncestors:
    def test_parent_dropped(self):
        max_depth = 6
        # key at level 2 and a descendant at level 4 with same prefix
        parent = morton.key_encode(jnp.asarray([8]), jnp.asarray([0]),
                                   jnp.asarray([0]), 2, max_depth)
        child = morton.key_encode(jnp.asarray([10]), jnp.asarray([2]),
                                  jnp.asarray([1]), 4, max_depth)
        keys = algorithms.sort_keys(jnp.concatenate([parent, child]))
        keep = algorithms.filter_ancestors(keys, max_depth)
        # exactly one dropped (the ancestor), deepest kept
        assert int(keep.sum()) == 1


class TestUniqueMultiscale:
    def test_deepest_level_wins(self):
        max_depth = 6
        x = jnp.asarray([16])
        k2 = morton.key_encode(x, x, x, 2, max_depth)
        k3 = morton.key_encode(x, x, x, 3, max_depth)
        keys = algorithms.sort_keys(jnp.concatenate([k2, k3]))
        keep = algorithms.unique_multiscale(keys, max_depth)
        kept = np.asarray(keys)[np.asarray(keep)]
        levels = [int(morton.key_level(jnp.asarray([k]))[0]) for k in kept]
        assert 3 in levels and len(kept) >= 1


class TestKeys64:
    """List-space algebra on uint64 keys (>512^3 volumes)."""

    def test_sort_unique_64(self):
        max_depth = 11
        rng = np.random.default_rng(5)
        xyz = rng.integers(0, 2048, size=(128, 3)).astype(np.uint32)
        k = morton.key_encode(xyz[:, 0], xyz[:, 1], xyz[:, 2], 8, max_depth)
        both = jnp.concatenate([k, k])          # every key duplicated
        s = algorithms.sort_keys(both)
        assert s.dtype == jnp.uint64
        mask, count = algorithms.unique(s)
        assert int(count) == len(np.unique(np.asarray(k)))

    def test_filter_ancestors_64(self):
        max_depth = 11
        parent = morton.key_encode(jnp.asarray([1536]), jnp.asarray([0]),
                                   jnp.asarray([0]), 2, max_depth)
        child = morton.key_encode(jnp.asarray([1600]), jnp.asarray([64]),
                                  jnp.asarray([32]), 6, max_depth)
        keys = algorithms.sort_keys(jnp.concatenate([parent, child]))
        keep = algorithms.filter_ancestors(keys, max_depth)
        assert int(keep.sum()) == 1

    def test_unique_multiscale_64(self):
        max_depth = 11
        x = jnp.asarray([1024])
        k2 = morton.key_encode(x, x, x, 2, max_depth)
        k3 = morton.key_encode(x, x, x, 3, max_depth)
        keys = algorithms.sort_keys(jnp.concatenate([k2, k3]))
        keep = algorithms.unique_multiscale(keys, max_depth)
        kept = np.asarray(keys)[np.asarray(keep)]
        levels = [int(morton.key_level(jnp.asarray([k]))[0]) for k in kept]
        assert 3 in levels


class TestActiveListFilter:
    """`algorithms::filter` / `in_frustum` / `getBlockList` parity
    (`filter.hpp:37-117`, `octree.hpp:858-895`)."""

    def _map(self):
        from supereight_tpu.core import octree
        from supereight_tpu.core.octree import ChannelSpec, BLOCK_SIDE
        m = octree.init(64, 4.8, (ChannelSpec("v", jnp.float32, 0.0, 0.0),),
                        capacity=64)
        # two blocks: one in front of the camera, one behind it
        coords = jnp.asarray([[4, 4, 6], [4, 4, 0]], jnp.int32)
        m = octree.allocate_blocks(m, coords, jnp.asarray([True, True]))
        return m

    def _camera(self):
        # camera at volume centre looking along +z
        pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([2.4, 2.4, 2.4]))
        K = jnp.asarray([[60.0, 0, 40, 0], [0, 60.0, 30, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32)
        return pose, K

    def test_in_frustum(self):
        m = self._map()
        pose, K = self._camera()
        mask = np.asarray(algorithms.in_frustum(m, pose, K, (60, 80)))
        live = np.asarray(__import__("supereight_tpu.core.octree",
                                     fromlist=["slot_mask"]).slot_mask(m))
        # the +z block is visible, the behind-camera block is not
        assert mask[live][0] != mask[live][1]
        assert mask[live].sum() == 1

    def test_filter_blocks_composes_predicates(self):
        m = self._map()
        pose, K = self._camera()
        frustum = algorithms.in_frustum(m, pose, K, (60, 80))
        mask = algorithms.filter_blocks(m, frustum,
                                        lambda mm: mm.active)
        live = int(mask.sum())
        assert live == 1
        # a predicate that rejects everything wins
        none = algorithms.filter_blocks(m, frustum,
                                        jnp.zeros(m.capacity, bool))
        assert int(none.sum()) == 0

    def test_block_list(self):
        from supereight_tpu.core import octree
        m = self._map()
        coords, mask = algorithms.block_list(m)
        got = set(map(tuple, np.asarray(coords)[np.asarray(mask)].tolist()))
        assert got == {(4, 4, 6), (4, 4, 0)}
        # active_only intersects with the active flags
        m2 = m.replace(active=jnp.zeros_like(m.active))
        _, mask2 = algorithms.block_list(m2, active_only=True)
        assert int(mask2.sum()) == 0
