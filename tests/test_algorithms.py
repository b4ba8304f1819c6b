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
