"""VoxelMap core tests with a scalar fake field type.

Mirrors the reference's central testing pattern (`se_core/test/`): a trivial
scalar voxel (`alloc_unittest.cpp:34-39`), synthetic allocation fixtures, and
analytic-field interpolation checks (`interpolation_unittest.cpp:45-90`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supereight_tpu.core import octree
from supereight_tpu.core.octree import BLOCK_SIDE, ChannelSpec


SCALAR = (ChannelSpec(name="v", dtype=jnp.float32, init=0.0, empty=-100.0),)


def make_map(size=64, dim=4.0, capacity=None):
    return octree.init(size, dim, SCALAR, capacity=capacity)


def alloc_voxels(m, coords):
    coords = jnp.asarray(coords, jnp.int32)
    return octree.allocate_blocks(
        m, coords >> 3, jnp.ones((coords.shape[0],), bool))


class TestAllocation:
    def test_basic_alloc_and_fetch(self):
        m = make_map()
        m = alloc_voxels(m, [[0, 0, 0], [17, 3, 9], [63, 63, 63]])
        assert int(m.n_blocks) == 3
        assert int(octree.fetch(m, 0, 0, 0)) >= 0
        assert int(octree.fetch(m, 7, 7, 7)) == int(octree.fetch(m, 0, 0, 0))
        assert int(octree.fetch(m, 17, 3, 9)) >= 0
        assert int(octree.fetch(m, 8, 0, 0)) == -1
        assert int(octree.fetch(m, 64, 0, 0)) == -1  # out of bounds
        assert int(octree.fetch(m, -1, 0, 0)) == -1

    def test_duplicate_keys_dedupe(self):
        m = make_map()
        coords = jnp.zeros((100, 3), jnp.int32) + 16
        m = octree.allocate_blocks(m, coords >> 3, jnp.ones((100,), bool))
        assert int(m.n_blocks) == 1

    def test_realloc_is_noop(self):
        m = make_map()
        m = alloc_voxels(m, [[16, 16, 16]])
        m = octree.set_voxels(m, "v", jnp.array([16]), jnp.array([16]),
                              jnp.array([16]), jnp.array([7.0]))
        m2 = alloc_voxels(m, [[16, 16, 16], [32, 0, 0]])
        assert int(m2.n_blocks) == 2
        assert float(octree.get(m2, "v", 16, 16, 16)) == 7.0

    def test_capacity_overflow_drops(self):
        m = make_map(capacity=2)
        coords = jnp.array([[0, 0, 0], [8, 0, 0], [16, 0, 0], [24, 0, 0]],
                           jnp.int32)
        m = octree.allocate_blocks(m, coords >> 3, jnp.ones((4,), bool))
        assert int(m.n_blocks) == 2
        assert int(m.overflow) == 2
        assert int(octree.fetch(m, 16, 0, 0)) == -1

    def test_random_morton_roundtrip_via_keys(self):
        rng = np.random.default_rng(3)
        coords = rng.integers(0, 64, (50, 3)).astype(np.int32)
        m = alloc_voxels(make_map(), coords)
        table = np.asarray(octree.block_coords_table(m))
        n = int(m.n_blocks)
        got = set(map(tuple, table[:n]))
        want = set(map(tuple, np.unique(coords >> 3, axis=0)))
        assert got == want

    def test_keys_under_jit(self):
        @jax.jit
        def go(m, coords):
            return octree.allocate_blocks(
                m, coords >> 3, jnp.ones((coords.shape[0],), bool))
        m = go(make_map(), jnp.array([[1, 2, 3], [40, 50, 60]], jnp.int32))
        assert int(m.n_blocks) == 2


class TestGetSet:
    def test_set_get_roundtrip(self):
        m = alloc_voxels(make_map(), [[5, 6, 7]])
        m = octree.set_voxels(m, "v", jnp.array([5]), jnp.array([6]),
                              jnp.array([7]), jnp.array([3.5]))
        assert float(octree.get(m, "v", 5, 6, 7)) == 3.5
        # untouched voxel in same block has init value
        assert float(octree.get(m, "v", 5, 6, 6)) == 0.0

    def test_get_unallocated_is_empty(self):
        m = make_map()
        assert float(octree.get(m, "v", 10, 10, 10)) == -100.0

    def test_set_unallocated_dropped(self):
        m = make_map()
        m = octree.set_voxels(m, "v", jnp.array([10]), jnp.array([10]),
                              jnp.array([10]), jnp.array([9.0]))
        assert float(octree.get(m, "v", 10, 10, 10)) == -100.0

    def test_multiscale_fallback(self):
        m = make_map(size=64)
        # allocate a coarse octant at level 1 (side 32) covering the origin;
        # its value slots live at child granularity (level 2), matching the
        # reference Node::value_[8] layout (node.hpp:45-87)
        coords = jnp.array([[0, 0, 0]], jnp.int32)
        m = octree.allocate_octants(m, coords, jnp.array([1]),
                                    jnp.ones((1,), bool))
        assert bool(m.node_alloc[2][0, 0, 0])
        assert bool(m.node_alloc[2][1, 1, 1])  # whole sibling group marked
        nv = dict(m.node_values[2])
        nv["v"] = nv["v"].at[0, 0, 0].set(42.0)
        node_values = list(m.node_values)
        node_values[2] = nv
        m = m.replace(node_values=node_values)
        assert float(octree.get_multiscale(m, "v", 3, 3, 3)) == 42.0
        # outside the allocated coarse octant -> empty
        assert float(octree.get_multiscale(m, "v", 40, 3, 3)) == -100.0
        # leaf data wins over coarse
        m = alloc_voxels(m, [[1, 1, 1]])
        m = octree.set_voxels(m, "v", jnp.array([1]), jnp.array([1]),
                              jnp.array([1]), jnp.array([5.0]))
        assert float(octree.get_multiscale(m, "v", 1, 1, 1)) == 5.0


def analytic(x, y, z):
    # Same spirit as interpolation_unittest.cpp:45-47: f = z^2 + sin(2x + y)
    return z * z + jnp.sin(2.0 * x + y)


class TestInterp:
    @pytest.fixture
    def field_map(self):
        m = make_map(size=64)
        # allocate a 2-block-thick shell and fill with the analytic field
        vx, vy, vz = jnp.meshgrid(jnp.arange(16, 32), jnp.arange(16, 32),
                                  jnp.arange(16, 32), indexing="ij")
        vx, vy, vz = vx.ravel(), vy.ravel(), vz.ravel()
        coords = jnp.stack([vx, vy, vz], -1).astype(jnp.int32)
        m = alloc_voxels(m, coords)
        m = octree.set_voxels(m, "v", vx, vy, vz,
                              analytic(vx.astype(jnp.float32),
                                       vy.astype(jnp.float32),
                                       vz.astype(jnp.float32)))
        return m

    def test_interp_at_voxel_centers_exact(self, field_map):
        pos = jnp.array([[20.0, 20.0, 20.0], [25.0, 18.0, 30.0]])
        vals = octree.interp(field_map, "v", pos)
        want = analytic(pos[:, 0], pos[:, 1], pos[:, 2])
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want),
                                   rtol=1e-5)

    def test_interp_matches_manual_trilinear(self, field_map):
        pos = jnp.array([[20.3, 21.7, 24.9]])
        got = float(octree.interp(field_map, "v", pos)[0])
        # manual trilinear
        import itertools
        base = np.array([20, 21, 24])
        f = np.array([0.3, 0.7, 0.9])
        want = 0.0
        for dx, dy, dz in itertools.product([0, 1], repeat=3):
            w = ((f[0] if dx else 1 - f[0]) * (f[1] if dy else 1 - f[1])
                 * (f[2] if dz else 1 - f[2]))
            want += w * float(analytic(base[0] + dx, base[1] + dy,
                                       base[2] + dz))
        assert abs(got - want) < 1e-4

    def test_interp_across_block_boundary(self, field_map):
        # 23.5 -> corners straddle blocks (23 in block 2, 24 in block 3)
        pos = jnp.array([[23.5, 23.5, 23.5]])
        got = float(octree.interp(field_map, "v", pos)[0])
        want = float(analytic(23.5, 23.5, 23.5))
        assert abs(got - want) < 0.3  # trilinear truncation error only

    def test_grad_matches_reference_formula(self, field_map):
        # Numpy reimplementation of the reference grad (`octree.hpp:566-737`):
        # trilinear blend of per-corner central differences, * 0.5*dim/size.
        m = field_map
        pos = np.array([22.4, 24.6, 26.2])
        base = np.floor(pos).astype(int)
        f = pos - base
        want = np.zeros(3)
        import itertools
        fld = lambda c: float(analytic(float(c[0]), float(c[1]), float(c[2])))
        for axis in range(3):
            acc = 0.0
            for dx, dy, dz in itertools.product([0, 1], repeat=3):
                w = ((f[0] if dx else 1 - f[0]) * (f[1] if dy else 1 - f[1])
                     * (f[2] if dz else 1 - f[2]))
                c = base + np.array([dx, dy, dz])
                hi = c.copy(); hi[axis] += 1
                lo = c.copy(); lo[axis] -= 1
                acc += w * (fld(hi) - fld(lo))
            want[axis] = acc * 0.5 * m.dim / m.size
        g = np.asarray(octree.grad(m, "v", jnp.asarray(pos)[None]))[0]
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)

    def test_grad_smooth_field_direction(self, field_map):
        # For the z^2 part the gradient must point along +z with value ~2z
        m = field_map
        pos = jnp.array([[20.1, 20.1, 25.5]])
        g = np.asarray(octree.grad(m, "v", pos))[0]
        scale = m.dim / m.size
        assert abs(g[2] - 2 * 25.5 * scale) < 0.1


class TestCounts:
    def test_counts(self):
        m = alloc_voxels(make_map(), [[0, 0, 0], [8, 8, 8]])
        assert int(octree.leaves_count(m)) == 2
        assert int(octree.nodes_count(m)) == 2


class TestInterpMultiscale:
    def test_falls_back_to_node_values(self):
        m = make_map(size=64)
        coords = jnp.array([[0, 0, 0]], jnp.int32)
        m = octree.allocate_octants(m, coords, jnp.array([1]),
                                    jnp.ones((1,), bool))
        nv = dict(m.node_values[2])
        nv["v"] = jnp.full_like(nv["v"], 7.0)
        node_values = list(m.node_values)
        node_values[2] = nv
        m = m.replace(node_values=node_values)
        # interior of the coarse octant, no leaf blocks anywhere
        got = float(octree.interp_multiscale(
            m, "v", jnp.asarray([[5.5, 5.5, 5.5]]))[0])
        assert got == 7.0

    def test_matches_leaf_interp_when_allocated(self):
        m = alloc_voxels(make_map(), [[8, 8, 8]])
        m = octree.set_voxels(m, "v", jnp.array([9]), jnp.array([9]),
                              jnp.array([9]), jnp.array([4.0]))
        pos = jnp.asarray([[9.0, 9.0, 9.0]])
        a = float(octree.interp(m, "v", pos)[0])
        b = float(octree.interp_multiscale(m, "v", pos)[0])
        assert a == b

    def test_volume_facade_exposes_it(self):
        """Volume.interp_multiscale: the metric-space entry point (the
        reference's interp descends coarse octants via interp_gather)."""
        from supereight_tpu.core.volume import Volume
        m = alloc_voxels(make_map(), [[8, 8, 8]])
        m = octree.set_voxels(m, "v", jnp.array([9]), jnp.array([9]),
                              jnp.array([9]), jnp.array([4.0]))
        vol = Volume(m, "v")
        pos_m = jnp.asarray([[9.0, 9.0, 9.0]]) * m.voxel_size
        a = float(vol.interp(pos_m)[0])
        b = float(vol.interp_multiscale(pos_m)[0])
        assert a == b


class TestUnpackDense:
    def test_pack_unpack_roundtrip(self):
        """unpack_dense inverts pack_dense on live blocks (the dense-edit
        write-back path, e.g. for axis-aligned bulk edits done in dense
        space)."""
        m = alloc_voxels(make_map(), [[0, 0, 0], [16, 8, 24], [40, 40, 40]])
        rng = np.random.default_rng(6)
        vox = dict(m.voxels)
        vox["v"] = jnp.asarray(rng.standard_normal(vox["v"].shape),
                               jnp.float32)
        m = m.replace(voxels=vox)
        dense = octree.pack_dense(m, "v")
        # perturb the dense volume, write back, re-pack: values must match
        dense2 = dense * 2.0
        m2 = octree.unpack_dense(m, "v", dense2)
        live = np.asarray(octree.slot_mask(m))
        a = np.asarray(m2.voxels["v"])[live]
        b = np.asarray(m.voxels["v"])[live] * 2.0
        np.testing.assert_allclose(a, b, rtol=1e-6)
        # voxel-level spot check through the dense round trip
        assert float(octree.get(m2, "v", 17, 9, 25)) == \
            float(dense2[17, 9, 25])


class TestPackTiledMultiscale:
    def test_matches_pack_dense_multiscale(self):
        """The tiled multiscale view (per-block node show-through + leaf
        row scatter) must read identically to the dense multiscale build
        at every voxel."""
        m = make_map(size=64)
        # node-level values at two levels
        m = octree.allocate_octants(m, jnp.array([[0, 0, 0], [32, 0, 16]],
                                                 jnp.int32),
                                    jnp.array([1, 2]), jnp.ones((2,), bool))
        for level, val in [(1, 3.0), (2, -7.0)]:
            nv = dict(m.node_values[level])
            nv["v"] = jnp.where(m.node_alloc[level],
                                jnp.float32(val), nv["v"])
            node_values = list(m.node_values)
            node_values[level] = nv
            m = m.replace(node_values=node_values)
        # plus some leaf blocks with brick data (overlapping octant 1)
        m = alloc_voxels(m, [[0, 0, 0], [8, 16, 8], [48, 48, 48]])
        rng = np.random.default_rng(2)
        vox = dict(m.voxels)
        vox["v"] = jnp.asarray(rng.standard_normal(vox["v"].shape),
                               jnp.float32)
        m = m.replace(voxels=vox)

        dense = np.asarray(octree.pack_dense_multiscale(m, "v"))
        tiled = np.asarray(octree.pack_tiled_multiscale(m, "v"))
        B = m.blocks_per_edge
        pts = rng.integers(0, 64, (500, 3))
        for x, y, z in pts:
            row = (x // 8 * B + y // 8) * B + z // 8
            col = (x % 8) + (y % 8) * 8 + (z % 8) * 64
            assert tiled[row, col] == dense[x, y, z], (x, y, z)


class TestLargeMapStructural:
    def test_2048_map_allocates_and_reads(self):
        """2048^3 maps (the multi-host BASELINE config) work structurally:
        block keys carry 8 bits/axis here (<=10-bit cap), the dense index
        is 256^3, and allocation/get round-trip."""
        from supereight_tpu.core.octree import ChannelSpec
        m = octree.init(2048, 19.2,
                        (ChannelSpec("v", jnp.float32, 0.0, 0.0),),
                        capacity=64)
        coords = jnp.asarray([[0, 0, 0], [255, 255, 255], [100, 7, 200]],
                             jnp.int32)
        m = octree.allocate_blocks(m, coords, jnp.ones(3, bool))
        assert int(m.n_blocks) == 3
        m = octree.set_voxels(m, "v", jnp.asarray([2047]),
                              jnp.asarray([2047]), jnp.asarray([2047]),
                              jnp.asarray([5.0]))
        assert float(octree.get(m, "v", jnp.asarray([2047]),
                                jnp.asarray([2047]),
                                jnp.asarray([2047]))[0]) == 5.0
        # key decode round-trips at the far corner
        bc = np.asarray(octree.block_coords_table(m))
        live = np.asarray(octree.slot_mask(m))
        assert {tuple(c) for c in bc[live]} == \
            {(0, 0, 0), (255, 255, 255), (100, 7, 200)}
