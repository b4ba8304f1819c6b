"""Meshing tests: analytic-sphere surface extraction
(reference pattern: `se_core/test/` fixtures + `meshing.hpp` semantics)."""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import octree, meshing
from supereight_tpu.core.octree import ChannelSpec


def sphere_map(size=64, dim=4.8, radius=1.0):
    chans = (ChannelSpec(name="v", dtype=jnp.float32, init=1.0, empty=1.0),
             ChannelSpec(name="w", dtype=jnp.float32, init=0.0, empty=-1.0))
    m = octree.init(size, dim, chans, capacity=(size // 8) ** 3)
    r = np.arange(size // 8)
    bx, by, bz = np.meshgrid(r, r, r, indexing="ij")
    coords = np.stack([bx, by, bz], -1).reshape(-1, 3).astype(np.int32)
    m = octree.allocate_blocks(m, jnp.asarray(coords),
                               jnp.ones((coords.shape[0],), bool))
    vs = m.voxel_size
    g = np.arange(size)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    c = dim / 2
    sdf = np.sqrt((gx * vs - c) ** 2 + (gy * vs - c) ** 2
                  + (gz * vs - c) ** 2) - radius
    m = octree.set_voxels(m, "v", jnp.asarray(gx.ravel()),
                          jnp.asarray(gy.ravel()), jnp.asarray(gz.ravel()),
                          jnp.asarray(sdf.ravel(), dtype=jnp.float32))
    m = octree.set_voxels(m, "w", jnp.asarray(gx.ravel()),
                          jnp.asarray(gy.ravel()), jnp.asarray(gz.ravel()),
                          jnp.ones(size ** 3))
    return m


class TestMarchingCubes:
    def test_sphere_vertices_on_surface(self):
        m = sphere_map()
        tris = meshing.marching_cubes(m, "v")
        assert tris.shape[0] > 1000
        d = np.linalg.norm(tris.reshape(-1, 3) - 2.4, axis=-1)
        # linear interpolation on an exact SDF: vertices on the sphere
        assert np.abs(d - 1.0).max() < 0.02

    def test_unobserved_cells_skipped(self):
        m = sphere_map(size=32)
        # zero all weights -> reference skip rule (meshing.hpp:133-140)
        m = m.replace(voxels={**m.voxels,
                              "w": jnp.zeros_like(m.voxels["w"])})
        tris = meshing.marching_cubes(m, "v")
        assert tris.shape[0] == 0

    def test_empty_map_no_triangles(self):
        chans = (ChannelSpec(name="v", dtype=jnp.float32, init=1.0, empty=1.0),
                 ChannelSpec(name="w", dtype=jnp.float32, init=0.0, empty=-1.0))
        m = octree.init(32, 4.8, chans, capacity=64)
        tris = meshing.marching_cubes(m, "v")
        assert tris.shape[0] == 0
