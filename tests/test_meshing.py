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


class TestMeshFidelity:
    """Quantified parity vs the reference MC's semantics (VERDICT r2
    item 8): the redesigned tetrahedral mesher must reproduce the same
    isosurface — measured as surface distance, coverage (no holes), and
    total area against the analytic sphere the SDF encodes
    (`meshing.hpp:159-208` extracts the identical zero crossing)."""

    def test_sphere_distance_coverage_area(self):
        radius = 1.0
        m = sphere_map(radius=radius)
        vs = m.voxel_size
        tris = np.asarray(meshing.marching_cubes(m, "v"))
        assert tris.shape[0] > 1000
        v = tris.reshape(-1, 3) - 2.4

        # (1) surface distance: RMS well under voxel/2, max under voxel
        d = np.abs(np.linalg.norm(v, axis=-1) - radius)
        assert np.sqrt((d ** 2).mean()) < 0.5 * vs
        assert d.max() < vs

        # (2) coverage: every patch of the analytic sphere has mesh
        # geometry within one voxel (no holes).  1k quasi-uniform samples.
        rng = np.random.default_rng(0)
        p = rng.standard_normal((1000, 3))
        p *= radius / np.linalg.norm(p, axis=-1, keepdims=True)
        centers = tris.mean(axis=1) - 2.4
        d2 = ((p[:, None, :] - centers[None]) ** 2).sum(-1)
        assert np.sqrt(d2.min(axis=1)).max() < vs

        # (3) area parity: tetrahedral triangulations of a smooth surface
        # approximate its area (the reference MC extracts the same
        # isosurface; triangulation density differs, area must not)
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
        sphere_area = 4.0 * np.pi * radius ** 2
        assert abs(area - sphere_area) / sphere_area < 0.05
