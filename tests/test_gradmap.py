"""Gradient-table tests: build_table vs the raycaster's 6-tap central
difference, sample() semantics, and the stored-normals raycast path.

Reference bar: normals from `volume.grad` at each raycast hit
(`rendering.cpp:75-84`); here the gradient is precomputed per voxel at
integration time (gradmap.py) and must agree with `_grad6` over the
NaN-encoded packed view everywhere — including brick faces (neighbour
bricks), unallocated neighbours, invalid (weight==0) voxels, and the
volume boundary.
"""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import octree
from supereight_tpu.fields import make_field
from supereight_tpu.pipeline import camera, gradmap, raycast

DIM = 4.8
SIZE = 64
VS = DIM / SIZE
H, W = 48, 64
K4 = np.asarray([40.0, 40.0, W / 2.0, H / 2.0], np.float32)


def _random_map(seed=0, n_blocks=40, invalid_frac=0.1):
    """Sparse random SDF map: random live blocks (some adjacent), random
    tsdf values, a sprinkling of weight==0 (invalid) voxels."""
    field = make_field("sdf", mu=0.3)
    m = octree.init(SIZE, DIM, field.channels, capacity=256)
    rng = np.random.default_rng(seed)
    B = SIZE // 8
    wanted = np.zeros((B, B, B), bool)
    pts = rng.integers(0, B, (n_blocks, 3))
    wanted[pts[:, 0], pts[:, 1], pts[:, 2]] = True
    # force some face-adjacent pairs so cross-brick taps are exercised
    wanted[2, 3, 3] = wanted[3, 3, 3] = wanted[3, 4, 3] = True
    wanted[3, 3, 4] = True
    # and a volume-corner block for boundary clamping
    wanted[0, 0, 0] = wanted[B - 1, B - 1, B - 1] = True
    m = octree.allocate_block_mask(m, jnp.asarray(wanted))

    n = int(m.n_blocks)
    vals = rng.uniform(-1.0, 1.0, (m.capacity, 512)).astype(np.float32)
    w = (rng.uniform(0, 1, (m.capacity, 512)) > invalid_frac).astype(
        np.float32)
    vox = dict(m.voxels)
    vox["tsdf"] = jnp.asarray(vals)
    vox["weight"] = jnp.asarray(w)
    m = m.replace(voxels=vox)
    assert n >= 40
    return m, field


class TestBuildTable:
    def test_matches_grad6_everywhere(self):
        """Stored per-voxel gradient == _grad6 at every live voxel centre
        (same bf16-view precision), including faces and invalid taps."""
        m, field = _random_map()
        table = np.asarray(gradmap.build_table(m, field).astype(jnp.float32))
        dense = raycast.pack_view(m, field)

        bc = np.asarray(octree.block_coords_table(m))
        n = int(m.n_blocks)
        # sample a mix of interior and face voxels from several bricks
        rng = np.random.default_rng(1)
        slots = rng.integers(0, n, 12)
        cols = np.concatenate([rng.integers(0, 512, 40),
                               np.arange(0, 512, 37)])
        for s in slots:
            base = bc[s] * 8
            lx, ly, lz = cols % 8, (cols // 8) % 8, cols // 64
            vox = np.stack([base[0] + lx, base[1] + ly, base[2] + lz], -1)
            pos_world = (vox + 0.5) * VS
            ref = np.asarray(raycast._grad6(
                m, dense, field, jnp.asarray(pos_world, jnp.float32)))
            got = table[s, cols, :3]
            np.testing.assert_allclose(got, ref, atol=5e-3)

    def test_value_component_matches_view(self):
        """The F component equals the NaN-encoded packed view."""
        m, field = _random_map(seed=3)
        table = np.asarray(gradmap.build_table(m, field).astype(jnp.float32))
        tiled = np.asarray(raycast.pack_view(m, field)["F"].astype(
            jnp.float32))
        bc = np.asarray(octree.block_coords_table(m))
        B = SIZE // 8
        n = int(m.n_blocks)
        for s in range(0, n, 3):
            row = (bc[s, 0] * B + bc[s, 1]) * B + bc[s, 2]
            np.testing.assert_array_equal(np.isnan(table[s, :, 3]),
                                          np.isnan(tiled[row]))
            ok = ~np.isnan(tiled[row])
            np.testing.assert_allclose(table[s, ok, 3], tiled[row][ok],
                                       atol=5e-3)

    def test_sample_unallocated_and_oob(self):
        m, field = _random_map(seed=4)
        table = gradmap.build_table(m, field)
        # a voxel position inside an unallocated block and one out of volume
        bi = np.asarray(m.block_index)
        ub = np.argwhere(bi < 0)[0]
        pos = jnp.asarray([[ub[0] * 8 + 4.5, ub[1] * 8 + 4.5,
                            ub[2] * 8 + 4.5],
                           [-3.0, 5.0, 5.0]], jnp.float32)
        g, F, ok = gradmap.sample(m, table, pos)
        assert not bool(ok[0]) and not bool(ok[1])
        assert np.all(np.asarray(g) == 0)
        assert np.all(np.isnan(np.asarray(F)))


class TestStoredNormalsRaycast:
    def test_wall_normals_and_depth(self):
        """Stored-normals raycast on an analytic wall: hit depth matches
        the wall, normals follow the SDF convention (negated gradient;
        sdf increases toward the camera here, so normal z is +1 — same
        convention as TestCrossingExactness in test_raycast)."""
        # reuse the wall fixture from test_raycast
        from tests.test_raycast import _front_view, _wall_map
        m, field = _wall_map()
        view, pose = _front_view()
        rc = raycast.raycast(m, field, view, H, W, 0.1, 8.0,
                             normals="stored")
        v = np.asarray(rc.vertex)
        nrm = np.asarray(rc.normal)
        t = np.asarray(rc.t_hit)
        hit = t > 0
        assert hit[H // 2 - 8:H // 2 + 8, W // 2 - 8:W // 2 + 8].all()
        zs = v[..., 2][hit]
        np.testing.assert_allclose(zs, 3.0, atol=1.5 * VS)
        np.testing.assert_allclose(nrm[hit][:, 2], 1.0, atol=0.05)

    def test_matches_volume_normals_on_hits(self):
        """Where both paths hit, stored normals equal the 6-tap volume
        normals (same taps, precomputed)."""
        from tests.test_raycast import _front_view, _wall_map
        m, field = _wall_map()
        view, _ = _front_view()
        rv = raycast.raycast(m, field, view, H, W, 0.1, 8.0,
                             normals="volume")
        rs = raycast.raycast(m, field, view, H, W, 0.1, 8.0,
                             normals="stored")
        hv = np.asarray(rv.t_hit) > 0
        hs = np.asarray(rs.t_hit) > 0
        both = hv & hs
        assert both.sum() > 0.8 * hv.sum()
        nv = np.asarray(rv.normal)[both]
        ns = np.asarray(rs.normal)[both]
        # normals agree (up to bf16 table rounding)
        np.testing.assert_allclose(ns, nv, atol=0.05)
        # hit depths agree to within a refine step
        np.testing.assert_allclose(np.asarray(rs.t_hit)[both],
                                   np.asarray(rv.t_hit)[both], atol=0.1)


class TestPlaneRefine:
    def test_wall_depth_matches_secant(self):
        """refine='plane' (gather-free stored-normal plane intersection)
        vs the secant re-solve, at a resolution that triggers the
        half-res fine scan (W>=160).  On a planar wall both re-solves
        are exact, so depths/normals must agree and land on the wall."""
        from tests.test_raycast import _wall_map
        m, field = _wall_map()
        Hr, Wr = 120, 160
        k = jnp.asarray([100.0, 100.0, Wr / 2.0, Hr / 2.0], jnp.float32)
        pose = jnp.eye(4).at[:3, 3].set(
            jnp.asarray([DIM / 2, DIM / 2, 0.6]))
        view = pose @ camera.inverse_camera_matrix(k)
        rs = raycast.raycast(m, field, view, Hr, Wr, 0.1, 8.0,
                             normals="stored", refine="secant")
        rp = raycast.raycast(m, field, view, Hr, Wr, 0.1, 8.0,
                             normals="stored", refine="plane")
        hs = np.asarray(rs.t_hit) > 0
        hp = np.asarray(rp.t_hit) > 0
        both = hs & hp
        assert both.sum() > 0.9 * hs.sum()
        # the plane solve is exact on a planar SDF: vertices sit on the wall
        vz = np.asarray(rp.vertex)[..., 2][both]
        np.testing.assert_allclose(vz, 3.0, atol=VS)
        np.testing.assert_allclose(np.asarray(rp.t_hit)[both],
                                   np.asarray(rs.t_hit)[both], atol=0.06)
        np.testing.assert_allclose(np.asarray(rp.normal)[both][:, 2], 1.0,
                                   atol=0.05)


class TestStoredPipeline:
    def test_icp_tracks_with_stored_normals(self):
        """End-to-end: the fused pipeline with raycast_normals='stored'
        tracks a small synthetic orbit (pose error stays tiny)."""
        from supereight_tpu.config import Configuration
        from supereight_tpu.io.synthetic import orbit_poses, render_depth
        from supereight_tpu.pipeline import DenseSLAMSystem

        H_, W_ = 60, 80
        k = np.asarray([60.0 * W_ / 160, 60.0 * H_ / 120,
                        W_ / 2.0, H_ / 2.0], np.float32)
        poses = orbit_poses(8, 4.8, sweep=0.06)
        depths = np.stack([
            np.asarray(render_depth(jnp.asarray(p), jnp.asarray(k),
                                    4.8, H_, W_)) for p in poses])
        depths = np.clip(depths * 1000, 0, 65535).astype(np.uint16)
        cfg = Configuration(volume_resolution=(128,) * 3,
                            volume_size=(4.8,) * 3,
                            pyramid=(4, 3, 2), integration_rate=1,
                            block_capacity=4096,
                            raycast_normals="stored")
        slam = DenseSLAMSystem((H_, W_), cfg)
        slam.setPose(poses[0])
        assert slam.state.grad is not None
        for i in range(8):
            st = slam.step(depths[i], k, i)
        assert bool(st.tracked)
        err = np.asarray(st.pose)[:3, 3] - poses[-1][:3, 3]
        # same gate as TestSDFPipeline.test_tracking_converges (the volume
        # path lands at ~0.095 on this sequence, stored at ~0.091: parity)
        assert np.linalg.norm(err) < 0.1
