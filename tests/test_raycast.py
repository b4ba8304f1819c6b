"""Raycast unit tests: splat bounds, fine-scan crossing exactness, tiled
packed-view equivalence.

Complements the end-to-end checks in test_pipeline.py with the
reference-style analytic strategy (SURVEY.md section 4): hand-built maps
with known surfaces, closed-form expectations.
"""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import octree
from supereight_tpu.fields import make_field
from supereight_tpu.pipeline import camera, experimental, raycast

DIM = 4.8
SIZE = 64
VS = DIM / SIZE
H, W = 48, 64
K4 = np.asarray([40.0, 40.0, W / 2.0, H / 2.0], np.float32)


def _wall_map(wall_z=3.0, mu=0.3):
    """A z = wall_z wall fused into an SDF map (band allocated + written)."""
    field = make_field("sdf", mu=mu)
    m = octree.init(SIZE, DIM, field.channels, capacity=1024)
    # allocate the band around the wall
    zb0 = int((wall_z - mu) / VS / 8)
    zb1 = int((wall_z + mu) / VS / 8) + 1
    B = SIZE // 8
    wanted = jnp.zeros((B, B, B), bool).at[:, :, zb0:zb1 + 1].set(True)
    m = octree.allocate_block_mask(m, wanted)

    def write(vals, coords):
        z = (coords[..., 2].astype(jnp.float32) + 0.5) * VS
        sdf = jnp.clip((wall_z - z) / mu, -1.0, 1.0)
        return {"tsdf": sdf, "weight": jnp.ones_like(sdf)}

    m = octree.axis_aligned_map(m, write)
    return m, field


def _front_view():
    """Camera at z=0.6 looking along +z (centred in x/y)."""
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([DIM / 2, DIM / 2, 0.6]))
    return pose @ camera.inverse_camera_matrix(jnp.asarray(K4)), pose


class TestTiledView:
    def test_pack_tiled_matches_pack_dense(self):
        m, field = _wall_map()
        tiled = np.asarray(octree.pack_tiled(m, "tsdf"))
        dense = np.asarray(octree.pack_dense(m, "tsdf"))
        B = SIZE // 8
        rng = np.random.default_rng(0)
        pts = rng.integers(0, SIZE, (200, 3))
        for x, y, z in pts:
            row = (x // 8 * B + y // 8) * B + z // 8
            col = (x % 8) + (y % 8) * 8 + (z % 8) * 64
            assert tiled[row, col] == dense[x, y, z]

    def test_sample_volume_tiled_equals_dense(self):
        m, field = _wall_map()
        view = raycast.pack_view(m, field)     # tiled for SDF
        assert view["F"].ndim == 2
        dense3 = np.asarray(octree.pack_dense(m, "tsdf"))
        rng = np.random.default_rng(1)
        pos = jnp.asarray(rng.uniform(0, SIZE, (500, 3)), jnp.float32)
        got, _ = raycast._sample_volume(view["F"], pos, SIZE, jnp.nan)
        v = np.floor(np.asarray(pos)).astype(int)
        want = dense3[v[:, 0], v[:, 1], v[:, 2]]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-2)


class TestMultiscaleView:
    def test_pack_view_matches_dense_multiscale_semantics(self):
        """The occupancy pack_view (compact-table NaN-encode + one bf16
        row scatter + per-cell node fill) must sample like the dense
        multiscale build: leaf values where allocated+fused, node values
        through unallocated space, NaN where unobserved."""
        field = make_field("ofusion", mu=0.05)
        m = octree.init(SIZE, DIM, field.channels, capacity=256)
        # a coarse allocated octant with fused node values
        m = octree.allocate_octants(m, jnp.asarray([[32, 0, 0]], jnp.int32),
                                    jnp.asarray([2]), jnp.ones((1,), bool))
        lvl = 2
        nv = dict(m.node_values[lvl])
        nv["occupancy"] = jnp.where(m.node_alloc[lvl], -4.0,
                                    nv["occupancy"])
        nv["timestamp"] = jnp.where(m.node_alloc[lvl], 2.0, nv["timestamp"])
        node_values = list(m.node_values)
        node_values[lvl] = nv
        m = m.replace(node_values=node_values)
        # leaf blocks with mixed fused/unfused voxels
        m = octree.allocate_blocks(m, jnp.asarray([[0, 0, 0], [1, 2, 1]]),
                                   jnp.ones((2,), bool))

        def fill(vals, coords):
            z = coords[..., 2]
            occ = jnp.where(z % 2 == 0, 3.0, -1.0)
            ts = jnp.where(coords[..., 0] % 2 == 0, 1.0, 0.0)
            return {"occupancy": occ, "timestamp": ts}

        m = octree.axis_aligned_map(m, fill)
        view = raycast.pack_view(m, field)
        assert view["F"].ndim == 2

        dd = {c.name: octree.pack_dense_multiscale(m, c.name)
              .astype(jnp.float32) for c in m.channels}
        want = np.asarray(jnp.where(field.sample_valid(dd),
                                    dd["occupancy"], jnp.nan))
        rng = np.random.default_rng(3)
        pts = rng.integers(0, SIZE, (400, 3))
        pos = jnp.asarray(pts + 0.5, jnp.float32)
        got, _ = raycast._sample_volume(view["F"], pos, SIZE, jnp.nan)
        got = np.asarray(got)
        w = want[pts[:, 0], pts[:, 1], pts[:, 2]]
        np.testing.assert_array_equal(np.isnan(got), np.isnan(w))
        ok = ~np.isnan(w)
        np.testing.assert_allclose(got[ok], w[ok], rtol=1e-2)


class TestSplatBounds:
    def test_start_bounds_bracket_the_wall(self):
        m, field = _wall_map(wall_z=3.0)
        view, pose = _front_view()
        tmin, tmax, g = raycast._splat_bounds(m, field, view, H, W,
                                              0.4, 4.0)
        tmin = np.asarray(tmin)
        tmax = np.asarray(tmax)
        # central cells: the camera is 2.4 m from the wall; the splatted
        # window must start before it and end after it
        c = tmin[tmin.shape[0] // 2, tmin.shape[1] // 2]
        assert np.isfinite(c)
        assert c <= 2.4
        assert tmax[tmax.shape[0] // 2, tmax.shape[1] // 2] >= 2.4
        # and not absurdly early (the wall band is only ~2 blocks thick)
        assert c >= 2.4 - 1.5

    def test_empty_map_has_no_bounds(self):
        field = make_field("sdf", mu=0.3)
        m = octree.init(SIZE, DIM, field.channels, capacity=256)
        view, _ = _front_view()
        tmin, tmax, g = raycast._splat_bounds(m, field, view, H, W,
                                              0.4, 4.0)
        assert not np.isfinite(np.asarray(tmin)).any()


class TestCrossingExactness:
    def test_linear_solve_recovers_plane_depth(self):
        """The fine scan + solve must localize a planar surface to well
        under a voxel (the band is linear by construction)."""
        m, field = _wall_map(wall_z=3.0, mu=0.3)
        view, pose = _front_view()
        rc = raycast.raycast(m, field, view, H, W, 0.4, 4.0)
        t = np.asarray(rc.t_hit)
        hit = t > 0
        assert hit.mean() > 0.9
        # central pixel ray is axis-aligned: depth = 3.0 - 0.6 = 2.4
        err = abs(t[H // 2, W // 2] - 2.4)
        assert err < 0.5 * VS, f"center depth error {err:.4f} m"
        # reference convention: SDF normals are the NEGATED gradient
        # (`rendering.cpp:80-82`); sdf increases toward the camera here, so
        # the normal points +z (matching vertex2normal's winding on the
        # input side — ICP only needs the two conventions to agree)
        n = np.asarray(rc.normal)
        assert n[H // 2, W // 2, 2] > 0.9

    def test_coarse_stride_midsolve_recovers_depth(self):
        """scan_stride=1.0 halves the scan samples; the half-res secant
        midsolve must pull the crossing estimate back to canonical-stride
        accuracy (the coarse linear solve alone can sit ~stride/2 off,
        between truncation-clamped samples)."""
        m, field = _wall_map(wall_z=3.0, mu=0.3)
        view, pose = _front_view()
        rc_c = raycast.raycast(m, field, view, H, W, 0.4, 4.0,
                               scan_stride=1.0, midsolve=False)
        rc_m = raycast.raycast(m, field, view, H, W, 0.4, 4.0,
                               scan_stride=1.0, midsolve=True)
        t_c = np.asarray(rc_c.t_hit)
        t_m = np.asarray(rc_m.t_hit)
        assert (t_m > 0).mean() > 0.9
        err_c = abs(t_c[H // 2, W // 2] - 2.4)
        err_m = abs(t_m[H // 2, W // 2] - 2.4)
        assert err_m < 0.5 * VS, f"midsolve depth error {err_m:.4f} m"
        assert err_m <= err_c + 1e-6

    def test_unobserved_gap_does_not_cross(self):
        """Weight-0 voxels between the camera and the wall must not
        produce crossings (`rendering_impl.hpp:49-53` skip semantics)."""
        m, field = _wall_map(wall_z=3.0, mu=0.3)
        # zero out the weights of the front half of the band: those voxels
        # become unobserved; the crossing must survive behind them only if
        # a valid outside sample precedes it -> the far band half alone
        # has no outside->inside pair, so rays must MISS
        def clear(vals, coords):
            z = (coords[..., 2].astype(jnp.float32) + 0.5) * VS
            w = jnp.where(z < 3.06, 0.0, vals["weight"])
            return {"tsdf": vals["tsdf"], "weight": w}
        m2 = octree.axis_aligned_map(m, clear)
        view, _ = _front_view()
        rc = raycast.raycast(m2, field, view, H, W, 0.4, 4.0)
        assert (np.asarray(rc.t_hit) > 0).mean() < 0.05


class TestWarpMaps:
    """Forward-warp of reference maps (`experimental.warp_maps`) — a
    measured-negative tracking variant quarantined to
    pipeline/experimental.py; the kernel itself must stay correct (it is
    still useful for free-view preview rendering)."""

    def _make_maps(self, H=48, W=64):
        fx, fy, cx, cy = 50.0, 50.0, W / 2.0, H / 2.0
        k = jnp.asarray([fx, fy, cx, cy], jnp.float32)
        jj, ii = np.meshgrid(np.arange(W), np.arange(H))
        d = 2.0 + 0.3 * np.sin(ii * 0.2) * np.cos(jj * 0.15)
        x = (jj - cx) / fx * d
        y = (ii - cy) / fy * d
        pc = np.stack([x, y, d], axis=-1).astype(np.float32)
        # camera pose: small rotation + translation
        tw = np.deg2rad(4.0)
        R = np.array([[np.cos(tw), 0, np.sin(tw)],
                      [0, 1, 0],
                      [-np.sin(tw), 0, np.cos(tw)]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = [0.3, -0.1, 0.2]
        vw = pc @ R.T + T[:3, 3]
        nw = np.tile(np.asarray(-R[:, 2], np.float32), (H, W, 1))
        return (jnp.asarray(vw), jnp.asarray(nw), jnp.asarray(T), k, H, W)

    def test_identity_warp_reproduces_maps(self):
        vw, nw, T, k, H, W = self._make_maps()
        view = camera.camera_matrix(k) @ camera.inverse_pose(T)
        wv, wn = experimental.warp_maps(vw, nw, view, H, W)
        np.testing.assert_allclose(np.asarray(wv), np.asarray(vw),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(wn), np.asarray(nw),
                                   atol=1e-6)

    def test_shifted_warp_properties(self):
        vw, nw, T, k, H, W = self._make_maps()
        # mark a block of source pixels invalid: they must never appear
        nw = nw.at[10:14, 20:30, 0].set(-2.0)
        T2 = np.asarray(T).copy()
        T2[:3, 3] += [0.05, 0.02, -0.04]
        view = camera.camera_matrix(k) @ camera.inverse_pose(jnp.asarray(T2))
        wv, wn = experimental.warp_maps(vw, nw, view, H, W)
        wv_n, wn_n = np.asarray(wv), np.asarray(wn)
        valid = wn_n[..., 0] != -2.0
        assert valid.mean() > 0.7
        # every valid output row is an exact copy of some valid source row
        src = np.concatenate([np.asarray(vw), np.asarray(nw)],
                             axis=-1).reshape(-1, 6)
        src_valid = src[src[:, 3] != -2.0]
        out = np.concatenate([wv_n, wn_n], axis=-1)[valid]
        # match via lookup on the vertex triplet
        import collections
        pool = collections.Counter(map(tuple, src_valid.round(5)))
        for row in out.round(5):
            assert tuple(row) in pool
        # winners reproject to their own pixel under the NEW view
        Kv = np.asarray(camera.camera_matrix(k))
        Ti = np.asarray(camera.inverse_pose(jnp.asarray(T2)))
        pc = (wv_n[valid] @ Ti[:3, :3].T + Ti[:3, 3]) @ Kv[:3, :3].T
        px = np.floor(pc[:, 0] / pc[:, 2] + 0.5).astype(int)
        py = np.floor(pc[:, 1] / pc[:, 2] + 0.5).astype(int)
        iy, ix = np.nonzero(valid)
        assert (px == ix).all() and (py == iy).all()


def test_trilinear_sampler_matches_octree_interp():
    """The tiled-view trilinear sampler (`_sample_volume_interp`, the
    reference's volume.interp used by `refine="interp"`) must match
    octree.interp on a fully-observed analytic field, and blend the init
    value for NaN (weight==0) taps."""
    import numpy as np
    import jax.numpy as jnp
    from supereight_tpu.core import octree
    from supereight_tpu.fields import make_field
    from supereight_tpu.pipeline.raycast import (_sample_volume_interp,
                                                 pack_view)

    field = make_field("sdf", mu=0.1)
    m = octree.init(32, 3.2, field.channels, capacity=128)
    # allocate everything and write f(x,y,z) = 0.01*(x + 2y + 3z) - 0.5
    m = octree.allocate_block_mask(
        m, jnp.ones((m.blocks_per_edge,) * 3, bool))

    def setf(vals, coords):
        c = coords.astype(jnp.float32)
        vals["tsdf"] = 0.01 * (c[..., 0] + 2 * c[..., 1]
                               + 3 * c[..., 2]) - 0.5
        vals["weight"] = jnp.ones_like(vals["weight"])
        return vals

    m = octree.axis_aligned_map(m, setf)
    dense = pack_view(m, field)["F"]

    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(1.0, 30.0, (50, 3)), jnp.float32)
    ref = octree.interp(m, "tsdf", pos)
    got = _sample_volume_interp(dense, pos, 32, nan_sub=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3)  # bf16 view rounding

    # NaN taps (weight==0) blend the init value: zero all weights and
    # sample -> exactly nan_sub

    def zerow(vals, coords):
        vals["weight"] = jnp.zeros_like(vals["weight"])
        return vals

    m2 = octree.axis_aligned_map(m, zerow)
    dense2 = pack_view(m2, field)["F"]
    got2 = _sample_volume_interp(dense2, pos[:4], 32, nan_sub=1.0)
    np.testing.assert_allclose(np.asarray(got2), 1.0, atol=1e-6)
