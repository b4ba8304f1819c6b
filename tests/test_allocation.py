"""Exact-allocation parity tests.

Compares the vectorized per-pixel marches (`pipeline/integration.py`
allocate_sdf / allocate_ofusion) against a direct scalar transcription of
the reference algorithms (`kfusion/alloc_impl.hpp:54-118`,
`bfusion/alloc_impl.hpp:56-129`) run in numpy, on a small synthetic frame.
The block SETS must match (VERDICT r1 item 3: the old conservative octant
superset inflated the table ~2x at depth edges).
"""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import octree
from supereight_tpu.core.octree import BLOCK_SIDE, ChannelSpec
from supereight_tpu.fields import make_field
from supereight_tpu.io.synthetic import orbit_poses, render_depth
from supereight_tpu.pipeline import camera, integration

H, W = 60, 80
K4 = np.array([60.0 * W / 160, 60.0 * H / 120, W / 2.0, H / 2.0], np.float32)
DIM = 4.8
SIZE = 64


def _frame():
    pose = orbit_poses(3, DIM, sweep=0.05)[1]
    depth = np.asarray(render_depth(jnp.asarray(pose), jnp.asarray(K4), DIM,
                                    H, W))
    return depth.astype(np.float32), pose


def _reference_sdf_march(depth, pose, K, size, voxel_size, band):
    """Scalar transcription of buildAllocationList semantics."""
    inv_vs = 1.0 / voxel_size
    invK = np.linalg.inv(K)
    kpose = pose @ invK
    cam = pose[:3, 3]
    n_steps = int(np.ceil(band * inv_vs))
    blocks = set()
    for y in range(H):
        for x in range(W):
            d = depth[y, x]
            if d <= 0:
                continue
            v = kpose @ np.array([(x + 0.5) * d, (y + 0.5) * d, d, 1.0])
            vertex = v[:3]
            direction = cam - vertex
            direction = direction / np.linalg.norm(direction)
            origin = vertex - 0.5 * band * direction
            step = direction * (band / n_steps)
            p = origin.copy()
            for _ in range(n_steps):
                vox = np.floor(p * inv_vs)
                if np.all(vox >= 0) and np.all(vox < size):
                    blocks.add(tuple((vox.astype(int) // BLOCK_SIDE)))
                p += step
    return blocks


def _block_set(m):
    idx = np.asarray(m.block_index)
    return set(map(tuple, np.argwhere(idx >= 0).tolist()))


class TestExactSDFAllocation:
    def test_matches_reference_march(self):
        depth, pose = _frame()
        field = make_field("sdf", mu=0.2)
        m = octree.init(SIZE, DIM, field.channels, capacity=4096)
        K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
        band = field.alloc_band()
        m = integration.allocate_sdf(m, jnp.asarray(depth),
                                     jnp.asarray(pose), jnp.asarray(K), band)
        ours = _block_set(m)
        ref = _reference_sdf_march(depth, pose, K, SIZE, DIM / SIZE, band)
        # the 2x-decimated march may miss corner-grazing sliver blocks whose
        # band intersection is touched by a single skipped ray (documented
        # in allocate_sdf); bounded to a few % and never inflating
        missing = ref - ours
        extra = ours - ref
        # (64^3 blocks are 0.6 m here, so the sliver rate is far higher than
        # at production resolutions; 256^3 bench scenes measure ~1%)
        assert len(missing) <= max(8, 0.06 * len(ref)), \
            f"{len(missing)} missing of {len(ref)}: {sorted(missing)[:5]}"
        # ours samples the same segments: no inflation beyond the reference
        assert len(extra) <= max(2, 0.05 * len(ref)), \
            f"{len(extra)} extra vs {len(ref)}"

    def test_no_depth_edge_inflation(self):
        """A half-near / half-far depth edge must not allocate the space
        between the two surfaces (the old octant min/max test did)."""
        depth = np.full((H, W), 1.2, np.float32)
        depth[:, W // 2:] = 3.4
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [DIM / 2, DIM / 2, 0.2]
        field = make_field("sdf", mu=0.2)
        m = octree.init(SIZE, DIM, field.channels, capacity=4096)
        K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
        band = field.alloc_band()
        m = integration.allocate_sdf(m, jnp.asarray(depth),
                                     jnp.asarray(pose), jnp.asarray(K), band)
        ours = _block_set(m)
        ref = _reference_sdf_march(depth, pose, K, SIZE, DIM / SIZE, band)
        assert len(ref - ours) == 0
        assert len(ours) <= 1.2 * len(ref)


class TestExactOFusionAllocation:
    def test_zones_allocated(self):
        depth, pose = _frame()
        field = make_field("ofusion", mu=0.05, voxel_size=DIM / SIZE)
        m = octree.init(SIZE, DIM, field.channels, capacity=4096)
        K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
        m = integration.allocate_ofusion(m, jnp.asarray(depth),
                                         jnp.asarray(pose), jnp.asarray(K),
                                         field.alloc_band())
        # surface blocks exist
        assert int(m.n_blocks) > 20
        # free space toward the camera is covered by coarse octants
        # (node_alloc levels below the block level are populated)
        coarse = sum(int(np.asarray(a).sum()) for a in m.node_alloc[1:-1])
        assert coarse > 0

    def test_free_space_on_ray(self):
        """Every sample along a central ray from camera to surface must be
        covered at some level (the reference marches the whole ray)."""
        depth, pose = _frame()
        field = make_field("ofusion", mu=0.05, voxel_size=DIM / SIZE)
        m = octree.init(SIZE, DIM, field.channels, capacity=4096)
        K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
        m = integration.allocate_ofusion(m, jnp.asarray(depth),
                                         jnp.asarray(pose), jnp.asarray(K),
                                         field.alloc_band())
        cam = pose[:3, 3]
        d = float(depth[H // 2, W // 2])
        invK = np.linalg.inv(K)
        v = (pose @ invK @ np.array([(W / 2) * d, (H / 2) * d, d, 1.0]))[:3]
        direction = (v - cam) / np.linalg.norm(v - cam)
        vs = DIM / SIZE
        node_alloc = [np.asarray(a) for a in m.node_alloc]
        bidx = np.asarray(m.block_index)
        t = 0.5
        dist = np.linalg.norm(v - cam)
        while t < dist - 0.7:   # up to just before the band
            p = cam + t * direction
            vox = np.floor(p / vs).astype(int)
            covered = False
            if np.all(vox >= 0) and np.all(vox < SIZE):
                if bidx[tuple(vox // BLOCK_SIDE)] >= 0:
                    covered = True
                for level in range(1, len(node_alloc)):
                    s = SIZE >> level   # octant side at this level...
                    oc = tuple(vox >> (int(np.log2(SIZE)) - level))
                    if node_alloc[level][oc]:
                        covered = True
                assert covered, f"uncovered free-space sample at t={t:.2f}"
            t += 0.5


class TestOFusionCoarseStride:
    # 128^3 here so the ray grid is undecimated (decim == 1) and the
    # coarse zones actually stride (at 64^3 decim == 2 disables striding)
    S128 = 128

    def _masks(self, **kw):
        depth, pose = _frame()
        field = make_field("ofusion", mu=0.05, voxel_size=DIM / self.S128)
        m = octree.init(self.S128, DIM, field.channels, capacity=4096)
        K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
        return integration.ofusion_wanted_masks(
            m, jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K),
            field.alloc_band(), **kw)

    def test_coarse_stride_near_lossless(self):
        """Stride-2 coarse-zone ray decimation: per-level masks are
        subsets of the full-ray march, the block level is identical
        (zone 1 is never strided), and coarse coverage stays
        near-complete."""
        exact = self._masks(coarse_stride=False)
        dec = self._masks()
        strode = False
        for lvl, (e, s) in enumerate(zip(exact, dec)):
            e = np.asarray(e)
            s = np.asarray(s)
            assert not (s & ~e).any(), f"level {lvl} inflated"
            if lvl == len(exact) - 1:
                np.testing.assert_array_equal(e, s)  # zone 1 untouched
            elif e.any():
                strode = strode or s.sum() < e.sum()
                # coarse octants are 2-4x a block: a sliver can be grazed
                # only by skipped rays, same class as the SDF decimation
                assert s.sum() >= 0.85 * e.sum(), \
                    f"level {lvl}: {int(s.sum())}/{int(e.sum())}"
        assert strode, "no level actually strided; test scale wrong"

    def test_phase_union_recovers_exact(self):
        """The 4 dither phases' union reproduces the full-ray march's
        coarse coverage (carve is cumulative across firings)."""
        exact = self._masks(coarse_stride=False)
        union = [np.zeros_like(np.asarray(e)) for e in exact]
        for p in range(4):
            for lvl, mk in enumerate(self._masks(phase=jnp.asarray(p))):
                union[lvl] |= np.asarray(mk)
        for lvl, (e, u) in enumerate(zip(exact, union)):
            e = np.asarray(e)
            # exact equality: each phase grid now reaches the last
            # row/col reachable from its offset (ADVICE r4), so the
            # 4-phase union IS the full-ray march's coverage
            np.testing.assert_array_equal(
                u, e, err_msg=f"level {lvl}: union != exact")


class TestAllocOnDemand:
    def test_unallocated_fraction_drops_after_march(self):
        """The on-demand gate's firing signal: ~1 on an empty map, ~0
        once the frame's surface blocks are allocated."""
        depth, pose = _frame()
        field = make_field("sdf", mu=0.2)
        m = octree.init(SIZE, DIM, field.channels, capacity=4096)
        K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
        before = float(integration.unallocated_fraction(
            m, jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K)))
        m = integration.allocate_sdf(m, jnp.asarray(depth),
                                     jnp.asarray(pose), jnp.asarray(K),
                                     field.alloc_band())
        after = float(integration.unallocated_fraction(
            m, jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K)))
        assert before > 0.9
        # decim-4 probe pixels vs decim-2 march: a few sliver pixels may
        # stay outside the allocated set
        assert after < 0.05, after


class TestIntegrateBudget:
    def test_budgeted_matches_dense(self):
        """integrate(budget=N) with N covering all visible blocks must fuse
        bit-identically to the dense capacity-axis stream."""
        depth, pose = _frame()
        field = make_field("sdf", mu=0.3)
        K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
        maps = []
        for budget in (0, 128):
            m = octree.init(SIZE, DIM, field.channels, capacity=256)
            m = integration.allocate_sdf(m, jnp.asarray(depth),
                                         jnp.asarray(pose), jnp.asarray(K),
                                         0.3)
            m = integration.integrate(m, field, jnp.asarray(depth),
                                      jnp.asarray(pose), jnp.asarray(K),
                                      budget=budget)
            # second frame exercises the active-flag path
            m = integration.integrate(m, field, jnp.asarray(depth),
                                      jnp.asarray(pose), jnp.asarray(K),
                                      budget=budget)
            maps.append(m)
        dense, comp = maps
        assert int(dense.n_blocks) == int(comp.n_blocks)
        n = int(dense.n_blocks)
        for name in ("tsdf", "weight"):
            np.testing.assert_array_equal(
                np.asarray(dense.voxels[name])[:n],
                np.asarray(comp.voxels[name])[:n])
        np.testing.assert_array_equal(np.asarray(dense.active)[:n],
                                      np.asarray(comp.active)[:n])


def test_alloc_stride_near_lossless():
    """stride=2 band-march sampling: block set is a subset of the exact
    march and misses at most a few sliver blocks."""
    depth, pose = _frame()
    K = np.asarray(camera.camera_matrix(jnp.asarray(K4)))
    sets = []
    for stride in (1.0, 2.0):
        w = integration.sdf_wanted_mask(
            jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K),
            size=SIZE, dim=DIM, band=0.3, decim=1, stride=stride)
        sets.append(set(map(tuple, np.argwhere(np.asarray(w)).tolist())))
    exact, strided = sets
    assert strided <= exact
    assert len(strided) >= 0.95 * len(exact)
