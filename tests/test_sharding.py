"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference is single-process OpenMP (SURVEY.md section 2.4) so there is
nothing to port; this validates the TPU-native scale-out design the jax way
(SURVEY.md section 4): the same pipeline body under a 1-device and an
8-device mesh must produce the same map and trajectory.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from supereight_tpu.config import Configuration
from supereight_tpu.parallel import make_mesh, shard_state
from supereight_tpu.pipeline import DenseSLAMSystem
from supereight_tpu.pipeline.system import process_frame
from supereight_tpu.io.synthetic import orbit_poses, render_depth

H, W = 48, 64
K4 = np.asarray([48.0 * W / 160, 48.0 * H / 120, W / 2.0, H / 2.0],
                np.float32)


def build(capacity=1024, partitions=1):
    cfg = Configuration(volume_resolution=(64,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(3, 2, 2), block_capacity=capacity,
                        integration_rate=1, map_partitions=partitions)
    slam = DenseSLAMSystem((H, W), cfg)
    fn = functools.partial(
        process_frame, field=slam.field, iterations=slam.iterations,
        tracking_rate=1, integration_rate=1, bilateral=False,
        icp_threshold=1e-5, use_gt=False, neg_y=False)
    return slam, fn


@pytest.fixture(scope="module")
def frames():
    poses = orbit_poses(4, 4.8, sweep=0.02)
    depths = [np.asarray(render_depth(jnp.asarray(p), jnp.asarray(K4),
                                      4.8, H, W)) for p in poses]
    return [np.clip(d * 1000, 0, 65535).astype(np.uint16) for d in depths], \
        poses


def run_frames(state, fn, frames, mesh=None):
    step = jax.jit(fn)
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        for i, d in enumerate(frames):
            state = step(state, jnp.asarray(d), jnp.asarray(K4),
                         jnp.asarray(i, jnp.int32),
                         jnp.eye(4, dtype=jnp.float32))
    return jax.device_get(state)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


class TestShardedPipeline:
    def test_8dev_matches_single(self, frames):
        depths, poses = frames
        slam, fn = build()
        single = run_frames(slam.state, fn, depths)

        slam2, fn2 = build()
        mesh = make_mesh(8)
        st = shard_state(slam2.state, mesh)
        sharded = run_frames(st, fn2, depths, mesh=mesh)

        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)
        # the fused field agrees on every allocated voxel
        n = int(single.map.n_blocks)
        for name in ("tsdf", "weight"):
            a = np.asarray(single.map.voxels[name])[:n]
            b = np.asarray(sharded.map.voxels[name])[:n]
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_sharded_layout(self, frames):
        depths, _ = frames
        slam, fn = build()
        mesh = make_mesh(8)
        st = shard_state(slam.state, mesh)
        # the block table is actually split over devices
        sh = st.map.voxels["tsdf"].sharding
        assert len(sh.device_set) == 8
        out = run_frames(st, fn, depths[:2], mesh=mesh)
        assert int(out.map.n_blocks) > 0


class TestShardMapTracking:
    def test_psum_reduction_matches_single_device(self, frames):
        import jax.numpy as jnp
        from supereight_tpu.parallel import tracking_dist
        from supereight_tpu.pipeline import camera, preprocessing, tracking

        depths, poses = frames
        slam, fn = build()
        # build a map + reference model with a few gt frames
        state = slam.state
        step = jax.jit(fn)
        for i, d in enumerate(depths):
            state = step(state, jnp.asarray(d), jnp.asarray(K4),
                         jnp.asarray(i, jnp.int32), jnp.asarray(poses[i]))
        kd = jnp.asarray(K4)
        dp, vt, nm = preprocessing.build_pyramid(state.scaled_depth, kd, 3,
                                                 neg_y=False)
        view = camera.camera_matrix(kd) @ jnp.linalg.inv(state.raycast_pose)

        # single-device iteration
        td = tracking.track_kernel(vt[0], nm[0], state.ref_vertex,
                                   state.ref_normal, state.pose, view)
        e2_s, JTe_s, JTJ_s, count_s = tracking.reduce_kernel(td)
        x = tracking.solve_normal_equations(JTe_s, JTJ_s)
        pose_s = camera.se3_exp(x) @ state.pose

        # shard_map + psum iteration over the 8-device mesh
        mesh = make_mesh(8)
        pose_d, e2_d, count_d = tracking_dist.track_step_sharded(
            mesh, state.pose, vt[0], nm[0], state.ref_vertex,
            state.ref_normal, view)
        np.testing.assert_allclose(np.asarray(pose_d), np.asarray(pose_s),
                                   atol=1e-5)
        np.testing.assert_allclose(float(e2_d), float(e2_s), rtol=1e-5)


class TestOwnerPartitionedAllocation:
    """Morton-range (x-slab) owner partitioning of the slot space
    (octree.VoxelMap.partitions; VERDICT r1 item 4)."""

    def _alloc_both(self):
        from supereight_tpu.core import octree
        from supereight_tpu.core.octree import ChannelSpec
        rng = np.random.default_rng(3)
        B = 8
        wanted = jnp.asarray(rng.random((B, B, B)) < 0.3)
        maps = []
        for parts in (1, 4):
            m = octree.init(64, 4.8,
                            (ChannelSpec("v", jnp.float32, 0.0, 0.0),),
                            capacity=256, partitions=parts)
            maps.append(octree.allocate_block_mask(m, wanted))
        return maps, wanted

    def test_same_block_set_and_counts(self):
        from supereight_tpu.core import octree
        (m1, m4), wanted = self._alloc_both()
        assert int(m1.n_blocks) == int(m4.n_blocks) == int(wanted.sum())
        np.testing.assert_array_equal(np.asarray(m1.block_index >= 0),
                                      np.asarray(m4.block_index >= 0))
        # same key SET (slot order differs by design)
        k1 = np.sort(np.asarray(m1.keys)[np.asarray(octree.slot_mask(m1))])
        k4 = np.sort(np.asarray(m4.keys)[np.asarray(octree.slot_mask(m4))])
        np.testing.assert_array_equal(k1, k4)

    def test_owner_locality(self):
        """Every slot in partition d holds a block whose x-slab is d."""
        from supereight_tpu.core import octree
        (_, m4), _ = self._alloc_both()
        bc = np.asarray(octree.block_coords_table(m4))
        live = np.asarray(octree.slot_mask(m4))
        per_cap = m4.capacity // m4.partitions
        B = m4.blocks_per_edge
        slab = B // m4.partitions
        for s in np.where(live)[0]:
            owner = s // per_cap
            assert owner * slab <= bc[s, 0] < (owner + 1) * slab

    def test_incremental_and_overflow(self):
        from supereight_tpu.core import octree
        from supereight_tpu.core.octree import ChannelSpec
        m = octree.init(64, 4.8,
                        (ChannelSpec("v", jnp.float32, 0.0, 0.0),),
                        capacity=8, partitions=4)   # 2 slots per owner
        # 3 blocks in slab 0 -> one must overflow its 2-slot partition
        wanted = jnp.zeros((8, 8, 8), bool).at[0, 0, :3].set(True)
        m = octree.allocate_block_mask(m, wanted)
        assert int(m.part_counts[0]) == 2
        assert int(m.overflow) == 1
        # other partitions unaffected and still allocatable
        wanted2 = jnp.zeros((8, 8, 8), bool).at[7, 1, 1].set(True)
        m = octree.allocate_block_mask(m, wanted2)
        assert int(m.part_counts[3]) == 1


class TestShardedAllocation:
    def test_sharded_mask_matches_single(self, frames):
        """Image-strip-sharded band march + one psum == full-frame mask
        (the collective new-key exchange, parallel/allocation_dist.py)."""
        from supereight_tpu.parallel import sharded_sdf_wanted_mask
        from supereight_tpu.pipeline import camera, integration
        depths, poses = frames
        mesh = make_mesh(8)
        K = camera.camera_matrix(jnp.asarray(K4))
        depth = jnp.asarray(depths[1] / 1000.0, jnp.float32)
        pose = jnp.asarray(poses[1])
        mask_fn = sharded_sdf_wanted_mask(mesh, H, W, size=64, dim=4.8,
                                          band=0.2)
        with jax.sharding.use_mesh(mesh) if hasattr(
                jax.sharding, "use_mesh") else _nullcontext():
            sharded = jax.jit(mask_fn)(depth, pose, K)
        direct = integration.sdf_wanted_mask(depth, pose, K, size=64,
                                             dim=4.8, band=0.2, decim=1)
        np.testing.assert_array_equal(np.asarray(sharded),
                                      np.asarray(direct))


class TestShardedRaycast:
    def test_frustum_exchange_matches_single(self, frames):
        """Frustum-limited brick exchange + strip-sharded raycast
        (parallel/raycast_dist.py) == single-device raycast."""
        from supereight_tpu.parallel import raycast_dist
        from supereight_tpu.pipeline import camera, raycast
        from supereight_tpu.pipeline.constants import FAR_PLANE, NEAR_PLANE

        depths, poses = frames
        slam, fn = build()
        state = slam.state
        step = jax.jit(fn)
        for i, d in enumerate(depths):
            state = step(state, jnp.asarray(d), jnp.asarray(K4),
                         jnp.asarray(i, jnp.int32), jnp.asarray(poses[i]))
        view = state.pose @ camera.inverse_camera_matrix(jnp.asarray(K4))

        # jit the baseline too: the CPU backend's eager-vs-jit fusion
        # differences (FMA in the secant solve) dwarf the exchange's zero
        rc = jax.jit(lambda mm, vv: raycast.raycast(
            mm, slam.field, vv, H, W, NEAR_PLANE, FAR_PLANE))(
                state.map, view)

        mesh = make_mesh(8)
        dist_fn = raycast_dist.sharded_raycast(
            mesh, slam.field, H, W, NEAR_PLANE, FAR_PLANE,
            max_visible_per_device=256)
        v, n, t, dropped = jax.jit(dist_fn)(state.map, view)

        assert int(np.asarray(dropped).sum()) == 0
        np.testing.assert_allclose(np.asarray(t), np.asarray(rc.t_hit),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), np.asarray(rc.vertex),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(n), np.asarray(rc.normal),
                                   atol=1e-4)

    def test_owner_partitioned_map_matches(self, frames):
        """The exchange also works on an owner-partitioned map (live slots
        are per-partition prefixes, not one global prefix)."""
        from supereight_tpu.parallel import raycast_dist
        from supereight_tpu.pipeline import camera, raycast
        from supereight_tpu.pipeline.constants import FAR_PLANE, NEAR_PLANE

        depths, poses = frames
        slam, fn = build(partitions=8)
        state = slam.state
        step = jax.jit(fn)
        for i, d in enumerate(depths):
            state = step(state, jnp.asarray(d), jnp.asarray(K4),
                         jnp.asarray(i, jnp.int32), jnp.asarray(poses[i]))
        view = state.pose @ camera.inverse_camera_matrix(jnp.asarray(K4))
        rc = jax.jit(lambda mm, vv: raycast.raycast(
            mm, slam.field, vv, H, W, NEAR_PLANE, FAR_PLANE))(
                state.map, view)
        mesh = make_mesh(8)
        dist_fn = raycast_dist.sharded_raycast(
            mesh, slam.field, H, W, NEAR_PLANE, FAR_PLANE,
            max_visible_per_device=256)
        v, n, t, dropped = jax.jit(dist_fn)(state.map, view)
        assert int(np.asarray(dropped).sum()) == 0
        np.testing.assert_allclose(np.asarray(t), np.asarray(rc.t_hit),
                                   atol=1e-4)

    def test_budget_overflow_reported(self, frames):
        """A too-small exchange budget reports dropped blocks instead of
        silently truncating."""
        from supereight_tpu.parallel import raycast_dist
        from supereight_tpu.pipeline import camera
        from supereight_tpu.pipeline.constants import FAR_PLANE, NEAR_PLANE

        depths, poses = frames
        slam, fn = build()
        state = slam.state
        step = jax.jit(fn)
        for i, d in enumerate(depths):
            state = step(state, jnp.asarray(d), jnp.asarray(K4),
                         jnp.asarray(i, jnp.int32), jnp.asarray(poses[i]))
        view = state.pose @ camera.inverse_camera_matrix(jnp.asarray(K4))
        mesh = make_mesh(8)
        dist_fn = raycast_dist.sharded_raycast(
            mesh, slam.field, H, W, NEAR_PLANE, FAR_PLANE,
            max_visible_per_device=2)
        *_, dropped = jax.jit(dist_fn)(state.map, view)
        assert int(np.asarray(dropped).sum()) > 0


class TestUnifiedShardedFrame:
    """The single fused sharded frame (parallel/frame_dist.py): every
    stage under one shard_map with explicit collectives must reproduce
    process_frame (VERDICT r2 item 5)."""

    def _run_sharded(self, slam, depths, *, normals="volume",
                     field_type=None):
        from supereight_tpu.parallel import frame_dist
        mesh = make_mesh(8)
        st = frame_dist.frame_sharding(mesh)(slam.state)
        step = frame_dist.make_process_frame_sharded(
            mesh, slam.field, H, W, iterations=slam.iterations,
            normals=normals, max_visible_per_device=256)
        jstep = jax.jit(functools.partial(step, use_gt=False, neg_y=False))
        for i, d in enumerate(depths):
            st = jstep(st, jnp.asarray(d), jnp.asarray(K4),
                       jnp.asarray(i, jnp.int32),
                       jnp.eye(4, dtype=jnp.float32))
        return jax.device_get(st)

    def test_sdf_frame_matches_single(self, frames):
        depths, _ = frames
        slam, fn = build(partitions=8)
        single = run_frames(slam.state, fn, depths)

        slam2, _ = build(partitions=8)
        sharded = self._run_sharded(slam2, depths)

        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)
        np.testing.assert_allclose(np.asarray(single.ref_vertex),
                                   np.asarray(sharded.ref_vertex),
                                   atol=1e-3)
        live = np.asarray(__import__("supereight_tpu.core.octree",
                                     fromlist=["slot_mask"])
                          .slot_mask(single.map))
        for name in single.map.voxels:
            a = np.asarray(single.map.voxels[name])[live]
            b = np.asarray(sharded.map.voxels[name])[live]
            np.testing.assert_allclose(a, b, atol=1e-4)
        assert int(sharded.map.overflow) == 0

    def test_alloc_rate_frame_matches_single(self, frames):
        """alloc_rate gating uses a masked request (not a cond) in the
        sharded frame — the skipped-march frames must still match
        process_frame's lax.cond path exactly."""
        from supereight_tpu.parallel import frame_dist

        # 8 frames: the march gate only engages past the bootstrap
        # (frame > 5), which the 4-frame module fixture never reaches
        poses8 = orbit_poses(8, 4.8, sweep=0.02)
        depths = [np.clip(np.asarray(render_depth(
            jnp.asarray(p), jnp.asarray(K4), 4.8, H, W)) * 1000,
            0, 65535).astype(np.uint16) for p in poses8]
        slam, _ = build(partitions=8)
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=False,
            icp_threshold=1e-5, use_gt=False, neg_y=False, alloc_rate=2)
        single = run_frames(slam.state, fn, depths)

        slam2, _ = build(partitions=8)
        mesh = make_mesh(8)
        st = frame_dist.frame_sharding(mesh)(slam2.state)
        step = frame_dist.make_process_frame_sharded(
            mesh, slam2.field, H, W, iterations=slam2.iterations,
            normals="volume", alloc_rate=2, max_visible_per_device=256)
        jstep = jax.jit(functools.partial(step, use_gt=False, neg_y=False))
        for i, d in enumerate(depths):
            st = jstep(st, jnp.asarray(d), jnp.asarray(K4),
                       jnp.asarray(i, jnp.int32),
                       jnp.eye(4, dtype=jnp.float32))
        sharded = jax.device_get(st)
        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)

    def test_headline_knobs_frame_matches_single(self, frames):
        """The single-chip headline knob set — hybrid normals, grad_decim,
        alloc_rate AND the motion-adaptive raycast gate (a lax.cond whose
        replicated predicate keeps the exchange all_gather schedule-safe)
        — must reproduce process_frame with the same knobs (VERDICT r3
        item 1: sharded == headline semantics)."""
        from supereight_tpu.parallel import frame_dist

        # enough frames that the gate actually skips refreshes (the orbit
        # sweep is slow, so most post-bootstrap frames sit under 3.8 deg)
        poses8 = orbit_poses(10, 4.8, sweep=0.03)
        depths = [np.clip(np.asarray(render_depth(
            jnp.asarray(p), jnp.asarray(K4), 4.8, H, W)) * 1000,
            0, 65535).astype(np.uint16) for p in poses8]
        knobs = dict(alloc_rate=2, grad_decim=2, normals="hybrid",
                     adaptive_deg=3.8, adaptive_dist=0.07)
        slam, _ = build(partitions=8)
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=False,
            icp_threshold=1e-5, use_gt=False, neg_y=False, **knobs)
        single = run_frames(slam.state, fn, depths)

        slam2, _ = build(partitions=8)
        mesh = make_mesh(8)
        st = frame_dist.frame_sharding(mesh)(slam2.state)
        step = frame_dist.make_process_frame_sharded(
            mesh, slam2.field, H, W, iterations=slam2.iterations,
            max_visible_per_device=256, **knobs)
        jstep = jax.jit(functools.partial(step, use_gt=False, neg_y=False))
        for i, d in enumerate(depths):
            st = jstep(st, jnp.asarray(d), jnp.asarray(K4),
                       jnp.asarray(i, jnp.int32),
                       jnp.eye(4, dtype=jnp.float32))
        sharded = jax.device_get(st)

        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)
        # the gate fired identically: raycast_pose is the stale pose of
        # the last refresh, not the current pose
        np.testing.assert_allclose(np.asarray(single.raycast_pose),
                                   np.asarray(sharded.raycast_pose),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(single.ref_vertex),
                                   np.asarray(sharded.ref_vertex),
                                   atol=1e-3)
        assert int(sharded.map.overflow) == 0

    def test_ofusion_frame_matches_single(self, frames):
        depths, _ = frames
        cfg = Configuration(volume_resolution=(64,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(3, 2, 2),
                            block_capacity=1024, integration_rate=1,
                            map_partitions=8, field_type="ofusion")
        slam = DenseSLAMSystem((H, W), cfg)
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=False,
            icp_threshold=1e-5, use_gt=False, neg_y=False)
        single = run_frames(slam.state, fn, depths)

        slam2 = DenseSLAMSystem((H, W), cfg)
        sharded = self._run_sharded(slam2, depths)

        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)
        np.testing.assert_allclose(np.asarray(single.ref_vertex),
                                   np.asarray(sharded.ref_vertex),
                                   atol=1e-3)


    def test_ofusion_adaptive_alloc_matches_single(self, frames):
        """The motion-adaptive alloc gate + the coarse march's dither
        phase counter (alloc_pose / alloc_count state) must fire
        identically in the sharded frame's masked form and the
        single-device lax.cond form."""
        from supereight_tpu.parallel import frame_dist

        poses8 = orbit_poses(8, 4.8, sweep=0.03)
        depths = [np.clip(np.asarray(render_depth(
            jnp.asarray(p), jnp.asarray(K4), 4.8, H, W)) * 1000,
            0, 65535).astype(np.uint16) for p in poses8]
        cfg = Configuration(volume_resolution=(64,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(3, 2, 2),
                            block_capacity=1024, integration_rate=1,
                            map_partitions=8, field_type="ofusion")
        knobs = dict(alloc_adaptive_deg=2.0, alloc_adaptive_dist=0.05)
        slam = DenseSLAMSystem((H, W), cfg)
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=False,
            icp_threshold=1e-5, use_gt=False, neg_y=False, **knobs)
        single = run_frames(slam.state, fn, depths)

        slam2 = DenseSLAMSystem((H, W), cfg)
        mesh = make_mesh(8)
        st = frame_dist.frame_sharding(mesh)(slam2.state)
        step = frame_dist.make_process_frame_sharded(
            mesh, slam2.field, H, W, iterations=slam2.iterations,
            normals="volume", max_visible_per_device=256, **knobs)
        jstep = jax.jit(functools.partial(step, use_gt=False, neg_y=False))
        for i, d in enumerate(depths):
            st = jstep(st, jnp.asarray(d), jnp.asarray(K4),
                       jnp.asarray(i, jnp.int32),
                       jnp.eye(4, dtype=jnp.float32))
        sharded = jax.device_get(st)

        # the gate and the dither phase fired identically
        assert int(single.alloc_count) == int(sharded.alloc_count)
        assert int(single.alloc_count) < len(depths)  # it actually gated
        np.testing.assert_allclose(np.asarray(single.alloc_pose),
                                   np.asarray(sharded.alloc_pose),
                                   atol=1e-4)
        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)

    def test_ofusion_on_demand_alloc_matches_single(self, frames):
        """ADVICE r4: the data-driven alloc gate (alloc_on_demand) relies
        on block_index/float_depth being replicated so unallocated_fraction
        yields an identical predicate on every device — pin that with the
        same 1-vs-8 parity the adaptive gate has."""
        from supereight_tpu.parallel import frame_dist

        poses8 = orbit_poses(8, 4.8, sweep=0.03)
        depths = [np.clip(np.asarray(render_depth(
            jnp.asarray(p), jnp.asarray(K4), 4.8, H, W)) * 1000,
            0, 65535).astype(np.uint16) for p in poses8]
        cfg = Configuration(volume_resolution=(64,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(3, 2, 2),
                            block_capacity=1024, integration_rate=1,
                            map_partitions=8, field_type="ofusion")
        knobs = dict(alloc_on_demand=0.01)
        slam = DenseSLAMSystem((H, W), cfg)
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=False,
            icp_threshold=1e-5, use_gt=False, neg_y=False, **knobs)
        single = run_frames(slam.state, fn, depths)

        slam2 = DenseSLAMSystem((H, W), cfg)
        mesh = make_mesh(8)
        st = frame_dist.frame_sharding(mesh)(slam2.state)
        step = frame_dist.make_process_frame_sharded(
            mesh, slam2.field, H, W, iterations=slam2.iterations,
            normals="volume", max_visible_per_device=256, **knobs)
        jstep = jax.jit(functools.partial(step, use_gt=False, neg_y=False))
        for i, d in enumerate(depths):
            st = jstep(st, jnp.asarray(d), jnp.asarray(K4),
                       jnp.asarray(i, jnp.int32),
                       jnp.eye(4, dtype=jnp.float32))
        sharded = jax.device_get(st)

        assert int(single.alloc_count) == int(sharded.alloc_count)
        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)


class TestShardedRaycastExtensions:
    """VERDICT r2 item 5: the exchange raycast must cover the headline
    hybrid-normals config and multiscale (occupancy) fields."""

    def _built_state(self, frames, field_type="sdf"):
        depths, poses = frames
        cfg = Configuration(volume_resolution=(64,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(3, 2, 2),
                            block_capacity=1024, integration_rate=1,
                            map_partitions=1, field_type=field_type)
        slam = DenseSLAMSystem((H, W), cfg)
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=False,
            icp_threshold=1e-5, use_gt=False, neg_y=False)
        state = slam.state
        step = jax.jit(fn)
        for i, d in enumerate(depths):
            state = step(state, jnp.asarray(d), jnp.asarray(K4),
                         jnp.asarray(i, jnp.int32), jnp.asarray(poses[i]))
        return slam, state

    def test_hybrid_normals_strip_matches(self, frames):
        """Hybrid normals engage the half-res scan (W >= 160): the strip
        split must still match — covers the even-row strip handling and
        the refine-sample along-ray correction across strips."""
        from supereight_tpu.parallel import raycast_dist
        from supereight_tpu.pipeline import camera, raycast
        from supereight_tpu.pipeline.constants import FAR_PLANE, NEAR_PLANE

        slam, state = self._built_state(frames)
        H2, W2 = 160, 160
        k2 = jnp.asarray([48.0 * W2 / 160, 48.0 * H2 / 120,
                          W2 / 2.0, H2 / 2.0], jnp.float32)
        view = state.pose @ camera.inverse_camera_matrix(k2)
        rc = jax.jit(lambda mm, vv: raycast.raycast(
            mm, slam.field, vv, H2, W2, NEAR_PLANE, FAR_PLANE,
            normals="hybrid"))(state.map, view)
        mesh = make_mesh(8)
        dist_fn = raycast_dist.sharded_raycast(
            mesh, slam.field, H2, W2, NEAR_PLANE, FAR_PLANE,
            max_visible_per_device=256, normals="hybrid")
        v, n, t, dropped = jax.jit(dist_fn)(state.map, view)
        assert int(np.asarray(dropped).sum()) == 0
        np.testing.assert_allclose(np.asarray(t), np.asarray(rc.t_hit),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(n), np.asarray(rc.normal),
                                   atol=1e-3)
        # headline grad_decim=2: each strip's half-res row offset (dev*10)
        # is even, so strip-local quarter-res taps hit the same global
        # grid as the unsharded run
        rc2 = jax.jit(lambda mm, vv: raycast.raycast(
            mm, slam.field, vv, H2, W2, NEAR_PLANE, FAR_PLANE,
            normals="hybrid", grad_decim=2))(state.map, view)
        dist2 = raycast_dist.sharded_raycast(
            mesh, slam.field, H2, W2, NEAR_PLANE, FAR_PLANE,
            max_visible_per_device=256, normals="hybrid", grad_decim=2)
        _, n2, t2, drop2 = jax.jit(dist2)(state.map, view)
        assert int(np.asarray(drop2).sum()) == 0
        np.testing.assert_allclose(np.asarray(t2), np.asarray(rc2.t_hit),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(n2), np.asarray(rc2.normal),
                                   atol=1e-3)

    def test_multiscale_exchange_matches(self, frames):
        """Occupancy field: leaf rows ride the exchange, unallocated cells
        read the replicated node pyramid's show-through."""
        from supereight_tpu.parallel import raycast_dist
        from supereight_tpu.pipeline import camera, raycast
        from supereight_tpu.pipeline.constants import FAR_PLANE, NEAR_PLANE

        slam, state = self._built_state(frames, field_type="ofusion")
        view = state.pose @ camera.inverse_camera_matrix(jnp.asarray(K4))
        rc = jax.jit(lambda mm, vv: raycast.raycast(
            mm, slam.field, vv, H, W, NEAR_PLANE, FAR_PLANE))(
                state.map, view)
        mesh = make_mesh(8)
        dist_fn = raycast_dist.sharded_raycast(
            mesh, slam.field, H, W, NEAR_PLANE, FAR_PLANE,
            max_visible_per_device=256)
        v, n, t, dropped = jax.jit(dist_fn)(state.map, view)
        assert int(np.asarray(dropped).sum()) == 0
        np.testing.assert_allclose(np.asarray(t), np.asarray(rc.t_hit),
                                   atol=1e-4)


class TestMultiHost:
    def test_two_process_mesh_matches_single(self):
        """VERDICT r4 item 4: the REAL multi-host code path —
        jax.distributed multi-controller over 2 localhost processes
        (4 virtual devices each, gloo transport, host-local frame
        reads), running the unified sharded frame over the
        process-spanning 8-device mesh.  launch() itself asserts
        1-process-vs-2-process pose + n_blocks equality."""
        from supereight_tpu.parallel import multihost
        multi, single = multihost.launch(2, 4, port=9961)
        assert multi["n_devices"] == 8
        assert multi["n_blocks"] == single["n_blocks"] > 0
        np.testing.assert_allclose(np.asarray(multi["pose"]),
                                   np.asarray(single["pose"]), atol=1e-4)


class TestShardedSymAuto:
    def test_sym_auto_matches_single(self, frames):
        """icp_symmetric="auto": the motion-gated symmetric residual is a
        replicated predicate of replicated state (pose/prev_pose) — the
        sharded frame must fire it identically (1-vs-8 parity)."""
        from supereight_tpu.parallel import frame_dist

        depths, poses = frames
        cfg = Configuration(volume_resolution=(64,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(3, 2, 2),
                            block_capacity=1024, integration_rate=1,
                            map_partitions=8)
        knobs = dict(icp_symmetric="auto", icp_sym_min_deg=0.01)
        slam = DenseSLAMSystem((H, W), cfg)
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=False,
            icp_threshold=1e-5, use_gt=False, neg_y=False, **knobs)
        single = run_frames(slam.state, fn, depths)

        slam2 = DenseSLAMSystem((H, W), cfg)
        mesh = make_mesh(8)
        st = frame_dist.frame_sharding(mesh)(slam2.state)
        step = frame_dist.make_process_frame_sharded(
            mesh, slam2.field, H, W, iterations=slam2.iterations,
            normals="volume", max_visible_per_device=256, **knobs)
        jstep = jax.jit(functools.partial(step, use_gt=False, neg_y=False))
        for i, d in enumerate(depths):
            st = jstep(st, jnp.asarray(d), jnp.asarray(K4),
                       jnp.asarray(i, jnp.int32),
                       jnp.eye(4, dtype=jnp.float32))
        sharded = jax.device_get(st)

        assert int(single.map.n_blocks) == int(sharded.map.n_blocks)
        np.testing.assert_allclose(np.asarray(single.pose),
                                   np.asarray(sharded.pose), atol=1e-4)
        np.testing.assert_allclose(np.asarray(single.prev_pose),
                                   np.asarray(sharded.prev_pose),
                                   atol=1e-4)


def test_knob_surface_parity_is_pinned():
    """VERDICT r4 weak-5: every single-chip process_frame knob must be
    either plumbed through the sharded frame or EXPLICITLY listed here
    with its reason — adding a new knob to one surface only fails this
    test instead of silently drifting."""
    import inspect
    from supereight_tpu.pipeline.system import process_frame
    from supereight_tpu.parallel.frame_dist import \
        make_process_frame_sharded

    call_args = {"state", "depth_mm", "k", "frame", "gt_pose",
                 "use_gt", "neg_y"}           # per-call, not knobs
    infra = {"mesh", "H", "W", "axis", "_skip",
             "max_visible_per_device"}        # sharded-frame plumbing
    documented_excluded = {
        # per-device capacity streaming IS the compaction (frame_dist
        # docstring); a budget knob would fight the owner partitioning
        "integrate_budget",
        # fusion depth-patch decimation: sharded fusion reuses the
        # single-chip kernel default; measured ATE-negative to change
        # (bench_data *_pt32)
        "integrate_patch",
        # fixed-rate refresh is superseded by the motion gate
        # (adaptive_deg/adaptive_dist, which ARE plumbed)
        "raycast_rate",
        # occupancy coarse-zone march decimation + per-pixel scan mode:
        # single-chip tuning knobs, reference-exact defaults here
        "coarse_alloc", "full_res_scan",
    }
    pf = set(inspect.signature(process_frame).parameters) - call_args
    sh = set(inspect.signature(make_process_frame_sharded).parameters) \
        - infra
    missing = pf - sh - documented_excluded
    assert not missing, (
        f"new single-chip knob(s) {sorted(missing)} not plumbed through "
        f"the sharded frame and not documented as excluded")
    stale = documented_excluded & sh
    assert not stale, f"exclusion list stale: {sorted(stale)} now plumbed"
    extra = sh - pf
    assert not extra, f"sharded-only knobs {sorted(extra)} unknown"
