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


def build(capacity=1024):
    cfg = Configuration(volume_resolution=(64,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(3, 2, 2), block_capacity=capacity,
                        integration_rate=1)
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
