"""True per-stage costs by ablation: run the fused scan bench with one stage
disabled at a time and diff the steady-state wall clock.  The axon tunnel's
block_until_ready is not trustworthy for sub-frame timers; 80-frame wall
deltas are.

Also micro-times candidate primitives at pipeline shapes (varied inputs per
iteration, one final host fetch) to inform the gather-free redesigns:
  - image-space row gather (ICP association)         [240x320, 6-wide]
  - volume element gather (raycast sampling)          [76800 x ~40]
  - scatter of block-wanted bools                     [230k -> 32^3]
  - sort+dedup of 230k uint32 keys
  - one-hot MXU binning [32,N]@[N,1024]
  - batched one-hot slab resample (shear-warp pass)   [256x(340,256)@(256,340)]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import signal
    signal.alarm(3500)
    import jax
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.pipeline import camera, raycast
    from supereight_tpu.pipeline import system as psys
    from supereight_tpu.pipeline.constants import NEAR_PLANE, FAR_PLANE

    field_name = "ofusion" if "--field" in sys.argv and \
        sys.argv[sys.argv.index("--field") + 1] == "ofusion" else "sdf"

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "bench_data/synthetic_256_frames.npz"))
    depths, poses = z["depths"], z["poses"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W, SIZE, NF = 240, 320, 256, 96
    results = {}

    k_dev = jnp.asarray(k)
    eye = jnp.eye(4, dtype=jnp.float32)
    depths_dev = jnp.asarray(depths)
    gt_dev = jnp.asarray(poses)

    def run_variant(name, *, skip_raycast=False, skip_integrate=False,
                    use_gt=False, chunk=16, nf=NF, stale_view=False):
        # the bench.py headline knob set (hybrid normals, budgeted fusion,
        # right-sized capacity, id2 ICP, scan_stride 1.0, alloc_rate 2,
        # grad_decim 2) so
        # the stage deltas describe the shipping configuration
        cfg = Configuration(volume_resolution=(SIZE,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(10, 5, 4),
                            integration_rate=1, block_capacity=6144,
                            mu=0.1 if field_name == "sdf" else 0.05,
                            raycast_normals="hybrid",
                            integrate_budget=3072,
                            field_type=field_name)
        slam = DenseSLAMSystem((H, W), cfg)
        slam.setPose(poses[0])
        field = slam.field

        def frame_fn(state, depth, frame, gt):
            state = psys.preprocessing_stage(state, depth, bilateral=False)
            state = psys.tracking_stage(state, k_dev, frame, gt, field=field,
                                        iterations=slam.iterations,
                                        tracking_rate=1, icp_threshold=1e-5,
                                        use_gt=use_gt, neg_y=False,
                                        finest_decimate=2)
            if not skip_integrate:
                state = psys.integration_stage(state, k_dev, frame,
                                               field=field,
                                               integration_rate=1,
                                               integrate_budget=3072,
                                               alloc_rate=2)
            if stale_view:
                # raycast against a FROZEN packed view: isolates the
                # per-frame pack_view cost (full - stale_view); all ray
                # phases keep their fixed shapes so compute is unchanged
                view = state.pose @ camera.inverse_camera_matrix(k_dev)
                rc = raycast.raycast(state.map, field, view, H, W,
                                     NEAR_PLANE, FAR_PLANE,
                                     normals="hybrid", scan_stride=1.0,
                                     grad_decim=2, dense=dense0)
                state = state.replace(ref_vertex=rc.vertex,
                                      ref_normal=rc.normal,
                                      raycast_pose=state.pose)
            elif not skip_raycast:
                state = psys.raycasting_stage(state, k_dev, frame,
                                              field=field, normals="hybrid",
                                              scan_stride=1.0, grad_decim=2)
            return state

        dense0 = raycast.pack_view(slam.state.map, field) \
            if stale_view else None

        def scan_step(state, inp):
            depth, frame, gt = inp
            return frame_fn(state, depth, frame, gt), ()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_chunk(state, depth_chunk, frame0, gts):
            frames = frame0 + jnp.arange(depth_chunk.shape[0],
                                         dtype=jnp.int32)
            state, _ = jax.lax.scan(scan_step, state,
                                    (depth_chunk, frames, gts))
            return state

        CHUNK = chunk
        st = run_chunk(slam.state, depths_dev[:CHUNK],
                       jnp.asarray(0, jnp.int32), gt_dev[:CHUNK])
        jax.block_until_ready(st.pose)
        t0 = time.perf_counter()
        for s in range(CHUNK, nf, CHUNK):
            st = run_chunk(st, depths_dev[s:s + CHUNK],
                           jnp.asarray(s, jnp.int32), gt_dev[s:s + CHUNK])
        np.asarray(st.pose)
        dt = (time.perf_counter() - t0) / (nf - CHUNK) * 1e3
        results[name] = round(dt, 2)
        print(f"# {name:22s} {dt:7.2f} ms/frame", file=sys.stderr)

    if "--variants-only" in sys.argv:
        run_variant("full", chunk=16)
        run_variant("no_raycast", skip_raycast=True)
        run_variant("no_integrate", skip_integrate=True)
        run_variant("gt_track", use_gt=True)
        run_variant("gt_only_integrate", use_gt=True, skip_raycast=True)
        run_variant("stale_view", stale_view=True)
        here2 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        suffix = "" if field_name == "sdf" else "_ofusion"
        with open(os.path.join(here2, f"bench_data/ablation{suffix}.json"),
                  "w") as fh:
            json.dump(results, fh, indent=1)
        print(json.dumps(results))
        return

    # dispatch-overhead model: per-frame cost = compute + overhead/chunk
    run_variant("full_c8", chunk=8)
    run_variant("full_c16", chunk=16)
    run_variant("full_c32", chunk=32)
    run_variant("full_c48", chunk=48)
    run_variant("no_raycast", skip_raycast=True)
    run_variant("no_integrate", skip_integrate=True)
    run_variant("gt_track", use_gt=True)
    run_variant("gt_only_integrate", use_gt=True, skip_raycast=True)

    # ---------------- primitives ----------------
    rng = np.random.default_rng(0)

    def timeit(name, fn, args_list, n=8):
        fn_j = jax.jit(fn)
        out = fn_j(*args_list[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(n):
            out = fn_j(*args_list[i % len(args_list)])
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        # force one host fetch so async queues must drain
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / n * 1e3
        results[name] = round(dt, 3)
        print(f"# prim {name:28s} {dt:7.3f} ms", file=sys.stderr)

    # image-space 6-wide row gather at association shapes
    ref = jnp.asarray(rng.standard_normal((H * W, 6)), jnp.float32)
    idxs = [jnp.asarray(rng.integers(0, H * W, (H, W)), jnp.int32)
            for _ in range(8)]
    timeit("assoc_row_gather", lambda r, i: r[i], [(ref, i) for i in idxs])

    # volume element gather: 76800 rays x 24 samples
    vol = jnp.asarray(rng.standard_normal((SIZE, SIZE, SIZE)), jnp.bfloat16)
    vidx = [jnp.asarray(rng.integers(0, SIZE, (24, H, W, 3)), jnp.int32)
            for _ in range(4)]
    timeit("vol_gather_24xHW",
           lambda v, i: v[i[..., 0], i[..., 1], i[..., 2]],
           [(vol, i) for i in vidx])

    # scatter 230k wanted bools into 32^3
    sidx = [jnp.asarray(rng.integers(0, 32, (230000, 3)), jnp.int32)
            for _ in range(4)]
    timeit("scatter_wanted_230k",
           lambda i: jnp.zeros((32, 32, 32), bool)
           .at[i[:, 0], i[:, 1], i[:, 2]].set(True),
           [(i,) for i in sidx])

    # sort 230k uint32
    keys = [jnp.asarray(rng.integers(0, 1 << 15, 230000), jnp.uint32)
            for _ in range(4)]
    timeit("sort_230k_u32", jnp.sort, [(kk,) for kk in keys])

    # one-hot MXU binning [32, N] @ [N, 1024]
    def binning(i):
        ohx = (i[:, 0:1] == jnp.arange(32)[None, :]).astype(jnp.bfloat16)
        byz = i[:, 1] * 32 + i[:, 2]
        ohyz = (byz[:, None] == jnp.arange(1024)[None, :]).astype(jnp.bfloat16)
        return (ohx.T @ ohyz) > 0
    timeit("mxu_binning_230k", binning, [(i,) for i in sidx])

    # batched one-hot slab resample (shear-warp pass shapes)
    A = 344
    v3 = jnp.asarray(rng.standard_normal((SIZE, SIZE, SIZE)), jnp.bfloat16)
    xs = [jnp.asarray(rng.uniform(0, SIZE, (SIZE, A)), jnp.float32)
          for _ in range(4)]

    def slab_pass(v, xb):
        oh = (jnp.floor(xb)[..., None] ==
              jnp.arange(SIZE)[None, None, :]).astype(jnp.bfloat16)
        # [k, A, S] @ [S, Sc, k] -> einsum kab,bck->kac
        return jnp.einsum("kab,bck->kac", oh, v,
                          preferred_element_type=jnp.float32)
    timeit("shearwarp_pass1", slab_pass, [(v3, x) for x in xs], n=4)

    print(json.dumps(results))
    path = os.path.join(here, "bench_data/ablation.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
