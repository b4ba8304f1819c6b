"""In-scan decomposition of raycast internals: pack_view, splat bounds,
fine scan, refine, gradient variants.  Each phase runs R times inside one
lax.scan with a perturbed pose per step; wall clock divided by R is the
on-chip cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import signal
    signal.alarm(3300)
    import jax
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem, camera
    from supereight_tpu.pipeline import raycast as rc
    from supereight_tpu.pipeline.system import process_frame
    import functools

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "bench_data/synthetic_256_frames.npz"))
    depths, poses = z["depths"], z["poses"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W, SIZE = 240, 320, 256

    # build a realistic 32-frame map once (gt poses, fused path)
    cfg = Configuration(volume_resolution=(SIZE,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(10, 5, 4), integration_rate=1,
                        block_capacity=6144)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])
    fn = functools.partial(process_frame, field=slam.field,
                           iterations=slam.iterations, tracking_rate=1,
                           integration_rate=1, bilateral=False,
                           icp_threshold=1e-5, use_gt=True, neg_y=False)

    def scan_step(state, inp):
        depth, frame, gt = inp
        return fn(state, depth, k_dev, frame, gt), ()

    k_dev = jnp.asarray(k)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def build_map(state, dchunk, gts):
        frames = jnp.arange(dchunk.shape[0], dtype=jnp.int32)
        state, _ = jax.lax.scan(scan_step, state, (dchunk, frames, gts))
        return state

    st = build_map(slam.state, jnp.asarray(depths[:32]),
                   jnp.asarray(poses[:32]))
    jax.block_until_ready(st.pose)
    m = st.map
    field = slam.field
    pose0 = jnp.asarray(poses[32])
    results = {"n_blocks": int(m.n_blocks)}
    print(f"# map built: {results['n_blocks']} blocks", file=sys.stderr)

    R = 48

    def scan_time(name, body):
        """body(pose) -> scalar; timed over R poses."""
        def step(carry, i):
            # tiny per-step pose perturbation defeats caching
            p = pose0.at[0, 3].add(0.001 * i.astype(jnp.float32))
            return carry + body(p), ()

        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(step, c0, jnp.arange(R, dtype=jnp.float32))
            return c

        c = run(jnp.float32(0))
        np.asarray(c)
        t0 = time.perf_counter()
        c = run(jnp.float32(1))
        np.asarray(c)
        dt = (time.perf_counter() - t0) / R * 1e3
        results[name] = round(dt, 3)
        print(f"# {name:28s} {dt:8.3f} ms", file=sys.stderr)

    invK = camera.inverse_camera_matrix(k_dev)

    def mkview(p):
        return p @ invK

    scan_time("pack_view", lambda p: jnp.sum(
        jnp.nan_to_num(rc.pack_view(m, field)["F"].astype(jnp.float32))
        * p[0, 3]))

    dense = jax.jit(lambda: rc.pack_view(m, field))()
    jax.block_until_ready(dense["F"])

    scan_time("splat_bounds", lambda p: jnp.sum(jnp.where(
        jnp.isfinite(rc._splat_bounds(m, field, mkview(p), H, W, 0.4,
                                      4.0)[0]), 1.0, 0.0)))

    tgrid, tmax_g, g = jax.jit(lambda: rc._splat_bounds(
        m, field, mkview(pose0), H, W, 0.4, 4.0))()
    jax.block_until_ready(tgrid)

    def fine_only(p):
        origin, dirs = rc.ray_directions(mkview(p), H, W)
        dirs_h = 0.25 * (dirs[0::2, 0::2] + dirs[1::2, 0::2]
                         + dirs[0::2, 1::2] + dirs[1::2, 1::2])
        t0_ = jnp.repeat(jnp.repeat(tgrid, 4, 0), 4, 1)
        act = jnp.isfinite(t0_)
        zs = jnp.clip(jnp.where(act, t0_, 0.4), 0.4, 4.0)
        f1 = rc._fine_scan(m, dense, field, origin, dirs_h, zs, 0.72, 15,
                           act)
        return jnp.sum(f1.z_hit)
    scan_time("fine_scan_15x19k", fine_only)

    def refine_only(p):
        origin, dirs = rc.ray_directions(mkview(p), H, W)
        zh = jnp.full((H, W), 2.0)
        z2, hit = rc._refine(m, dense, field, origin, dirs, zh,
                             jnp.ones((H, W), bool), 0.15)
        return jnp.sum(z2)
    scan_time("refine_2x77k", refine_only)

    def grad_only(p):
        origin, dirs = rc.ray_directions(mkview(p), H, W)
        vert = origin + dirs * 2.0
        g_ = rc._grad6(m, dense, field, vert)
        return jnp.sum(g_)
    scan_time("grad6_6x77k", grad_only)

    def full_raycast(p):
        r = rc.raycast(m, field, mkview(p), H, W, 0.4, 4.0)
        return jnp.sum(r.t_hit)
    scan_time("raycast_full", full_raycast)

    def full_raycast_shared_dense(p):
        r = rc.raycast(m, field, mkview(p), H, W, 0.4, 4.0, dense=dense)
        return jnp.sum(r.t_hit)
    scan_time("raycast_given_dense", full_raycast_shared_dense)

    def no_second(p):
        r = rc.raycast(m, field, mkview(p), H, W, 0.4, 4.0, dense=dense,
                       second_window=False)
        return jnp.sum(r.t_hit)
    scan_time("raycast_no_fine2", no_second)

    print(json.dumps(results))
    with open(os.path.join(here, "bench_data/raycast_probe.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
