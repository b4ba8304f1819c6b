"""Per-stage timing breakdown on the real chip (VERDICT r1 item 7).

Runs the staged pipeline over cached bench frames and times each pipeline
stage (TSV-column parity: preprocessing / tracking / integration /
raycasting), then micro-times raycast sub-phases and one tracking level so
optimisation is data-driven.  Writes bench_data/stage_breakdown.json.

Usage:  python scripts/stage_bench.py            (TPU)
        JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/stage_bench.py --cpu-small
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
    signal.alarm(2700)   # hard ceiling: never leave a wedged claim
    small = "--cpu-small" in sys.argv
    import jax
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.pipeline import raycast as rc
    from supereight_tpu.pipeline import tracking, preprocessing, camera

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    H, W, SIZE, NF = (60, 80, 64, 12) if small else (240, 320, 256, 48)
    cache = os.path.join(here, "bench_data/synthetic_256_frames.npz")
    if small or not os.path.exists(cache):
        from supereight_tpu.io import synthetic
        depths, poses, _ = synthetic.generate_sequence(
            NF, H=H, W=W, room_dim=4.8,
            k=(60.0 * W / 160, 60.0 * H / 120, W / 2, H / 2))
        k = np.asarray([60.0 * W / 160, 60.0 * H / 120, W / 2, H / 2],
                       np.float32)
    else:
        z = np.load(cache)
        depths, poses = z["depths"][:NF], z["poses"][:NF]
        k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)

    cfg = Configuration(volume_resolution=(SIZE,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(10, 5, 4), integration_rate=1,
                        block_capacity=2048 if small else 12288)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])

    # ---- staged per-frame timing ----
    agg = {}
    for f in range(NF):
        _, times = slam.step_staged(depths[f], k, f)
        if f >= 8:   # skip compile + bootstrap frames
            for kk, v in times.items():
                agg.setdefault(kk, []).append(v)
    stage_ms = {kk: 1e3 * float(np.mean(v)) for kk, v in agg.items()}
    total = sum(stage_ms.values())
    print(f"# staged totals over {NF-8} frames: {total:.2f} ms/frame",
          file=sys.stderr)
    for kk, v in sorted(stage_ms.items(), key=lambda x: -x[1]):
        print(f"#   {kk:15s} {v:7.2f} ms", file=sys.stderr)

    # ---- raycast sub-phases ----
    st = slam.state
    field = slam.field
    m = st.map

    def timeit(name, fn, *args, n=10, **kw):
        fn_j = jax.jit(fn)
        out = fn_j(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(n):
            out = fn_j(*args, **kw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"#   {name:28s} {dt:7.2f} ms", file=sys.stderr)
        return dt

    sub = {}
    view = st.pose @ camera.inverse_camera_matrix(jnp.asarray(k))
    sub["pack_view"] = timeit("raycast/pack_view",
                              lambda mm: rc.pack_view(mm, field), m)
    sub["raycast_full"] = timeit(
        "raycast/full",
        lambda mm, v: rc.raycast(mm, field, v, H, W, 0.4, 4.0), m, view)

    # ---- tracking sub-parts ----
    depths_p, verts, norms = jax.jit(
        functools.partial(preprocessing.build_pyramid, levels=3,
                          neg_y=False))(st.scaled_depth, jnp.asarray(k))
    viewT = camera.camera_matrix(jnp.asarray(k)) @ jnp.linalg.inv(
        st.raycast_pose)

    def one_iter(pose, iv, inorm):
        td = tracking.track_kernel(iv, inorm, st.ref_vertex, st.ref_normal,
                                   pose, viewT)
        e2, JTe, JTJ, cnt = tracking.reduce_kernel(td)
        x = tracking.solve_normal_equations(JTe, JTJ)
        return camera.se3_exp(x) @ pose

    sub["track_iter_L0"] = timeit("tracking/iter L0",
                                  one_iter, st.pose, verts[0], norms[0])
    sub["track_iter_L2"] = timeit("tracking/iter L2",
                                  one_iter, st.pose, verts[2], norms[2])
    sub["pyramid"] = timeit(
        "tracking/build_pyramid",
        functools.partial(preprocessing.build_pyramid, levels=3, neg_y=False),
        st.scaled_depth, jnp.asarray(k))

    # ---- integration sub-parts ----
    from supereight_tpu.pipeline import integration as integ
    K = camera.camera_matrix(jnp.asarray(k))
    sub["alloc_sdf"] = timeit(
        "integration/allocate_sdf",
        lambda mm, d, p: integ.allocate_sdf(mm, d, p, K, field.alloc_band()),
        m, st.float_depth, st.pose)
    sub["integrate"] = timeit(
        "integration/integrate",
        lambda mm, d, p: integ.integrate(mm, field, d, p, K), m,
        st.float_depth, st.pose)

    out = {"stage_ms": stage_ms, "sub_ms": sub,
           "n_blocks": int(m.n_blocks), "config": f"{SIZE}^3 {H}x{W}"}
    path = os.path.join(here, "bench_data/stage_breakdown.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
