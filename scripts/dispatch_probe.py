"""Decisive throughput probe: is the scan-chunk path slower than per-frame
dispatch on the axon tunnel?  Wall-clock over many varied frames with ONE
final host fetch — the only timing this backend can't fake.
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
    signal.alarm(2700)
    import jax
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.pipeline.system import process_frame

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "bench_data/synthetic_256_frames.npz"))
    depths, poses = z["depths"], z["poses"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W, SIZE, NF = 240, 320, 256, 96

    def build():
        cfg = Configuration(volume_resolution=(SIZE,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(10, 5, 4),
                            integration_rate=1, block_capacity=12288)
        slam = DenseSLAMSystem((H, W), cfg)
        slam.setPose(poses[0])
        return slam

    results = {}
    k_dev = jnp.asarray(k)
    eye = jnp.eye(4, dtype=jnp.float32)
    depths_dev = jnp.asarray(depths)

    # ---- path A: per-frame fused dispatch (donated), sync only at end ----
    slam = build()
    fn = functools.partial(process_frame, field=slam.field,
                           iterations=slam.iterations, tracking_rate=1,
                           integration_rate=1, bilateral=False,
                           icp_threshold=1e-5, use_gt=False, neg_y=False)
    step = jax.jit(fn, donate_argnums=(0,))
    st = slam.state
    t0 = time.perf_counter()
    for f in range(16):   # warmup: compile + bootstrap
        st = step(st, depths_dev[f], k_dev, jnp.asarray(f, jnp.int32), eye)
    jax.block_until_ready(st.pose)
    print(f"# A compile+16: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for f in range(16, NF):
        st = step(st, depths_dev[f], k_dev, jnp.asarray(f, jnp.int32), eye)
    pos = np.asarray(st.pose)          # forced device->host sync
    dt = time.perf_counter() - t0
    results["per_frame_fused_ms"] = dt / (NF - 16) * 1e3
    err = float(np.linalg.norm(pos[:3, 3] - poses[NF - 1][:3, 3]))
    print(f"# A per-frame fused: {dt/(NF-16)*1e3:.2f} ms/frame "
          f"(err {err:.3f} m)", file=sys.stderr)

    # ---- path B: scan chunks (bench.py's path) ----
    slam = build()

    def scan_step(state, inp):
        depth, frame = inp
        return fn(state, depth, k_dev, frame, eye), ()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, depth_chunk, frame0):
        frames = frame0 + jnp.arange(depth_chunk.shape[0], dtype=jnp.int32)
        state, _ = jax.lax.scan(scan_step, state, (depth_chunk, frames))
        return state

    CHUNK = 16
    t0 = time.perf_counter()
    st = run_chunk(slam.state, depths_dev[:CHUNK], jnp.asarray(0, jnp.int32))
    jax.block_until_ready(st.pose)
    print(f"# B compile+chunk: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for s in range(CHUNK, NF, CHUNK):
        st = run_chunk(st, depths_dev[s:s + CHUNK], jnp.asarray(s, jnp.int32))
    pos = np.asarray(st.pose)
    dt = time.perf_counter() - t0
    results["scan_chunk_ms"] = dt / (NF - CHUNK) * 1e3
    err = float(np.linalg.norm(pos[:3, 3] - poses[NF - 1][:3, 3]))
    print(f"# B scan chunks: {dt/(NF-CHUNK)*1e3:.2f} ms/frame "
          f"(err {err:.3f} m)", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
