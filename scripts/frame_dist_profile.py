"""Leave-one-out stage profile of the unified explicit sharded frame
(parallel/frame_dist.py) on the virtual CPU mesh — the probe behind the
MULTICHIP explicit-frame wall-clock (209.5 ms in r03 vs GSPMD's 51.3).

Virtual devices share host cores, so every REPLICATED stage costs
n_devices x its single-device wall here; stages that are stripped/
owner-local cost ~1x.  The leave-one-out deltas attribute the gap.

Run:  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/frame_dist_profile.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build
from supereight_tpu.parallel import frame_dist, make_mesh

N = 8
SKIPS = [
    frozenset(),
    frozenset({"preprocess"}),
    frozenset({"track"}),
    frozenset({"alloc"}),
    frozenset({"fuse"}),
    frozenset({"nodes"}),
    frozenset({"exchange", "raycast"}),   # whole raycast stage
    frozenset({"exchange"}),              # raycast from a local dummy view
]


def time_variant(skip, *, warm=4, iters=6, **kw):
    cap = max(1024, 128 * N)
    slam, depth, k = _build(capacity=cap, partitions=N)
    mesh = make_mesh(N)
    st = frame_dist.frame_sharding(mesh)(slam.state)
    H, W = depth.shape
    step = jax.jit(functools.partial(
        frame_dist.make_process_frame_sharded(
            mesh, slam.field, H, W, iterations=slam.iterations,
            normals="volume", alloc_rate=2,
            max_visible_per_device=cap // N, _skip=skip, **kw),
        use_gt=False, neg_y=False))
    eye = jnp.eye(4, dtype=jnp.float32)
    f = 3
    for _ in range(warm):
        st = step(st, depth, k, jnp.asarray(f, jnp.int32), eye)
        f += 1
    st.pose.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        st = step(st, depth, k, jnp.asarray(f, jnp.int32), eye)
        f += 1
    st.pose.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    out = {}
    full = time_variant(frozenset())
    out["full_ms"] = round(full, 1)
    print(f"full: {full:.1f} ms")
    for skip in SKIPS[1:]:
        name = "+".join(sorted(skip))
        ms = time_variant(skip)
        out[f"skip_{name}_ms"] = round(ms, 1)
        print(f"skip {name}: {ms:.1f} ms (delta {full - ms:+.1f})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
