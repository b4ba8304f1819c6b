"""Virtual-mesh scaling curve for the unified sharded frame.

Runs the explicit-collective sharded step (parallel/frame_dist.py) at
D = 1, 2, 4, 8 virtual CPU devices — each D in its own subprocess (the
XLA host-device count is fixed at process start) — and records
ms/frame, the compiled collective census, and the per-frame exchange
byte budget.  Virtual devices share one core, so ideal sharding holds
wall(D) ~= wall(1) (same total work split D ways); the census and the
overhead ratio are the meaningful scaling signals without real ICI
(docs/DISTRIBUTED.md).

Usage: python scripts/scaling_bench.py          # orchestrates all D
       python scripts/scaling_bench.py --one 4  # internal: measure D=4
Writes bench_data/scaling_virtual.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def measure(n_dev: int) -> dict:
    import functools
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from supereight_tpu.config import Configuration
    from supereight_tpu.parallel import frame_dist, make_mesh
    from supereight_tpu.pipeline import DenseSLAMSystem

    H, W, size, cap = 48, 64, 64, 2048
    cfg = Configuration(volume_resolution=(size,) * 3,
                        volume_size=(4.8,) * 3, pyramid=(3, 2, 2),
                        block_capacity=cap, integration_rate=1,
                        map_partitions=n_dev)
    slam = DenseSLAMSystem((H, W), cfg)
    yy, xx = np.mgrid[0:H, 0:W]
    depth = jnp.asarray(2000 + 6 * yy + 4 * xx, jnp.uint16)
    k = jnp.asarray([60.0 * W / 160, 60.0 * H / 120, W / 2.0, H / 2.0],
                    jnp.float32)
    eye = jnp.eye(4, dtype=jnp.float32)

    mesh = make_mesh(n_dev)
    st = frame_dist.frame_sharding(mesh)(slam.state)
    M = cap // n_dev
    step = jax.jit(functools.partial(
        frame_dist.make_process_frame_sharded(
            mesh, slam.field, H, W, iterations=slam.iterations,
            normals="volume", alloc_rate=2, max_visible_per_device=M),
        use_gt=False, neg_y=False))
    for f in range(3, 7):
        st = step(st, depth, k, jnp.asarray(f, jnp.int32), eye)
    st.pose.block_until_ready()
    t0 = time.perf_counter()
    for f in range(7, 15):
        st = step(st, depth, k, jnp.asarray(f, jnp.int32), eye)
    st.pose.block_until_ready()
    ms = (time.perf_counter() - t0) / 8 * 1e3
    hlo = step.lower(st, depth, k, jnp.asarray(8, jnp.int32),
                     eye).compile().as_text()
    return {
        "devices": n_dev,
        "ms_per_frame": round(ms, 2),
        "all_reduce": hlo.count("all-reduce"),
        "all_gather": hlo.count("all-gather"),
        "collective_permute": hlo.count("collective-permute"),
        "exchange_budget_mb": round(n_dev * M * 512 * 2 / 1e6, 2),
        "blocks": int(st.map.n_blocks),
        "tracked": bool(st.tracked),
    }


def main():
    if "--one" in sys.argv:
        n = int(sys.argv[sys.argv.index("--one") + 1])
        print(json.dumps(measure(n)))
        return

    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={n}")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(n)],
            capture_output=True, text=True, env=env, timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"D={n} failed")
        rows.append(json.loads(line[-1]))
        print(f"# D={n}: {rows[-1]}", file=sys.stderr)
    with open(os.path.join(REPO, "bench_data/scaling_virtual.json"),
              "w") as fh:
        json.dump(rows, fh, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
