"""On-chip mesh-extraction timing (dump_mesh / marching-tetrahedra).

Builds a 256^3 map by running the first 32 bench frames (same headline
config as bench.py, so the SLAM program is compile-cached), then times
the meshing kernel (`core.meshing._block_chunk_triangles`) over the WHOLE
live block set inside ONE device program (a fori_loop reducing to a
checksum — the tunnel's per-dispatch floor and output transfer would
otherwise dominate; see .claude/skills/verify/SKILL.md TIMING TRUTH).

Writes bench_data/mesh_bench.json.  Reference counterpart: the vtk dump
path `se_denseslam/include/se/algorithms/meshing.hpp:161-208` (called
once at sequence end, `benchmark.cpp:179-181`).
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
    signal.alarm(3000)
    import jax
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.core import meshing, octree
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.pipeline.system import process_frame

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "bench_data/synthetic_256_frames.npz"))
    depths, poses = z["depths"], z["poses"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W = 240, 320

    cfg = Configuration(volume_resolution=(256,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(10, 5, 4), integration_rate=1,
                        block_capacity=6144, raycast_normals="hybrid",
                        integrate_budget=3072, icp_finest_decimate=2,
                        raycast_scan_stride=1.0, alloc_rate=2,
                        raycast_grad_decim=2)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])
    fn = functools.partial(
        process_frame, field=slam.field, iterations=slam.iterations,
        tracking_rate=1, integration_rate=1, bilateral=False,
        icp_threshold=cfg.icp_threshold, use_gt=False, neg_y=False,
        normals="hybrid", integrate_budget=3072, finest_decimate=2,
        scan_stride=1.0, alloc_rate=2, grad_decim=2)
    k_dev = jnp.asarray(k)
    eye = jnp.eye(4, dtype=jnp.float32)

    def scan_step(state, inp):
        depth, frame = inp
        return fn(state, depth, k_dev, frame, eye), ()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, depth_chunk, frame0):
        frames = frame0 + jnp.arange(depth_chunk.shape[0], dtype=jnp.int32)
        state, _ = jax.lax.scan(scan_step, state, (depth_chunk, frames))
        return state

    t0 = time.perf_counter()
    st = run_chunk(slam.state, jnp.asarray(depths[:16]),
                   jnp.asarray(0, jnp.int32))
    st = run_chunk(st, jnp.asarray(depths[16:32]), jnp.asarray(16, jnp.int32))
    n_blocks = int(st.map.n_blocks)
    print(f"# map built: {n_blocks} blocks in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    m = st.map

    # full-map meshing as ONE device program: live slots compacted first,
    # then a dynamic-trip fori_loop over just their chunks (dead capacity
    # costs nothing), checksum-reduced
    field = slam.field
    CHUNK = 64
    cap = m.capacity
    other = [c.name for c in m.channels if c.name != field.select_channel]
    wname = other[0] if other else field.select_channel

    def chunk_fn(mm, slots):
        return meshing._block_chunk_triangles(
            mm, slots=slots, inside_fn=field.is_inside,
            observed_fn=lambda vals: vals[wname] != 0.0,
            channel=field.select_channel)

    @jax.jit
    def mesh_all(mm):
        from supereight_tpu.core import octree as oc
        live = oc.slot_mask(mm)
        n_live = jnp.sum(live.astype(jnp.int32))
        slots_sorted = jnp.nonzero(live, size=cap, fill_value=0)[0]
        n_chunks = (n_live + CHUNK - 1) // CHUNK

        def body(i, acc):
            slots = jax.lax.dynamic_slice(slots_sorted, (i * CHUNK,),
                                          (CHUNK,))
            in_range = (i * CHUNK + jnp.arange(CHUNK)) < n_live
            tris, valid = chunk_fn(mm, slots)
            valid = valid & in_range[:, None, None]
            s, n = acc
            t = jnp.where(valid[..., None, None], tris, 0.0)
            return s + jnp.sum(t), n + jnp.sum(valid)
        return jax.lax.fori_loop(0, n_chunks, body,
                                 (jnp.zeros(()), jnp.zeros((), jnp.int32)))

    # warm up / compile
    s0, n0 = mesh_all(m)
    n_tris = int(n0)
    REPS = 8
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(REPS):
        s0, n0 = mesh_all(m)
        acc += float(s0)       # one tiny fetch per rep keeps it honest
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"# mesh_all: {ms:.1f} ms for {n_tris} triangles "
          f"({n_blocks} live blocks, live-compacted sweep)",
          file=sys.stderr)

    # sanity: host-loop marching_cubes agrees on the triangle count
    tris_host = meshing.marching_cubes(m, field.select_channel,
                                       inside=field.is_inside)
    out = {
        "mesh_ms_on_chip": round(ms, 2),
        "triangles": n_tris,
        "triangles_host_path": int(tris_host.shape[0]),
        "live_blocks": n_blocks,
        "sweep": "live-compacted",
        "reps": REPS,
    }
    with open(os.path.join(here, "bench_data/mesh_bench.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
