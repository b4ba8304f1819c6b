"""Generate round artifacts from a real-chip 256^3 ICP run: render
triptych, free-view re-raycast, surface mesh (PLY), trajectory plot.

Doubles as an end-to-end validation of the renderers and the mesher at
production scale.  Writes into bench_data/artifacts/.
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
    signal.alarm(3300)
    import jax
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem, camera, rendering
    from supereight_tpu.pipeline.system import process_frame
    from supereight_tpu.apps.viewer import save_triptych, plot_trajectory

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "bench_data/artifacts")
    os.makedirs(out, exist_ok=True)
    z = np.load(os.path.join(here, "bench_data/synthetic_256_frames.npz"))
    depths, poses = z["depths"], z["poses"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W, SIZE, NF = 240, 320, 256, 64

    cfg = Configuration(volume_resolution=(SIZE,) * 3,
                        volume_size=(4.8,) * 3, pyramid=(10, 5, 4),
                        integration_rate=1, block_capacity=6144)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])

    fn = functools.partial(process_frame, field=slam.field,
                           iterations=slam.iterations, tracking_rate=1,
                           integration_rate=1, bilateral=False,
                           icp_threshold=cfg.icp_threshold,
                           use_gt=False, neg_y=False)
    k_dev = jnp.asarray(k)
    depths_dev = jnp.asarray(depths)
    eye = jnp.eye(4, dtype=jnp.float32)

    def scan_step(state, inp):
        depth, frame = inp
        state = fn(state, depth, k_dev, frame, eye)
        return state, state.pose

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, dchunk, frame0):
        frames = frame0 + jnp.arange(dchunk.shape[0], dtype=jnp.int32)
        return jax.lax.scan(scan_step, state, (dchunk, frames))

    CHUNK = 16
    st = slam.state
    est = []
    for s in range(0, NF, CHUNK):
        st, ps = run_chunk(st, depths_dev[s:s + CHUNK],
                           jnp.asarray(s, jnp.int32))
        est.append(np.asarray(ps))
    slam.state = st
    est = np.concatenate(est, axis=0)
    print(f"# ran {NF} frames; blocks {int(st.map.n_blocks)}",
          file=sys.stderr)

    # triptych from the tracked state
    save_triptych(os.path.join(out, "triptych_frame63.png"),
                  slam.renderDepth(), slam.renderTrack(),
                  slam.renderVolume())

    # free-view re-raycast (renderVolume(view_pose, k) path)
    view_pose = np.asarray(st.pose).copy()
    view_pose[:3, 3] += np.asarray([0.25, -0.15, -0.3], np.float32)
    free = np.asarray(slam.renderVolume(view_pose, k))
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imsave(os.path.join(out, "free_view.png"), free[..., :3])

    # trajectory vs ground truth
    plot_trajectory(os.path.join(out, "trajectory.png"), list(est),
                    list(poses[:NF]))

    # mesh (PLY, marching tetrahedra over the live blocks)
    t0 = time.perf_counter()
    tris = slam.dump_mesh(os.path.join(out, "room_mesh.vtk"))
    from supereight_tpu.io import vtk as vtk_io
    vtk_io.write_ply_mesh(os.path.join(out, "room_mesh.ply"), tris)
    print(f"# mesh: {len(tris)} triangles in "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    rec = {"frames": NF, "blocks": int(st.map.n_blocks),
           "triangles": int(len(tris)),
           "free_view_nonzero_frac":
               float((free[..., :3].sum(-1) > 0).mean())}
    with open(os.path.join(out, "artifacts.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
