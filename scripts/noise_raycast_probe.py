"""512^3-noise first-lock bisect probe (CPU): build maps from the SAME
4 noisy frames at GT poses at 256^3 and 512^3, raycast once from the
frame-4 pose, and report per-ray outcome statistics — isolating the
map+raycast from ICP feedback entirely.

The closed-loop failure signature (ate_bench --dump-traj histograms):
at 512^3 the frame-4 reference map yields ~857 inlier pixels vs ~24k at
256^3 (no_ref_normal ~61k).  This probe answers WHERE the rays go:
no crossing found at all, crossing at the wrong depth, or normals too
noisy — and lets raycast internals (splat bounds, scan stride,
full-res, show-through) be toggled without the chip.

Usage (CPU): python scripts/noise_raycast_probe.py [--size 512]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem, camera
    from supereight_tpu.pipeline.system import process_frame
    import functools

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "bench_data",
                             "synthetic_256_frames_noisy.npz"))
    zc = np.load(os.path.join(here, "bench_data",
                              "synthetic_256_frames.npz"))
    depths, poses = z["depths"], z["poses"]
    clean = zc["depths"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W = 240, 320

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [256, 512]
    out = {}
    for size in sizes:
        cfg = Configuration(volume_resolution=(size,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(10, 5, 4),
                            block_capacity=24576 if size >= 512 else 6144,
                            integration_rate=1, mu=0.05,
                            raycast_near_rescue=False,
                            field_type="ofusion")
        slam = DenseSLAMSystem((H, W), cfg)
        slam.setPose(poses[0])
        fn = functools.partial(
            process_frame, field=slam.field, iterations=slam.iterations,
            tracking_rate=1, integration_rate=1, bilateral=True,
            icp_threshold=1e-5, use_gt=True, neg_y=False,
            normals="volume", near_rescue=False)
        st = slam.state
        import jax
        step = jax.jit(fn, static_argnames=())
        for i in range(5):
            st = step(st, jnp.asarray(depths[i]), jnp.asarray(k),
                      jnp.asarray(i, jnp.int32), jnp.asarray(poses[i]))
        # st.ref_* is the raycast from the frame-4 GT pose of the 4-frame
        # gt-built map.  Reproject to camera depth and compare to CLEAN
        # depth (the true surface).
        rv = np.asarray(st.ref_vertex)
        rn = np.asarray(st.ref_normal)
        T_wc = np.linalg.inv(np.asarray(st.raycast_pose))
        pc = (rv @ T_wc[:3, :3].T) + T_wc[:3, 3]
        zc_map = pc[..., 2]
        true_d = clean[4].astype(np.float32) / 1000.0
        noisy_d = depths[4].astype(np.float32) / 1000.0
        valid_n = rn[..., 0] != -2.0
        has_hit = np.abs(zc_map) > 1e-6
        sel = valid_n & (true_d > 0)
        err = np.abs(zc_map - true_d)[sel]
        out[size] = {
            "blocks": int(st.map.n_blocks),
            "rays": int(true_d.size),
            "hit_fraction": round(float(has_hit.mean()), 4),
            "valid_normal_fraction": round(float(valid_n.mean()), 4),
            "depth_err_median_m": round(float(np.median(err)), 4),
            "depth_err_p90_m": round(float(np.percentile(err, 90)), 4),
            "err_gt_10cm_fraction": round(float((err > 0.10).mean()), 4),
            "noise_mad_m": round(float(np.median(
                np.abs(noisy_d - true_d)[true_d > 0])), 4),
        }
        print(size, out[size], flush=True)
    path = os.path.join(here, "bench_data", "noise_raycast_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
