"""Differential tracking test against the reference's own kernels.

Runs the closed-loop pipeline on a chosen sequence; at selected frames it
dumps the EXACT tracking inputs (filtered depth, reference maps, poses)
to a blob, solves the frame with BOTH implementations — our
`tracking_stage` and the reference's compiled tracking loop
(csrc/track_oracle, built from the read-only reference sources) — and
prints the solved poses side by side.  Arbiter for the noisy-sequence
ICP question in STATUS "Generalization".

Usage: python scripts/track_oracle.py [--frames-npz NAME] [--bilateral]
       [--at 50,66,82]
"""

from __future__ import annotations

import functools
import json
import os
import struct
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ORACLE = os.path.join(REPO, "csrc/track_oracle")


def main():
    import signal
    signal.alarm(3300)
    frames_npz = sys.argv[sys.argv.index("--frames-npz") + 1] \
        if "--frames-npz" in sys.argv else "synthetic_256_frames.npz"
    bilateral = "--bilateral" in sys.argv
    at = [int(x) for x in (sys.argv[sys.argv.index("--at") + 1]
                           if "--at" in sys.argv else "50,66,82").split(",")]

    mode = 1 if "--our-pyramid" in sys.argv else 0

    import jax
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.pipeline import system as psys
    from supereight_tpu.pipeline import preprocessing

    z = np.load(os.path.join(REPO, "bench_data", frames_npz))
    depths, poses = z["depths"], z["poses"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W = 240, 320

    cfg = Configuration(volume_resolution=(256,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(10, 5, 4), integration_rate=1,
                        block_capacity=6144,
                        bilateral_filter=bilateral)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])
    field = slam.field
    k_dev = jnp.asarray(k)

    step = jax.jit(functools.partial(
        psys.process_frame, field=field, iterations=slam.iterations,
        tracking_rate=1, integration_rate=1, bilateral=bilateral,
        icp_threshold=cfg.icp_threshold, use_gt=False, neg_y=False))
    pre = jax.jit(functools.partial(psys.preprocessing_stage,
                                    bilateral=bilateral))
    trk = jax.jit(functools.partial(
        psys.tracking_stage, field=field, iterations=slam.iterations,
        tracking_rate=1, icp_threshold=cfg.icp_threshold,
        use_gt=False, neg_y=False))

    state = slam.state
    eye = jnp.eye(4, dtype=jnp.float32)
    results = []
    for f in range(max(at) + 1):
        if f in at and f > 3:
            # dump the tracking inputs of THIS frame, solve both ways
            st_pre = pre(state, jnp.asarray(depths[f]))
            blob = os.path.join("/tmp", f"track_blob_{f}.bin")
            if mode == 1:
                # dump OUR pyramid so the oracle's ICP loop runs on
                # identical inputs (bisects pyramid vs loop differences)
                ds, vs_, ns_ = preprocessing.build_pyramid(
                    st_pre.scaled_depth, k_dev, 3, neg_y=False)
                with open(blob + ".pyr", "wb") as fh:
                    for lv in range(3):
                        fh.write(np.ascontiguousarray(
                            np.asarray(vs_[lv]), np.float32).tobytes())
                        fh.write(np.ascontiguousarray(
                            np.asarray(ns_[lv]), np.float32).tobytes())
            with open(blob, "wb") as fh:
                fh.write(struct.pack("<iii", H, W, mode))
                for a in (np.asarray(st_pre.scaled_depth),
                          np.asarray(st_pre.ref_vertex),
                          np.asarray(st_pre.ref_normal),
                          np.asarray(st_pre.pose),
                          np.asarray(st_pre.raycast_pose),
                          k, np.asarray([cfg.icp_threshold], np.float32)):
                    fh.write(np.ascontiguousarray(a, np.float32).tobytes())
            st_trk = trk(st_pre, k_dev, jnp.asarray(f, jnp.int32), eye)
            ours = np.asarray(st_trk.pose)
            out = subprocess.run([ORACLE, blob], capture_output=True,
                                 text=True, timeout=300)
            vals = out.stdout.split()
            ref_pose = np.asarray([float(v) for v in vals[:16]]
                                  ).reshape(4, 4)
            tracked_ref, rmse_ref = int(vals[16]), float(vals[17])
            gt = poses[f]
            d_impl = float(np.linalg.norm(ours[:3, 3] - ref_pose[:3, 3]))
            results.append({
                "frame": f,
                "ours_vs_oracle_m": round(d_impl, 5),
                "ours_vs_gt_m": round(float(np.linalg.norm(
                    ours[:3, 3] - gt[:3, 3])), 5),
                "oracle_vs_gt_m": round(float(np.linalg.norm(
                    ref_pose[:3, 3] - gt[:3, 3])), 5),
                "ours_tracked": bool(st_trk.tracked),
                "oracle_tracked": bool(tracked_ref),
                "oracle_rmse": round(rmse_ref, 5),
            })
            print(json.dumps(results[-1]), file=sys.stderr)
        state = step(state, jnp.asarray(depths[f]), k_dev,
                     jnp.asarray(f, jnp.int32), eye)
    tag = frames_npz.replace("synthetic_256_frames", "")\
        .replace(".npz", "")
    if bilateral:
        tag += "_bf"
    if mode == 1:
        tag += "_ourpyr"
    path = os.path.join(REPO, f"bench_data/track_oracle{tag}.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
