"""Noise diagnosis: ICP solve error against a GROUND-TRUTH-fused map.

Separates the two suspects for the noisy-sequence SDF drift (STATUS
"Generalization"): per-frame solve noise vs map-corruption feedback.
Each frame: preprocess -> ICP track (recording the solved pose's error
vs ground truth) -> OVERRIDE the pose with ground truth -> integrate ->
raycast.  The map is therefore always fused at perfect poses; the solved
poses never feed back.  If the solves are tight here, the closed-loop
drift comes from fusing at (slightly) wrong poses; if they still wander,
the solve/raycast noise itself is the gap.

Usage: python scripts/track_probe.py [--frames-npz NAME] [--bilateral]
Writes bench_data/track_probe[_<seq>].json.
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
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.pipeline import system as psys

    frames_npz = sys.argv[sys.argv.index("--frames-npz") + 1] \
        if "--frames-npz" in sys.argv else "synthetic_256_frames.npz"
    bilateral = "--bilateral" in sys.argv

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "bench_data", frames_npz))
    depths, poses = z["depths"], z["poses"]
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
    H, W, NF = 240, 320, 96

    cfg = Configuration(volume_resolution=(256,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(10, 5, 4), integration_rate=1,
                        block_capacity=6144)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])
    field = slam.field
    k_dev = jnp.asarray(k)

    def frame_fn(state, depth, frame, gt):
        state = psys.preprocessing_stage(state, depth, bilateral=bilateral)
        # ICP solve from the gt-accurate previous pose (the previous gt
        # override), against gt-fused reference maps
        st_icp = psys.tracking_stage(state, k_dev, frame, gt, field=field,
                                     iterations=slam.iterations,
                                     tracking_rate=1, icp_threshold=1e-5,
                                     use_gt=False, neg_y=False)
        icp_pose = st_icp.pose
        icp_ok = st_icp.tracked
        # override with ground truth before the map touches anything
        state = state.replace(pose=gt, tracked=jnp.ones((), bool))
        state = psys.integration_stage(state, k_dev, frame, field=field,
                                       integration_rate=1,
                                       integrate_budget=3072)
        state = psys.raycasting_stage(state, k_dev, frame, field=field,
                                      normals="volume")
        return state, (icp_pose, icp_ok)

    def scan_step(state, inp):
        depth, frame, gt = inp
        return frame_fn(state, depth, frame, gt)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, depth_chunk, frame0, gts):
        frames = frame0 + jnp.arange(depth_chunk.shape[0], dtype=jnp.int32)
        return jax.lax.scan(scan_step, state, (depth_chunk, frames, gts))

    depths_dev = jnp.asarray(depths)
    gt_dev = jnp.asarray(poses)
    CHUNK = 16
    t0 = time.perf_counter()
    st, out = run_chunk(slam.state, depths_dev[:CHUNK],
                        jnp.asarray(0, jnp.int32), gt_dev[:CHUNK])
    jax.block_until_ready(st.pose)
    print(f"# compile+chunk0: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    all_p = [np.asarray(out[0])]
    all_ok = [np.asarray(out[1])]
    for s in range(CHUNK, NF, CHUNK):
        st, out = run_chunk(st, depths_dev[s:s + CHUNK],
                            jnp.asarray(s, jnp.int32), gt_dev[s:s + CHUNK])
        all_p.append(np.asarray(out[0]))
        all_ok.append(np.asarray(out[1]))
    icp_poses = np.concatenate(all_p, axis=0)
    oks = np.concatenate(all_ok, axis=0)

    # per-frame solved-pose error vs gt (no alignment needed: same frame)
    terr = np.linalg.norm(icp_poses[:, :3, 3] - poses[:NF, :3, 3], axis=1)
    rot = np.asarray([np.degrees(np.arccos(np.clip(
        (np.trace(icp_poses[i, :3, :3].T @ poses[i, :3, :3]) - 1) / 2,
        -1, 1))) for i in range(NF)])
    out = {
        "sequence": frames_npz.replace(".npz", ""),
        "bilateral": bilateral,
        "tracked_frames": int(oks.sum()),
        "trans_err_rmse_m": round(float(np.sqrt((terr[4:] ** 2).mean())), 5),
        "trans_err_max_m": round(float(terr[4:].max()), 4),
        "rot_err_rmse_deg": round(float(np.sqrt((rot[4:] ** 2).mean())), 4),
        "per_frame_trans_err_m": [round(float(e), 4) for e in terr],
    }
    tag = frames_npz.replace("synthetic_256_frames", "")\
        .replace(".npz", "")
    if bilateral:
        tag += "_bf"
    path = os.path.join(here, f"bench_data/track_probe{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({kk: v for kk, v in out.items()
                      if kk != "per_frame_trans_err_m"}))


if __name__ == "__main__":
    main()
