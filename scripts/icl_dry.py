"""Real-dataset readiness drill (VERDICT r4 item 8): exercise the EXACT
`make icl-bench` code path — registry entry ``icl-lr-traj2`` →
tools/scene2raw conversion → benchmark → evaluate → driver metric — on a
fabricated ICL-NUIM scene tree, since the real archive cannot be
downloaded in this zero-egress environment.

With the real dataset on disk the identical path runs via::

    datasets/living_room_traj2_loop/   scene_00_0000.depth ... (text
                                       euclidean ray lengths, 640x480)
    datasets/livingRoom2.gt.freiburg   TUM-format ground truth
    make icl-bench                     # prints the driver metric JSON

Usage: python scripts/icl_dry.py  (CPU env; ~1 min)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate(root: str, n_frames: int = 4):
    """Write a tiny ICL-style tree for the lr-traj2 registry entry:
    euclidean-ray text .depth files + freiburg ground truth."""
    from supereight_tpu.io import synthetic, groundtruth
    from supereight_tpu.tools.scene2raw import SCENE_K, SCENE_W, SCENE_H

    seq = os.path.join(root, "living_room_traj2_loop")
    os.makedirs(seq, exist_ok=True)
    depths, poses, k = synthetic.generate_sequence(
        n_frames, H=SCENE_H, W=SCENE_W, room_dim=4.8)
    fx, fy, cx, cy = SCENE_K
    u = (np.arange(SCENE_W, dtype=np.float32) - cx) / fx
    v = (np.arange(SCENE_H, dtype=np.float32) - cy) / fy
    norm = np.sqrt(1.0 + u[None, :] ** 2 + v[:, None] ** 2)
    for i, d in enumerate(depths):
        eu = (np.asarray(d, np.float32) / 1000.0) * norm
        with open(os.path.join(seq, f"scene_00_{i:04d}.depth"), "w") as f:
            eu.astype(np.float32).tofile(f, sep=" ")
    groundtruth.write_poses(
        os.path.join(root, "livingRoom2.gt.freiburg"), poses)
    return k


def main():
    from supereight_tpu.apps import runner

    root = os.environ.get("SE_DATASETS", "")
    fabricated = False
    if not root or not os.path.isdir(
            os.path.join(root, "living_room_traj2_loop")):
        root = tempfile.mkdtemp(prefix="se_icl_dry_")
        k = fabricate(root)
        os.environ["SE_DATASETS"] = root
        fabricated = True
        # fabricated frames are tiny: drop to a small map + the scene
        # camera scaled by -r 8 like the ingestion test
        kk = ",".join(str(float(x)) for x in k)
        extra = ("-r", "8", "-k", kk)
        # auto_regime off: the 4-frame 64^3 toy run mistracks by
        # construction, and the drill must exercise the SDF icl-bench
        # path, not a dispatcher rerun
        res = runner.run("icl-lr-traj2", field="sdf", resolution=64,
                         frames=4, extra_args=extra, auto_regime=False)
    else:
        res = runner.run("icl-lr-traj2", field="sdf", resolution=256)
    res["fabricated_tree"] = fabricated
    print(json.dumps(res, indent=2))
    assert res["frames"] > 0
    raw = os.path.join(root, "living_room_traj2_loop.raw")
    assert os.path.exists(raw), "scene2raw conversion did not run"
    print(f"# icl drill ok: {res['frames']} frames via {raw}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
