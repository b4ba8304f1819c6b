"""Like-for-like reference-CPU anchor run (VERDICT r2 item 3).

Exports the EXACT 96-frame synthetic sequence the TPU bench uses
(bench_data/synthetic_256_frames.npz) to the reference's SLAMBench .raw
format, runs the reference CPU binary (`se-denseslam-sdf-benchmark`,
built offline via refbuild/ — tensorflow's vendored Eigen + a minimal SE3
shim), parses its per-frame TSV trajectory (`benchmark.cpp:110-173`), and
computes Horn-aligned ATE against the renderer's ground-truth poses with
the same evaluate.ate() used for the TPU records.

The reference binary estimates poses in its own world frame (camera0 at
init_pose with identity rotation); Horn alignment absorbs the fixed rigid
offset, so its ATE is directly comparable with bench_data/ records.

Run:  python scripts/ref_anchor.py [--binary PATH] [--field sdf|ofusion]
Writes bench_data/ref_anchor_<field>.json.

Pure CPU — safe to run anywhere (no TPU, no jax needed beyond numpy).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from supereight_tpu.apps import evaluate            # noqa: E402
from supereight_tpu.io import raw                    # noqa: E402


def export_raw(npz_path: str, out_raw: str) -> np.ndarray:
    z = np.load(npz_path)
    depths, poses = z["depths"], z["poses"]
    w = raw.RawWriter(out_raw, depths.shape[2], depths.shape[1])
    for d in depths:
        w.write(d)
    w.close()
    return poses


def parse_tsv(path: str):
    rows = []
    with open(path) as fh:
        header = fh.readline().split()
        ix, iy, iz = header.index("X"), header.index("Y"), header.index("Z")
        i_track = header.index("tracked")
        i_comp = header.index("computation")
        for line in fh:
            f = line.split()
            if len(f) < i_track + 1:
                continue
            rows.append((float(f[ix]), float(f[iy]), float(f[iz]),
                         float(f[i_comp]), int(f[i_track])))
    arr = np.asarray(rows, np.float64)
    return arr[:, :3], arr[:, 3], arr[:, 4].astype(int)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default=os.path.join(
        REPO, "refbuild/build/se_apps/se-denseslam-sdf-benchmark"))
    ap.add_argument("--field", default="sdf", choices=["sdf", "ofusion"])
    ap.add_argument("--mu", type=float, default=None)
    ap.add_argument("--init-pose", default="0.5,0.5,0.27")
    ap.add_argument("--frames-npz", default="synthetic_256_frames.npz",
                    help="sequence under bench_data/ (alt/noisy variants)")
    ap.add_argument("--extra", default="",
                    help="extra flags for the reference binary (e.g. -F)")
    args = ap.parse_args()
    if args.field == "ofusion":
        args.binary = args.binary.replace("-sdf-", "-ofusion-")
    mu = args.mu if args.mu is not None else (
        0.1 if args.field == "sdf" else 0.008)

    npz = os.path.join(REPO, "bench_data", args.frames_npz)
    raw_path = "/tmp/anchor.raw"
    poses = export_raw(npz, raw_path)
    gt_xyz = poses[:, :3, 3].astype(np.float64)

    log = f"/tmp/ref_anchor_{args.field}.tsv"
    cmd = [args.binary, "-i", raw_path, "-s", "4.8", "-p", args.init_pose,
           "-r", "1", "-z", "4", "-c", "1", "-m", str(mu),
           "-k", "240.6,240,160,120", "-o", log] \
        + ([a for a in args.extra.split() if a])
    print("#", " ".join(cmd), file=sys.stderr)
    t0 = time.perf_counter()
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    wall = time.perf_counter() - t0
    if res.returncode != 0:
        print(res.stdout[-2000:], res.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"reference binary failed rc={res.returncode}")

    est_xyz, comp_s, tracked = parse_tsv(log)
    n = min(len(est_xyz), len(gt_xyz))
    ate_stats = evaluate.ate([_pose(t) for t in est_xyz[:n]],
                             [_pose(t) for t in gt_xyz[:n]])
    ate_rmse = ate_stats["rmse"]
    comp_fps = n / comp_s[:n].sum()
    out = {
        "field": args.field,
        "frames": int(n),
        "tracked_frames": int(tracked[:n].sum()),
        "ate_rmse_m": float(ate_rmse),
        "computation_fps": round(float(comp_fps), 3),
        "wall_fps": round(n / wall, 3),
        "mu": mu,
        "host": "this container (1 CPU core, OpenMP)",
        "cmd": " ".join(cmd),
    }
    tag = args.frames_npz.replace("synthetic_256_frames", "")\
        .replace(".npz", "")
    if "-F" in args.extra.split():
        tag += "_bf"
    extra = args.extra.split()
    if "-v" in extra:
        tag += f"_v{extra[extra.index('-v') + 1]}"
    out["sequence"] = args.frames_npz.replace(".npz", "")
    path = os.path.join(REPO, f"bench_data/ref_anchor_{args.field}{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


def _pose(t):
    p = np.eye(4)
    p[:3, 3] = t
    return p


if __name__ == "__main__":
    main()
