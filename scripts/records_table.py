"""Render every ATE record in bench_data/ as one sorted table.

Usage: python scripts/records_table.py [--csv]

Reads the ate_icp*.json records written by scripts/ate_bench.py and
prints config | fps | ATE | blocks rows sorted by (size, field, -fps),
so the Pareto front is visible at a glance and the STATUS.md table can
be regenerated instead of hand-maintained.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def knobs(rec: dict) -> str:
    parts = [rec.get("normals", "volume")]
    z = rec.get("integration_rate", 1)
    parts.append(f"-z{z}")
    if rec.get("icp_finest_decimate", 1) != 1:
        parts.append(f"id{rec['icp_finest_decimate']}")
    if rec.get("integrate_budget", 0):
        parts.append(f"ib{rec['integrate_budget']}")
    if rec.get("scan_stride", 0.5) != 0.5:
        parts.append(f"ss{rec['scan_stride']:g}")
    if rec.get("midsolve"):
        parts.append("m")
    if rec.get("raycast_rate", 1) != 1:
        parts.append(f"rr{rec['raycast_rate']}"
                     + ("w" if rec.get("raycast_warp") else ""))
    if rec.get("adaptive_deg", 0.0) > 0:
        tag = f"ad{rec['adaptive_deg']:g}"
        if rec.get("adaptive_dist", 0.12) != 0.12:
            tag += f"x{rec['adaptive_dist']:g}"
        parts.append(tag)
    if rec.get("w2_budget", 8192) != 8192:
        parts.append(f"w2b{rec['w2_budget']}")
    if rec.get("alloc_stride", 1.0) != 1.0:
        parts.append(f"as{rec['alloc_stride']:g}")
    if rec.get("alloc_rate", 1) != 1:
        parts.append(f"ar{rec['alloc_rate']}")
    if rec.get("grad_decim", 1) != 1:
        parts.append(f"gd{rec['grad_decim']}")
    if rec.get("incremental_view"):
        parts.append("iv")
    if rec.get("span_factor", 1.6) != 1.6:
        parts.append(f"sp{rec['span_factor']:g}")
    if rec.get("gather_streams", 1) != 1:
        parts.append(f"gs{rec['gather_streams']}")
    if not rec.get("near_rescue", True):
        parts.append("nr")
    if rec.get("lazy_assoc"):
        parts.append("la")
    if rec.get("refine", "secant") != "secant":
        parts.append(rec["refine"])
    if not rec.get("second_window", True):
        parts.append("nf2")
    if rec.get("mode") == "gt":
        parts.append("gt")
    if rec.get("bilateral"):
        parts.append("bf")
    seq = rec.get("sequence", "synthetic_256_frames")
    if seq != "synthetic_256_frames":
        parts.append("[" + seq.replace("synthetic_256_frames_", "") + "]")
    return " ".join(parts)


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for path in sorted(glob.glob(os.path.join(here, "bench_data/ate_*.json"))):
        with open(path) as fh:
            rec = json.load(fh)
        rows.append((rec.get("size", 0), rec.get("field", "?"),
                     -rec.get("steady_fps", 0.0), knobs(rec),
                     rec.get("steady_fps", 0.0),
                     rec.get("ate_rmse_m", float("nan")) * 100.0,
                     rec.get("blocks", 0), os.path.basename(path)))
    rows.sort()
    if "--csv" in sys.argv:
        print("size,field,config,fps,ate_cm,blocks,file")
        for size, field, _, cfg, fps, ate, blocks, name in rows:
            print(f"{size},{field},{cfg},{fps},{ate:.2f},{blocks},{name}")
        return
    print(f"{'size':>5} {'field':7} {'config':42} {'fps':>6} "
          f"{'ATE cm':>7} {'blocks':>7}")
    for size, field, _, cfg, fps, ate, blocks, name in rows:
        print(f"{size:>5} {field:7} {cfg:42} {fps:>6.1f} {ate:>7.2f} "
              f"{blocks:>7}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:     # head/less closed the pipe
        pass
