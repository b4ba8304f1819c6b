"""Render every ATE record in bench_data/ as one sorted table.

Usage: python scripts/records_table.py [--csv | --check]

Reads the ate_icp*.json records written by scripts/ate_bench.py and
prints config | fps | ATE | blocks rows sorted by (size, field, -fps),
so the Pareto front is visible at a glance and the STATUS.md table can
be regenerated instead of hand-maintained.

``--check`` verifies STATUS.md against the captures (VERDICT r3 item 8:
docs must quote the measured records verbatim).  STATUS.md embeds a
``STATUS-CLAIMS`` JSON block listing every headline number with its
source file + key; the check fails if a claim diverges from its source
JSON or if the quoted text is missing from the STATUS prose.  Run by
tests/test_tools.py so `make test` catches doc/capture drift.
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
    if rec.get("alloc_adaptive_deg", 0.0) > 0:
        parts.append(f"aad{rec['alloc_adaptive_deg']:g}"
                     f"x{rec.get('alloc_adaptive_dist', 0.24):g}")
    if rec.get("alloc_on_demand", 0.0) > 0:
        t = f"aod{rec['alloc_on_demand']:g}"
        if rec.get("alloc_on_demand_border", 0.0) > 0:
            t += f"b{rec['alloc_on_demand_border']:g}"
        parts.append(t)
    if not rec.get("coarse_alloc", True):
        parts.append("eca")
    if rec.get("grad_decim", 1) != 1:
        parts.append(f"gd{rec['grad_decim']}")
    if rec.get("integrate_patch", 16) != 16:
        parts.append(f"pt{rec['integrate_patch']}")
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
    if rec.get("mu") not in (None, 0.1, 0.05):
        parts.append(f"mu{rec['mu']:g}")
    if rec.get("mode") == "gt":
        parts.append("gt")
    if rec.get("bilateral"):
        parts.append("bf")
    if rec.get("sync_fetch"):
        parts.append("syncfetch")
    if rec.get("chunk", 16) != 16:
        parts.append(f"ck{rec['chunk']}")
    seq = rec.get("sequence", "synthetic_256_frames")
    if seq != "synthetic_256_frames":
        parts.append("[" + seq.replace("synthetic_256_frames_", "") + "]")
    return " ".join(parts)


def check_status_claims(root: str) -> int:
    """Verify every STATUS-CLAIMS entry against its source JSON and the
    STATUS.md prose.  Returns the number of failures (0 = consistent)."""
    import re
    status_path = os.path.join(root, "STATUS.md")
    with open(status_path) as fh:
        status = fh.read()
    m = re.search(r"<!--\s*STATUS-CLAIMS\s*(\[.*?\])\s*-->", status,
                  re.DOTALL)
    if not m:
        print("FAIL: no STATUS-CLAIMS block in STATUS.md")
        return 1
    claims = json.loads(m.group(1))
    # the claims block must not satisfy its own prose check
    status = status.replace(m.group(0), "")
    failures = 0
    for c in claims:
        path = os.path.join(root, c["file"])
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except OSError as e:
            print(f"FAIL: {c['file']}: {e}")
            failures += 1
            continue
        actual = rec
        for part in c["key"].split("."):
            actual = actual[part]
        actual = float(actual) * c.get("scale", 1.0)
        tol = c.get("tol", max(abs(c["value"]) * 0.005, 1e-9))
        if abs(actual - c["value"]) > tol:
            print(f"FAIL: {c['file']}:{c['key']} = {actual:g}, STATUS "
                  f"claims {c['value']:g} (tol {tol:g})")
            failures += 1
        text = c.get("text", f"{c['value']:g}")
        if text not in status:
            print(f"FAIL: claimed text {text!r} ({c['file']}:{c['key']}) "
                  f"not quoted anywhere in STATUS.md")
            failures += 1
    if not failures:
        print(f"STATUS-CLAIMS ok: {len(claims)} claims match their "
              f"capture files")
    return failures


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--check" in sys.argv:
        sys.exit(1 if check_status_claims(here) else 0)
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
