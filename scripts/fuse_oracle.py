"""Fusion differential oracle (VERDICT r3 item 2): the track_oracle move
applied to the MAP.

Both sides integrate the SAME depth frames with the SAME ground-truth
poses — the reference via csrc/fuse_oracle_<field> (its own
buildAllocationList/buildOctantList + sdf_update/bfusion_update compiled
out-of-tree, saving its map in Octree::save format), ours via the normal
pipeline in gt mode — and the two maps are compared per voxel.  With
tracking removed, any field difference is fusion/allocation, not pose
feedback; this localizes the OFusion accuracy gap (BASELINE 0.61 cm vs
our 2.21) to a stage.

Usage:
  python scripts/fuse_oracle.py --field sdf|ofusion
      [--ours MAP.bin]          # map saved by `ate_bench --gt --save-map`
      [--size N] [--frames N] [--mu F] [--frames-npz NAME]
Without --ours, runs our pipeline inline (CPU-safe at --size 64).
Writes bench_data/fuse_oracle_<field>[_SIZE].json.
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def _flag(name, default, cast):
    return cast(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


def write_blob(path, depths, poses, k):
    with open(path, "wb") as fh:
        H, W = depths.shape[1:]
        fh.write(struct.pack("<iii", H, W, len(depths)))
        fh.write(np.asarray(k, np.float32).tobytes())
        for d, p in zip(depths, poses):
            fh.write(np.asarray(p, np.float32).tobytes())
            fh.write(np.asarray(d, np.uint16).tobytes())


def run_ours_inline(field_name, depths, poses, k, size, mu, capacity):
    import jax.numpy as jnp
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem
    cfg = Configuration(volume_resolution=(size,) * 3,
                        volume_size=(4.8,) * 3, pyramid=(10, 5, 4),
                        integration_rate=1, block_capacity=capacity,
                        mu=mu, field_type=field_name,
                        initial_pos_factor=(0, 0, 0))
    H, W = depths.shape[1:]
    slam = DenseSLAMSystem((H, W), cfg)
    for i, (d, p) in enumerate(zip(depths, poses)):
        slam.step(jnp.asarray(d), jnp.asarray(k, np.float32), i, gt_pose=p)
    import jax
    return jax.device_get(slam.state.map)


def compare(field_name, ref_m, our_m):
    """Per-voxel field comparison over the union of allocated blocks."""
    from supereight_tpu.core import octree
    names = [c.name for c in ref_m.channels]
    out = {}

    def dense(m):
        live = np.asarray(octree.slot_mask(m))
        bc = np.asarray(octree.block_coords_table(m))[live]
        B = m.blocks_per_edge
        lin = bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2]
        d = {}
        for n in names:
            v = np.asarray(m.voxels[n])[live]
            flat = np.full((B * B * B, 512), np.nan, v.dtype)
            flat[lin] = v
            d[n] = flat
        return d, set(map(int, lin))

    rd, rset = dense(ref_m)
    od, oset = dense(our_m)
    out["ref_blocks"] = len(rset)
    out["our_blocks"] = len(oset)
    out["common_blocks"] = len(rset & oset)
    out["only_ref"] = len(rset - oset)
    out["only_ours"] = len(oset - rset)

    x_r, x_o = rd[names[0]], od[names[0]]
    y_r, y_o = rd[names[1]], od[names[1]]
    both = ~np.isnan(x_r) & ~np.isnan(x_o)
    if field_name == "sdf":
        # voxels observed by both (weight > 0); truncation band |tsdf|<1
        upd = both & (y_r > 0) & (y_o > 0)
        band = upd & (np.abs(x_r) < 1.0) & (np.abs(x_o) < 1.0)
        near = upd & (np.abs(x_r) < 0.25)
        out["updated_both"] = int(upd.sum())
        out["updated_ref_only"] = int((both & (y_r > 0) & (y_o <= 0)).sum())
        out["updated_ours_only"] = int((both & (y_o > 0) & (y_r <= 0)).sum())
        d = (x_r - x_o)[band]
        dn = (x_r - x_o)[near]
        out["band_voxels"] = int(band.sum())
        out["tsdf_band_rms"] = float(np.sqrt(np.mean(d ** 2))) if d.size else None
        out["tsdf_band_max"] = float(np.abs(d).max()) if d.size else None
        out["tsdf_near_rms"] = float(np.sqrt(np.mean(dn ** 2))) if dn.size else None
        wd = (y_r - y_o)[upd]
        out["weight_rms"] = float(np.sqrt(np.mean(wd ** 2))) if wd.size else None
    else:
        upd = both & (y_r > 0) & (y_o > 0)
        out["updated_both"] = int(upd.sum())
        out["updated_ref_only"] = int((both & (y_r > 0) & (y_o <= 0)).sum())
        out["updated_ours_only"] = int((both & (y_o > 0) & (y_r <= 0)).sum())
        d = (x_r - x_o)[upd]
        out["logodds_rms"] = float(np.sqrt(np.mean(d ** 2))) if d.size else None
        out["logodds_max"] = float(np.abs(d).max()) if d.size else None
        # near-surface: |log-odds| small on the reference side
        near = upd & (np.abs(x_r) < 10.0)
        dn = (x_r - x_o)[near]
        out["logodds_near_rms"] = float(np.sqrt(np.mean(dn ** 2))) if dn.size else None
        # sign agreement (occupied vs free) where both updated
        out["sign_agree_frac"] = float(
            ((x_r > 0) == (x_o > 0))[upd].mean()) if upd.sum() else None
    return out


def main():
    field_name = _flag("--field", "sdf", str)
    size = _flag("--size", 64, int)
    nf = _flag("--frames", 96, int)
    capacity = _flag("--capacity", 6144 if size >= 256 else 2048, int)
    mu = _flag("--mu", 0.1 if field_name == "sdf" else 0.008, float)
    frames_npz = _flag("--frames-npz", "synthetic_256_frames.npz", str)
    ours_path = _flag("--ours", None, str)

    z = np.load(os.path.join(REPO, "bench_data", frames_npz))
    depths, poses = z["depths"][:nf], z["poses"][:nf]
    k = [240.6, 240.0, 160.0, 120.0]

    blob = f"/tmp/fuse_blob_{field_name}.bin"
    ref_bin = f"/tmp/fuse_ref_{field_name}.bin"
    write_blob(blob, depths, poses, k)
    tool = os.path.join(REPO, "csrc", f"fuse_oracle_{field_name}")
    subprocess.run([tool, blob, ref_bin, str(mu), str(size), "4.8"],
                   check=True, timeout=3600)

    from supereight_tpu.io import serialise
    from supereight_tpu.fields import make_field
    field = make_field(field_name, mu=mu) if field_name == "sdf" else \
        make_field(field_name, mu=mu, voxel_size=4.8 / size)
    ref_m = serialise.load_se(ref_bin, field.channels, capacity=capacity)
    assert ref_m.size == size

    if ours_path:
        our_m = serialise.load_se(ours_path, field.channels,
                                  capacity=capacity)
    else:
        our_m = run_ours_inline(field_name, depths, poses, k, size, mu,
                                capacity)

    out = {"field": field_name, "size": size, "frames": int(nf), "mu": mu,
           "sequence": frames_npz.replace(".npz", ""),
           "ours": ours_path or "inline-gt"}
    out.update(compare(field_name, ref_m, our_m))
    print(json.dumps(out, indent=1))
    tag = f"_{size}" if size != 256 else ""
    with open(os.path.join(REPO,
              f"bench_data/fuse_oracle_{field_name}{tag}.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
