"""Headless viewer: the reference GUI's render triptych as image files.

Reference: the GLUT/Qt frontend draws depth / ICP-status / shaded-volume
views each frame (`se_apps/src/mainQt.cpp`, `se_apps/include/draw.h`).
Cloud TPU hosts have no display, so this writes the same triptych as PNGs
(matplotlib backend) every ``rate`` frames.

Usage:
    python -m supereight_tpu.apps.viewer -i seq.raw -g seq.gt -v 128 \
        --out-dir renders --rate 5
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from supereight_tpu.apps import benchmark as bench_app
from supereight_tpu.config import Configuration
from supereight_tpu.io import groundtruth, raw
from supereight_tpu.pipeline import DenseSLAMSystem


def save_triptych(path: str, depth_img, track_img, volume_img):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    for ax, img, title in zip(
            axes, (depth_img, track_img, volume_img),
            ("depth", "tracking", "volume")):
        ax.imshow(np.asarray(img)[..., :3])
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_trajectory(path: str, est_poses, gt_poses=None):
    """Estimated (and ground-truth) trajectory top-down + height plot —
    the headless stand-in for the reference GUI's live pose plots
    (qcustomplot panels in `se_apps/qt/`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    est = np.stack([np.asarray(T)[:3, 3] for T in est_poses])
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.plot(est[:, 0], est[:, 2], label="estimated")
    if gt_poses is not None:
        gt = np.stack([np.asarray(T)[:3, 3] for T in gt_poses[:len(est)]])
        ax1.plot(gt[:, 0], gt[:, 2], "--", label="ground truth")
        ax2.plot(gt[:, 1], "--", label="gt y")
    ax1.set_xlabel("x [m]")
    ax1.set_ylabel("z [m]")
    ax1.set_title("trajectory (top-down)")
    ax1.legend()
    ax1.axis("equal")
    ax2.plot(est[:, 1], label="est y")
    ax2.set_xlabel("frame")
    ax2.set_ylabel("y [m]")
    ax2.set_title("height")
    ax2.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def write_scrubber(out_dir: str, frame_files, fps: float = 6.0) -> str:
    """Offline HTML scrubber over the triptych PNGs: slider + play/pause
    at a chosen rate — the decided GUI story for this display-less
    environment (VERDICT r2 item 7; the reference's live Qt window,
    `se_apps/src/mainQt.cpp:91-199`, has no headless equivalent).  Pure
    static file, relative image paths: open ``view.html`` anywhere."""
    frames_js = ",".join(f'"{os.path.basename(f)}"' for f in frame_files)
    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>supereight_tpu viewer</title>
<style>
 body {{ font-family: sans-serif; background:#111; color:#ddd;
        text-align:center }}
 img#frame {{ max-width: 96%; image-rendering: pixelated }}
 .bar {{ margin: 12px }}
 input[type=range] {{ width: 60% }}
</style></head><body>
<h3>supereight_tpu — render triptych scrubber</h3>
<img id="frame" src=""/>
<div class="bar">
 <button id="play">&#9658;</button>
 <input type="range" id="pos" min="0" value="0"/>
 <span id="label"></span>
 <label>fps <input type="number" id="fps" value="{fps:g}" min="1"
  max="60" style="width:4em"/></label>
</div>
<img src="trajectory.png" style="max-width:70%"/>
<script>
 const frames = [{frames_js}];
 const img = document.getElementById("frame");
 const pos = document.getElementById("pos");
 const label = document.getElementById("label");
 const fps = document.getElementById("fps");
 pos.max = frames.length - 1;
 let timer = null;
 function show(i) {{
   i = Math.max(0, Math.min(frames.length - 1, i|0));
   pos.value = i; img.src = frames[i];
   label.textContent = frames[i] + " (" + (i+1) + "/" + frames.length + ")";
 }}
 pos.oninput = () => show(+pos.value);
 document.getElementById("play").onclick = function () {{
   if (timer) {{ clearInterval(timer); timer = null;
                 this.innerHTML = "&#9658;"; return; }}
   this.innerHTML = "&#10074;&#10074;";
   timer = setInterval(() => show((+pos.value + 1) % frames.length),
                       1000 / +fps.value);
 }};
 if (frames.length) show(0);
</script></body></html>
"""
    path = os.path.join(out_dir, "view.html")
    with open(path, "w") as f:
        f.write(html)
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input-file", required=True)
    p.add_argument("-g", "--ground-truth", default="")
    p.add_argument("-k", "--camera", default="")
    p.add_argument("-s", "--volume-size", type=float, default=4.8)
    p.add_argument("-v", "--volume-resolution", type=int, default=256)
    p.add_argument("--out-dir", default="renders")
    p.add_argument("--rate", type=int, default=5)
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args(argv)

    reader = raw.RawReader(args.input_file)
    if args.camera:
        k = np.asarray([float(x) for x in args.camera.split(",")], np.float32)
    else:
        k = np.asarray([481.2, -480.0, reader.width / 2.0,
                        reader.height / 2.0], np.float32)
    cfg = Configuration(volume_resolution=(args.volume_resolution,) * 3,
                        volume_size=(args.volume_size,) * 3,
                        integration_rate=1)
    slam = DenseSLAMSystem((reader.height, reader.width), cfg)
    gt = groundtruth.read_poses(args.ground_truth) \
        if args.ground_truth else None

    os.makedirs(args.out_dir, exist_ok=True)
    n = len(reader)
    if args.max_frames:
        n = min(n, args.max_frames)
    est_poses = []
    frame_files = []
    for frame in range(n):
        depth, _ = reader.read(frame)
        st = slam.step(depth, k, frame,
                       gt_pose=gt[frame] if gt is not None else None)
        est_poses.append(np.asarray(st.pose))
        if frame % args.rate == 0 and frame > 2:
            fp = os.path.join(args.out_dir, f"frame_{frame:05d}.png")
            save_triptych(fp, slam.renderDepth(), slam.renderTrack(),
                          slam.renderVolume())
            frame_files.append(fp)
    plot_trajectory(os.path.join(args.out_dir, "trajectory.png"),
                    est_poses, gt)
    write_scrubber(args.out_dir, frame_files)
    print(f"wrote renders + view.html to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
