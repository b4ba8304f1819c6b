"""Headless benchmark frontend (CLI parity with the reference).

Reference: `se_apps/src/benchmark.cpp:34-200` (per-frame loop + TSV log) and
the getopt flag set of `se_apps/include/default_parameters.h:63-88`.

Usage:
    python -m supereight_tpu.apps.benchmark -i scene.raw -s 4.8 \
        -p 0.34,0.5,0.24 -z 4 -c 2 -r 1 -k 481.2,-480,320,240 -o log.tsv
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from supereight_tpu.config import Configuration
import supereight_tpu.io as seio
from supereight_tpu.io import groundtruth, serialise
from supereight_tpu.pipeline import DenseSLAMSystem
from supereight_tpu.utils.perfstats import Stats


def parse_args(argv=None) -> argparse.Namespace:
    """Flag names follow `default_parameters.h:63-88`."""
    p = argparse.ArgumentParser(description="supereight_tpu benchmark")
    p.add_argument("-i", "--input-file", required=True)
    p.add_argument("-o", "--log-file", default="")
    p.add_argument("-s", "--volume-size", default="4.8",
                   help="metric volume size (one float or x,y,z)")
    p.add_argument("-v", "--volume-resolution", default="256",
                   help="voxels per edge (one int or x,y,z)")
    p.add_argument("-p", "--init-pose", default="0.5,0.5,0",
                   help="initial position as fraction of volume")
    p.add_argument("-k", "--camera", default="",
                   help="fx,fy,cx,cy (at input resolution)")
    p.add_argument("-m", "--mu", type=float, default=0.1)
    p.add_argument("-r", "--compute-size-ratio", type=int, default=1)
    p.add_argument("-t", "--tracking-rate", type=int, default=1)
    p.add_argument("-z", "--integration-rate", type=int, default=2)
    p.add_argument("-c", "--rendering-rate", type=int, default=4)
    p.add_argument("-y", "--pyramid-levels", default="10,5,4")
    p.add_argument("-l", "--icp-threshold", type=float, default=1e-5)
    p.add_argument("-g", "--ground-truth", default="")
    p.add_argument("-G", "--gt-transform", default="",
                   help="16 comma-separated row-major floats")
    p.add_argument("-F", "--bilateral-filter", action="store_true")
    p.add_argument("-d", "--dump-volume", default="",
                   help="save the map checkpoint at the end (.npz)")
    p.add_argument("--dump-mesh", default="")
    p.add_argument("-f", "--fps", type=int, default=0)
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--field", choices=("sdf", "ofusion"), default="sdf")
    p.add_argument("--staged", action="store_true",
                   help="one dispatch per stage: fills the per-stage TSV "
                        "columns (slower than the fused default)")
    # TPU-extension raycast knobs (Configuration extras; reference has no
    # equivalents — its raycast runs every frame at one fidelity)
    p.add_argument("--raycast-rate", type=int, default=1,
                   help="refresh reference maps every Nth frame")
    p.add_argument("--adaptive-raycast", type=float, default=0.0,
                   metavar="DEG",
                   help="motion-adaptive model refresh: raycast once the "
                        "pose has rotated DEG degrees (or moved "
                        "--adaptive-dist metres) since the last refresh, "
                        "instead of a fixed --raycast-rate schedule")
    p.add_argument("--adaptive-dist", type=float, default=0.12,
                   help="translation trigger (m) for --adaptive-raycast")
    p.add_argument("--adaptive-alloc", type=float, default=0.0,
                   metavar="DEG",
                   help="motion-adaptive allocation march (occupancy): "
                        "march once the pose has rotated DEG degrees or "
                        "moved --adaptive-alloc-dist metres since the "
                        "last march")
    p.add_argument("--adaptive-alloc-dist", type=float, default=0.3)
    p.add_argument("--alloc-on-demand", type=float, default=0.0,
                   metavar="FRAC",
                   help="data-driven allocation march: fire when more "
                        "than FRAC of valid depth pixels hits an "
                        "unallocated block (the validated-safe gate)")
    p.add_argument("--block-capacity", type=int, default=0,
                   help="voxel-block table capacity (0: auto-size from "
                        "the volume resolution); raise when the run "
                        "warns about dropped allocations")
    p.add_argument("--normals", default="volume",
                   choices=("volume", "stored", "hybrid", "exact"))
    p.add_argument("--icp-decim", type=int, default=1,
                   help="stride the finest ICP level's input maps")
    p.add_argument("--scan-stride", type=float, default=0.5,
                   help="fine-scan step in band thicknesses")
    p.add_argument("--midsolve", action="store_true",
                   help="half-res secant re-solve (pairs with a coarse "
                        "--scan-stride)")
    p.add_argument("--int-budget", type=int, default=0,
                   help="fuse at most this many frustum-candidate blocks "
                        "per frame (0 = stream the whole table)")
    p.add_argument("--preset", default="",
                   help="named validated knob stack (config.PRESETS: "
                        "headline, quality, ofusion, noise, demo512-sdf, "
                        "demo512-ofusion, 1024-quality); explicitly "
                        "passed flags override preset fields")
    p.add_argument("--live", action="store_true",
                   help="acquire through the live-camera replay reader "
                        "(io.live.LiveReplayReader): the sensor paces the "
                        "stream, slow frames are dropped with the pose "
                        "held — the OpenNI streaming contract "
                        "(interface.h:532+) without camera hardware")
    return p.parse_args(argv)


def _triple(text, cast):
    parts = [cast(x) for x in text.split(",")]
    return tuple(parts * 3) if len(parts) == 1 else tuple(parts)


def main(argv=None):
    args = parse_args(argv)
    # reader factory (reference createReader): native mmap+prefetch .raw
    # reader when csrc is built, numpy fallback, or an ICL scene directory
    reader = seio.create_reader(args.input_file)
    live_reader = None
    if args.live:
        from supereight_tpu.io.live import LiveReplayReader
        live_reader = LiveReplayReader(args.input_file,
                                       fps=args.fps or 30.0)
    vol_size = _triple(args.volume_size, float)
    vol_res = _triple(args.volume_resolution, int)

    if args.camera:
        k = np.asarray([float(x) for x in args.camera.split(",")], np.float32)
    else:
        # reference SceneK default (interface.h:171-176)
        k = np.asarray([481.2, -480.0, reader.width / 2.0,
                        reader.height / 2.0], np.float32)
    k = k / args.compute_size_ratio

    cfg = Configuration(
        compute_size_ratio=args.compute_size_ratio,
        tracking_rate=args.tracking_rate,
        integration_rate=args.integration_rate,
        rendering_rate=args.rendering_rate,
        volume_resolution=vol_res,
        volume_size=vol_size,
        initial_pos_factor=_triple(args.init_pose, float),
        pyramid=tuple(int(x) for x in args.pyramid_levels.split(",")),
        mu=args.mu,
        icp_threshold=args.icp_threshold,
        bilateral_filter=args.bilateral_filter,
        field_type=args.field,
        raycast_rate=args.raycast_rate,
        raycast_adaptive_deg=args.adaptive_raycast,
        raycast_adaptive_dist=args.adaptive_dist,
        alloc_adaptive_deg=args.adaptive_alloc,
        alloc_adaptive_dist=args.adaptive_alloc_dist,
        alloc_on_demand=args.alloc_on_demand,
        block_capacity=args.block_capacity or None,
        raycast_normals=args.normals,
        icp_finest_decimate=args.icp_decim,
        raycast_scan_stride=args.scan_stride,
        raycast_midsolve=args.midsolve,
        integrate_budget=args.int_budget,
    )

    argv_l = sys.argv[1:] if argv is None else argv
    # explicitly-passed flags pin their Configuration fields against
    # preset / auto-regime overrides
    _FLAG2FIELD = {
        "--field": "field_type", "--normals": "raycast_normals",
        "-z": "integration_rate", "--integration-rate": "integration_rate",
        "-m": "mu", "--mu": "mu",
        "-v": "volume_resolution",
        "--volume-resolution": "volume_resolution",
        "--block-capacity": "block_capacity",
        "--int-budget": "integrate_budget",
        "--icp-decim": "icp_finest_decimate",
        "--scan-stride": "raycast_scan_stride",
        "--midsolve": "raycast_midsolve",
        "--raycast-rate": "raycast_rate",
        "--adaptive-raycast": "raycast_adaptive_deg",
        "--adaptive-dist": "raycast_adaptive_dist",
        "--adaptive-alloc": "alloc_adaptive_deg",
        "--adaptive-alloc-dist": "alloc_adaptive_dist",
        "--alloc-on-demand": "alloc_on_demand",
        "-F": "bilateral_filter", "--bilateral-filter": "bilateral_filter",
    }
    # membership must also catch the --flag=value token form
    pinned = {f for fl, f in _FLAG2FIELD.items()
              if fl in argv_l
              or any(a.startswith(fl + "=") for a in argv_l)}

    if args.preset:
        # named validated stack (config.PRESETS); user flags win
        from supereight_tpu.config import apply_preset
        cfg = apply_preset(args.preset, cfg, pinned=pinned)
        print(f"# preset {args.preset}: field={cfg.field_type}, "
              f"v={cfg.volume_resolution[0]}, -z{cfg.integration_rate}",
              file=sys.stderr)
    else:
        # -F is the noisy-sensor signal: unless the user pinned the
        # relevant knobs, switch to the noise-validated stack
        # (config.NOISE_REGIME — occupancy fusion, measured 9.88 cm on
        # the Kinect-noise sequence vs 23.4 for the SDF default)
        from supereight_tpu.config import apply_noise_regime
        cfg2 = apply_noise_regime(cfg, pinned)
        if cfg2 is not cfg and cfg2.field_type != cfg.field_type:
            print(f"# bilateral filter on: noise regime selected "
                  f"(field={cfg2.field_type}, -z{cfg2.integration_rate}; "
                  f"pass --field to override)", file=sys.stderr)
        cfg = cfg2

    gt_poses = None
    if args.ground_truth:
        transform = None
        if args.gt_transform:
            transform = np.asarray(
                [float(x) for x in args.gt_transform.split(",")],
                np.float32).reshape(4, 4)
        gt_poses = groundtruth.read_poses(args.ground_truth, transform)

    slam = DenseSLAMSystem((reader.height, reader.width), cfg)

    log = open(args.log_file, "w") if args.log_file else sys.stdout
    # TSV columns (`benchmark.cpp:110-112`)
    log.write("frame\tacquisition\tpreprocessing\ttracking\tintegration\t"
              "raycasting\trendering\tcomputation\ttotal\tX\tY\tZ\t"
              "tracked\tintegrated\n")

    n = len(reader)
    if args.max_frames:
        n = min(n, args.max_frames)
    est_poses = []
    render_images = None
    frame_period = 1.0 / args.fps if args.fps > 0 else 0.0
    t_start = time.perf_counter()
    for frame in range(n):
        t0 = time.perf_counter()
        if live_reader is not None:
            nxt = live_reader.read_next()
            if nxt is None:
                break                        # stream ended (camera stopped)
            depth = nxt[0]
            # index-align est_poses/TSV with the SENSOR timeline: frames
            # the consumer was too slow to see keep the previous pose
            src = live_reader._last
            pose_np = np.asarray(slam.state.pose)
            while len(est_poses) < src:
                dpos = pose_np[:3, 3]
                est_poses.append(pose_np)
                log.write(f"{len(est_poses) - 1}\t0\t0\t0\t0\t0\t0\t"
                          f"0\t0\t{dpos[0]:.6f}\t{dpos[1]:.6f}\t"
                          f"{dpos[2]:.6f}\t0\t0\n")
            frame = src
        else:
            depth, _ = reader.read(frame)
        # -f fps pacing: drop frames that arrive late, like the reference's
        # DepthReader::get_next_frame (`interface.h:80-116`)
        if live_reader is None and frame_period > 0:
            due = t_start + frame * frame_period
            lag = time.perf_counter() - due
            if lag > frame_period:
                # Dropped frame: still append the current (unchanged) pose
                # and a TSV row so est_poses stays index-aligned with the
                # ground truth for ATE/RPE (ADVICE r2), like the
                # reference's per-frame log.
                pose_np = np.asarray(slam.state.pose)
                est_poses.append(pose_np)
                pos = pose_np[:3, 3]
                log.write(f"{frame}\t{time.perf_counter() - t0:.8f}\t"
                          f"0\t0\t0\t0\t0\t0\t0\t"
                          f"{pos[0]:.6f}\t{pos[1]:.6f}\t{pos[2]:.6f}\t"
                          f"0\t0\n")
                continue
            if lag < 0:
                time.sleep(-lag)
        t1 = time.perf_counter()
        gt = gt_poses[frame] if gt_poses is not None else None
        if args.staged:
            st, stage_t = slam.step_staged(depth, k, frame, gt_pose=gt)
            for name, dt in stage_t.items():
                Stats.sample(name, dt)
        else:
            st = slam.step(depth, k, frame, gt_pose=gt)
            st.pose.block_until_ready()
            stage_t = {}
        t2 = time.perf_counter()
        # render the triptych every rendering_rate frames
        # (`benchmark.cpp:150-158`)
        t_render = 0.0
        if args.rendering_rate > 0 and frame % args.rendering_rate == 0:
            tr = time.perf_counter()
            render_images = (slam.renderDepth(), slam.renderTrack(),
                             slam.renderVolume())
            render_images[2].block_until_ready()
            t_render = time.perf_counter() - tr
            Stats.sample("rendering", t_render)
        t3 = time.perf_counter()
        pos = np.asarray(st.pose[:3, 3])
        est_poses.append(np.asarray(st.pose))
        Stats.sample("computation", t2 - t1)
        Stats.sample("total", t3 - t0)
        g = lambda s: stage_t.get(s, 0.0)
        log.write(f"{frame}\t{t1 - t0:.8f}\t{g('preprocessing'):.8f}\t"
                  f"{g('tracking'):.8f}\t{g('integration'):.8f}\t"
                  f"{g('raycasting'):.8f}\t{t_render:.8f}\t"
                  f"{t2 - t1:.8f}\t{t3 - t0:.8f}\t"
                  f"{pos[0]:.6f}\t{pos[1]:.6f}\t{pos[2]:.6f}\t"
                  f"{int(bool(st.tracked))}\t{int(bool(st.integrated))}\n")
    wall = time.perf_counter() - t_start

    if args.log_file:
        log.close()
    if not args.quiet:
        print(Stats.summary(), file=sys.stderr)
        print(f"{n} frames in {wall:.2f}s -> {n / wall:.2f} fps",
              file=sys.stderr)

    overflow = int(slam.state.map.overflow)
    if overflow:
        # capacity exhaustion silently corrupts the map (and then the
        # trajectory) — e.g. a long dolly sweep wants ~2x the orbit's
        # block count at 512^3; surface it loudly
        print(f"WARNING: {overflow} block-allocation requests dropped — "
              f"map capacity ({slam.state.map.capacity}) exhausted; "
              f"re-run with a larger --block-capacity", file=sys.stderr)

    if args.dump_volume:
        serialise.save_map(args.dump_volume, slam.state.map)
    if args.dump_mesh:
        slam.dump_mesh(args.dump_mesh)
    return est_poses


if __name__ == "__main__":
    main()
