"""Benchmark: fused SLAM frames/s/chip at the canonical configuration.

Canonical reference run (BASELINE.md): ICL-NUIM lr-traj2, SDF, 4.8 m volume,
256^3 voxels, compute size 320x240, pyramid (10,5,4), integration every 4th
frame (-z 4).  ICL-NUIM is not fetchable in this environment, so the frames
come from the analytic-room renderer (supereight_tpu.io.synthetic) at
identical resolution/intrinsics — the compute per frame (track every frame,
allocate+integrate at the canonical rate, raycast every frame) is the same.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 100 (the >=100 fused fps/chip target in
BASELINE.json).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def _watchdog(seconds: int, error: str, exit_code: int):
    """The axon TPU tunnel can wedge on a stale chip claim (observed when a
    client is killed mid-compile) or spontaneously at compile time; a hung
    device init / compile must not hang the caller.  SIGALRM fires -> emit
    a zero-score line and exit CLEANLY (a clean interpreter shutdown
    releases the claim; a SIGKILL wedges it for ~1-2 h).  The exit code
    tells the bench.py orchestrator whether a retry is worthwhile."""
    import signal

    def on_alarm(signum, frame):
        print(f"# TPU bench watchdog fired: {error}", file=sys.stderr)
        print(json.dumps({
            "metric": "fused_frames_per_s_per_chip_256",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": error,
        }), flush=True)
        sys.exit(exit_code)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)
    return lambda: signal.alarm(0)


INIT_TIMEOUT_S = int(__import__("os").environ.get("SE_BENCH_INIT_S", "240"))
RUN_TIMEOUT_S = int(__import__("os").environ.get("SE_BENCH_RUN_S", "2400"))


def main():
    cancel = _watchdog(INIT_TIMEOUT_S, "tpu_init_timeout", 3)
    import jax
    import jax.numpy as jnp
    jax.devices()   # force backend init under the watchdog
    cancel()
    # whole-bench ceiling; cancelled before the report.  A wedge here
    # (exit 4) is mid-compile/mid-run — retrying immediately would hit
    # the same stale claim, so the orchestrator backs off longer first.
    _watchdog(RUN_TIMEOUT_S, "tpu_run_wedged", 4)
    import signal
    from supereight_tpu.config import Configuration
    from supereight_tpu.io import synthetic
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.pipeline.system import process_frame

    H, W = 240, 320
    SIZE = 256
    N_FRAMES = 96
    k = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)

    t0 = time.perf_counter()
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    for cache in (os.path.join(here, "bench_data/synthetic_256_frames.npz"),
                  "/tmp/se_bench_frames.npz"):
        if os.path.exists(cache):
            z = np.load(cache)
            depths, poses = z["depths"], z["poses"]
            print(f"# loaded cached frames ({cache}) in "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            break
    else:
        depths, poses, _ = synthetic.generate_sequence(
            N_FRAMES, H=H, W=W, room_dim=4.8, k=tuple(k))
        np.savez_compressed("/tmp/se_bench_frames.npz",
                            depths=depths, poses=poses)
        print(f"# generated {N_FRAMES} frames in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    # capacity right-sized to the scene (3304 live blocks with the exact
    # allocator + 86% headroom); every capacity-proportional cost (patch
    # gathers, pack, splat) shrinks with it.
    # The reference's canonical lr-traj2 command integrates every 4th
    # frame (-z 4, BASELINE.md / reference README.md:77-81).  This config
    # integrates EVERY frame (-z 1) and still beats the -z 4 run on both
    # axes: 4x the canonical fusion rate at better accuracy.  Headline
    # knobs (ATE-validated in bench_data/): hybrid normals (lateral
    # gradient at quarter res via grad_decim 2 + per-pixel along-ray
    # correction), integrate_budget (frustum-compacted fusion rows),
    # icp_finest_decimate 2 (stride-2 finest ICP level), scan_stride 1.0
    # (band-thickness fine-scan step; the full-res refine re-solves per
    # pixel), alloc_rate 3 (band march every 3rd frame), and the
    # motion-adaptive raycast gate (3.8 deg / 0.07 m): the reference-map
    # refresh amortizes with accumulated camera MOTION instead of a fixed
    # schedule, bounding ICP-association staleness where it actually
    # matters.  Validated on all three sequences
    # (bench_data/ate_icp_256_hybrid_ad3.8x0.07_id2_ib3072_ss1_ar3_gd2*):
    # base 90.0 fps @ 1.85 cm, held-out 1.5x-rate orbit 94.2 @ 3.83
    # (beats both the every-frame-refresh config's 6.15 and the
    # reference CPU's 6.56), Kinect-noise 76.5 @ 23.4 with 92/96 tracked
    # (pose jitter auto-triggers refreshes; a FIXED rate-4 schedule loses
    # half the frames there, 29.7 cm @ 46/96).  Fixed-rate frontier for
    # comparison: rr4 = 2.35 cm but noisy-fragile, rr6/rr8 = 2.17/1.95 on
    # base but 26 cm on the held-out orbit.
    cfg = Configuration(volume_resolution=(SIZE,) * 3, volume_size=(4.8,) * 3,
                        pyramid=(10, 5, 4), integration_rate=1,
                        block_capacity=6144,
                        raycast_normals="hybrid",
                        integrate_budget=3072,
                        icp_finest_decimate=2,
                        raycast_scan_stride=1.0,
                        alloc_rate=3,
                        raycast_adaptive_deg=3.8,
                        raycast_adaptive_dist=0.07,
                        raycast_grad_decim=2)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])

    fn = functools.partial(
        process_frame, field=slam.field, iterations=slam.iterations,
        tracking_rate=1, integration_rate=1, bilateral=False,
        icp_threshold=cfg.icp_threshold,
        use_gt=False, neg_y=False, normals="hybrid",
        integrate_budget=3072, finest_decimate=2, scan_stride=1.0,
        alloc_rate=3, adaptive_deg=3.8, adaptive_dist=0.07, grad_decim=2)

    k_dev = jnp.asarray(k)
    eye = jnp.eye(4, dtype=jnp.float32)

    def scan_step(state, inp):
        depth, frame = inp
        return fn(state, depth, k_dev, frame, eye), ()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, depth_chunk, frame0):
        frames = frame0 + jnp.arange(depth_chunk.shape[0], dtype=jnp.int32)
        state, _ = jax.lax.scan(scan_step, state, (depth_chunk, frames))
        return state

    CHUNK = 16
    depths_dev = jnp.asarray(depths)

    # warmup/compile + map bootstrap on the first chunk
    t0 = time.perf_counter()
    state = run_chunk(slam.state, depths_dev[:CHUNK],
                      jnp.asarray(0, jnp.int32))
    state.pose.block_until_ready()
    print(f"# compile+first chunk: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # timed steady-state run
    t0 = time.perf_counter()
    n_timed = 0
    for s in range(CHUNK, N_FRAMES, CHUNK):
        state = run_chunk(state, depths_dev[s:s + CHUNK],
                          jnp.asarray(s, jnp.int32))
        n_timed += CHUNK
    state.pose.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_timed / dt

    # trajectory sanity (drift vs ground truth, meters)
    final_err = float(np.linalg.norm(
        np.asarray(state.pose)[:3, 3] - poses[N_FRAMES - 1][:3, 3]))
    print(f"# {n_timed} frames in {dt:.2f}s; final pose err {final_err:.3f} m;"
          f" blocks {int(state.map.n_blocks)}", file=sys.stderr)

    # optional profiler trace (--profile): per-kernel timeline for the
    # TICK/TOCK parity story (`se_shared/timings.h`); viewable with
    # tensorboard or xprof
    if "--profile" in sys.argv:
        import jax.profiler
        trace_dir = os.path.join(here, "bench_data/profile")
        try:
            with jax.profiler.trace(trace_dir):
                state = run_chunk(state, depths_dev[:CHUNK],
                                  jnp.asarray(0, jnp.int32))
                state.pose.block_until_ready()
            print(f"# profiler trace -> {trace_dir}", file=sys.stderr)
        except Exception as e:  # axon tunnel may not support device traces
            print(f"# profiler trace unavailable: {e}", file=sys.stderr)

    # sidecar: stage breakdown (measured by scripts/ablation_bench.py's
    # stage-skipping wall-clock diffs — the only trustworthy per-stage
    # timing on this backend) next to the headline number
    sidecar = {"fused_fps": round(fps, 2),
               "blocks": int(state.map.n_blocks)}
    abl_path = os.path.join(here, "bench_data/ablation.json")
    if os.path.exists(abl_path):
        with open(abl_path) as fh:
            abl = json.load(fh)
        if "full" in abl and "gt_track" in abl:
            sidecar["stage_ms"] = {
                "tracking_icp": round(abl["full"] - abl["gt_track"], 2),
                "integration_alloc": round(
                    abl.get("gt_only_integrate", 0.0), 2),
                "raycasting": round(abl["gt_track"]
                                    - abl.get("gt_only_integrate", 0.0), 2),
                "frame_total": abl["full"],
            }
    with open(os.path.join(here, "bench_data/bench_sidecar.json"),
              "w") as fh:
        json.dump(sidecar, fh, indent=1)

    signal.alarm(0)
    print(json.dumps({
        "metric": "fused_frames_per_s_per_chip_256",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
