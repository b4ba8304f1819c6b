"""Generate the cached validation frame sets under bench_data/ (CPU-only).

Round-3 sets (regenerated only if missing — the records reference them):
  synthetic_256_frames_alt.npz    held-out orbit (0.85 m radius, 1.5x rate)
  synthetic_256_frames_noisy.npz  Kinect noise model on the bench orbit

Round-4 additions (VERDICT r3 item 6 — widen generalization evidence):
  synthetic_256_frames_room2.npz  held-out ROOM geometry (scene variant 1:
                                  pillar, two boxes, offset sphere, wall
                                  alcove), standard orbit
  synthetic_256_frames_trans.npz  translation-dominant dolly path (the
                                  opposite regime from the orbits; probes
                                  the adaptive gate's distance trigger)
  synthetic_256_frames_jit.npz    hand-shake pose jitter on the bench
                                  orbit (0.35 deg / 3 mm per-frame,
                                  deterministic): frame-to-frame motion
                                  roughness with exact ground truth

Run: JAX_PLATFORMS=cpu python scripts/make_validation_seqs.py
Never regenerate the 256 base set (synthetic_256_frames.npz) — the TPU
records are tied to it byte-for-byte.
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax.numpy as jnp                                    # noqa: E402
from supereight_tpu.io import synthetic                    # noqa: E402

N, H, W = 96, 240, 320
K = np.asarray([240.6, 240.0, 160.0, 120.0], np.float32)
ROOM = 4.8
OUT = os.path.join(REPO, "bench_data")


def render(poses, variant=0, noise=False):
    frames = []
    for i, p in enumerate(poses):
        d = synthetic.render_depth(jnp.asarray(p), jnp.asarray(K), ROOM,
                                   H, W, variant=variant)
        mm = np.clip(np.asarray(d) * 1000.0, 0, 65535).astype(np.uint16)
        if noise:
            mm = synthetic.apply_sensor_noise(mm, seed=i)
        frames.append(mm)
    return np.stack(frames)


def save(name, depths, poses):
    path = os.path.join(OUT, name)
    np.savez_compressed(path, depths=depths,
                        poses=poses.astype(np.float32))
    print(f"wrote {path} ({depths.shape})")


def main():
    todo = {
        "synthetic_256_frames_alt.npz": lambda: (
            lambda p: (render(p), p))(
            synthetic.orbit_poses(N, ROOM, radius=0.85,
                                  height_amp=0.2,
                                  sweep=1.5 * 0.0175 * N)),
        "synthetic_256_frames_noisy.npz": lambda: (
            lambda p: (render(p, noise=True), p))(
            synthetic.orbit_poses(N, ROOM)),
        "synthetic_256_frames_room2.npz": lambda: (
            lambda p: (render(p, variant=1), p))(
            synthetic.orbit_poses(N, ROOM)),
        "synthetic_256_frames_trans.npz": lambda: (
            lambda p: (render(p), p))(
            synthetic.translation_poses(N, ROOM)),
        "synthetic_256_frames_jit.npz": lambda: (
            lambda p: (render(p), p))(
            synthetic.jitter_poses(synthetic.orbit_poses(N, ROOM))),
    }
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, gen in todo.items():
        if only and only not in name:
            continue
        path = os.path.join(OUT, name)
        if os.path.exists(path):
            print(f"exists, skipping: {name}")
            continue
        depths, poses = gen()
        save(name, depths, poses)


if __name__ == "__main__":
    main()
