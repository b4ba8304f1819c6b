"""Synthetic depth-sequence generator (scene2raw stand-in for CI/bench).

The reference validates end-to-end against ICL-NUIM sequences converted by
`se_tools/scene2raw.cpp`.  Networkless environments can't fetch ICL-NUIM, so
this module renders an analytic room scene (known SDF -> exact depth + exact
trajectory) into the same .raw + TUM ground-truth files.  ATE against this
ground truth exercises exactly the same code paths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import groundtruth, raw


MARGIN = 0.45   # walls sit inside the volume so the TSDF band fits


def scene_sdf(p, room_dim: float, variant: int = 0):
    """Analytic scene: room interior + obstacles; units meters.
    ``p``[..., 3] in world coords; the room occupies
    [MARGIN, room_dim-MARGIN]^3 so wall surfaces stay inside the map volume
    (like ICL-NUIM's ~4 m room in supereight's 4.8 m canonical volume).

    ``variant`` selects the room geometry: 0 = the bench scene (sphere +
    box), 1 = a held-out room (pillar, two boxes, offset sphere, a wall
    alcove) for trajectory-independent generalization runs."""
    c = room_dim / 2.0
    center = jnp.asarray([c, c, c])
    # room: inside of the box [MARGIN, room_dim-MARGIN]^3 (negative in walls)
    q = jnp.abs(p - center) - (c - MARGIN)
    room = -(jnp.max(q, axis=-1))
    if variant == 0:
        sph_c = center + jnp.asarray([0.0, 0.3, 0.0])
        sphere = jnp.linalg.norm(p - sph_c, axis=-1) - 0.5
        box_c = center + jnp.asarray([-0.9, 0.6, 0.7])
        bq = jnp.abs(p - box_c) - jnp.asarray([0.3, 0.4, 0.25])
        box = (jnp.linalg.norm(jnp.maximum(bq, 0.0), axis=-1)
               + jnp.minimum(jnp.max(bq, axis=-1), 0.0))
        return jnp.minimum(room, jnp.minimum(sphere, box))
    # variant 1: held-out room
    def _box(bc, half):
        bq = jnp.abs(p - bc) - jnp.asarray(half)
        return (jnp.linalg.norm(jnp.maximum(bq, 0.0), axis=-1)
                + jnp.minimum(jnp.max(bq, axis=-1), 0.0))
    # vertical pillar (capped cylinder via 2D circle + slab)
    pil_c = center + jnp.asarray([0.8, 0.0, -0.6])
    r2d = jnp.linalg.norm((p - pil_c)[..., ::2], axis=-1) - 0.28
    slab = jnp.abs(p[..., 1] - c) - (c - MARGIN)
    pillar = jnp.maximum(r2d, slab)
    sph_c = center + jnp.asarray([-0.7, 0.55, -0.9])
    sphere = jnp.linalg.norm(p - sph_c, axis=-1) - 0.35
    box1 = _box(center + jnp.asarray([0.4, 0.75, 1.0]),
                [0.55, 0.25, 0.35])
    box2 = _box(center + jnp.asarray([-1.2, 0.2, 0.2]),
                [0.25, 0.8, 0.25])
    # alcove: carve a recess out of one wall (max with negated box)
    alcove = _box(jnp.asarray([room_dim - MARGIN, c, c]),
                  [0.35, 0.7, 0.9])
    room = jnp.maximum(room, -alcove)
    return jnp.minimum(room, jnp.minimum(
        pillar, jnp.minimum(sphere, jnp.minimum(box1, box2))))


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "steps", "variant"))
def render_depth(pose, k, room_dim, H: int, W: int, steps: int = 160,
                 variant: int = 0):
    """Exact depth (camera z, meters) by sphere tracing the analytic SDF."""
    fx, fy, cx, cy = k[0], k[1], k[2], k[3]
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    # camera-space ray with unit z so that t == depth
    dx = (jnp.broadcast_to(x, (H, W)) - cx) / fx
    dy = (jnp.broadcast_to(y, (H, W)) - cy) / fy
    dirs_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    R = pose[:3, :3]
    origin = pose[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam)

    t = jnp.full((H, W), 0.05, jnp.float32)
    done = jnp.zeros((H, W), bool)

    def body(_, carry):
        t, done = carry
        p = origin + dirs * t[..., None]
        f = scene_sdf(p, room_dim, variant)
        hit = f < 1e-4
        # conservative step: scale SDF by ray norm (dirs are not unit)
        dn = jnp.linalg.norm(dirs, axis=-1)
        t = jnp.where(done | hit, t, t + jnp.maximum(f / dn, 1e-4))
        return t, done | hit

    t, done = jax.lax.fori_loop(0, steps, body, (t, done))
    depth = jnp.where(done & (t < 2.0 * room_dim), t, 0.0)
    return depth


def orbit_poses(n: int, room_dim: float, radius: float = 1.1,
                height_amp: float = 0.12, sweep: float | None = None):
    """Smooth orbit inside the room looking at the centre; returns [n, 4, 4].
    Default sweep keeps angular velocity ~1 deg/frame (ICP-trackable, like
    a 30 fps hand-held sweep)."""
    if sweep is None:
        sweep = min(1.5 * np.pi, 0.0175 * n)
    c = room_dim / 2.0
    center = np.array([c, c, c], np.float32)
    poses = []
    for i in range(n):
        a = sweep * i / max(n - 1, 1)
        eye = center + np.array([radius * np.cos(a),
                                 height_amp * np.sin(2.5 * a),
                                 radius * np.sin(a)], np.float32)
        look = center - eye
        z = look / np.linalg.norm(look)
        up = np.array([0.0, -1.0, 0.0], np.float32)   # camera y down
        xaxis = np.cross(up, z)
        xaxis /= np.linalg.norm(xaxis)
        yaxis = np.cross(z, xaxis)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = xaxis, yaxis, z, eye
        poses.append(T)
    return np.stack(poses)


def translation_poses(n: int, room_dim: float, span: float = 2.4,
                      look_angle: float = 0.35):
    """Translation-dominant path: dolly along x past the scene at a fixed
    small look-in angle (≈25 mm/frame at n=96, near-zero rotation) —
    the opposite regime from :func:`orbit_poses`' rotation-dominant
    sweep.  Returns [n, 4, 4]."""
    c = room_dim / 2.0
    poses = []
    for i in range(n):
        s = i / max(n - 1, 1)
        eye = np.array([c - span / 2 + span * s, c - 0.1, c - 1.4],
                       np.float32)
        # constant gaze: slightly into the room, tilted by look_angle
        z = np.array([np.sin(look_angle), 0.0, np.cos(look_angle)],
                     np.float32)
        z /= np.linalg.norm(z)
        up = np.array([0.0, -1.0, 0.0], np.float32)
        xaxis = np.cross(up, z)
        xaxis /= np.linalg.norm(xaxis)
        yaxis = np.cross(z, xaxis)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = xaxis, yaxis, z, eye
        poses.append(T)
    return np.stack(poses)


def jitter_poses(poses: np.ndarray, rot_sigma_deg: float = 0.35,
                 trans_sigma_m: float = 0.003, seed: int = 7):
    """Hand-shake / rolling-shutter-style pose jitter: compose each pose
    with a small random rotation + translation (deterministic seed).
    The jittered poses ARE the ground truth (frames are rendered from
    them) — this probes frame-to-frame motion roughness, not gt error."""
    rng = np.random.default_rng(seed)
    out = []
    for T in poses:
        w = rng.standard_normal(3) * np.radians(rot_sigma_deg)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]], np.float64) / max(th, 1e-12)
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        J = np.eye(4, dtype=np.float32)
        J[:3, :3] = (T[:3, :3] @ R).astype(np.float32)
        J[:3, 3] = T[:3, 3] + rng.standard_normal(3) * trans_sigma_m
        out.append(J)
    return np.stack(out)


DEFAULT_K = (120.0, 120.0, 160.0, 120.0)   # for 320x240


def apply_sensor_noise(depth_mm: np.ndarray, seed: int = 0) -> np.ndarray:
    """Kinect-style depth noise (the TUM sensors): axial sigma grows
    quadratically with range (~1.2 mm at 0.5 m to ~25 mm at 4 m, Khoshelham
    & Elberink 2012), plus the disparity quantisation staircase.  Applied
    deterministically so noisy datasets are reproducible."""
    rng = np.random.default_rng(seed)
    z = depth_mm.astype(np.float32) / 1000.0
    sigma_mm = 1.2 + 19.0 * (z - 0.4) ** 2 * (z > 0.4)
    noisy = depth_mm.astype(np.float32) \
        + rng.standard_normal(depth_mm.shape).astype(np.float32) * sigma_mm
    # disparity quantisation: step also grows ~quadratically with range
    step_mm = np.maximum(1.0, 2.85 * z * z)
    noisy = np.round(noisy / step_mm) * step_mm
    noisy = np.where(depth_mm == 0, 0.0, noisy)
    return np.clip(noisy, 0, 65535).astype(np.uint16)


def generate_sequence(n_frames: int, H: int = 240, W: int = 320,
                      room_dim: float = 4.8, k=None, noise: bool = False):
    """Render an orbit sequence; returns (depths_mm uint16 [n,H,W],
    poses [n,4,4], k).  ``noise`` applies the TUM sensor noise model."""
    if k is None:
        k = (DEFAULT_K[0] * W / 320.0, DEFAULT_K[1] * H / 240.0,
             W / 2.0, H / 2.0)
    k_arr = jnp.asarray(k, jnp.float32)
    poses = orbit_poses(n_frames, room_dim)
    # per-frame dispatch: vmapping the sphere-trace loop explodes the remote
    # compiler's time (33 min for 3 chunk shapes vs ~2.5 min total this way)
    frames = []
    for i in range(n_frames):
        d = render_depth(jnp.asarray(poses[i]), k_arr, room_dim, H, W)
        mm = np.clip(np.asarray(d) * 1000.0, 0, 65535).astype(np.uint16)
        if noise:
            mm = apply_sensor_noise(mm, seed=i)
        frames.append(mm)
    return np.stack(frames), poses, np.asarray(k, np.float32)


def write_dataset(prefix: str, n_frames: int, H: int = 240, W: int = 320,
                  room_dim: float = 4.8, k=None, noise: bool = False):
    """Write ``<prefix>.raw`` + ``<prefix>.gt`` (scene2raw equivalent)."""
    depths, poses, k = generate_sequence(n_frames, H, W, room_dim, k,
                                         noise=noise)
    w = raw.RawWriter(prefix + ".raw", W, H)
    for d in depths:
        w.write(d)
    w.close()
    groundtruth.write_poses(prefix + ".gt", poses)
    return prefix + ".raw", prefix + ".gt", k
