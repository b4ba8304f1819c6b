"""Depth preprocessing kernels, batched jnp over whole images.

TPU-native rebuild of `se_denseslam/src/preprocessing.cpp` — every per-pixel
OpenMP loop becomes one fused XLA computation over the [H, W] array.  The 5x5
bilateral window and the 2x2 half-sample window are unrolled into static
shifted adds, which XLA fuses into a single VPU pass (no gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import camera
from .constants import E_DELTA, GAUSSIAN_DELTA, INVALID, RADIUS


def gaussian_weights(radius: int = RADIUS, delta: float = GAUSSIAN_DELTA):
    """Spatial Gaussian row, matching `DenseSLAMSystem.cpp:111-118` (note the
    reference's off-by-design ``x = i - 2`` regardless of radius)."""
    i = jnp.arange(2 * radius + 1, dtype=jnp.float32)
    x = i - 2.0
    return jnp.exp(-(x * x) / (2.0 * delta * delta))


def mm_to_meters(depth_mm: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """uint16 mm depth -> float32 m, decimated by pixel striding.

    Reference `preprocessing.cpp:161-188`: output pixel (x, y) samples input
    pixel (x*ratio, y*ratio); no averaging.
    """
    H, W = out_hw
    ih, iw = depth_mm.shape
    ratio = iw // W
    if ih // H != ratio or W * ratio != iw or H * ratio != ih:
        raise ValueError(f"invalid decimation {depth_mm.shape} -> {out_hw}")
    d = depth_mm[::ratio, ::ratio].astype(jnp.float32)
    return d / 1000.0


def _shifted(img, dy, dx):
    """Image sampled at clamped (y+dy, x+dx) — static shift via pad+slice so
    XLA keeps it a fused elementwise pipeline instead of a gather."""
    H, W = img.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(img, ((py1, py0), (px1, px0)), mode="edge")
    return padded[py1 + dy: py1 + dy + H, px1 + dx: px1 + dx + W]


def bilateral_filter(depth: jnp.ndarray, e_d: float = E_DELTA,
                     radius: int = RADIUS) -> jnp.ndarray:
    """5x5 bilateral filter (`preprocessing.cpp:42-89`): spatial Gaussian x
    intensity Gaussian, skipping non-positive neighbours; zero depth stays 0."""
    g = gaussian_weights(radius)
    inv_2ed2 = 1.0 / (2.0 * e_d * e_d)
    t = jnp.zeros_like(depth)
    s = jnp.zeros_like(depth)
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            cur = _shifted(depth, j, i)   # reference: i over x, j over y
            w_spatial = g[i + radius] * g[j + radius]
            mod = (cur - depth) ** 2
            factor = w_spatial * jnp.exp(-mod * inv_2ed2)
            valid = cur > 0
            t = t + jnp.where(valid, factor * cur, 0.0)
            s = s + jnp.where(valid, factor, 0.0)
    out = t / jnp.maximum(s, 1e-20)
    return jnp.where(depth == 0, 0.0, out)


def half_sample_robust(depth: jnp.ndarray, e_d: float = E_DELTA * 3,
                       radius: int = 1) -> jnp.ndarray:
    """Edge-preserving 2x downsample (`preprocessing.cpp:190-226`): average
    the 2x2(+r) neighbourhood pixels within ``e_d`` of the centre sample."""
    H2, W2 = depth.shape[0] // 2, depth.shape[1] // 2
    center = depth[::2, ::2]
    t = jnp.zeros_like(center)
    s = jnp.zeros_like(center)
    for i in range(-radius + 1, radius + 1):
        for j in range(-radius + 1, radius + 1):
            cur = _shifted(depth, i, j)[::2, ::2]
            ok = jnp.abs(cur - center) < e_d
            t = t + jnp.where(ok, cur, 0.0)
            s = s + ok.astype(depth.dtype)
    return t / jnp.maximum(s, 1e-20)


def depth_to_vertex(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Back-project depth to camera-space vertices [H, W, 3]
    (`preprocessing.cpp:91-111`: vertex = depth * invK @ (x, y, 1, 0))."""
    H, W = depth.shape
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    vx = depth * (inv_K[0, 0] * x + inv_K[0, 2])
    vy = depth * (inv_K[1, 1] * y + inv_K[1, 2])
    vz = depth
    v = jnp.stack([jnp.broadcast_to(vx, (H, W)),
                   jnp.broadcast_to(vy, (H, W)), vz], axis=-1)
    return jnp.where(depth[..., None] > 0, v, 0.0)


def vertex_to_normal(vertex: jnp.ndarray, neg_y: bool) -> jnp.ndarray:
    """Cross-product normals from neighbouring vertices [H, W, 3].

    Reference `preprocessing.cpp:113-159`; ``neg_y`` swaps up/down for
    ICL-NUIM's left-handed frame (fy < 0).  Invalid pixels get x = INVALID.
    """
    def shift3(dy, dx):
        return jnp.stack([_shifted(vertex[..., c], dy, dx) for c in range(3)],
                         axis=-1)

    left = shift3(0, -1)
    right = shift3(0, 1)
    if neg_y:
        up, down = shift3(-1, 0), shift3(1, 0)
    else:
        up, down = shift3(1, 0), shift3(-1, 0)

    dxv = right - left
    dyv = up - down
    n = jnp.cross(dxv, dyv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-20)

    ok = ((vertex[..., 2] != 0) & (left[..., 2] != 0) & (right[..., 2] != 0)
          & (up[..., 2] != 0) & (down[..., 2] != 0))
    invalid = jnp.concatenate(
        [jnp.full_like(n[..., :1], INVALID), jnp.zeros_like(n[..., 1:])], axis=-1)
    return jnp.where(ok[..., None], n, invalid)


@functools.partial(jax.jit, static_argnames=("levels", "neg_y"))
def build_pyramid(depth: jnp.ndarray, k: jnp.ndarray, levels: int, neg_y: bool):
    """Depth pyramid + per-level vertex/normal maps for coarse-to-fine ICP.

    Mirrors `DenseSLAMSystem.cpp:149-164`: half-sample chain, then per level
    back-projection with intrinsics scaled by 2^-level.
    """
    depths = [depth]
    for _ in range(1, levels):
        depths.append(half_sample_robust(depths[-1]))
    vertices, normals = [], []
    for i, d in enumerate(depths):
        inv_K = camera.inverse_camera_matrix(k / (1 << i))
        v = depth_to_vertex(d, inv_K)
        vertices.append(v)
        normals.append(vertex_to_normal(v, neg_y))
    return depths, vertices, normals
