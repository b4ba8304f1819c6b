"""Render kernels: depth colormap, ICP status map, shaded volume.

Reference: `se_denseslam/src/rendering.cpp:111-283` and the `gs2rgb`
HSV-ramp colormap (`se_denseslam/include/se/commons.h:105-160`).  All
produce uint8 [H, W, 4] RGBW images as batched jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import raycast as _raycast
from .constants import AMBIENT, INVALID, LIGHT, NEAR_PLANE, FAR_PLANE


def gs2rgb(h):
    """Grayscale [0,1] -> HSV ramp rgb (commons.h:105-160; v=0.75, m=0.25,
    sv=2/3), vectorized branch-free over the 6 sextants."""
    v, m, sv = 0.75, 0.25, 0.6667
    h6 = h * 6.0
    sextant = jnp.clip(h6.astype(jnp.int32), 0, 5)
    fract = h6 - sextant.astype(jnp.float32)
    vsf = v * sv * fract
    mid1 = m + vsf
    mid2 = v - vsf
    vv = jnp.full_like(h, v)
    mm = jnp.full_like(h, m)
    # per-sextant (r, g, b) table
    rs = jnp.stack([vv, mid2, mm, mm, mid1, vv], -1)
    gs = jnp.stack([mid1, vv, vv, mid2, mm, mm], -1)
    bs = jnp.stack([mm, mm, mid1, vv, vv, mid2], -1)
    idx = sextant[..., None]
    r = jnp.take_along_axis(rs, idx, axis=-1)[..., 0]
    g = jnp.take_along_axis(gs, idx, axis=-1)[..., 0]
    b = jnp.take_along_axis(bs, idx, axis=-1)[..., 0]
    return jnp.stack([r, g, b], axis=-1)


def render_depth(depth, near=NEAR_PLANE, far=FAR_PLANE):
    """renderDepthKernel (`rendering.cpp:111-152`): white below near, black
    beyond far, HSV ramp in between.  Returns uint8 [H, W, 4]."""
    d = (depth - near) / (far - near)
    rgb = (gs2rgb(jnp.clip(d, 0.0, 1.0)) * 255.0).astype(jnp.uint8)
    white = jnp.full_like(rgb, 255)
    black = jnp.zeros_like(rgb)
    rgb = jnp.where((depth < near)[..., None], white,
                    jnp.where((depth > far)[..., None], black, rgb))
    a = jnp.zeros(depth.shape + (1,), jnp.uint8)
    return jnp.concatenate([rgb, a], axis=-1)


_TRACK_COLORS = jnp.array([
    # result -6..1 -> rows 0..7 (row = result + 6)
    [255, 128, 128],   # default / other
    [255, 255, 0],     # -5 bad normal
    [0, 0, 255],       # -4 too far
    [0, 255, 0],       # -3 no ref normal
    [255, 0, 0],       # -2 out of frame
    [0, 0, 0],         # -1 no input normal
    [255, 128, 128],   # 0 (unused)
    [128, 128, 128],   # 1 ok
], dtype=jnp.uint8)


def render_track(result):
    """renderTrackKernel (`rendering.cpp:154-212`): ICP status colors."""
    idx = jnp.clip(result + 6, 0, 7)
    rgb = _TRACK_COLORS[idx]
    a = jnp.zeros(result.shape + (1,), jnp.uint8)
    return jnp.concatenate([rgb, a], axis=-1)


def render_volume(m, field, view, H, W, light=LIGHT, ambient=AMBIENT,
                  vertex=None, normal=None,
                  near=NEAR_PLANE, far=FAR_PLANE):
    """renderVolumeKernel (`rendering.cpp:214-283`): Lambertian shading of
    the raycast surface.  Pass precomputed ``vertex``/``normal`` to reuse the
    tracking raycast (render==false path); otherwise re-raycasts from
    ``view`` (= pose @ inv(K))."""
    if vertex is None or normal is None:
        rc = _raycast.raycast(m, field, view, H, W, near, far)
        vertex, normal = rc.vertex, rc.normal

    light = jnp.asarray(light, jnp.float32)
    ambient = jnp.asarray(ambient, jnp.float32)
    diff = vertex - light
    diff = diff / jnp.maximum(jnp.linalg.norm(diff, axis=-1, keepdims=True),
                              1e-12)
    n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True),
                             1e-12)
    lam = jnp.maximum(jnp.sum(n * diff, axis=-1), 0.0)
    col = jnp.clip(lam[..., None] + ambient, 0.0, 1.0) * 255.0
    ok = (normal[..., 0] != INVALID)[..., None]
    rgb = jnp.where(ok, col, 0.0).astype(jnp.uint8)
    a = jnp.zeros(lam.shape + (1,), jnp.uint8)
    return jnp.concatenate([rgb, a], axis=-1)
