"""Surface raycasting: TPU-native two-phase ray march.

Reference: `se_denseslam/src/rendering.cpp:50-90` (raycastKernel) +
`se_core/include/se/ray_iterator.hpp` (hierarchical ESVO traversal) +
the per-field `raycast()` marchers (`kfusion/rendering_impl.hpp:34-74`,
`bfusion/rendering_impl.hpp:35-68`).

Design (not a port): the pointer-stack ray_iterator is hostile to SIMD, so
phase 1 instead marches the dense ``block_index`` occupancy grid (B^3, B =
size/8 — 128 KB at 256^3) at fixed sub-block steps to find the first
allocated block per ray; phase 2 runs the field's adaptive march from there
as a fixed-trip-count ``fori_loop`` with per-ray done masks.  All rays
advance in lockstep on the VPU; gathers are the only irregular access.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from supereight_tpu.core import octree
from supereight_tpu.core.octree import BLOCK_SIDE, VoxelMap
from .constants import INVALID


class RaycastResult(NamedTuple):
    vertex: jnp.ndarray   # [H, W, 3] world-space hit points (0 on miss)
    normal: jnp.ndarray   # [H, W, 3] unit normals (x = INVALID on miss)
    t_hit: jnp.ndarray    # [H, W] ray parameter of the hit (0 on miss)


def ray_directions(view: jnp.ndarray, H: int, W: int):
    """Per-pixel world ray origin + unit direction (`rendering.cpp:62-65`).
    ``view`` = camera-to-world pose @ inv(K)."""
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    dirs = jnp.stack([
        view[0, 0] * jnp.broadcast_to(x, (H, W)) + view[0, 1] * y + view[0, 2],
        view[1, 0] * jnp.broadcast_to(x, (H, W)) + view[1, 1] * y + view[1, 2],
        jnp.broadcast_to(view[2, 0] * x + view[2, 1] * y + view[2, 2], (H, W)),
    ], axis=-1)
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-12)
    origin = view[:3, 3]
    return origin, dirs


def _ray_box(origin, dirs, dim: float, near: float, far: float):
    """Clamp [near, far] to the map AABB [0, dim]^3 per ray
    (the commented-out box intersect of `kfusion/rendering_impl.hpp:83-102`,
    which ray_iterator performs internally `ray_iterator.hpp:53-111`)."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                          jnp.where(dirs >= 0, 1e-12, -1e-12), dirs)
    tbot = -origin * inv
    ttop = (dim - origin) * inv
    tmin = jnp.minimum(tbot, ttop).max(axis=-1)
    tmax = jnp.maximum(tbot, ttop).min(axis=-1)
    return jnp.maximum(tmin, near), jnp.minimum(tmax, far)


def _first_block_t(m: VoxelMap, origin, dirs, tnear, tfar, step_frac=0.5):
    """Phase 1: distance to the first allocated block along each ray.

    Fixed-step march over the dense block-occupancy grid; replaces the
    ray_iterator's hierarchical descend/advance (`ray_iterator.hpp:116-226`).
    Returns (t_entry, found) with t_entry backed up one step so phase 2
    starts outside the block.
    """
    block_m = BLOCK_SIDE * m.voxel_size
    step = block_m * step_frac
    max_range = float(m.dim) * 1.7320508  # map diagonal
    n_steps = int(max_range / step) + 2
    inv_vs = m.inverse_voxel_size
    B = m.blocks_per_edge

    def body(i, carry):
        t_hit, found = carry
        t = tnear + step * i
        pos = origin + dirs * t[..., None]
        bv = jnp.floor(pos * inv_vs).astype(jnp.int32) >> octree.BLOCK_BITS
        inb = ((bv >= 0) & (bv < B)).all(axis=-1) & (t <= tfar)
        bvc = jnp.clip(bv, 0, B - 1)
        occ = m.block_index[bvc[..., 0], bvc[..., 1], bvc[..., 2]] >= 0
        hit_now = occ & inb & ~found
        t_hit = jnp.where(hit_now, jnp.maximum(t - step, tnear), t_hit)
        return t_hit, found | hit_now

    t0 = jnp.zeros_like(tnear)
    t_hit, found = jax.lax.fori_loop(
        0, n_steps, body, (t0, jnp.zeros(tnear.shape, bool)))
    return t_hit, found & (tnear < tfar)


def _march(m: VoxelMap, field, origin, dirs, t_start, active, tfar,
           max_steps: int):
    """Phase 2: the field-specific adaptive march, in lockstep with masks.

    SDF (`kfusion/rendering_impl.hpp:39-70`): skip weight==0 voxels at
    largestep, sphere-trace by max(f*mu, step), trilinear refine near the
    surface, linear zero-crossing solve.
    OFusion (`bfusion/rendering_impl.hpp:41-66`): fixed one-voxel steps,
    crossing of log-odds 0.
    """
    step = m.voxel_size
    largestep = BLOCK_SIDE * m.voxel_size
    inv_vs = m.inverse_voxel_size
    sel = field.select_channel
    inside = field.is_inside

    def interp_at(t):
        pos = origin + dirs * t[..., None]
        return octree.interp(m, sel, pos * inv_vs)

    def get_at(t):
        pos = (origin + dirs * t[..., None]) * inv_vs
        vx = jnp.floor(pos).astype(jnp.int32)
        vals = {c.name: octree.get(m, c.name, vx[..., 0], vx[..., 1],
                                   vx[..., 2]) for c in m.channels}
        return vals

    f0 = interp_at(t_start)
    # "if we were already in it, don't render" (rendering_impl.hpp:46)
    running = active & ~inside(f0)
    f_t = f0

    class S(NamedTuple):
        t: jnp.ndarray
        f_t: jnp.ndarray
        f_tt: jnp.ndarray
        stepsize: jnp.ndarray
        hit: jnp.ndarray
        running: jnp.ndarray

    st = S(t=t_start, f_t=f_t, f_tt=jnp.zeros_like(f_t),
           stepsize=jnp.full_like(f_t, largestep),
           hit=jnp.zeros(t_start.shape, bool), running=running)

    def body(_, st):
        data = get_at(st.t)
        valid = field.sample_valid(data)
        f_near = data[sel].astype(jnp.float32)
        refine = field.interp_window(f_near)
        f_new = jnp.where(refine, interp_at(st.t), f_near)

        hit_now = st.running & valid & inside(f_new)
        adv = jnp.maximum(field.step_scale(f_new), step)
        new_stepsize = jnp.where(valid, adv, field.skip_stepsize(step, largestep))

        f_tt = jnp.where(st.running & valid, f_new, st.f_tt)
        # reference keeps f_t un-updated across skipped (invalid) samples
        f_t = jnp.where(st.running & valid & ~hit_now, f_new, st.f_t)
        t = jnp.where(st.running & ~hit_now, st.t + new_stepsize, st.t)
        running = st.running & ~hit_now & (t < tfar)
        return S(t=t, f_t=f_t, f_tt=f_tt, stepsize=new_stepsize,
                 hit=st.hit | hit_now, running=running)

    st = jax.lax.fori_loop(0, max_steps, body, st)

    # linear crossing solve (rendering_impl.hpp:66 / bfusion :61)
    denom = st.f_t - st.f_tt
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t_hit = st.t + st.stepsize * (st.f_tt - field.surf_boundary) / denom
    t_hit = jnp.where(st.hit, t_hit, 0.0)
    return t_hit, st.hit


def raycast(m: VoxelMap, field, view: jnp.ndarray, H: int, W: int,
            near: float, far: float, max_fine_steps: int = 64) -> RaycastResult:
    """Full raycastKernel (`rendering.cpp:50-90`): vertex+normal maps."""
    origin, dirs = ray_directions(view, H, W)
    tnear, tfar = _ray_box(origin, dirs, m.dim, near, far)
    t_entry, found = _first_block_t(m, origin, dirs, tnear, tfar)
    t_hit, hit = _march(m, field, origin, dirs, t_entry, found, tfar,
                        max_fine_steps)

    vertex = origin + dirs * t_hit[..., None]
    g = octree.grad(m, field.select_channel, vertex * m.inverse_voxel_size)
    if field.invert_normals:
        g = -g
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
    normal = g / jnp.maximum(gn, 1e-12)
    bad = ~hit | (gn[..., 0] == 0)
    vertex = jnp.where(hit[..., None], vertex, 0.0)
    invalid = jnp.concatenate([jnp.full_like(normal[..., :1], INVALID),
                               jnp.zeros_like(normal[..., 1:])], axis=-1)
    normal = jnp.where(bad[..., None], invalid, normal)
    return RaycastResult(vertex=vertex, normal=normal,
                         t_hit=jnp.where(hit, t_hit, 0.0))
