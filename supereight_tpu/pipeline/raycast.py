"""Surface raycasting: splat bounds + short-window batched scan.

Reference: `se_denseslam/src/rendering.cpp:50-90` (raycastKernel) +
`se_core/include/se/ray_iterator.hpp` (hierarchical ESVO traversal) +
the per-field marchers (`kfusion/rendering_impl.hpp:34-74`,
`bfusion/rendering_impl.hpp:35-68`).

TPU design v3 (descriptor-budgeted; every random-gathered element costs
~8-14 ns on this hardware regardless of table size):

* phase 1 (`_splat_bounds`): inside-containing blocks project into a small
  image grid and scatter-min/max their camera depth — the ESVO iterator's
  coarse skip for ~12k scattered descriptors instead of a mip plane sweep
  (~770k gathered).
* phase 2 (`_fine_scan`): each ray samples a short window from its splat
  start in ONE batched gather; the reference's valid-first-crossing
  semantics (weight==0 / unobserved samples never cross,
  `rendering_impl.hpp:49-53`) run as a gather-free forward-fill (integer
  cummax) plus the exact linear zero-crossing solve
  (`rendering_impl.hpp:66`).  A compacted rescue scan covers the few rays
  whose nearest block grazed without a crossing.
* the fine scan runs at half ray resolution; a full-res re-solve INSIDE
  the truncation band recovers per-pixel depth, then volume-gradient
  normals (or the cheaper hybrid/image variants).

Fine-scan gather budget: ~15 samples/ray at half res + 2 refine + <=6
gradient taps per pixel (~8 per full-res pixel) instead of the ~600
dependent rounds of a hierarchical per-ray iterator.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import octree
from supereight_tpu.core.octree import BLOCK_SIDE, VoxelMap
from . import camera, gradmap
from .constants import INVALID


class RaycastResult(NamedTuple):
    vertex: jnp.ndarray   # [H, W, 3] world-space hit points (0 on miss)
    normal: jnp.ndarray   # [H, W, 3] unit normals (x = INVALID on miss)
    t_hit: jnp.ndarray    # [H, W] ray distance of the hit (0 on miss)


def ray_directions(view: jnp.ndarray, H: int, W: int):
    """Per-pixel world ray origin + direction with unit camera-z
    (`rendering.cpp:62-65`; ``view`` = camera-to-world pose @ inv(K)), so
    that ``origin + z * dir`` is the point at camera depth ``z``."""
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    dirs = jnp.stack([
        view[0, 0] * jnp.broadcast_to(x, (H, W)) + view[0, 1] * y + view[0, 2],
        view[1, 0] * jnp.broadcast_to(x, (H, W)) + view[1, 1] * y + view[1, 2],
        jnp.broadcast_to(view[2, 0] * x + view[2, 1] * y + view[2, 2], (H, W)),
    ], axis=-1)
    origin = view[:3, 3]
    return origin, dirs


def view_dtype(field):
    """Storage dtype of the single-scale read view: bf16 halves pack and
    sample traffic for a [-1,1] TSDF (rounding <=2^-8 i.e. <1 mm surface
    error at mu=0.1); fields whose select channel is not normalized keep
    f32."""
    return jnp.bfloat16 if field.invert_normals else jnp.float32


def encode_view_rows(field, rows):
    """NaN-encode channel rows for the tiled read view (the single-scale
    rule of :func:`pack_view`): *invalid* samples — the reference's
    weight==0 / unobserved skip (`rendering_impl.hpp:49-53`) — become NaN
    so the sweep samples ONE array and `isnan` recovers validity.  Shared
    by the full rebuild and the incremental per-frame update
    (`integration.integrate(view=...)`), so both produce bit-identical
    encodings."""
    vals = {k: v.astype(jnp.float32) for k, v in rows.items()}
    valid = field.sample_valid(vals)
    return jnp.where(valid, vals[field.select_channel],
                     jnp.nan).astype(view_dtype(field))


def view_alloc_fill(view, m: VoxelMap, live_before, field):
    """Incremental-view maintenance for ALLOCATION: rows of blocks that
    became live since ``live_before`` flip from the unallocated fill
    (e.g. the SDF's valid free-space 1.0) to the encoding of freshly
    initialized voxels (weight 0 -> NaN).  Fusion handles every later
    change (`integration.integrate(view=...)`)."""
    with jax.ensure_compile_time_eval():
        inits = {name: jnp.full((), spec.init, jnp.float32)
                 for name, spec in ((c.name, c) for c in m.channels)}
        iv = field.sample_valid(inits)
        new_fill = float(inits[field.select_channel]) if bool(iv) \
            else float("nan")
    newly = octree.slot_mask(m) & ~live_before
    B = m.blocks_per_edge
    bc = octree.block_coords_table(m)
    lin = bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2]
    vt = jnp.where(newly, lin, B * B * B)
    vals = jnp.full((m.capacity, view.shape[1]), new_fill, view.dtype)
    return view.at[vt].set(vals, mode="drop")


def pack_view(m: VoxelMap, field):
    """Dense read view for the raycaster.

    One fat-row scatter per channel (`octree.pack_dense`); ``empty`` baked
    into unallocated space so sampling needs no block indirection.  For
    multiscale fields (occupancy) the node pyramid shows through
    unallocated space, matching the reference's ``volume.get`` descend
    (`bfusion/rendering_impl.hpp:52`, `octree.hpp:313-368`).

    Returns ``{"F": ...}`` where ``F`` is the select channel with *invalid*
    samples (the reference's weight==0 / unobserved skip,
    `rendering_impl.hpp:49-53`) encoded as NaN — so the sweep samples ONE
    array and `isnan` recovers validity; comparisons against NaN are
    False, so an invalid sample can never read as a crossing.

    Both field classes return a brick-TILED view (``[B^3, 512]`` rows).
    Single-scale: the NaN-encode runs on the compact ``[capacity, 512]``
    table and one row scatter materializes it — no dense 6D untiling
    (which OOMs at 1024^3) and ~16x less encode arithmetic.  Multiscale
    (occupancy): unallocated rows read the deepest allocated node value
    for their cell (`octree.pack_tiled_multiscale`), matching the
    reference's multiscale descend (`bfusion/rendering_impl.hpp:52`,
    `octree.hpp:313-368`) at per-block granularity.
    """
    if field.multiscale_alloc:
        # tiled multiscale view, built like the single-scale path: the
        # NaN-encode runs on the compact [capacity, 512] table, ONE bf16
        # row scatter materializes the leaf rows, and the node-pyramid
        # show-through (a per-cell scalar — coarse octants are always
        # >= block-sized, octree.node_fill) fills unallocated rows with
        # one dense select.  Replaces the dense [S^3] build (5 upsample
        # passes + 6D transpose per channel per frame).  bf16 is safe
        # for crossing detection: log-odds near SURF_BOUNDARY=0 keep
        # full relative precision; only the +/-1000 clamps round.
        data = {c.name: m.voxels[c.name].astype(jnp.float32)
                for c in m.channels}
        valid = field.sample_valid(data)
        enc = jnp.where(valid, data[field.select_channel], jnp.nan)
        fills = {c.name: octree.node_fill(m, c.name).astype(jnp.float32)
                 for c in m.channels}
        fvalid = field.sample_valid(fills)
        fill_cell = jnp.where(fvalid, fills[field.select_channel],
                              jnp.nan).astype(jnp.bfloat16)
        B = m.blocks_per_edge
        bc = octree.block_coords_table(m)
        live = octree.slot_mask(m)
        lin = bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2]
        tgt = jnp.where(live, lin, B * B * B)
        flat = jnp.full((B * B * B, octree.BLOCK_VOXELS), jnp.nan,
                        dtype=jnp.bfloat16)
        flat = flat.at[tgt].set(enc.astype(jnp.bfloat16), mode="drop")
        has_leaf = (m.block_index >= 0).reshape(-1)
        return {"F": jnp.where(has_leaf[:, None], flat, fill_cell[:, None])}

    # tiled path: encode on the block table, scatter rows once
    enc = encode_view_rows(field, m.voxels)
    dtype = view_dtype(field)
    # what unallocated space reads: the field's empty values, NaN if the
    # field treats empty as unobserved
    with jax.ensure_compile_time_eval():
        empties = {c.name: jnp.full((), c.empty, jnp.float32)
                   for c in m.channels}
        ev = field.sample_valid(empties)
        fill = float(empties[field.select_channel]) if bool(ev) \
            else float("nan")

    B = m.blocks_per_edge
    bc = octree.block_coords_table(m)
    live = octree.slot_mask(m)
    lin = bc[:, 0] * B * B + bc[:, 1] * B + bc[:, 2]
    tgt = jnp.where(live, lin, B * B * B)
    flat = jnp.full((B * B * B, octree.BLOCK_VOXELS), fill, dtype=dtype)
    flat = flat.at[tgt].set(enc.astype(dtype), mode="drop")
    return {"F": flat}


def _sample_volume(vol, pos_vox, size, fill):
    """Nearest-voxel lookup with out-of-bounds fill.  ``vol`` is either a
    dense ``[S,S,S]`` volume or a brick-tiled ``[B^3, 512]`` row view
    (see pack_view); both cost one gathered descriptor per sample.

    (A ``gather_streams`` knob that split this into N separate gather ops
    measured 4x faster in isolated probes — bench_data/stream_probe.json —
    but neutral-to-negative at pipeline level; pruned, see
    ``pipeline/experimental.py``.)"""
    v = jnp.floor(pos_vox).astype(jnp.int32)
    inb = ((v >= 0) & (v < size)).all(axis=-1)
    vc = jnp.clip(v, 0, size - 1)
    if vol.ndim == 2:      # tiled rows
        B = size // BLOCK_SIDE
        b = vc >> 3
        l = vc & 7
        row = (b[..., 0] * B + b[..., 1]) * B + b[..., 2]
        col = l[..., 0] + l[..., 1] * 8 + l[..., 2] * 64
        val = _gather2(vol, row, col)
    else:
        val = _gather2(vol.reshape(vol.shape[0], -1),
                       vc[..., 0],
                       vc[..., 1] * vol.shape[2] + vc[..., 2])
    return jnp.where(inb, val, jnp.float32(fill)), inb


def _sample_volume_interp(vol, pos_vox, size, nan_sub):
    """Trilinear sample from the tiled view — the reference's
    ``volume.interp`` (`octree.hpp:542-563`, used by its raycaster near
    the surface, `kfusion/rendering_impl.hpp:55-57`): 8 corner gathers
    blended by the fractional position.  NaN taps (weight==0 voxels,
    whose RAW value the reference blends) and out-of-bounds taps read
    ``nan_sub`` — the field's init/empty value (1.0 for the TSDF).

    8x the descriptors of :func:`_sample_volume`; quality knob for noisy
    sensors, where nearest-tap crossing solves amplify per-voxel noise.
    """
    base = jnp.floor(pos_vox).astype(jnp.int32)
    frac = pos_vox - base
    B = size // BLOCK_SIDE
    out = 0.0
    for i in range(8):
        off = jnp.array([i & 1, (i >> 1) & 1, (i >> 2) & 1], jnp.int32)
        v = base + off
        inb = ((v >= 0) & (v < size)).all(axis=-1)
        vc = jnp.clip(v, 0, size - 1)
        if vol.ndim == 2:
            b = vc >> 3
            l = vc & 7
            row = (b[..., 0] * B + b[..., 1]) * B + b[..., 2]
            col = l[..., 0] + l[..., 1] * 8 + l[..., 2] * 64
            val = _gather2(vol, row, col)
        else:
            val = _gather2(vol.reshape(vol.shape[0], -1), vc[..., 0],
                           vc[..., 1] * vol.shape[2] + vc[..., 2])
        val = jnp.where(inb & ~jnp.isnan(val), val, jnp.float32(nan_sub))
        w = (jnp.where(off[0] == 1, frac[..., 0], 1.0 - frac[..., 0])
             * jnp.where(off[1] == 1, frac[..., 1], 1.0 - frac[..., 1])
             * jnp.where(off[2] == 1, frac[..., 2], 1.0 - frac[..., 2]))
        out = out + val * w
    return out


def _gather2(vol2d, row, col):
    """``vol2d[row, col] -> f32`` (one gather op)."""
    return vol2d[row, col].astype(jnp.float32)


def _splat_bounds(m: VoxelMap, field, view, H: int, W: int,
                  near: float, far: float, inside_any=None,
                  near_rescue: bool = True):
    """Phase 1: per-ray start depth by splatting inside-containing blocks.

    Replaces the ESVO ray_iterator's coarse skip (`ray_iterator.hpp`) AND
    round-1's pooled-mip plane sweep.  Rationale (measured on this backend,
    bench_data/gather_scan_probe.json): every random-gathered element costs
    ~8-14 ns regardless of table size, so a 40-plane sweep over 19k rays
    (~770k gathers) costs ~10 ms; projecting the ~12k block slots and
    scatter-min-ing their camera depth into a small image grid costs ~0.2 ms
    for the same information.

    Only blocks whose brick contains an *inside* voxel splat (a dense
    [capacity, 512] reduction), so stale free-space blocks do not pull the
    scan start forward.  A min-pool dilation covers each block's pixel
    footprint.  Returns (t_start [gh, gw] grid, grid cell size).
    """
    # grid cell: largest of 8/4/2/1 dividing both image dims
    for g in (8, 4, 2, 1):
        if H % g == 0 and W % g == 0:
            break
    gh, gw = H // g, W // g

    inv_view = jnp.linalg.inv(view)          # = K @ inv(pose): world -> pix
    vs = m.voxel_size
    bc = octree.block_coords_table(m).astype(jnp.float32)
    centers = (bc + 0.5) * (BLOCK_SIDE * vs)
    hom = centers @ inv_view[:3, :3].T + inv_view[:3, 3]
    z = hom[:, 2]
    zsafe = jnp.where(z == 0, 1.0, z)
    px = hom[:, 0] / zsafe
    py = hom[:, 1] / zsafe

    if inside_any is None:
        raw = m.voxels[field.select_channel].astype(jnp.float32)
        inside_any = jnp.any(field.is_inside(raw), axis=1)
    diag = 1.7320508 * BLOCK_SIDE * vs
    # pixel footprint margin: blocks slightly off-screen still cover border
    # pixels; the min-pool below covers up to 2 cells of spread
    marg = 2.0 * g
    ok = (octree.slot_mask(m) & inside_any & (z > 1e-3)
          & (px >= -marg) & (px <= W - 1 + marg)
          & (py >= -marg) & (py <= H - 1 + marg))

    z_lo = jnp.maximum(z - 0.5 * diag, near)
    z_hi = z + 0.5 * diag
    cxf = px / g
    cyf = py / g
    # Scatter each block into the 3x3 cell neighbourhood its pixel
    # footprint actually reaches (masked), then dilate one more cell with a
    # 3x3 min-pool.  A plain 5x5 pool (tried first) spreads a slanted
    # surface's depth minimum over +-2 cells (~0.4 m at 2.5 m), which both
    # forces a wide fine window and fires the second scan constantly.
    tmin = jnp.full((gh * gw,), jnp.inf)
    tmax = jnp.full((gh * gw,), -jnp.inf)
    # fx recovered from view = pose @ inv(K): ||view[:3,0]|| == 1/fx
    fx = 1.0 / jnp.maximum(jnp.linalg.norm(view[:3, 0]), 1e-9)
    foot_r = 0.5 * diag * fx / jnp.maximum(z, 1e-3) / g
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            reach = float(np.hypot(dx, dy)) - 0.71
            okc = ok & (foot_r >= reach)
            cx = jnp.clip((cxf + dx).astype(jnp.int32), 0, gw - 1)
            cy = jnp.clip((cyf + dy).astype(jnp.int32), 0, gh - 1)
            tgt = jnp.where(okc, cy * gw + cx, gh * gw)
            tmin = tmin.at[tgt].min(z_lo, mode="drop")
            tmax = tmax.at[tgt].max(z_hi, mode="drop")
    tmin = tmin.reshape(gh, gw)
    tmax = tmax.reshape(gh, gw)
    tmin = -jax.lax.reduce_window(-tmin, -jnp.inf, jax.lax.max,
                                  (3, 3), (1, 1), "SAME")
    tmax = jax.lax.reduce_window(tmax, -jnp.inf, jax.lax.max,
                                 (3, 3), (1, 1), "SAME")

    # Near-field blind-zone fallback (ADVICE r2): a block's pixel footprint
    # foot_r exceeds the 3x3-scatter + 3x3-pool reach (~2.4 cells) once it
    # is closer than z_blind = 0.5*diag*fx/(2.4*g), so silhouette rays at
    # the periphery of close blocks can end up with NO start bound and
    # would never be scanned.  Rescue: cells with no splat whose wide
    # neighbourhood holds such a close block inherit that neighbourhood's
    # tmin as their start — the missed surface IS the close block, so one
    # fine window anchored there covers it.  Activating these rays is
    # descriptor-free (the fine scan is dense with an active mask); the
    # only cost is two more dense reduce_windows on the tiny splat grid.
    if not near_rescue:
        return tmin, tmax, g
    R = 12           # covers foot_r at the near plane for bench intrinsics
    twide = -jax.lax.reduce_window(-tmin, -jnp.inf, jax.lax.max,
                                   (2 * R + 1, 2 * R + 1), (1, 1), "SAME")
    z_blind = 0.5 * diag * fx / (2.4 * g)
    fallback = (~jnp.isfinite(tmin)) & (twide < z_blind)
    tmin = jnp.where(fallback, twide, tmin)
    # keep the fallback rays' far bound narrow (the near block only) so
    # they don't flood the budgeted second-window pass
    tmax = jnp.where(fallback, twide + diag, tmax)
    return tmin, tmax, g


class _Fine(NamedTuple):
    hit: jnp.ndarray
    z_hit: jnp.ndarray


def _fine_scan(m, dense, field, origin, dirs, z_start, span, n_samples,
               active):
    """Phase 2: fine first-crossing detection across a bracket.

    Reference semantics: only transitions between *valid* samples count
    (weight==0 / unobserved never cross, `rendering_impl.hpp:49-58`) —
    invalid samples do not reset the previous valid value — and the
    crossing position is the linear solve between the two bracketing valid
    samples (`rendering_impl.hpp:66`).

    Batched: one gather over all (sample, ray) positions, a gather-free
    forward-fill of the last valid sample along the depth axis, then dense
    first-crossing reductions.
    """
    inv_vs = m.inverse_voxel_size
    dz = span / n_samples
    F = n_samples + 1
    rshape = dirs.shape[:-1]          # ray batch: [h, w] or compacted [n]

    # one [F, *rays] gather: NaN marks invalid AND out-of-volume samples
    stepshape = (F,) + (1,) * len(rshape)
    z = z_start[None] + dz * jnp.arange(F, dtype=jnp.float32) \
        .reshape(stepshape)
    pos = (origin + dirs[None] * z[..., None]) * inv_vs
    f, _ = _sample_volume(dense["F"], pos, m.size, jnp.nan)   # [F, *rays]
    ok = ~jnp.isnan(f)

    # Forward-fill of "last valid sample was outside" WITHOUT a gather:
    # encode (sample index, outside-bit) into one int and cummax — the max
    # carries the most recent valid sample's index and sign.  (A
    # take_along_axis forward-fill of the values costs another full-size
    # gather, measured at ~4 ms of the old 10 ms fine scan.)
    steps = jnp.arange(F, dtype=jnp.int32).reshape(stepshape)
    outside = ok & ~field.is_inside(f)
    enc = jnp.where(ok, steps * 2 + outside.astype(jnp.int32), -1)
    last_enc = jax.lax.cummax(enc, axis=0)                    # [F, h, w]
    prev_enc = jnp.concatenate([jnp.full_like(last_enc[:1], -1),
                                last_enc[:-1]])
    prev_valid = prev_enc >= 0
    prev_was_outside = (prev_enc & 1) == 1
    prev_idx = jnp.maximum(prev_enc >> 1, 0)

    crossing = (ok & prev_valid & field.is_inside(f) & prev_was_outside)
    crossing = crossing & active[None]
    hit = jnp.any(crossing, axis=0)
    j_star = jnp.argmax(crossing, axis=0)                     # first crossing

    take = lambda a: jnp.take_along_axis(a, j_star[None], axis=0)[0]
    f_hi = take(f)
    j_lo = take(prev_idx)                                     # [h, w]
    z_lo = z_start + dz * j_lo.astype(jnp.float32)
    # value of the bracketing outside sample: one small per-ray gather
    f_lo = jnp.take_along_axis(jnp.where(ok, f, 0.0), j_lo[None], axis=0)[0]
    z_hi = take(z)

    # linear crossing solve between the two valid samples
    # (rendering_impl.hpp:66), using their true spacing across invalid gaps
    denom = f_lo - f_hi
    denom = jnp.where(jnp.abs(denom) < 1e-12, -1e-12, denom)
    frac = (f_hi - field.surf_boundary) / denom
    z_ref = z_hi + (z_hi - z_lo) * frac      # backtrack toward f_lo
    return _Fine(hit=hit, z_hit=jnp.where(hit, z_ref, 0.0))


def raycast(m: VoxelMap, field, view: jnp.ndarray, H: int, W: int,
            near: float, far: float, dense=None, *,
            normals: str = "volume",
            second_window: bool = True,
            span_factor: float = 1.6,
            grad_table=None,
            refine: str = "secant",
            inside_any=None,
            row_range=None,
            w2_budget: int = 8192,
            scan_stride: float = 0.5,
            midsolve: bool = False,
            near_rescue: bool = True,
            grad_decim: int = 1,
            full_res_scan: bool = False) -> RaycastResult:
    """Full raycastKernel (`rendering.cpp:50-90`): vertex + normal maps.

    Pipeline: block-splat start depths (phase 1, ~12k scattered elements)
    -> fine first-crossing scan over a short window at half ray resolution
    (phase 2) -> second window for rays whose first window grazed without a
    valid crossing -> full-res re-solve -> normals.

    ``normals``: "volume" = 6-tap central difference in the field at full
    resolution (the reference's volume.grad); "stored" = precomputed
    per-voxel gradient table (`gradmap.py`, 2 gather descriptors/pixel
    instead of 6, same taps; pass ``grad_table`` from the pipeline
    cache, else it is built here); "hybrid" = half-res 6-tap gradient
    with a per-pixel along-ray
    correction from the refine samples (1/4 the gradient taps); "exact" =
    the reference's trilinearly-blended gradient (quality mode).
    Cheaper variants that broke the ICP solve ("image", "forward3") live
    in ``pipeline/experimental.py`` with their measurements.

    ``refine``: full-res re-solve flavour when the fine scan ran at half
    resolution.  "secant" = `_refine`'s 2-sample field re-solve (the
    reference-faithful default); "plane" (requires stored normals) =
    gather-free ray/plane intersection against the half-res hit's stored
    surface plane — zero refine descriptors; observedness validation
    folds into the per-pixel normal gather (an unobserved/unallocated
    landing voxel yields a zero gradient -> invalid normal, which the
    ICP's -3 status already rejects).

    ``inside_any`` (bool[capacity], optional): precomputed per-slot
    inside-voxel flags for the splat phase — lets a distributed caller
    (parallel/raycast_dist.py) avoid touching ``m.voxels`` so the brick
    table can stay sharded.  ``row_range = (r0, nrows)`` restricts the
    per-ray phases (fine scan, refine, normals) to an image-row strip;
    r0 may be traced (a mesh axis_index), nrows must be static.  The
    splat grid is still computed for the full image (cheap dense math);
    with the half-res fine scan both r0 and nrows must be even.
    """
    origin, dirs = ray_directions(view, H, W)
    if dense is None:
        dense = pack_view(m, field)
    use_stored = normals == "stored"
    if use_stored and grad_table is None:
        grad_table = gradmap.build_table(m, field)

    tgrid, tmax_grid, g = _splat_bounds(m, field, view, H, W, near, far,
                                        inside_any=inside_any,
                                        near_rescue=near_rescue)

    vs = m.voxel_size
    thickness = field.mu if field.invert_normals else 2.0 * vs
    diag = 1.7320508 * BLOCK_SIDE * vs
    # fine scan at half ray resolution when the image is dense enough (the
    # full-res refine below then re-solves per pixel)
    # the reference marches EVERY pixel; our default scans at half ray
    # resolution + a per-pixel full-res re-solve.  ``full_res_scan``
    # restores per-pixel scanning (4x the scan descriptors; quality probe
    # for noisy sensors where silhouette pixels inheriting a neighbour's
    # crossing may matter).
    half_res = (H % 2 == 0) and (W % 2 == 0) and W >= 160 \
        and not full_res_scan
    # window: covers the splatted block's extent plus the band; step
    # ``scan_stride`` band thicknesses (default half).  (0.75 * thickness
    # alone — the reference's largestep — was measured at +2 fps but ATE
    # 1.73 -> 2.23 cm at -z1 and 2.53 -> 4.59 cm at the canonical -z4:
    # the wider linear-solve baseline hurts more than the refine pass
    # recovers.  ``midsolve`` adds a half-res secant re-solve between the
    # scan and the full-res refine to pull the baseline back inside the
    # band when a coarse stride is used.)
    fine_step = scan_stride * thickness
    fine_span = span_factor * diag + 2.0 * thickness
    n_fine = int(np.clip(np.ceil(fine_span / fine_step) + 1, 8, 48))
    fine_span = n_fine * fine_step

    # the start depth comes from the ray's splat-grid cell
    if half_res:
        dirs_h = 0.25 * (dirs[0::2, 0::2] + dirs[1::2, 0::2]
                         + dirs[0::2, 1::2] + dirs[1::2, 1::2])
        rep = g // 2
        fd = dirs_h
    else:
        rep = g
        fd = dirs
    t0 = jnp.repeat(jnp.repeat(tgrid, rep, 0), rep, 1)[:fd.shape[0],
                                                       :fd.shape[1]]
    t1 = jnp.repeat(jnp.repeat(tmax_grid, rep, 0), rep, 1)[:fd.shape[0],
                                                           :fd.shape[1]]
    active = jnp.isfinite(t0)
    z_start = jnp.clip(jnp.where(active, t0, near), near, far)

    if row_range is not None:
        r0, nr = row_range
        f = 2 if half_res else 1
        sl = lambda a, s0, n: jax.lax.dynamic_slice_in_dim(a, s0, n, 0)
        dirs = sl(dirs, r0, nr)
        fd = sl(fd, r0 // f, nr // f)
        z_start = sl(z_start, r0 // f, nr // f)
        active = sl(active, r0 // f, nr // f)
        t1 = sl(t1, r0 // f, nr // f)

    f1 = _fine_scan(m, dense, field, origin, fd, z_start, fine_span,
                    n_fine, active)

    # second window: surfaces deeper than the nearest splatted block (e.g.
    # a wall behind a grazed silhouette block).  Only rays whose splatted
    # FAR bound extends beyond window 1 can possibly hit deeper (one
    # block-diagonal of slack compensates pooling locality).  The needy
    # rays — typically a few % at silhouettes — are COMPACTED into a fixed
    # budget and only they are re-scanned: a full masked second pass over
    # all rays was measured at ~5.5 ms/frame; the compacted one is ~1.5 ms.
    if second_window:
        need2 = active & ~f1.hit & (z_start + fine_span < t1 + diag)
        n_rays = fd.shape[0] * fd.shape[1]
        # the compacted re-scan always runs its full budget (fixed shapes):
        # every budget slot costs n_fine sample descriptors whether or not
        # a needy ray fills it, so size it to the scene's silhouette
        # fraction (typically a few % of rays), not to n_rays
        budget = min(w2_budget, n_rays)
        idx = jnp.nonzero(need2.reshape(-1), size=budget,
                          fill_value=-1)[0]
        sel = jnp.maximum(idx, 0)
        fd2 = fd.reshape(-1, 3)[sel]
        zs2 = (z_start + fine_span).reshape(-1)[sel]
        f2 = _fine_scan(m, dense, field, origin, fd2, zs2, fine_span,
                        n_fine, idx >= 0)
        tgt = jnp.where(idx >= 0, idx, n_rays)
        hit2 = jnp.zeros((n_rays,), bool).at[tgt].set(f2.hit, mode="drop") \
            .reshape(f1.hit.shape)
        z2 = jnp.zeros((n_rays,)).at[tgt].set(f2.z_hit, mode="drop") \
            .reshape(f1.z_hit.shape)
        hit = f1.hit | hit2
        z_hit = jnp.where(f1.hit, f1.z_hit, z2)
    else:
        hit, z_hit = f1.hit, f1.z_hit

    if midsolve:
        # half-res secant re-solve: with a coarse scan stride the linear
        # solve between (possibly truncation-clamped) scan samples can be
        # off by ~stride/2; two samples well inside the band re-anchor z
        # before the full-res refine (whose +/-0.7*thickness window would
        # otherwise straddle the band edge and re-solve between clamped
        # values).
        z_hit = _midsolve(m, dense, field, origin, fd, z_hit, hit,
                          0.35 * thickness)

    z_half, hit_half = z_hit, hit          # pre-upsample (hybrid normals)
    ref_extras = None
    if half_res:
        up = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
        hit = up(hit)
        z_hit = up(z_hit)
        # full-res validation + sub-step re-solve around the half-res z:
        # pixels whose own ray has no crossing there (silhouettes) drop out.
        # delta = 0.7 * thickness (decoupled from the scan stride): both
        # samples stay inside the +-thickness linear band — at the original
        # 3-step delta they were usually clamped/truncated values, biasing
        # the linear solve (ATE 2.6 -> 1.73 cm when fixed) — while still
        # covering the surface-z spread across the 2x2 upsample
        delta = 0.7 * thickness
        if use_stored and refine == "plane":
            # gather-free per-pixel re-solve: intersect each full-res ray
            # with the surface plane at its parent half-res hit (stored
            # normal there: one 2-descriptor gather per HALF-res ray).
            # Valid exactly where _refine's linear solve is: the field is
            # locally planar inside the band.
            vert_h = origin + fd * z_half[..., None]
            g_h, _, _ = gradmap.sample(m, grad_table,
                                       vert_h * m.inverse_voxel_size)
            up3 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
            n_f = up3(g_h)
            v_f = up3(vert_h)
            denom = jnp.sum(dirs * n_f, axis=-1)
            numer = jnp.sum((v_f - origin) * n_f, axis=-1)
            okp = jnp.abs(denom) > 1e-9
            z_pl = jnp.where(okp, numer / jnp.where(okp, denom, 1.0),
                             z_hit)
            # stay inside the refine window around the parent depth
            z_hit = jnp.where(hit, jnp.clip(z_pl, z_hit - delta,
                                            z_hit + delta), z_hit)
        else:
            interp_sub = None
            if refine == "interp":
                # noise-robust quality mode: reference-style trilinear
                # re-solve; unobserved taps blend the raw init value
                interp_sub = next(c.init for c in m.channels
                                  if c.name == field.select_channel)
            z_hit, hit, rf_lo, rf_hi, rf_pair = _refine(
                m, dense, field, origin, dirs, z_hit, hit, delta,
                interp_sub=interp_sub)
            ref_extras = (rf_lo, rf_hi, rf_pair, delta)

    vertex = origin + dirs * z_hit[..., None]
    ray_norm = jnp.linalg.norm(dirs, axis=-1)
    t_hit = jnp.where(hit, z_hit * ray_norm, 0.0)

    if use_stored:
        # normals from the precomputed table at the REFINED vertex: 2
        # gather descriptors/pixel vs _grad6's 6, numerically the same
        # taps.  Depth keeps _refine's 2-sample secant re-solve — a
        # 1-sample Newton step off the stored tangent was tried instead
        # and rejected: the pre-refine voxel can sit on the truncation
        # plateau where the tangent slope is unusable (ATE 1.73 -> 3.75
        # at -z1 even with the Taylor correction).
        stored_g, _, _ = gradmap.sample(
            m, grad_table, vertex * m.inverse_voxel_size)
        g_ = -stored_g if field.invert_normals else stored_g
        gn = jnp.linalg.norm(g_, axis=-1, keepdims=True)
        normal = g_ / jnp.maximum(gn, 1e-12)
        bad = ~hit | (gn[..., 0] == 0)
    elif normals == "hybrid" and half_res:
        # half-res central-difference gradient (1/4 the taps), corrected
        # per pixel with the along-ray derivative from the refine samples
        # (already gathered): the lateral components are shared across the
        # 2x2 upsample but the ray component is exact per pixel.
        # ``grad_decim`` > 1 subsamples the gradient grid further (e.g. 2 =
        # quarter-res lateral taps, 1/16 of full): each (2*gd)^2 pixel
        # group shares lateral components; pixels whose sampled parent ray
        # missed get invalid normals (the ICP's -3 status rejects them).
        vert_h = origin + fd * z_half[..., None]
        gd = int(grad_decim)
        if gd > 1 and vert_h.shape[0] % gd == 0 and vert_h.shape[1] % gd == 0:
            g_q = _grad6(m, dense, field, vert_h[::gd, ::gd]) \
                * m.inverse_voxel_size
            g_h = jnp.repeat(jnp.repeat(g_q, gd, 0), gd, 1)
            grad_ok_h = jnp.repeat(jnp.repeat(hit_half[::gd, ::gd], gd, 0),
                                   gd, 1)
        else:
            g_h = _grad6(m, dense, field, vert_h) * m.inverse_voxel_size
            grad_ok_h = jnp.ones_like(hit_half)
        up3 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
        g_m = up3(g_h)
        rf_lo, rf_hi, rf_pair, delta = ref_extras
        rhat = dirs / jnp.maximum(ray_norm, 1e-12)[..., None]
        d_ray = (rf_hi - rf_lo) / (2.0 * delta * jnp.maximum(ray_norm,
                                                             1e-12))
        have = rf_pair & hit & up3(hit_half)
        corr = jnp.where(have, d_ray - jnp.sum(g_m * rhat, -1), 0.0)
        g_ = g_m + corr[..., None] * rhat
        if field.invert_normals:
            g_ = -g_
        gn = jnp.linalg.norm(g_, axis=-1, keepdims=True)
        normal = g_ / jnp.maximum(gn, 1e-12)
        bad = ~hit | (gn[..., 0] == 0) | ~up3(grad_ok_h)
    elif normals == "exact":
        # the reference's exact trilinearly-blended central-difference
        # gradient (octree.grad == `octree.hpp:566-737`), read from the
        # RAW brick table (weight-0 voxels contribute their init value,
        # as the reference's gather does).  ~48 gather descriptors per
        # pixel: a quality mode for noisy sensors, not the headline.
        g_ = octree.grad(m, field.select_channel,
                         vertex * m.inverse_voxel_size)
        if field.invert_normals:
            g_ = -g_
        gn = jnp.linalg.norm(g_, axis=-1, keepdims=True)
        normal = g_ / jnp.maximum(gn, 1e-12)
        bad = ~hit | (gn[..., 0] == 0)
    elif normals not in ("volume", "hybrid"):
        # ("hybrid" without a half-res scan falls through to the full-res
        # 6-tap gradient — same taps, no half-res grid to decimate)
        raise ValueError(f"unknown normals mode {normals!r} (rejected "
                         "variants live in pipeline/experimental.py)")
    else:
        # normals: 6-tap central difference at the hit (the reference's
        # trilinear-blended grad `octree.hpp:566-737` reduces to this at
        # voxel resolution; full interp-grad remains via octree.grad).
        # Full-res on purpose: 2x2-shared normals measurably degrade the
        # ICP point-to-plane solve (ATE 2.3 -> 4.0 cm).
        g_ = _grad6(m, dense, field, vertex)
        if field.invert_normals:
            g_ = -g_
        gn = jnp.linalg.norm(g_, axis=-1, keepdims=True)
        normal = g_ / jnp.maximum(gn, 1e-12)
        bad = ~hit | (gn[..., 0] == 0)
    vertex = jnp.where(hit[..., None], vertex, 0.0)
    invalid = jnp.concatenate([jnp.full_like(normal[..., :1], INVALID),
                               jnp.zeros_like(normal[..., 1:])], axis=-1)
    normal = jnp.where(bad[..., None], invalid, normal)
    return RaycastResult(vertex=vertex, normal=normal, t_hit=t_hit)


def _refine(m: VoxelMap, dense, field, origin, dirs, z_hit, hit, delta,
            interp_sub=None):
    """Full-res re-solve of the crossing within +/-delta of ``z_hit``.

    Samples the field at z-delta and z+delta per pixel; a valid
    outside->inside pair re-solves the linear crossing (and corrects the
    2x2-shared fine result per pixel), no pair -> the pixel becomes a miss
    (its own ray has no surface there, e.g. at silhouettes).
    """
    inv_vs = m.inverse_voxel_size

    def sample(z):
        # NaN OOB fill: out-of-volume samples are invalid (never pair up)
        pos = (origin + dirs * z[..., None]) * inv_vs
        if interp_sub is not None:
            # reference-style trilinear re-solve (volume.interp near the
            # surface, kfusion/rendering_impl.hpp:55-57): unobserved taps
            # blend the raw init value, so samples always pair
            return _sample_volume_interp(dense["F"], pos, m.size,
                                         interp_sub)
        f, _ = _sample_volume(dense["F"], pos, m.size, jnp.nan)
        return f

    f_lo = sample(z_hit - delta)
    f_hi = sample(z_hit + delta)
    pair = ~jnp.isnan(f_lo) & ~jnp.isnan(f_hi)
    crossing = pair & ~field.is_inside(f_lo) & field.is_inside(f_hi)
    # drop only on positive evidence the pixel's own ray has no surface
    # here (both samples observed, no crossing); unobserved -> keep
    miss = pair & ~crossing
    denom = f_lo - f_hi
    denom = jnp.where(jnp.abs(denom) < 1e-12, -1e-12, denom)
    frac = (f_hi - field.surf_boundary) / denom
    z_new = z_hit + delta + 2.0 * delta * frac
    # (f_lo, f_hi, pair) feed the hybrid normals' per-pixel along-ray
    # derivative — already gathered, free to return
    return jnp.where(crossing, z_new, z_hit), hit & ~miss, f_lo, f_hi, pair


def _midsolve(m: VoxelMap, dense, field, origin, dirs, z_hit, hit,
              delta):
    """Half-res secant correction of the scan's crossing estimate: sample
    at z +/- delta and re-solve the linear crossing when a valid
    outside->inside pair brackets it.  Never drops hits (unlike `_refine`
    the rays here are the scan's own, so a non-bracketing pair just means
    the estimate was already within delta of the surface)."""
    inv_vs = m.inverse_voxel_size

    def sample(z):
        pos = (origin + dirs * z[..., None]) * inv_vs
        f, _ = _sample_volume(dense["F"], pos, m.size, jnp.nan)
        return f

    f_lo = sample(z_hit - delta)
    f_hi = sample(z_hit + delta)
    pair = ~jnp.isnan(f_lo) & ~jnp.isnan(f_hi)
    crossing = pair & ~field.is_inside(f_lo) & field.is_inside(f_hi) & hit
    denom = f_lo - f_hi
    denom = jnp.where(jnp.abs(denom) < 1e-12, -1e-12, denom)
    frac = (f_hi - field.surf_boundary) / denom
    z_new = z_hit + delta + 2.0 * delta * frac
    return jnp.where(crossing, z_new, z_hit)


def _grad6(m: VoxelMap, dense, field, pos_world):
    """Central-difference gradient from 6 nearest-voxel taps (reads the
    NaN-encoded view; NaN taps recover the raw init/empty value).  All six
    taps go through ONE batched gather op."""
    inv_vs = m.inverse_voxel_size
    vol = dense["F"]
    spec = [c for c in m.channels if c.name == field.select_channel][0]
    base = pos_world * inv_vs
    offs = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
    pos6 = base[None] + offs.reshape((6,) + (1,) * (base.ndim - 1) + (3,))
    vals, _ = _sample_volume(vol, pos6, m.size, spec.empty)
    vals = jnp.nan_to_num(vals, nan=spec.init)
    g = jnp.stack([vals[0] - vals[1], vals[2] - vals[3],
                   vals[4] - vals[5]], axis=-1)
    return g * 0.5
