"""Pallas TPU kernel: fused projective TSDF integration.

Fuses what the XLA path (`pipeline/integration.py:integrate`) does in
several materialized passes — per-voxel projection, per-block depth-patch
fetch, nearest-sample lookup, and the SDF update rule
(`kfusion/mapping_impl.hpp:38-55`) — into one VMEM-resident pass with no
HBM materialization of one-hots / patches / row-values.

Mosaic constraints shape the lookup (probed on the v5e):
* VMEM loads need 8-aligned dynamic row starts and 128-aligned column
  starts -> fetch a 32-row, full-width slab at an aligned start,
* the only per-lane gather is `dynamic_gather` on (rows, 128) tiles
  (axis 1) -> extract the 16-wide column window with a dynamic
  `pltpu.roll` (positive shifts only) and resolve the (row, lane) lookup
  as 4 row-broadcast gathers + selects.

Falls back to the XLA path when unavailable (`available()`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supereight_tpu.core.octree import BLOCK_SIDE, BLOCK_VOXELS

PATCH = 16        # footprint window (strided pixels)
SLAB_ROWS = 32    # 8-aligned fetch rows covering the window
BLK = 32          # blocks per program
AW = 384          # atlas width, padded to a lane multiple


def _kernel(scal_ref, atlas_ref, tsdf_ref, weight_ref, tcw_ref, k_ref,
            out_tsdf_ref, out_weight_ref, out_vis_ref,
            *, H, W, mu, max_weight, vs):
    """One program: BLK voxel blocks.

    scal_ref: SMEM int32[BLK, 8]: bcx, bcy, bcz, lvl, p0r, p0c, live, pad
    atlas_ref: VMEM f32[4*H + 32, AW] decimated depth atlas
    (zero-padded cols + 32 guard rows so aligned slab loads stay in range)
    """
    lin = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0) * 128 \
        + jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    lx = (lin % BLOCK_SIDE).astype(jnp.float32)
    ly = ((lin // BLOCK_SIDE) % BLOCK_SIDE).astype(jnp.float32)
    lz = (lin // (BLOCK_SIDE * BLOCK_SIDE)).astype(jnp.float32)

    def body(i, _):
        bcx = scal_ref[i, 0]
        bcy = scal_ref[i, 1]
        bcz = scal_ref[i, 2]
        lvl = scal_ref[i, 3]
        p0r = scal_ref[i, 4]
        p0c = scal_ref[i, 5]
        live = scal_ref[i, 6]

        # world voxel corners (projective_functor.hpp:88-95)
        wx = (bcx.astype(jnp.float32) * BLOCK_SIDE + lx) * vs
        wy = (bcy.astype(jnp.float32) * BLOCK_SIDE + ly) * vs
        wz = (bcz.astype(jnp.float32) * BLOCK_SIDE + lz) * vs
        cx = tcw_ref[0, 0] * wx + tcw_ref[0, 1] * wy \
            + tcw_ref[0, 2] * wz + tcw_ref[0, 3]
        cy = tcw_ref[1, 0] * wx + tcw_ref[1, 1] * wy \
            + tcw_ref[1, 2] * wz + tcw_ref[1, 3]
        cz = tcw_ref[2, 0] * wx + tcw_ref[2, 1] * wy \
            + tcw_ref[2, 2] * wz + tcw_ref[2, 3]
        hx = k_ref[0, 0] * cx + k_ref[0, 2] * cz
        hy = k_ref[1, 1] * cy + k_ref[1, 2] * cz
        zsafe = jnp.where(cz == 0.0, 1.0, cz)
        px = hx / zsafe + 0.5
        py = hy / zsafe + 0.5
        valid = ((cz >= 1e-4) & (px >= 0.5) & (px <= W - 1.5)
                 & (py >= 0.5) & (py <= H - 1.5))

        # patch-local coords at the block's stride level
        ix = px.astype(jnp.int32) >> lvl
        iy = py.astype(jnp.int32) >> lvl
        lr = iy - p0r
        lc = ix - p0c
        valid = valid & (lr >= 0) & (lr < PATCH) & (lc >= 0) & (lc < PATCH) \
            & (live > 0)

        # 8-aligned full-width slab; roll window start to (0, 0)
        # (dynamic pltpu.roll needs positive shifts on this backend)
        p0r_al = pl.multiple_of((lvl * H + p0r) & ~7, 8)
        roff = (lvl * H + p0r) - p0r_al          # 0..7
        slab = atlas_ref[pl.ds(p0r_al, SLAB_ROWS), :]          # [32, AW]
        slab = pltpu.roll(slab, AW - p0c, axis=1)[:, :128]     # [32, 128]
        slab = pltpu.roll(slab, SLAB_ROWS - roff, axis=0)      # rows at 0..

        # per-voxel lookup: window row via 16-way select, column via the
        # 128-lane dynamic_gather (the hardware's only per-lane shuffle)
        lane = jnp.clip(lc, 0, 127)
        dsample = jnp.zeros_like(lx)
        for r in range(PATCH):
            hr = jnp.broadcast_to(slab[r:r + 1, :], (4, 128))
            vr = jnp.take_along_axis(hr, lane, axis=1)
            dsample = jnp.where(lr == r, vr, dsample)
        valid = valid & (dsample > 0.0)

        # sdf_update (kfusion/mapping_impl.hpp:38-55)
        norm = jnp.sqrt(1.0 + (cx / zsafe) ** 2 + (cy / zsafe) ** 2)
        diff = (dsample - cz) * norm
        do = valid & (diff > -mu)
        t_old = tsdf_ref[i, :].reshape(4, 128)
        w_old = weight_ref[i, :].reshape(4, 128)
        sdf = jnp.minimum(1.0, diff / mu)
        t_new = jnp.clip((w_old * t_old + sdf) / (w_old + 1.0), -1.0, 1.0)
        w_new = jnp.minimum(w_old + 1.0, max_weight)
        out_tsdf_ref[i, :] = jnp.where(do, t_new, t_old).reshape(BLOCK_VOXELS)
        out_weight_ref[i, :] = jnp.where(do, w_new,
                                         w_old).reshape(BLOCK_VOXELS)
        out_vis_ref[i, 0] = jnp.any(valid).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "mu", "max_weight", "vs"))
def fused_integrate(scal, atlas2d, tsdf, weight, Tcw, Kmat,
                    *, H, W, mu, max_weight, vs):
    """scal int32[cap, 8]; atlas2d f32[4*H + 32, AW]; tsdf/weight f32[cap, 512].
    Returns (tsdf', weight', visible int32[cap, 1])."""
    cap = tsdf.shape[0]
    grid = cap // BLK
    kern = functools.partial(_kernel, H=H, W=W, mu=mu,
                             max_weight=max_weight, vs=vs)

    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4 * H + SLAB_ROWS, AW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, BLOCK_VOXELS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, BLOCK_VOXELS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLK, BLOCK_VOXELS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, BLOCK_VOXELS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap, BLOCK_VOXELS), jnp.float32),
            jax.ShapeDtypeStruct((cap, BLOCK_VOXELS), jnp.float32),
            jax.ShapeDtypeStruct((cap, 1), jnp.int32),
        ],
    )(scal, atlas2d, tsdf, weight,
      Tcw.astype(jnp.float32), Kmat.astype(jnp.float32))


_available = None


def available() -> bool:
    """Probe-compile once; False on backends where Mosaic can't lower it."""
    global _available
    if _available is not None:
        return _available
    import jax as _jax
    if _jax.default_backend() not in ("tpu", "axon"):
        _available = False
        return False
    try:
        scal = jnp.zeros((BLK, 8), jnp.int32)
        atlas = jnp.zeros((4 * 64 + SLAB_ROWS, AW), jnp.float32)
        t = jnp.ones((BLK, BLOCK_VOXELS), jnp.float32)
        w = jnp.zeros((BLK, BLOCK_VOXELS), jnp.float32)
        fused_integrate(scal, atlas, t, w, jnp.eye(4), jnp.eye(4),
                        H=64, W=128, mu=0.1, max_weight=100.0, vs=0.02)
        _available = True
    except Exception:
        _available = False
    return _available
