"""Fused-integration Pallas kernel semantics (interpret mode, CPU).

The kernel is numerically exact vs the XLA path (validated on-chip: 0
mismatches over 0.5M voxels) but the per-lane shuffle formulation measured
~30x slower than the one-hot MXU einsum path on the v5e, so the pipeline
keeps the XLA path as default.  This test pins the kernel's semantics via
the Pallas interpreter so the alternative path can't rot.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_interpret(scal, atlas, tsdf, weight, Tcw, K, H, W, mu, vs):
    import functools
    from supereight_tpu.ops import integrate_kernel as ik
    kern = functools.partial(ik._kernel, H=H, W=W, mu=mu,
                             max_weight=100.0, vs=vs)
    cap = tsdf.shape[0]
    return pl.pallas_call(
        kern,
        grid=(cap // ik.BLK,),
        in_specs=[
            pl.BlockSpec((ik.BLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(atlas.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ik.BLK, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ik.BLK, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((ik.BLK, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ik.BLK, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ik.BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap, 512), jnp.float32),
            jax.ShapeDtypeStruct((cap, 512), jnp.float32),
            jax.ShapeDtypeStruct((cap, 1), jnp.int32),
        ],
        interpret=True,
    )(scal, atlas, tsdf, weight, Tcw, K)


def test_kernel_matches_oracle():
    from supereight_tpu.ops import integrate_kernel as ik
    rng = np.random.default_rng(1)
    cap, H, W = ik.BLK * 2, 64, 128
    scal = np.zeros((cap, 8), np.int32)
    scal[:, 0] = rng.integers(0, 8, cap)
    scal[:, 1] = rng.integers(0, 8, cap)
    scal[:, 2] = rng.integers(1, 8, cap)
    scal[:, 3] = 0
    scal[:, 4] = rng.integers(0, H - 16, cap)
    scal[:, 5] = rng.integers(0, W - 16, cap)
    scal[:, 6] = 1
    atlas = np.zeros((4 * H + ik.SLAB_ROWS, ik.AW), np.float32)
    atlas[:H, :W] = rng.uniform(0.5, 3.0, (H, W)).astype(np.float32)
    tsdf = np.ones((cap, 512), np.float32)
    weight = np.zeros((cap, 512), np.float32)
    Tcw = np.eye(4, dtype=np.float32)
    K = np.array([[100, 0, W / 2, 0], [0, 100, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    vs, mu = 0.02, 0.1

    out_t, out_w, vis = run_interpret(
        jnp.asarray(scal), jnp.asarray(atlas), jnp.asarray(tsdf),
        jnp.asarray(weight), jnp.asarray(Tcw), jnp.asarray(K), H, W, mu, vs)
    out_t = np.asarray(out_t)
    out_w = np.asarray(out_w)

    lin = np.arange(512)
    lx = (lin % 8).astype(np.float32)
    ly = ((lin // 8) % 8).astype(np.float32)
    lz = (lin // 64).astype(np.float32)
    for b in range(cap):
        wx = (scal[b, 0] * 8 + lx) * vs
        wy = (scal[b, 1] * 8 + ly) * vs
        cz = (scal[b, 2] * 8 + lz) * vs
        zs = np.where(cz == 0, 1, cz)
        px = (100 * wx + W / 2 * cz) / zs + 0.5
        py = (100 * wy + H / 2 * cz) / zs + 0.5
        valid = (cz >= 1e-4) & (px >= 0.5) & (px <= W - 1.5) \
            & (py >= 0.5) & (py <= H - 1.5)
        lr = py.astype(np.int64) - scal[b, 4]
        lc = px.astype(np.int64) - scal[b, 5]
        valid &= (lr >= 0) & (lr < 16) & (lc >= 0) & (lc < 16)
        ds = np.zeros(512, np.float32)
        ds[valid] = atlas[py.astype(np.int64)[valid],
                          px.astype(np.int64)[valid]]
        valid &= ds > 0
        norm = np.sqrt(1 + (wx / zs) ** 2 + (wy / zs) ** 2)
        diff = (ds - cz) * norm
        do = valid & (diff > -mu)
        sdf = np.minimum(1.0, diff / mu)
        et = np.where(do, np.clip(sdf, -1, 1), 1.0)
        ew = np.where(do, 1.0, 0.0)
        np.testing.assert_allclose(out_t[b], et, atol=2e-5)
        np.testing.assert_allclose(out_w[b], ew, atol=1e-5)
