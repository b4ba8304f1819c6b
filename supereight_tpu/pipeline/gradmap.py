"""Precomputed per-voxel field gradients (the raycaster's normal source).

Reference: normals come from ``volume.grad`` evaluated per raycast hit
(`se_denseslam/src/rendering.cpp:75-84`, `octree.hpp:566-737`).  On this
backend every random-gathered element costs ~8-14 ns regardless of table
size (bench_data/gather_scan_probe.json), so the 6-tap central difference
at ~77k hit pixels costs ~460k gather descriptors per frame — the single
largest line item of the raycast budget.

TPU design: the field only changes at integration time (every
``integration_rate`` frames), so the gradient is a pure function of the
map that can be computed ONCE per integration, densely over the brick
table, and stored.  The raycast then reads the gradient of the refined
hit voxel with 2 gather descriptors per pixel (block_index + one
[4]-wide row) instead of 6 volume taps.  (The F component also fed a
1-sample Newton depth re-solve in an earlier design; rejected — the
pre-refine voxel can sit on the truncation plateau where the local
tangent is unusable, ATE 1.73 -> 3.75 cm — the depth re-solve stays
`raycast._refine`'s 2-sample secant.)

Construction is gather-free inside a brick: the three axis shifts of the
x-fastest ``l = x + 8y + 64z`` brick layout (`node.hpp:140-165`) are lane
rotations of the ``[capacity, 512]`` row (x: +-1, y: +-8, z: +-64), with
the 64 face voxels patched from the 6 face-neighbour bricks — one
``block_index`` gather + one fat-row gather per direction per block
(~12 descriptors/block, vs 3072 per-voxel taps).  Semantics match
`raycast._grad6` over the NaN-encoded packed view: invalid (weight==0 /
unobserved) and unallocated in-volume taps read ``init``, out-of-volume
taps read ``empty``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from supereight_tpu.core import octree
from supereight_tpu.core.octree import BLOCK_SIDE, BLOCK_VOXELS, VoxelMap

#: table layout: [capacity, 512, 4] bf16 rows (gx, gy, gz, F) where g* is
#: the per-voxel-step central difference (0.5 * (f[v+e] - f[v-e])) and F
#: the NaN-encoded field value (NaN = invalid/unobserved, like pack_view)
GRAD_COMPONENTS = 4


def empty_table(capacity: int) -> jnp.ndarray:
    """All-unobserved table (gradient 0, value NaN): what FrameState carries
    before the first integration."""
    t = jnp.zeros((capacity, BLOCK_VOXELS, GRAD_COMPONENTS), jnp.bfloat16)
    return t.at[..., 3].set(jnp.nan)


def _axis_strides():
    # brick linear index l = lx + 8*ly + 64*lz
    return ((0, 1), (1, BLOCK_SIDE), (2, BLOCK_SIDE * BLOCK_SIDE))


def _neighbour_rows(m: VoxelMap, R: jnp.ndarray, bc: jnp.ndarray,
                    live: jnp.ndarray, axis: int, step: int,
                    init: float, empty: float) -> jnp.ndarray:
    """R-rows of each block's face neighbour along ``axis`` in direction
    ``step`` (+1/-1); missing in-volume neighbours read ``init``,
    out-of-volume ones ``empty`` (matching `_grad6`'s OOB fill)."""
    B = m.blocks_per_edge
    n = bc[:, axis] + step
    oob = (n < 0) | (n >= B)
    nb = [bc[:, 0], bc[:, 1], bc[:, 2]]
    nb[axis] = jnp.clip(n, 0, B - 1)
    nslot = m.block_index[nb[0], nb[1], nb[2]]          # [cap] gather
    nslot = jnp.where(oob | ~live, -1, nslot)
    rows = R[jnp.maximum(nslot, 0)]                     # [cap, 512] fat rows
    fill = jnp.where(oob, jnp.bfloat16(empty), jnp.bfloat16(init))[:, None]
    return jnp.where((nslot >= 0)[:, None], rows, fill)


def build_table(m: VoxelMap, field) -> jnp.ndarray:
    """bf16[capacity, 512, 4] (gx, gy, gz, F) for every live brick.

    ``g`` is the unscaled per-voxel-step central difference of the resolved
    field R (R = f where sample-valid, else ``init``), identical to what
    `raycast._grad6` computes from the NaN-encoded view; metric gradients
    are ``g * inverse_voxel_size`` per metre.
    """
    spec = [c for c in m.channels if c.name == field.select_channel][0]
    data = {c.name: m.voxels[c.name].astype(jnp.float32)
            for c in m.channels}
    valid = field.sample_valid(data)
    live = octree.slot_mask(m)
    obs = valid & live[:, None]
    f = data[field.select_channel]
    # resolved field for differencing (invalid -> init, like _grad6) and
    # NaN-encoded value for the Newton refine (invalid -> NaN, like
    # pack_view); bf16 matches the raycaster's packed-view precision
    R = jnp.where(obs, f, spec.init).astype(jnp.bfloat16)
    Fenc = jnp.where(obs, f, jnp.nan).astype(jnp.bfloat16)

    bc = octree.block_coords_table(m)
    lidx = jnp.arange(BLOCK_VOXELS, dtype=jnp.int32)

    comps = []
    for axis, st in _axis_strides():
        la = (lidx // st) % BLOCK_SIDE                  # local coord [512]
        # value at v+e: lane rotation for la<7, +neighbour's la==0 face else
        np_rows = _neighbour_rows(m, R, bc, live, axis, +1,
                                  spec.init, spec.empty)
        plus = jnp.where((la == BLOCK_SIDE - 1)[None, :],
                         jnp.roll(np_rows, (BLOCK_SIDE - 1) * st, axis=1),
                         jnp.roll(R, -st, axis=1))
        nm_rows = _neighbour_rows(m, R, bc, live, axis, -1,
                                  spec.init, spec.empty)
        minus = jnp.where((la == 0)[None, :],
                          jnp.roll(nm_rows, -(BLOCK_SIDE - 1) * st, axis=1),
                          jnp.roll(R, st, axis=1))
        comps.append(0.5 * (plus.astype(jnp.float32)
                            - minus.astype(jnp.float32)))
    comps.append(Fenc.astype(jnp.float32))
    table = jnp.stack(comps, axis=-1).astype(jnp.bfloat16)
    # dead rows: unobserved (gradient 0 / F NaN)
    dead = jnp.stack([jnp.zeros((), jnp.float32)] * 3
                     + [jnp.full((), jnp.nan, jnp.float32)]).astype(
                         jnp.bfloat16)
    return jnp.where(live[:, None, None], table, dead)


def sample(m: VoxelMap, table: jnp.ndarray, pos_vox: jnp.ndarray):
    """Gather (g[3], F, valid) at the voxel containing fractional voxel
    coords ``pos_vox``[..., 3]: 2 descriptors per query (block_index +
    one 4-wide row).  Unallocated / out-of-volume queries return g=0,
    F=NaN, valid=False."""
    v = jnp.floor(pos_vox).astype(jnp.int32)
    inb = ((v >= 0) & (v < m.size)).all(axis=-1)
    vc = jnp.clip(v, 0, m.size - 1)
    b = vc >> 3
    l = vc & 7
    slot = m.block_index[b[..., 0], b[..., 1], b[..., 2]]
    ok = inb & (slot >= 0)
    col = l[..., 0] + l[..., 1] * BLOCK_SIDE \
        + l[..., 2] * BLOCK_SIDE * BLOCK_SIDE
    flat = table.reshape(-1, GRAD_COMPONENTS)
    row = flat[jnp.maximum(slot, 0) * BLOCK_VOXELS + col].astype(jnp.float32)
    g = jnp.where(ok[..., None], row[..., :3], 0.0)
    F = jnp.where(ok, row[..., 3], jnp.nan)
    return g, F, ok
