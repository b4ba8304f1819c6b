"""Measured-negative pipeline variants, quarantined from the shipping API.

Each function here was implemented, benchmarked on-chip, and REJECTED for
the default pipeline (VERDICT r3 weak #5: prune or quarantine).  They are
kept runnable — with their measurements — as the lab notebook behind the
negative records in ``bench_data/``, but the shipping ``raycast()`` /
``track()`` signatures no longer carry their knobs.

Archive of the rejected pipeline knobs (removed from ``Configuration``;
records remain in bench_data/ and the round-2/3 tables in git history):

* ``raycast_warp`` / :func:`warp_maps` — forward-warp the reference maps
  on raycast-skipped frames.  ATE negative (rr2 -z1: 2.66 stale vs 4.01
  cm warped): the association composes two nearest-pixel quantizations
  and loses constraints to splat holes.
* ``icp_lazy_assoc`` — elide provably-identical association gathers in
  the late Gauss-Newton iterations.  ATE exactly neutral but fps
  NEGATIVE (40.2 -> 30.5 at 256^3/-z1): the ``lax.cond`` + extra carries
  inside the hot while_loop cost more than the elided descriptors save
  (bench_data/ate_icp_256_la records).
* ``raycast_normals="image"`` / :func:`image_normals` — vertex-map cross
  products, zero volume gathers.  ATE catastrophic (51.9 cm noisy, ~4x
  clean): silhouette-adjacent normals break the point-to-plane solve.
* ``raycast_normals="forward3"`` / :func:`grad3` — 3-tap forward
  difference anchored at the surface value.  34.8 fps but ATE 12 cm vs
  2.2: one-sided derivatives are too noisy for ICP.
* ``raycast_gather_streams`` — split the big sample gathers into N ops.
  4x faster in isolated probes (bench_data/stream_probe.json) but
  NEUTRAL-to-negative at pipeline level: the shipping gathers already
  overlap the scan's dense work, so the engine-rate win never reaches
  the frame wall clock.
"""

from __future__ import annotations

import jax.numpy as jnp

from supereight_tpu.core.octree import VoxelMap
from . import camera
from .constants import INVALID
from .raycast import _sample_volume


def warp_maps(vertex, normal, view, H: int, W: int):
    """Forward-warp world-space reference maps to a new viewpoint.

    ``view`` = K @ inv(new_pose).  Splats every valid map point into the
    new image plane with a z-buffer (scatter-min), then scatters the
    winners' 6-wide vertex+normal rows in one fat-row scatter.  Pixels no
    point lands on (disocclusions, frame borders entering view) stay
    invalid and are skipped by the ICP association (result -3), exactly
    like raycast misses.

    MEASURED NEGATIVE for ICP tracking quality (see module docstring);
    the kernel remains useful for free-view preview rendering at
    interactive rates (3 x H*W descriptors vs a full raycast).
    """
    HW = H * W
    v = vertex.reshape(HW, 3)
    n = normal.reshape(HW, 3)
    p = camera.transform_points(view, v)
    z = p[:, 2]
    valid = (n[:, 0] != INVALID) & (z > 1e-4) & jnp.isfinite(z)
    zsafe = jnp.where(valid, z, 1.0)
    # same nearest-pixel convention as the ICP association (_project)
    ix = jnp.floor(p[:, 0] / zsafe + 0.5).astype(jnp.int32)
    iy = jnp.floor(p[:, 1] / zsafe + 0.5).astype(jnp.int32)
    ok = valid & (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    lin = jnp.where(ok, iy * W + ix, HW)          # HW = dump slot

    zbuf = jnp.full((HW + 1,), jnp.inf, jnp.float32)
    zbuf = zbuf.at[lin].min(jnp.where(ok, z, jnp.inf))
    win = ok & (z <= zbuf[lin])
    rows = jnp.concatenate([v, n], axis=1)
    buf = jnp.zeros((HW + 1, 6), jnp.float32).at[:, 3].set(INVALID)
    buf = buf.at[jnp.where(win, lin, HW)].set(rows)
    out = buf[:HW]
    return out[:, :3].reshape(H, W, 3), out[:, 3:].reshape(H, W, 3)


def image_normals(vertex, hit, dirs):
    """Normals from vertex-map central differences (zero volume gathers;
    the classic KinectFusion vertex2normal on the raycast output).  Oriented
    toward the camera like the SDF's negated gradient.

    MEASURED NEGATIVE (see module docstring).  Returns (normal, bad)."""
    pad = lambda a: jnp.pad(a, ((1, 1), (1, 1), (0, 0)), mode="edge")
    v = pad(vertex)
    hp = jnp.pad(hit, 1, mode="edge")
    dx = v[1:-1, 2:] - v[1:-1, :-2]
    dy = v[2:, 1:-1] - v[:-2, 1:-1]
    n = jnp.cross(dy, dx)
    # neighbours must all be hits for a meaningful difference
    okn = (hp[1:-1, 2:] & hp[1:-1, :-2] & hp[2:, 1:-1] & hp[:-2, 1:-1])
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-12)
    flip = jnp.sum(n * dirs, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    bad = ~hit | ~okn | (nn[..., 0] < 1e-12)
    return n, bad


def grad3(m: VoxelMap, dense, field, pos_world):
    """Forward-difference gradient from 3 taps at +1 voxel, anchored at the
    surface value (``field.surf_boundary``).

    MEASURED NEGATIVE (see module docstring); default is the raycaster's
    6-tap central difference."""
    inv_vs = m.inverse_voxel_size
    vol = dense["F"]
    spec = [c for c in m.channels if c.name == field.select_channel][0]
    base = pos_world * inv_vs
    grads = []
    for axis in range(3):
        e = jnp.zeros((3,)).at[axis].set(1.0)
        val, _ = _sample_volume(vol, base + e, m.size, spec.empty)
        grads.append(jnp.nan_to_num(val, nan=spec.init)
                     - field.surf_boundary)
    return jnp.stack(grads, axis=-1)
