"""Distributed ICP tracking: image-sharded residuals + psum reduction.

The reference reduces per-pixel ICP residuals through an 8-stripe OpenMP
buffer (`tracking.cpp:66-224`).  Across a device mesh the same reduction is
a `shard_map` over image rows: every device computes the residual/Jacobian
sums for its strip and one `psum` over ICI yields the global 6x6 normal
equations (SURVEY.md section 2.4's mapping of the reduction to psum).

This is the explicit-collective counterpart of the GSPMD path: the pose
update stays identical, so 1-device and N-device runs agree to float
tolerance (see tests/test_sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from supereight_tpu.pipeline import camera, tracking


def sharded_reduce(mesh: Mesh, axis: str = "map"):
    """Returns reduce(td_arrays...) -> (error2, JTe, JTJ, count) where the
    per-pixel track data is row-sharded over ``axis`` and the sums are
    combined with one psum."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None, None)),
        out_specs=(P(), P(), P()),
    )
    def _reduce(result, error, J):
        ok = (result == 1).astype(jnp.float32)
        w = ok[..., None]
        error2 = jnp.sum(ok * error * error)[None]
        JTe = jnp.sum(w * error[..., None] * J, axis=(0, 1))
        JTJ = jnp.einsum("hwi,hwj->ij", w * J, J)
        # one collective over the mesh: the OpenMP stripe merge -> psum
        error2 = jax.lax.psum(error2, axis)
        JTe = jax.lax.psum(JTe, axis)
        JTJ = jax.lax.psum(JTJ, axis)
        return error2, JTe, JTJ

    def reduce(td: tracking.TrackData):
        e2, JTe, JTJ = _reduce(td.result, td.error, td.J)
        count = jnp.sum((td.result == 1).astype(jnp.float32))
        return e2[0], JTe, JTJ, count

    return reduce


def track_step_sharded(mesh: Mesh, pose, in_vertex, in_normal, ref_vertex,
                       ref_normal, view, axis: str = "map"):
    """One ICP iteration with the reduction done via explicit collectives.

    The per-pixel kernel runs under the mesh with row-sharded image inputs;
    the returned pose update equals the single-device path.
    """
    td = tracking.track_kernel(in_vertex, in_normal, ref_vertex, ref_normal,
                               pose, view)
    e2, JTe, JTJ, count = sharded_reduce(mesh, axis)(td)
    x = tracking.solve_normal_equations(JTe, JTJ)
    return camera.se3_exp(x) @ pose, e2, count
