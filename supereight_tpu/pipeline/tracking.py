"""Projective point-to-plane ICP tracking.

Reference: `se_denseslam/src/tracking.cpp` — trackKernel (per-pixel residual
+ 6-Jacobian with failure codes -1..-5), reduceKernel (32-wide partial sums),
makeJTJ + LLT solve, Sophus SE3 exp pose update, divergence check.

TPU design: the per-pixel kernel is one fused batched computation; the
8-stripe OpenMP scalar reduction collapses to ``jnp.sum`` (a single XLA
reduce, and a ``psum`` over ICI when image-sharded); the inner iteration loop
runs as ``lax.while_loop`` with an in-graph convergence test so one tracking
call is a single device program with no host round-trips
(SURVEY.md section 7 hard part (b)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import camera
from .constants import (DIST_THRESHOLD, INVALID, NORMAL_THRESHOLD,
                        TRACK_THRESHOLD)


class TrackData(NamedTuple):
    """Per-pixel ICP result (`commons.h:249-253`). ``result`` codes:
    1 ok, -1 no input normal, -2 out of frame, -3 no reference normal,
    -4 too far, -5 bad normal agreement."""
    result: jnp.ndarray   # int32[H, W]
    error: jnp.ndarray    # f32[H, W]
    J: jnp.ndarray        # f32[H, W, 6]


def _project(Ttrack, view, in_vertex, rH, rW):
    """Pose-dependent, gather-free half of the association: world-space
    input vertices + their pixel coords in the reference frame."""
    proj_vertex = camera.transform_points(Ttrack, in_vertex)       # world
    proj_pos = camera.transform_points(view, proj_vertex)          # cam px
    z = proj_pos[..., 2]
    zsafe = jnp.where(z == 0, 1.0, z)
    px = proj_pos[..., 0] / zsafe + 0.5
    py = proj_pos[..., 1] / zsafe + 0.5
    in_frame = (px >= 0) & (px <= rW - 1) & (py >= 0) & (py <= rH - 1)
    return proj_vertex, px, py, in_frame


def _gather_ref(ref_vertex, ref_normal, px, py, rH, rW, assoc="nearest"):
    """The association's gathered op: 6-wide reference rows at the
    projected pixels (per-row descriptor cost, width nearly free).

    ``assoc="nearest"`` reproduces the reference's rounding association
    (`tracking.cpp:262-264`: the +0.5 added in ``_project`` makes the
    int cast a round).  ``assoc="bilinear"`` is a beyond-reference
    sub-pixel association: blend the 4 neighbouring reference rows where
    all four carry a valid normal (4 row gathers instead of 1; blended
    normal renormalized), falling back to the nearest row at
    silhouettes/holes so discontinuities never mix surfaces."""
    table = jnp.concatenate([ref_vertex, ref_normal], axis=-1)
    if assoc == "nearest":
        ix = jnp.clip(px.astype(jnp.int32), 0, rW - 1)
        iy = jnp.clip(py.astype(jnp.int32), 0, rH - 1)
        ref_vn = table[iy, ix]
        return ref_vn[..., :3], ref_vn[..., 3:]
    if assoc != "bilinear":
        raise ValueError(f"assoc {assoc!r}")
    pxc = px - 0.5                      # continuous pixel coordinate
    pyc = py - 0.5
    x0 = jnp.clip(jnp.floor(pxc).astype(jnp.int32), 0, rW - 1)
    y0 = jnp.clip(jnp.floor(pyc).astype(jnp.int32), 0, rH - 1)
    x1 = jnp.minimum(x0 + 1, rW - 1)
    y1 = jnp.minimum(y0 + 1, rH - 1)
    wx = jnp.clip(pxc - x0.astype(pxc.dtype), 0.0, 1.0)[..., None]
    wy = jnp.clip(pyc - y0.astype(pyc.dtype), 0.0, 1.0)[..., None]
    t00, t01 = table[y0, x0], table[y0, x1]
    t10, t11 = table[y1, x0], table[y1, x1]
    blend = (t00 * (1 - wx) * (1 - wy) + t01 * wx * (1 - wy)
             + t10 * (1 - wx) * wy + t11 * wx * wy)
    n = blend[..., 3:]
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    blend = blend.at[..., 3:].set(n / jnp.where(nn == 0, 1.0, nn))
    valid4 = ((t00[..., 3] != INVALID) & (t01[..., 3] != INVALID)
              & (t10[..., 3] != INVALID) & (t11[..., 3] != INVALID))
    # >= : the int cast of px (= pxc + 0.5) rounds half UP
    nearest = jnp.where(wx >= 0.5, jnp.where(wy >= 0.5, t11, t01),
                        jnp.where(wy >= 0.5, t10, t00))
    ref_vn = jnp.where(valid4[..., None], blend, nearest)
    return ref_vn[..., :3], ref_vn[..., 3:]


def _residuals(proj_vertex, proj_normal, ref_v, ref_n, in_frame,
               no_in_normal, dist_threshold, normal_threshold,
               symmetric=False) -> TrackData:
    """Dense residual/Jacobian/status math shared by the gathered and
    frozen-association steps (`tracking.cpp:252-301`).

    ``symmetric`` (beyond-reference): symmetric point-to-plane — project
    the residual onto the bisector of the reference and (rotated) input
    normals instead of the reference normal alone (Rusinkiewicz 2019,
    "A Symmetric Objective Function for ICP": quadratic convergence
    basin on locally-quadratic surfaces).  The bisector is renormalized
    so the divergence gate's RMSE keeps its metric meaning; the
    rejection gates are unchanged."""
    no_ref_normal = ref_n[..., 0] == INVALID
    diff = ref_v - proj_vertex
    too_far = jnp.linalg.norm(diff, axis=-1) > dist_threshold
    bad_normal = jnp.sum(proj_normal * ref_n, axis=-1) < normal_threshold

    result = jnp.full(proj_vertex.shape[:-1], 1, jnp.int32)
    result = jnp.where(bad_normal, -5, result)
    result = jnp.where(too_far, -4, result)
    result = jnp.where(no_ref_normal, -3, result)
    result = jnp.where(~in_frame, -2, result)
    result = jnp.where(no_in_normal, -1, result)

    if symmetric is not False:
        n_s = ref_n + proj_normal
        nn = jnp.linalg.norm(n_s, axis=-1, keepdims=True)
        n_s = n_s / jnp.where(nn == 0, 1.0, nn)
        if symmetric is True:
            n_c = n_s
        else:
            # traced bool (the motion-gated "auto" mode): both normal
            # choices are dense elementwise math, so select per frame
            n_c = jnp.where(symmetric, n_s, ref_n)
    else:
        n_c = ref_n
    error = jnp.sum(n_c * diff, axis=-1)
    J = jnp.concatenate([n_c, jnp.cross(proj_vertex, n_c)], axis=-1)
    ok = (result == 1)[..., None]
    return TrackData(result=result,
                     error=jnp.where(ok[..., 0], error, 0.0),
                     J=jnp.where(ok, J, 0.0))


def track_kernel(in_vertex, in_normal, ref_vertex, ref_normal,
                 Ttrack, view,
                 dist_threshold=DIST_THRESHOLD,
                 normal_threshold=NORMAL_THRESHOLD) -> TrackData:
    """Per-pixel projective data association (`tracking.cpp:226-302`).

    ``in_*`` are level-resolution maps, ``ref_*`` full-resolution maps from
    the last raycast; ``view`` = K @ inv(raycast_pose) at full resolution.
    """
    rH, rW = ref_vertex.shape[:2]
    proj_vertex, px, py, in_frame = _project(Ttrack, view, in_vertex,
                                             rH, rW)
    no_in_normal = in_normal[..., 0] == INVALID
    ref_v, ref_n = _gather_ref(ref_vertex, ref_normal, px, py, rH, rW)
    proj_normal = camera.rotate_vectors(Ttrack, in_normal)
    return _residuals(proj_vertex, proj_normal, ref_v, ref_n, in_frame,
                      no_in_normal, dist_threshold, normal_threshold)


def reduce_kernel(td: TrackData, robust: str = "none",
                  robust_delta: float = 0.01):
    """Normal-equation sums (`tracking.cpp:66-224`): returns
    (error2, JTe[6], JTJ[6,6], count).  The reference's 8x32 stripe buffer +
    tree merge is just one ``jnp.sum`` on TPU.  The reference also
    accumulates per-failure-code counts into the same buffer; those live in
    ``TrackData.result`` (renderTrack / PerfStats consume them from there)
    rather than in this reduction.

    ``robust`` (beyond-reference; the reference uses hard gates only):
    IRLS weights on the point-to-plane residual — ``"huber"``
    (w = min(1, delta/|r|)) or ``"tukey"`` (w = (1-(r/c)^2)^2 inside c,
    0 outside), dense elementwise math at zero descriptor cost.  The
    weights enter ONLY the solve (JTe/JTJ); ``error2`` and ``count``
    stay unweighted so the divergence gate's RMSE and pixel-fraction
    tests keep the reference's semantics exactly (a weighted error2
    would deflate the RMSE and let misaligned frames past the gate)."""
    ok = (td.result == 1).astype(jnp.float32)
    wr = ok
    if robust == "huber":
        ae = jnp.abs(td.error)
        wr = ok * jnp.where(ae > robust_delta,
                            robust_delta / jnp.maximum(ae, 1e-12), 1.0)
    elif robust == "tukey":
        r2 = (td.error / robust_delta) ** 2
        wr = ok * jnp.where(r2 < 1.0, (1.0 - r2) ** 2, 0.0)
    elif robust != "none":
        raise ValueError(f"robust {robust!r}")
    w = wr[..., None]
    error2 = jnp.sum(ok * td.error * td.error)
    JTe = jnp.sum(w * td.error[..., None] * td.J, axis=(0, 1))
    Jw = w * td.J
    JTJ = jnp.einsum("hwi,hwj->ij", Jw, td.J)
    count = jnp.sum(ok)
    return error2, JTe, JTJ, count


def solve_normal_equations(JTe, JTJ):
    """6x6 LLT solve (`tracking.cpp:57-64`); zero twist if not SPD."""
    L = jnp.linalg.cholesky(JTJ)
    y = jax.scipy.linalg.solve_triangular(L, JTe, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    bad = jnp.any(jnp.isnan(x)) | jnp.any(jnp.isinf(x))
    return jnp.where(bad, jnp.zeros_like(x), x)


class TrackState(NamedTuple):
    pose: jnp.ndarray          # [4,4]
    error2: jnp.ndarray        # scalar: last reduction error^2 sum
    count: jnp.ndarray         # scalar: last reduction inlier count
    converged: jnp.ndarray     # bool
    iteration: jnp.ndarray     # int32


def _level_loop(state: TrackState, n_iters: int, in_vertex, in_normal,
                ref_vertex, ref_normal, view, icp_threshold,
                psum_axis=None, robust="none", robust_delta=0.01,
                assoc="nearest", symmetric=False):
    """`DenseSLAMSystem.cpp:173-185`: iterate track+reduce+update with early
    exit on ||twist|| < icp_threshold, as one lax.while_loop.

    (An ``icp_lazy_assoc`` variant that elided provably-identical
    association gathers in the late sub-pixel iterations was measured
    fps-NEGATIVE — the in-loop ``lax.cond`` + extra carries cost more
    than the elided descriptors saved; see ``pipeline/experimental.py``
    and bench_data/ate_icp_256_la records.)

    Returns (TrackState, result image at this level's resolution from the
    last executed step) — the reference's trackingResult is likewise the
    last trackKernel's output, not an extra pass.
    """
    rH, rW = ref_vertex.shape[:2]
    no_in_normal = in_normal[..., 0] == INVALID

    def cond(carry):
        st = carry[0]
        return (st.iteration < n_iters) & ~st.converged

    def body(carry):
        st, _ = carry
        proj_vertex, px, py, in_frame = _project(st.pose, view, in_vertex,
                                                 rH, rW)
        ref_v, ref_n = _gather_ref(ref_vertex, ref_normal, px, py,
                                   rH, rW, assoc=assoc)
        proj_normal = camera.rotate_vectors(st.pose, in_normal)
        td = _residuals(proj_vertex, proj_normal, ref_v, ref_n, in_frame,
                        no_in_normal, DIST_THRESHOLD, NORMAL_THRESHOLD,
                        symmetric=symmetric)
        error2, JTe, JTJ, count = reduce_kernel(td, robust=robust,
                                                robust_delta=robust_delta)
        if psum_axis is not None:
            # image-strip-sharded reduction: the reference's 8-stripe
            # OpenMP merge (`tracking.cpp:110`) over ICI — every device
            # holds a row strip of this level; one psum yields the global
            # normal equations so the pose update is identical everywhere
            error2, JTe, JTJ, count = jax.lax.psum(
                (error2, JTe, JTJ, count), psum_axis)
        x = solve_normal_equations(JTe, JTJ)
        pose = camera.se3_exp(x) @ st.pose
        converged = jnp.linalg.norm(x) < icp_threshold
        return (TrackState(pose=pose, error2=error2, count=count,
                           converged=converged, iteration=st.iteration + 1),
                td.result)

    lshape = in_vertex.shape[:-1]
    init = (state._replace(converged=jnp.zeros((), bool),
                           iteration=jnp.zeros((), jnp.int32)),
            jnp.zeros(lshape, jnp.int32))
    st, result = jax.lax.while_loop(cond, body, init)
    return st, result


def track(pose, depths, vertices, normals, ref_vertex, ref_normal,
          raycast_pose, k, iterations: Sequence[int],
          icp_threshold: float,
          track_threshold: float = TRACK_THRESHOLD,
          finest_decimate: int = 1,
          shard=None,
          robust: str = "none", robust_delta: float = 0.01,
          assoc: str = "nearest", symmetric: bool = False):
    """Full coarse-to-fine tracking (`DenseSLAMSystem.cpp:143-189`).

    Returns (new_pose, tracked, result image at full res for renderTrack —
    the last level-0 iteration's status codes, like the reference's
    trackingResult buffer after the finest level).
    ``iterations`` e.g. (10, 5, 4): index = level, coarsest executed first.

    ``finest_decimate`` (TPU extension): stride the FINEST level's input
    maps by this factor.  The finest level runs the most iterations over
    the most pixels — the frame's single biggest descriptor sink (~77k
    association rows x up to iterations[0] passes at 320x240).  A stride-2
    level still solves 6 DOF from ~19k point-to-plane constraints; the
    reference maps stay full resolution, so the gathered reference points
    keep full angular density.

    ``shard = (axis_name, n_dev)`` (inside an enclosing ``shard_map``):
    each level whose row count divides ``n_dev`` computes residuals for
    only this device's row strip and the reduction psums over the mesh —
    the reference's OpenMP stripe merge over ICI.  Indivisible (coarse)
    levels run replicated: both forms produce the same global sums, so
    control flow stays identical on every device.  The returned status
    image covers only this device's finest-level strip; the sharded frame
    concatenates strips via its out_specs.
    """
    view = camera.camera_matrix(k) @ jnp.linalg.inv(raycast_pose)
    old_pose = pose
    st = TrackState(pose=pose, error2=jnp.zeros(()), count=jnp.zeros(()),
                    converged=jnp.zeros((), bool),
                    iteration=jnp.zeros((), jnp.int32))
    result = None
    d = finest_decimate
    n_px = None
    for level in range(len(iterations) - 1, -1, -1):
        iv, inm = vertices[level], normals[level]
        if level == 0 and d > 1:
            iv, inm = iv[::d, ::d], inm[::d, ::d]
        psum_axis = None
        if shard is not None:
            axis, n_dev = shard
            rows = iv.shape[0]
            if rows % n_dev == 0:
                r_d = rows // n_dev
                r0 = jax.lax.axis_index(axis) * r_d
                iv = jax.lax.dynamic_slice_in_dim(iv, r0, r_d, 0)
                inm = jax.lax.dynamic_slice_in_dim(inm, r0, r_d, 0)
                psum_axis = axis
                if level == 0:
                    n_px = rows * iv.shape[1]
        st, result = _level_loop(st, iterations[level], iv, inm,
                                 ref_vertex, ref_normal,
                                 view, icp_threshold,
                                 psum_axis=psum_axis,
                                 robust=robust, robust_delta=robust_delta,
                                 assoc=assoc, symmetric=symmetric)

    # divergence check (`tracking.cpp:320-336`); pixel fraction over the
    # finest level actually executed
    if n_px is None:
        n_px = result.shape[0] * result.shape[1]
    rmse = jnp.sqrt(st.error2 / jnp.maximum(st.count, 1.0))
    ok = (rmse <= 2e-2) & (st.count / n_px >= track_threshold)
    new_pose = jnp.where(ok, st.pose, old_pose)
    if d > 1:   # full-res status image for renderTrack / the TSV log
        H, W = vertices[0].shape[:2]
        # crop: when d does not divide H/W the strided input has ceil(H/d)
        # rows, so the repeat overshoots by up to d-1 (ADVICE r2)
        result = jnp.repeat(jnp.repeat(result, d, 0), d, 1)[:H, :W]
    return new_pose, ok, result
