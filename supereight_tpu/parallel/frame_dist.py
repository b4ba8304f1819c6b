"""One true distributed SLAM frame: every stage sharded under a single
``shard_map`` with explicit collectives.

This composes the per-stage protocols that were previously validated in
isolation (`allocation_dist.py`, `tracking_dist.py`, `raycast_dist.py`)
into ONE fused sharded step with the same semantics as
``pipeline.system.process_frame`` (equality-tested 1-vs-N in
tests/test_sharding.py):

* **placement** — only the brick table ``map.voxels`` (the one structure
  that grows with the map) is sharded, on the capacity axis; all metadata
  (block_index, keys, counters, node pyramid — a few hundred KB) and the
  image-space state are replicated.  With ``map.partitions == n_devices``
  each device's slot range IS one owner partition, so every per-slot
  update lands on the shard that owns it.
* **tracking** — per-level image-row strips + ONE psum of the 6x6 normal
  equations per Gauss-Newton iteration (`tracking.track(shard=...)`),
  the reference's 8-stripe OpenMP merge (`tracking.cpp:66-224`) over ICI.
* **allocation** — each device marches a round-robin share of the
  allocation rays; the per-device request masks OR-merge with ONE psum
  (bit-identical to the full-frame mask); every device then runs the
  identical deterministic allocator (`octree.allocate_block_mask`) on the
  replicated metadata — no slot contention by construction.
* **fusion** — each device fuses ONLY its own brick rows against the
  (replicated) depth frame: zero communication; the sharding plays the
  role of the single-device path's ``integrate_budget`` compaction.  One
  small bool all_gather refreshes the replicated ``active`` flags.
* **raycast** — the frustum-limited brick exchange (one fat all_gather of
  visible rows) + per-device image-strip scan from `raycast_dist.py`,
  extended here to hybrid normals and to multiscale (occupancy) fields:
  the node-pyramid show-through is a per-cell select on replicated
  metadata, so only leaf rows ride the exchange.  The refreshed
  reference maps all_gather back to every device (tracking associates
  across the whole image, so they must be replicated — ~2 MB at 320x240).

Stage gating (integration_rate / tracked / bootstrap) uses masked
updates instead of ``lax.cond``: predicates are replicated, and keeping
the collectives unconditional at the top level makes the schedule
identical on every device by construction.  The ONE exception is the
raycast stage: its predicate (bootstrap OR the motion-adaptive gate,
``adaptive_deg``/``adaptive_dist`` — the single-chip headline knob) is a
pure function of replicated state, so every device takes the same
``lax.cond`` branch and the brick-exchange ``all_gather`` inside the
taken branch stays schedule-identical across the mesh; a skipped refresh
then costs nothing, exactly as on one chip.  The gate also amortizes the
dense view build (the sharded analog of single-chip
``incremental_view``: the exchange rebuilds the view only on refresh
frames), and per-device owner-local fusion over ``capacity/n_devices``
rows plays the role of ``integrate_budget`` compaction.

Not supported here: stored-normal gradient tables (hybrid normals — the
headline config — are supported).  The measured-negative knobs that once
existed single-chip (``raycast_warp``, ``icp_lazy_assoc``) are pruned
everywhere — see ``pipeline/experimental.py``.

Reference: SURVEY.md §2.4 (the north-star scale-out design); the
single-process reference has no counterpart (`DenseSLAMSystem.cpp`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supereight_tpu.core import octree
from supereight_tpu.pipeline import (camera, integration, preprocessing,
                                     raycast, tracking)
from supereight_tpu.pipeline.constants import FAR_PLANE, NEAR_PLANE
from supereight_tpu.pipeline.system import FrameState, preprocessing_stage
from .raycast_dist import exchange_view, scan_far_extension

MAP_AXIS = "map"


def frame_sharding(mesh: Mesh, axis: str = MAP_AXIS):
    """Placement for the unified sharded frame: brick table sharded on the
    capacity axis, every other leaf replicated."""
    repl = NamedSharding(mesh, P())
    shard_cap2 = NamedSharding(mesh, P(axis, None))

    def place(state: FrameState) -> FrameState:
        n = mesh.devices.size
        if state.map.capacity % n:
            raise ValueError(
                f"capacity {state.map.capacity} not divisible by {n}")
        if state.map.partitions != n:
            raise ValueError(
                f"map.partitions ({state.map.partitions}) must equal the "
                f"mesh size ({n}) so slot ranges match device ownership")
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        vox = {k: jax.device_put(v, shard_cap2)
               for k, v in state.map.voxels.items()}
        return state.replace(map=state.map.replace(voxels=vox))

    return place


def _stub(m):
    """Metadata view of the map: 1-row dummy voxels (replicated), so the
    sharded brick table never rides a replicated in_spec."""
    return m.replace(voxels={k: jnp.zeros((1,) + v.shape[1:], v.dtype)
                             for k, v in m.voxels.items()})


def make_process_frame_sharded(
        mesh: Mesh, field, H: int, W: int, *,
        iterations, tracking_rate: int = 1, integration_rate: int = 1,
        bootstrap_frames: int = 3, fuse_filtered: bool = False,
        raycast_from_frame: int = 3, bootstrap_f2f: bool = False,
        f2f_fallback: bool = False,
        bilateral: bool = False, icp_threshold: float = 1e-5,
        normals: str = "hybrid", second_window: bool = True,
        span_factor: float = 1.6, refine: str = "secant",
        finest_decimate: int = 1, w2_budget: int = 8192,
        scan_stride: float = 0.5, midsolve: bool = False,
        alloc_stride: float = 1.0, alloc_rate: int = 1,
        alloc_adaptive_deg: float = 0.0, alloc_adaptive_dist: float = 0.0,
        alloc_on_demand: float = 0.0,
        alloc_on_demand_border: float = 0.0,
        grad_decim: int = 1, near_rescue: bool = True,
        adaptive_deg: float = 0.0, adaptive_dist: float = 0.12,
        icp_robust: str = "none", icp_robust_delta: float = 0.01,
        icp_assoc: str = "nearest", icp_symmetric=False,
        icp_sym_min_deg: float = 0.5, icp_sym_max_deg: float = 4.5,
        max_visible_per_device: int = 1024,
        axis: str = MAP_AXIS, _skip: frozenset = frozenset()):
    """Build ``step(state, depth_mm, k, frame, gt_pose, *, use_gt, neg_y)``
    — the fused sharded frame.  ``state`` must be placed by
    :func:`frame_sharding`; jit the returned function.

    Semantics match ``process_frame`` with the same knobs (equality-tested
    on the 8-device CPU mesh), except ``integrate_budget`` — here each
    device streams its own ``capacity / n_devices`` rows, which IS the
    compaction (6144/8 = 768 rows/device vs the single-chip budget 3072).
    """
    if normals not in ("volume", "hybrid"):
        raise ValueError(f"sharded frame supports volume/hybrid normals, "
                         f"not {normals!r}")
    n_dev = mesh.devices.size
    if H % n_dev:
        raise ValueError(f"image height {H} not divisible by {n_dev}")
    rows_d = H // n_dev
    half_res = (H % 2 == 0) and (W % 2 == 0) and W >= 160  # raycast's rule
    if half_res and (rows_d % 2 or (H // 2) % n_dev):
        raise ValueError("half-res raycast strips need even per-device "
                         "rows")
    M = max_visible_per_device
    # does track() shard the finest level? (mirrors its rows % n_dev test)
    finest_rows = H // finest_decimate

    def step(state: FrameState, depth_mm, k, frame, gt_pose, *,
             use_gt: bool, neg_y: bool) -> FrameState:
        m = state.map
        cap = m.capacity
        if cap % n_dev:
            raise ValueError(f"capacity {cap} not divisible by {n_dev}")
        cap_d = cap // n_dev
        vs = m.voxel_size

        vox_specs = {name: P(axis, None) for name in m.voxels}
        st_repl = state.replace(map=_stub(m))
        repl_specs = jax.tree.map(lambda _: P(), st_repl)
        out_specs = repl_specs.replace(map=repl_specs.map.replace(
            voxels=vox_specs))

        far_ext = scan_far_extension(field, vs, FAR_PLANE,
                                     span_factor=span_factor,
                                     scan_stride=scan_stride)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(vox_specs, repl_specs, P(), P(), P(), P()),
            out_specs=out_specs,
            check_vma=False,
        )
        def body(vox_local, st: FrameState, depth_mm, k, frame, gt_pose):
            dev = jax.lax.axis_index(axis)
            slot0 = dev * cap_d

            # ---- preprocessing: replicated dense math ----
            if "preprocess" not in _skip:
                st = preprocessing_stage(st, depth_mm, bilateral=bilateral)

            # ---- tracking: strip residuals + psum normal equations ----
            depths, vertices, norms_pyr = preprocessing.build_pyramid(
                st.scaled_depth, k, len(iterations), neg_y=neg_y)
            if "track" in _skip:
                st = st.replace(tracked=jnp.ones((), bool))
            elif use_gt:
                st = st.replace(pose=gt_pose, tracked=jnp.ones((), bool),
                                prev_pose=None if st.prev_pose is None
                                else st.pose * 1.0)
            else:
                do_track = (frame % tracking_rate) == 0
                sym = icp_symmetric
                if icp_symmetric == "auto":
                    # replicated pure function of replicated state -> the
                    # gate fires identically on every device (same
                    # discipline as the alloc gates below)
                    from supereight_tpu.pipeline.system import \
                        _sym_auto_gate
                    sym = _sym_auto_gate(st, icp_sym_min_deg,
                                         icp_sym_max_deg)
                new_pose, ok, result = tracking.track(
                    st.pose, depths, vertices, norms_pyr, st.ref_vertex,
                    st.ref_normal, st.raycast_pose, k, iterations,
                    icp_threshold, finest_decimate=finest_decimate,
                    shard=(axis, n_dev),
                    robust=icp_robust, robust_delta=icp_robust_delta,
                    assoc=icp_assoc, symmetric=sym)
                if finest_rows % n_dev == 0:
                    # finest level ran strip-sharded: result is this
                    # device's strip — reassemble the full status image
                    result = jax.lax.all_gather(result, axis, tiled=True)
                st = st.replace(
                    pose=jnp.where(do_track, new_pose, st.pose),
                    tracked=do_track & ok,
                    track_result=jnp.where(do_track, result,
                                           st.track_result),
                    prev_pose=None if st.prev_pose is None
                    else jnp.where(do_track, st.pose, st.prev_pose))

            # ---- integration: psum'd request masks + deterministic
            # replicated allocation + owner-local fusion ----
            m0 = st.map
            model_ok = st.tracked if st.model_ref is None \
                else st.tracked & st.model_ref
            do_integrate = (model_ok | (frame <= bootstrap_frames)) & \
                (((frame % integration_rate) == 0)
                 | (frame <= bootstrap_frames))
            K = camera.camera_matrix(k)
            timestamp = (1.0 / 30.0) * frame.astype(jnp.float32)
            T_cw = jnp.linalg.inv(st.pose)
            band = field.alloc_band()
            # same depth-source selection as integration_stage
            fuse_depth = st.scaled_depth if fuse_filtered \
                else st.float_depth
            gate = do_integrate  # replicated predicate; masks, not conds
            # alloc_rate / the motion-adaptive alloc gate: skip the march
            # on off frames (masked, so the collective schedule stays
            # identical on every device)
            alloc_gate = gate
            if alloc_on_demand > 0.0:
                # data-driven gate: replicated block_index + depth ->
                # identical predicate on every device
                frac = integration.unallocated_fraction(
                    m0, fuse_depth, st.pose, K,
                    border=alloc_on_demand_border)
                alloc_gate = gate & ((frac > alloc_on_demand)
                                     | (frame <= 5))
            elif alloc_adaptive_deg > 0.0 and st.alloc_pose is not None:
                import numpy as _np
                dRa = st.pose[:3, :3] @ st.alloc_pose[:3, :3].T
                cos_a = 0.5 * (jnp.trace(dRa) - 1.0)
                dist_a = jnp.linalg.norm(st.pose[:3, 3]
                                         - st.alloc_pose[:3, 3])
                moved_a = (cos_a < float(_np.cos(
                    _np.radians(alloc_adaptive_deg)))) \
                    | (dist_a > alloc_adaptive_dist)
                alloc_gate = gate & (moved_a | (frame <= 5))
            elif alloc_rate > 1:
                alloc_gate = gate & (((frame % alloc_rate) == 0)
                                     | (frame <= 5))
            a_count = st.alloc_count if st.alloc_count is not None \
                else frame // max(alloc_rate, integration_rate, 1)

            if "alloc" in _skip:
                m1 = m0
            elif field.multiscale_alloc:
                # same dither phase as the single-device frame
                # (replicated firing counter), so 1-vs-8 stays bit-exact
                masks = integration.ofusion_wanted_masks(
                    m0, fuse_depth, st.pose, K, band,
                    row_share=(dev, n_dev), phase=a_count)
                masks = [jax.lax.psum(mk.astype(jnp.int32), axis) > 0
                         for mk in masks]
                masks = [mk & alloc_gate for mk in masks]
                m1 = octree.allocate_octant_masks(m0, masks)
            else:
                decim = integration._alloc_decimation(
                    m0, fuse_depth.shape)
                wanted = integration.sdf_wanted_mask(
                    fuse_depth, st.pose, K, size=m0.size, dim=m0.dim,
                    band=band, decim=decim, stride=alloc_stride,
                    row_share=(dev, n_dev))
                wanted = jax.lax.psum(wanted.astype(jnp.int32), axis) > 0
                m1 = octree.allocate_block_mask(m0, wanted & alloc_gate)

            # owner-local fusion over this device's slot range
            if "fuse" not in _skip:
                bc_full = octree.block_coords_table(m1)
                live_full = octree.slot_mask(m1) & m1.active
                bc_loc = jax.lax.dynamic_slice_in_dim(bc_full, slot0,
                                                      cap_d, 0)
                live_loc = jax.lax.dynamic_slice_in_dim(live_full, slot0,
                                                        cap_d, 0)
                rows, visible_loc = integration.fuse_rows(
                    field, bc_loc, live_loc & gate, vox_local,
                    fuse_depth, T_cw, K, timestamp, vs)
                vox_local = {name: jnp.where(gate, rows[name],
                                             vox_local[name])
                             for name in vox_local}
                # ONE tiny bool all_gather refreshes the replicated active
                # flags (the visibility refresh, `projective_functor.hpp:96`)
                visible = jax.lax.all_gather(visible_loc, axis, tiled=True)
                active = jnp.where(gate & live_full, visible, m1.active)
                m1 = m1.replace(active=active)
            if "nodes" not in _skip:
                # coarse node updates: replicated metadata, identical result
                m2 = integration._update_nodes(m1, field, fuse_depth,
                                               T_cw, K, timestamp)
                m1 = jax.tree.map(lambda a, b: jnp.where(gate, b, a), m1, m2)
            st = st.replace(
                map=m1, integrated=do_integrate,
                alloc_pose=(jnp.where(alloc_gate, st.pose, st.alloc_pose)
                            if st.alloc_pose is not None else None),
                alloc_count=(st.alloc_count + alloc_gate.astype(jnp.int32)
                             if st.alloc_count is not None else None))

            # ---- raycast: frustum-limited brick exchange + strip scan ----
            if "raycast" in _skip:
                return st.replace(map=st.map.replace(voxels=vox_local))
            do_raycast = frame >= raycast_from_frame
            if adaptive_deg > 0.0:
                # motion-adaptive refresh gate (raycasting_stage parity):
                # replicated predicate -> every device takes the same
                # branch, so the collectives inside stay schedule-safe
                import numpy as _np
                dR = st.pose[:3, :3] @ st.raycast_pose[:3, :3].T
                cos_ang = 0.5 * (jnp.trace(dR) - 1.0)
                dist = jnp.linalg.norm(st.pose[:3, 3]
                                       - st.raycast_pose[:3, 3])
                moved = (cos_ang < float(_np.cos(_np.radians(adaptive_deg)))
                         ) | (dist > adaptive_dist)
                do_raycast &= moved | (frame <= 5)
            view = st.pose @ camera.inverse_camera_matrix(k)

            def raycast_branch(_):
                if "exchange" in _skip:
                    B = m1.blocks_per_edge
                    dense = {"F": jnp.full((B * B * B, 512), jnp.nan,
                                           jnp.float32)}
                    inside_any = jnp.zeros((cap,), bool)
                    n_drop = jnp.zeros((), jnp.int32)
                else:
                    dense, inside_any, n_drop = exchange_view(
                        vox_local, m1, field, view, H, W, NEAR_PLANE,
                        far_ext, axis=axis, budget=M)
                rc = raycast.raycast(
                    _stub(m1), field, view, H, W, NEAR_PLANE, FAR_PLANE,
                    dense=dense, inside_any=inside_any,
                    row_range=(dev * rows_d, rows_d), normals=normals,
                    second_window=second_window, span_factor=span_factor,
                    refine=refine, w2_budget=w2_budget,
                    scan_stride=scan_stride, midsolve=midsolve,
                    near_rescue=near_rescue, grad_decim=grad_decim)
                # reassemble full reference maps on every device (tracking
                # associates across the whole image next frame)
                ref_v = jax.lax.all_gather(rc.vertex, axis, tiled=True)
                ref_n = jax.lax.all_gather(rc.normal, axis, tiled=True)
                return ref_v, ref_n, st.pose, n_drop

            def skip_branch(_):
                return (st.ref_vertex, st.ref_normal, st.raycast_pose,
                        jnp.zeros((), jnp.int32))

            ref_v, ref_n, rc_pose, n_drop = jax.lax.cond(
                do_raycast, raycast_branch, skip_branch, None)
            if bootstrap_f2f or f2f_fallback:
                # frame-to-frame publication (raycasting_stage parity):
                # replicated dense math on replicated state
                in_bs = jnp.zeros((), bool)
                if bootstrap_f2f:
                    in_bs |= (~do_raycast) & (frame < raycast_from_frame)
                if f2f_fallback:
                    in_bs |= (~st.tracked) & (frame >= raycast_from_frame)
                w_v = camera.transform_points(st.pose, vertices[0])
                w_n = camera.rotate_vectors(st.pose, norms_pyr[0])
                inval = norms_pyr[0][..., 0] == -2.0
                w_n = jnp.where(inval[..., None], norms_pyr[0], w_n)
                ref_v = jnp.where(in_bs, w_v, ref_v)
                ref_n = jnp.where(in_bs, w_n, ref_n)
                rc_pose = jnp.where(in_bs, st.pose, rc_pose)
                if st.model_ref is not None:
                    st = st.replace(model_ref=jnp.where(
                        in_bs, False,
                        jnp.where(do_raycast, True, st.model_ref)))
            elif st.model_ref is not None:
                st = st.replace(model_ref=jnp.where(do_raycast, True,
                                                    st.model_ref))
            st = st.replace(
                ref_vertex=ref_v, ref_normal=ref_n, raycast_pose=rc_pose,
                # frustum-overflow diagnostic (no silent caps): visible
                # blocks past the exchange budget would leave raycast
                # holes — count them like the allocator's overflow
                map=st.map.replace(overflow=st.map.overflow + n_drop))

            return st.replace(map=st.map.replace(voxels=vox_local))

        return body(m.voxels, st_repl, depth_mm, k, frame, gt_pose)

    return step
