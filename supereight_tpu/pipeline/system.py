"""DenseSLAMSystem: the pipeline facade.

Reference: `se_denseslam/include/se/DenseSLAMSystem.h:58-411` and
`se_denseslam/src/DenseSLAMSystem.cpp` — holds pose, reference maps, the
voxel map, and exposes preprocessing / tracking / integration / raycasting /
render* / dump_mesh / save / load.

TPU design: all per-frame state lives in one ``FrameState`` pytree and the
whole frame (preprocess -> track -> integrate -> raycast) compiles into a
SINGLE jitted device program — no host round-trips inside a frame, which is
where the reference's 19 sequential kernel launches per frame
(`DenseSLAMSystem.cpp:169-185`) would otherwise dominate.  Stage gating
(tracking_rate / integration_rate / frame<=3) uses ``lax.cond`` in-graph.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from supereight_tpu.config import Configuration
from supereight_tpu.core import octree
from supereight_tpu.fields import make_field
from . import (camera, gradmap, integration, preprocessing, raycast,
               rendering, tracking)
from .constants import FAR_PLANE, INVALID, NEAR_PLANE


class FrameState(struct.PyTreeNode):
    map: octree.VoxelMap
    pose: jnp.ndarray           # camera-to-world [4,4]
    raycast_pose: jnp.ndarray   # pose of the last reference raycast
    float_depth: jnp.ndarray    # unfiltered metric depth [H,W] (integration)
    scaled_depth: jnp.ndarray   # filtered depth [H,W] (tracking pyramid)
    ref_vertex: jnp.ndarray     # [H,W,3] model vertices from last raycast
    ref_normal: jnp.ndarray     # [H,W,3]
    track_result: jnp.ndarray   # int32[H,W] ICP status image
    tracked: jnp.ndarray        # bool scalar
    integrated: jnp.ndarray     # bool scalar
    #: precomputed per-voxel gradient/value table (gradmap.build_table),
    #: refreshed at integration; None unless raycast_normals == "stored"
    grad: Optional[jnp.ndarray] = None
    #: incrementally-maintained tiled raycast read view [B^3, 512]
    #: (raycast.pack_view layout); fusion scatters only the rows it
    #: touched (integration.integrate(view=...)) instead of rebuilding
    #: the whole view every frame.  None => rebuild per frame.
    view: Optional[jnp.ndarray] = None
    #: pose at the last allocation march + firing counter (the counter
    #: drives the coarse march's dither phase; the pose anchors the
    #: motion-adaptive alloc gate, `alloc_adaptive_deg`)
    alloc_pose: Optional[jnp.ndarray] = None
    alloc_count: Optional[jnp.ndarray] = None
    #: previous frame's final pose — the per-frame motion signal for the
    #: in-graph regime gates (icp_symmetric="auto")
    prev_pose: Optional[jnp.ndarray] = None
    #: True when ref_vertex/ref_normal came from a MODEL raycast, False
    #: when the f2f bootstrap/fallback published input maps instead —
    #: f2f-tracked frames keep pose continuity but must not fuse (their
    #: odometry pose is only good to the single-frame ICP noise floor)
    model_ref: Optional[jnp.ndarray] = None


class DenseSLAMSystem:
    """Stateful facade over the functional pipeline (API parity with
    `DenseSLAMSystem.h`).  ``step()`` runs one fused frame."""

    def __init__(self, input_size: Tuple[int, int],
                 config: Configuration):
        self.config = config
        ratio = config.compute_size_ratio
        self.input_size = input_size                       # (H, W)
        self.H = input_size[0] // ratio
        self.W = input_size[1] // ratio
        self.size = config.volume_resolution[0]
        self.dim = float(config.volume_size[0])
        self.mu = config.mu
        self.iterations = tuple(config.pyramid)

        voxel_size = self.dim / self.size
        if config.field_type == "sdf":
            self.field = make_field("sdf", mu=config.mu)
        else:
            self.field = make_field("ofusion", mu=config.mu,
                                    voxel_size=voxel_size,
                                    sigma_floor=config.ofusion_sigma_floor)

        init_t = jnp.asarray([
            config.initial_pos_factor[0] * config.volume_size[0],
            config.initial_pos_factor[1] * config.volume_size[1],
            config.initial_pos_factor[2] * config.volume_size[2],
        ], jnp.float32)
        self.init_pose = camera.pose_from_translation(init_t)

        capacity = config.block_capacity
        self.state = init_state(self.size, self.dim, self.field,
                                self.H, self.W, self.init_pose,
                                capacity=capacity,
                                partitions=config.map_partitions,
                                grad_normals=(config.raycast_normals
                                              == "stored"),
                                incremental_view=config.incremental_view)

        self._step = jax.jit(
            functools.partial(
                process_frame,
                field=self.field,
                iterations=self.iterations,
                tracking_rate=config.tracking_rate,
                integration_rate=config.integration_rate,
                bilateral=config.bilateral_filter,
                icp_threshold=config.icp_threshold,
                normals=config.raycast_normals,
                second_window=config.raycast_second_window,
                span_factor=config.raycast_span_factor,
                refine=config.raycast_refine,
                raycast_rate=config.raycast_rate,
                finest_decimate=config.icp_finest_decimate,
                w2_budget=config.raycast_w2_budget,
                scan_stride=config.raycast_scan_stride,
                grad_decim=config.raycast_grad_decim,
                full_res_scan=config.raycast_full_res_scan,
                near_rescue=config.raycast_near_rescue,
                midsolve=config.raycast_midsolve,
                adaptive_deg=config.raycast_adaptive_deg,
                adaptive_dist=config.raycast_adaptive_dist,
                integrate_budget=config.integrate_budget,
                alloc_stride=config.alloc_stride,
                alloc_rate=config.alloc_rate,
                alloc_adaptive_deg=config.alloc_adaptive_deg,
                alloc_adaptive_dist=config.alloc_adaptive_dist,
                alloc_on_demand=config.alloc_on_demand,
                alloc_on_demand_border=config.alloc_on_demand_border,
                integrate_patch=config.integrate_patch,
                icp_robust=config.icp_robust,
                icp_robust_delta=config.icp_robust_delta,
                icp_assoc=config.icp_assoc,
                icp_symmetric=config.icp_symmetric,
                icp_sym_min_deg=config.icp_sym_min_deg,
                icp_sym_max_deg=config.icp_sym_max_deg,
                bootstrap_frames=config.bootstrap_frames,
                fuse_filtered=config.fuse_filtered,
                raycast_from_frame=config.raycast_from_frame,
                bootstrap_f2f=config.bootstrap_f2f,
                f2f_fallback=config.f2f_fallback,
            ),
            static_argnames=("use_gt", "neg_y"))
        # (no donation here: callers may hold references to earlier states;
        # the bench's scan path donates instead)
        # separately-jitted stages for --staged timing (TSV column parity
        # with benchmark.cpp:110-112)
        self._stages = {
            "preprocessing": jax.jit(functools.partial(
                preprocessing_stage, bilateral=config.bilateral_filter)),
            "tracking": jax.jit(functools.partial(
                tracking_stage, field=self.field, iterations=self.iterations,
                tracking_rate=config.tracking_rate,
                icp_threshold=config.icp_threshold,
                finest_decimate=config.icp_finest_decimate,
                icp_robust=config.icp_robust,
                icp_robust_delta=config.icp_robust_delta,
                icp_assoc=config.icp_assoc,
                icp_symmetric=config.icp_symmetric,
                icp_sym_min_deg=config.icp_sym_min_deg,
                icp_sym_max_deg=config.icp_sym_max_deg),
                static_argnames=("use_gt", "neg_y")),
            "integration": jax.jit(functools.partial(
                integration_stage, field=self.field,
                integration_rate=config.integration_rate,
                bootstrap_frames=config.bootstrap_frames,
                fuse_filtered=config.fuse_filtered,
                integrate_budget=config.integrate_budget,
                alloc_stride=config.alloc_stride,
                alloc_rate=config.alloc_rate,
                alloc_adaptive_deg=config.alloc_adaptive_deg,
                alloc_adaptive_dist=config.alloc_adaptive_dist,
                alloc_on_demand=config.alloc_on_demand,
                alloc_on_demand_border=config.alloc_on_demand_border,
                integrate_patch=config.integrate_patch)),
            "raycasting": jax.jit(functools.partial(
                raycasting_stage, field=self.field,
                normals=config.raycast_normals,
                second_window=config.raycast_second_window,
                span_factor=config.raycast_span_factor,
                refine=config.raycast_refine,
                raycast_rate=config.raycast_rate,
                w2_budget=config.raycast_w2_budget,
                scan_stride=config.raycast_scan_stride,
                grad_decim=config.raycast_grad_decim,
                full_res_scan=config.raycast_full_res_scan,
                near_rescue=config.raycast_near_rescue,
                midsolve=config.raycast_midsolve,
                adaptive_deg=config.raycast_adaptive_deg,
                adaptive_dist=config.raycast_adaptive_dist,
                raycast_from_frame=config.raycast_from_frame,
                bootstrap_f2f=config.bootstrap_f2f,
                f2f_fallback=config.f2f_fallback),
                static_argnames=("neg_y",)),
        }

    # ---- reference-parity accessors ----

    def getPosition(self):
        return self.state.pose[:3, 3]

    def getPose(self):
        return self.state.pose

    def setPose(self, pose):
        p = jnp.asarray(pose, jnp.float32)
        self.state = self.state.replace(pose=p, prev_pose=p * 1.0)

    def setViewPose(self, pose=None):
        self._view_pose = pose

    def getMap(self):
        return self.state.map

    def getVolume(self):
        """Metric-space continuous view (VolumeTemplate parity)."""
        from supereight_tpu.core.volume import Volume
        return Volume(self.state.map, self.field.select_channel)

    def getInitPos(self):
        return self.init_pose[:3, 3]

    # ---- individual pipeline stages (reference DenseSLAMSystem API:
    # preprocessing/tracking/integration/raycasting, DenseSLAMSystem.h) ----

    def preprocessing(self, depth_mm):
        self.state = self._stages["preprocessing"](
            self.state, jnp.asarray(depth_mm))
        return True

    def tracking(self, k, frame: int, gt_pose=None):
        use_gt = gt_pose is not None
        if gt_pose is None:
            gt_pose = jnp.eye(4, dtype=jnp.float32)
        self.state = self._stages["tracking"](
            self.state, jnp.asarray(k, jnp.float32),
            jnp.asarray(frame, jnp.int32), jnp.asarray(gt_pose, jnp.float32),
            use_gt=use_gt, neg_y=bool(k[1] < 0))
        return bool(self.state.tracked)

    def integration(self, k, frame: int):
        self.state = self._stages["integration"](
            self.state, jnp.asarray(k, jnp.float32),
            jnp.asarray(frame, jnp.int32))
        return bool(self.state.integrated)

    def raycasting(self, k, frame: int):
        # neg_y follows fy < 0 like the tracking stage
        # (`DenseSLAMSystem.cpp:159-162`) — it shapes the f2f-published
        # reference normals
        self.state = self._stages["raycasting"](
            self.state, jnp.asarray(k, jnp.float32),
            jnp.asarray(frame, jnp.int32),
            neg_y=bool(np.asarray(k)[1] < 0))
        return frame > 2

    # ---- main entry ----

    def step(self, depth_mm, k, frame: int, gt_pose=None):
        """Process one frame (the benchmark.cpp:115-158 loop body).

        ``depth_mm`` uint16 [H_in, W_in] millimetre depth; ``k`` (fx,fy,cx,cy)
        at computation resolution; ``gt_pose`` bypasses ICP like the
        reference's ground-truth mode (`mainQt.cpp:257-265`).
        """
        use_gt = gt_pose is not None
        if gt_pose is None:
            gt_pose = jnp.eye(4, dtype=jnp.float32)
        neg_y = bool(k[1] < 0)   # NegY normals for ICL-NUIM's flipped y
        self.state = self._step(self.state, jnp.asarray(depth_mm),
                                jnp.asarray(k, jnp.float32),
                                jnp.asarray(frame, jnp.int32),
                                jnp.asarray(gt_pose, jnp.float32),
                                use_gt=use_gt, neg_y=neg_y)
        return self.state

    def step_staged(self, depth_mm, k, frame: int, gt_pose=None):
        """Like :meth:`step` but one device dispatch per pipeline stage,
        returning ``(state, {stage: seconds})`` for the reference's per-stage
        TSV log (`benchmark.cpp:110-112,162-173`)."""
        import time as _time
        use_gt = gt_pose is not None
        if gt_pose is None:
            gt_pose = jnp.eye(4, dtype=jnp.float32)
        neg_y = bool(k[1] < 0)
        kd = jnp.asarray(k, jnp.float32)
        fd = jnp.asarray(frame, jnp.int32)
        st = self.state
        times = {}

        t0 = _time.perf_counter()
        st = self._stages["preprocessing"](st, jnp.asarray(depth_mm))
        st.scaled_depth.block_until_ready()
        times["preprocessing"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        st = self._stages["tracking"](st, kd, fd,
                                      jnp.asarray(gt_pose, jnp.float32),
                                      use_gt=use_gt, neg_y=neg_y)
        st.pose.block_until_ready()
        times["tracking"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        st = self._stages["integration"](st, kd, fd)
        st.map.n_blocks.block_until_ready()
        times["integration"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        st = self._stages["raycasting"](st, kd, fd, neg_y=neg_y)
        st.ref_vertex.block_until_ready()
        times["raycasting"] = _time.perf_counter() - t0

        self.state = st
        return st, times

    # ---- renderers ----

    def renderDepth(self):
        return rendering.render_depth(self.state.scaled_depth)

    def renderTrack(self):
        return rendering.render_track(self.state.track_result)

    def renderVolume(self, view_pose=None, k=None):
        st = self.state
        if view_pose is None:
            return rendering.render_volume(
                st.map, self.field, None, self.H, self.W,
                vertex=st.ref_vertex, normal=st.ref_normal)
        view = jnp.asarray(view_pose, jnp.float32) @ \
            camera.inverse_camera_matrix(jnp.asarray(k, jnp.float32))
        return rendering.render_volume(st.map, self.field, view,
                                       self.H, self.W)

    def dump_mesh(self, filename: str):
        from supereight_tpu.core import meshing
        from supereight_tpu.io import vtk as vtk_io
        tris = meshing.marching_cubes(self.state.map,
                                      self.field.select_channel,
                                      inside=self.field.is_inside)
        vtk_io.write_vtk_mesh(filename, tris)
        return tris


def init_state(size: int, dim: float, field, H: int, W: int,
               init_pose, capacity: Optional[int] = None,
               partitions: int = 1,
               grad_normals: bool = False,
               incremental_view: bool = False) -> FrameState:
    m = octree.init(size, dim, field.channels, capacity=capacity,
                    partitions=partitions)
    z3 = jnp.zeros((H, W, 3), jnp.float32)
    invalid_n = z3.at[..., 0].set(INVALID)
    return FrameState(
        map=m,
        pose=jnp.asarray(init_pose, jnp.float32),
        raycast_pose=jnp.asarray(init_pose, jnp.float32),
        float_depth=jnp.zeros((H, W), jnp.float32),
        scaled_depth=jnp.zeros((H, W), jnp.float32),
        ref_vertex=z3,
        ref_normal=invalid_n,
        track_result=jnp.zeros((H, W), jnp.int32),
        tracked=jnp.zeros((), bool),
        integrated=jnp.zeros((), bool),
        grad=gradmap.empty_table(m.capacity) if grad_normals else None,
        view=raycast.pack_view(m, field)["F"] if incremental_view else None,
        # + 0.0 materializes a buffer distinct from pose/raycast_pose
        # (donation aliasing trap, SKILL round-2 note)
        alloc_pose=jnp.asarray(init_pose, jnp.float32) + 0.0,
        alloc_count=jnp.zeros((), jnp.int32),
        prev_pose=jnp.asarray(init_pose, jnp.float32) * 1.0,
        model_ref=jnp.ones((), bool),
    )


def preprocessing_stage(state: FrameState, depth_mm, *,
                        bilateral: bool) -> FrameState:
    """preprocessing() (`DenseSLAMSystem.cpp:128-141`)."""
    H, W = state.float_depth.shape
    if depth_mm.dtype == jnp.uint16:
        float_depth = preprocessing.mm_to_meters(depth_mm, (H, W))
    else:
        ih, iw = depth_mm.shape
        ratio = iw // W
        float_depth = depth_mm[::ratio, ::ratio].astype(jnp.float32)
    if bilateral:
        scaled_depth = preprocessing.bilateral_filter(float_depth)
    else:
        scaled_depth = float_depth
    return state.replace(float_depth=float_depth, scaled_depth=scaled_depth)


def tracking_stage(state: FrameState, k, frame, gt_pose, *, field,
                   iterations, tracking_rate, icp_threshold, use_gt: bool,
                   neg_y: bool,
                   finest_decimate: int = 1,
                   icp_robust: str = "none",
                   icp_robust_delta: float = 0.01,
                   icp_assoc: str = "nearest",
                   icp_symmetric=False,
                   icp_sym_min_deg: float = 0.5,
                   icp_sym_max_deg: float = 4.5) -> FrameState:
    """tracking() (`DenseSLAMSystem.cpp:143-189`); ground-truth mode
    bypasses ICP like `mainQt.cpp:257-265`.  The ``icp_*`` knobs are the
    beyond-reference solver levers (robust IRLS weighting, bilinear
    sub-pixel association, symmetric point-to-plane — tracking.py).

    ``icp_symmetric="auto"`` gates the symmetric residual IN-GRAPH on
    the previous frame's rotation rate (``state.prev_pose``): the
    bisector residual measured a pure win under moderate rotation
    (256^3 base 1.85 -> 1.37 cm, 512^3 base 2.9 -> 1.32, room2, jit)
    but a LOSS on translation-dominant motion (trans 18 -> 38 cm) and
    on the fast held-out orbit (r5 chains 27-29) — so it engages only
    inside the [icp_sym_min_deg, icp_sym_max_deg] per-frame rotation
    window, falling back to the reference's plain point-to-plane
    outside it.  The predicate is a replicated pure function of state,
    so the sharded frame fires identically (frame_dist)."""
    # NegY normal orientation follows fy < 0 (`DenseSLAMSystem.cpp:159-162`)
    depths, vertices, normals = preprocessing.build_pyramid(
        state.scaled_depth, k, len(iterations), neg_y=neg_y)

    if use_gt:
        return state.replace(pose=gt_pose, tracked=jnp.ones((), bool),
                             prev_pose=None if state.prev_pose is None
                             else state.pose * 1.0)

    sym = icp_symmetric
    if icp_symmetric == "auto":
        sym = _sym_auto_gate(state, icp_sym_min_deg, icp_sym_max_deg)

    do_track = (frame % tracking_rate) == 0
    new_pose, ok, result = tracking.track(
        state.pose, depths, vertices, normals, state.ref_vertex,
        state.ref_normal, state.raycast_pose, k, iterations, icp_threshold,
        finest_decimate=finest_decimate,
        robust=icp_robust, robust_delta=icp_robust_delta,
        assoc=icp_assoc, symmetric=sym)
    return state.replace(
        pose=jnp.where(do_track, new_pose, state.pose),
        tracked=do_track & ok,
        track_result=jnp.where(do_track, result, state.track_result),
        prev_pose=None if state.prev_pose is None
        else jnp.where(do_track, state.pose, state.prev_pose))


def _sym_auto_gate(state: FrameState, min_deg: float, max_deg: float):
    """Replicated moderate-rotation predicate for icp_symmetric="auto":
    per-frame rotation angle of the last pose step, from prev_pose."""
    if state.prev_pose is None:
        return False
    dR = state.pose[:3, :3] @ state.prev_pose[:3, :3].T
    cos_ang = jnp.clip(0.5 * (jnp.trace(dR) - 1.0), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cos_ang))
    return (ang >= min_deg) & (ang <= max_deg)


def integration_stage(state: FrameState, k, frame, *, field,
                      integration_rate,
                      bootstrap_frames: int = 3,
                      fuse_filtered: bool = False,
                      integrate_budget: int = 0,
                      alloc_stride: float = 1.0,
                      alloc_rate: int = 1,
                      integrate_patch: int = 16,
                      coarse_alloc: bool = True,
                      alloc_adaptive_deg: float = 0.0,
                      alloc_adaptive_dist: float = 0.0,
                      alloc_on_demand: float = 0.0,
                      alloc_on_demand_border: float = 0.0) -> FrameState:
    """integration() (`DenseSLAMSystem.cpp:206-268`): integrates when
    tracked or during the bootstrap frames.  When the state carries a
    gradient table (raycast_normals == "stored") it is rebuilt here — the
    field only changes under this cond, so the raycaster's per-frame
    normal source stays consistent for free between integrations.

    ``alloc_adaptive_deg`` > 0 replaces the fixed ``alloc_rate`` schedule
    with a motion gate like the raycast's: march once the pose has
    rotated/translated past the thresholds since ``state.alloc_pose``.

    ``alloc_on_demand`` > 0 gates the march on the DATA instead: fire
    when the fraction of valid depth pixels whose surface block is
    unallocated exceeds the threshold
    (`integration.unallocated_fraction`).  Allocation is idempotent
    coverage, so this fires exactly when the frame shows surface outside
    the allocated set — a fixed rate cannot be right on both a
    fully-allocated orbit (march wasted) and held-out room geometry
    whose occlusions keep revealing new surface (measured: ar16 holds
    2.48 cm on the bench orbit but loses room2 at 40 cm while the
    every-firing march holds 9.4 cm there)."""
    model_ok = state.tracked if state.model_ref is None \
        else state.tracked & state.model_ref
    do_integrate = (model_ok | (frame <= bootstrap_frames)) & \
        (((frame % integration_rate) == 0) | (frame <= bootstrap_frames))
    K = camera.camera_matrix(k)
    timestamp = (1.0 / 30.0) * frame.astype(jnp.float32)
    # fuse_filtered (TPU extension; reference fuses RAW depth,
    # `DenseSLAMSystem.cpp:206+` floatDepth): fuse the bilateral-filtered
    # depth instead — at voxel sizes below the sensor noise floor the raw
    # noise IS the map, and the model-map surface a fine-voxel bootstrap
    # raycasts can be too rough for the first ICP lock
    float_depth = state.scaled_depth if fuse_filtered else state.float_depth
    pose = state.pose
    alloc_count = state.alloc_count if state.alloc_count is not None \
        else frame // max(alloc_rate, integration_rate, 1)

    def integrate_fn(arg):
        m, grad, view, a_pose, a_count = arg
        band = field.alloc_band()
        live_before = octree.slot_mask(m) if view is not None else None

        def alloc_fn(mm):
            if field.multiscale_alloc:
                # the firing counter rotates the coarse march's dither
                # phase — consecutive firings cover complementary
                # stride-2 ray grids
                return integration.allocate_ofusion(mm, float_depth, pose,
                                                    K, band,
                                                    coarse_stride=coarse_alloc,
                                                    phase=alloc_count)
            return integration.allocate_sdf(mm, float_depth, pose, K, band,
                                            stride=alloc_stride)

        if alloc_on_demand > 0.0:
            frac = integration.unallocated_fraction(
                m, float_depth, pose, K, border=alloc_on_demand_border)
            do_alloc = (frac > alloc_on_demand) | (frame <= 5)
        elif alloc_adaptive_deg > 0.0 and state.alloc_pose is not None:
            dR = pose[:3, :3] @ state.alloc_pose[:3, :3].T
            cos_ang = 0.5 * (jnp.trace(dR) - 1.0)
            dist = jnp.linalg.norm(pose[:3, 3] - state.alloc_pose[:3, 3])
            moved = (cos_ang < float(np.cos(np.radians(alloc_adaptive_deg)))) \
                | (dist > alloc_adaptive_dist)
            do_alloc = moved | (frame <= 5)
        elif alloc_rate > 1:
            # TPU extension: at -z1 the band march + dedupe scatter run
            # every frame (~2 ms) yet consecutive 30 fps frames request
            # near-identical block sets; skipping alternate marches only
            # delays first allocation of a NEW region by one frame (fusion
            # still runs every frame on allocated blocks).  Bootstrap
            # frames always allocate.
            do_alloc = ((frame % alloc_rate) == 0) | (frame <= 5)
        else:
            do_alloc = None
        if do_alloc is not None:
            m = jax.lax.cond(do_alloc, alloc_fn, lambda mm: mm, m)
            if a_pose is not None:
                a_pose = jnp.where(do_alloc, pose, a_pose)
            if a_count is not None:
                a_count = a_count + do_alloc.astype(jnp.int32)
        else:
            m = alloc_fn(m)
            if a_pose is not None:
                a_pose = pose
            if a_count is not None:
                a_count = a_count + 1
        if view is not None and not field.multiscale_alloc:
            # newly allocated rows flip from the unallocated fill to the
            # fresh-voxel encoding before fusion scatters its updates
            view = raycast.view_alloc_fill(view, m, live_before, field)
            m, view = integration.integrate(m, field, float_depth, pose, K,
                                            timestamp=timestamp,
                                            budget=integrate_budget,
                                            view=view,
                                            patch=integrate_patch)
        else:
            m = integration.integrate(m, field, float_depth, pose, K,
                                      timestamp=timestamp,
                                      budget=integrate_budget,
                                      patch=integrate_patch)
            if view is not None:
                # multiscale (occupancy): the node show-through re-selects
                # every unallocated row, so rebuild — but only HERE, on
                # integration frames (the map cannot change anywhere
                # else), instead of inside every raycast.  At -z4 this
                # amortizes the pack 4x.
                view = raycast.pack_view(m, field)["F"]
        if grad is not None:
            grad = gradmap.build_table(m, field)
        return m, grad, view, a_pose, a_count

    m, grad, view, a_pose, a_count = jax.lax.cond(
        do_integrate, integrate_fn, lambda a: a,
        (state.map, state.grad, state.view, state.alloc_pose,
         state.alloc_count))
    return state.replace(map=m, grad=grad, view=view,
                         alloc_pose=a_pose, alloc_count=a_count,
                         integrated=do_integrate)


def raycasting_stage(state: FrameState, k, frame, *, field,
                     normals: str = "volume",
                     second_window: bool = True,
                     span_factor: float = 1.6,
                     refine: str = "secant",
                     raycast_rate: int = 1,
                     w2_budget: int = 8192,
                     scan_stride: float = 0.5,
                     grad_decim: int = 1,
                     full_res_scan: bool = False,
                     midsolve: bool = False,
                     near_rescue: bool = True,
                     adaptive_deg: float = 0.0,
                     adaptive_dist: float = 0.12,
                     raycast_from_frame: int = 3,
                     bootstrap_f2f: bool = False,
                     f2f_fallback: bool = False,
                     neg_y: bool = False) -> FrameState:
    """raycasting() (`DenseSLAMSystem.cpp:191-204`): refresh the reference
    model maps from the current pose (only after the bootstrap frames).

    ``raycast_rate`` > 1 refreshes every Nth frame only (TPU extension:
    the ICP association already tracks against ``raycast_pose``, so the
    maps may lag the camera by a few frames; bootstrap frames <=5 always
    refresh so tracking starts from a fresh model).

    ``adaptive_deg`` > 0 replaces the fixed schedule with a motion gate:
    refresh once the pose has rotated ``adaptive_deg`` degrees or moved
    ``adaptive_dist`` metres since ``raycast_pose`` (the state already
    carries it — no extra state).  The staleness bound lives in motion
    space instead of frame count, so the amortization adapts to the
    trajectory; the skipped raycast costs nothing (`lax.cond`)."""
    H, W = state.float_depth.shape
    # first refresh at frame raycast_from_frame (reference parity: 3 —
    # `kernels.cpp` raycasts when frame > 2).  1 = refresh right after
    # the frame-0 bootstrap integration, so frame-1 tracking sees a real
    # model map and the untracked-bootstrap pose smear never happens
    do_raycast = frame >= raycast_from_frame
    if adaptive_deg > 0.0:
        dR = state.pose[:3, :3] @ state.raycast_pose[:3, :3].T
        cos_ang = 0.5 * (jnp.trace(dR) - 1.0)
        dist = jnp.linalg.norm(state.pose[:3, 3] - state.raycast_pose[:3, 3])
        moved = (cos_ang < float(np.cos(np.radians(adaptive_deg)))) | \
            (dist > adaptive_dist)
        do_raycast &= moved | (frame <= 5)
    elif raycast_rate > 1:
        do_raycast &= ((frame % raycast_rate) == 0) | (frame <= 5)

    def raycast_fn(args):
        m, pose, grad, dv = args
        view = pose @ camera.inverse_camera_matrix(k)
        rc = raycast.raycast(m, field, view, H, W, NEAR_PLANE, FAR_PLANE,
                             normals=normals,
                             dense=None if dv is None else {"F": dv},
                             second_window=second_window,
                             span_factor=span_factor, grad_table=grad,
                             refine=refine, w2_budget=w2_budget,
                             scan_stride=scan_stride, midsolve=midsolve,
                             near_rescue=near_rescue,
                             grad_decim=grad_decim,
                             full_res_scan=full_res_scan)
        return rc.vertex, rc.normal, pose

    def skip_fn(args):
        return state.ref_vertex, state.ref_normal, state.raycast_pose

    ref_vertex, ref_normal, raycast_pose = jax.lax.cond(
        do_raycast, raycast_fn, skip_fn,
        (state.map, state.pose, state.grad, state.view))

    if bootstrap_f2f or f2f_fallback:
        # frame-to-frame reference publication (beyond-reference): make
        # THIS frame's input vertex/normal maps (world space) the
        # reference model so the NEXT frame's ICP tracks frame-to-frame.
        # Two triggers:
        # * bootstrap_f2f — before the first model raycast (the
        #   reference leaves frames 1..raycast_from_frame-1 untracked
        #   and fuses them at a frozen pose; that double-exposure smear
        #   is fatal at fine voxels under noise);
        # * f2f_fallback — whenever THIS frame's model tracking failed
        #   (divergence gate): instead of freezing against an
        #   increasingly stale model, the pose rides frame-to-frame
        #   odometry through the failure streak (at the single-frame
        #   ICP noise floor) and model tracking can re-lock after it.
        publish = jnp.zeros((), bool)
        if bootstrap_f2f:
            publish |= (~do_raycast) & (frame < raycast_from_frame)
        if f2f_fallback:
            publish |= (~state.tracked) & (frame >= raycast_from_frame)
        _, v0, n0 = preprocessing.build_pyramid(state.scaled_depth, k, 1,
                                                neg_y=neg_y)
        w_v = camera.transform_points(state.pose, v0[0])
        w_n = camera.rotate_vectors(state.pose, n0[0])
        invalid = n0[0][..., 0] == INVALID
        w_n = jnp.where(invalid[..., None], n0[0], w_n)
        ref_vertex = jnp.where(publish, w_v, ref_vertex)
        ref_normal = jnp.where(publish, w_n, ref_normal)
        raycast_pose = jnp.where(publish, state.pose, raycast_pose)
        model_ref = state.model_ref
        if model_ref is not None:
            model_ref = jnp.where(publish, False,
                                  jnp.where(do_raycast, True, model_ref))
        return state.replace(ref_vertex=ref_vertex, ref_normal=ref_normal,
                             raycast_pose=raycast_pose,
                             model_ref=model_ref)
    return state.replace(ref_vertex=ref_vertex, ref_normal=ref_normal,
                         raycast_pose=raycast_pose,
                         model_ref=None if state.model_ref is None
                         else jnp.where(do_raycast, True,
                                        state.model_ref))


def process_frame(state: FrameState, depth_mm, k, frame, gt_pose,
                  *, field, iterations, tracking_rate, integration_rate,
                  bilateral, icp_threshold, use_gt: bool,
                  neg_y: bool, normals: str = "volume",
                  second_window: bool = True,
                  span_factor: float = 1.6,
                  refine: str = "secant",
                  raycast_rate: int = 1,
                  finest_decimate: int = 1,
                  w2_budget: int = 8192,
                  scan_stride: float = 0.5,
                  grad_decim: int = 1,
                  full_res_scan: bool = False,
                  midsolve: bool = False,
                  integrate_budget: int = 0,
                  alloc_stride: float = 1.0,
                  alloc_rate: int = 1,
                  integrate_patch: int = 16,
                  near_rescue: bool = True,
                  adaptive_deg: float = 0.0,
                  adaptive_dist: float = 0.12,
                  coarse_alloc: bool = True,
                  alloc_adaptive_deg: float = 0.0,
                  alloc_adaptive_dist: float = 0.0,
                  alloc_on_demand: float = 0.0,
                  alloc_on_demand_border: float = 0.0,
                  icp_robust: str = "none",
                  icp_robust_delta: float = 0.01,
                  icp_assoc: str = "nearest",
                  icp_symmetric=False,
                  icp_sym_min_deg: float = 0.5,
                  icp_sym_max_deg: float = 4.5,
                  bootstrap_frames: int = 3,
                  fuse_filtered: bool = False,
                  raycast_from_frame: int = 3,
                  bootstrap_f2f: bool = False,
                  f2f_fallback: bool = False) -> FrameState:
    """One full SLAM frame as a pure function (fused jit target; the staged
    variants above are jitted separately by the CLI's --staged timing mode)."""
    state = preprocessing_stage(state, depth_mm, bilateral=bilateral)
    state = tracking_stage(state, k, frame, gt_pose, field=field,
                           iterations=iterations, tracking_rate=tracking_rate,
                           icp_threshold=icp_threshold, use_gt=use_gt,
                           neg_y=neg_y,
                           finest_decimate=finest_decimate,
                           icp_robust=icp_robust,
                           icp_robust_delta=icp_robust_delta,
                           icp_assoc=icp_assoc,
                           icp_symmetric=icp_symmetric,
                           icp_sym_min_deg=icp_sym_min_deg,
                           icp_sym_max_deg=icp_sym_max_deg)
    state = integration_stage(state, k, frame, field=field,
                              integration_rate=integration_rate,
                              bootstrap_frames=bootstrap_frames,
                              fuse_filtered=fuse_filtered,
                              integrate_budget=integrate_budget,
                              alloc_stride=alloc_stride,
                              alloc_rate=alloc_rate,
                              integrate_patch=integrate_patch,
                              coarse_alloc=coarse_alloc,
                              alloc_adaptive_deg=alloc_adaptive_deg,
                              alloc_adaptive_dist=alloc_adaptive_dist,
                              alloc_on_demand=alloc_on_demand,
                              alloc_on_demand_border=alloc_on_demand_border)
    return raycasting_stage(state, k, frame, field=field, normals=normals,
                            second_window=second_window,
                            span_factor=span_factor, refine=refine,
                            raycast_rate=raycast_rate,
                            w2_budget=w2_budget, scan_stride=scan_stride,
                            midsolve=midsolve, near_rescue=near_rescue,
                            adaptive_deg=adaptive_deg,
                            adaptive_dist=adaptive_dist,
                            grad_decim=grad_decim,
                            full_res_scan=full_res_scan,
                            raycast_from_frame=raycast_from_frame,
                            bootstrap_f2f=bootstrap_f2f,
                            f2f_fallback=f2f_fallback, neg_y=neg_y)
