"""Runtime configuration (reference `se_denseslam/include/se/config.h:39-214`
and defaults `se_apps/include/default_parameters.h:26-49`)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple


@dataclasses.dataclass
class Configuration:
    # Pipeline rates (default_parameters.h:26-31)
    compute_size_ratio: int = 1          # --compute-size-ratio / -r
    tracking_rate: int = 1               # --tracking-rate / -t
    integration_rate: int = 2            # --integration-rate / -z
    rendering_rate: int = 4              # --rendering-rate / -c

    # Volume (default_parameters.h:32-35): 256^3 voxels over 2m
    volume_resolution: Tuple[int, int, int] = (256, 256, 256)   # -v
    volume_size: Tuple[float, float, float] = (2.0, 2.0, 2.0)   # -s
    initial_pos_factor: Tuple[float, float, float] = (0.5, 0.5, 0.0)  # -p

    pyramid: Tuple[int, ...] = (10, 5, 4)  # ICP iterations per level, -y

    dump_volume_file: str = ""           # -d
    input_file: str = ""                 # -i
    log_file: str = ""                   # -o
    groundtruth_file: str = ""           # -g
    gt_transform: Optional[Sequence[float]] = None  # -G, row-major 4x4

    # Camera: fx, fy, cx, cy (negative fy = ICL-NUIM flipped y), -k
    camera: Optional[Tuple[float, float, float, float]] = None
    camera_overrided: bool = False

    mu: float = 0.1                      # TSDF truncation band, -m
    fps: int = 0                         # reader pacing, -f
    blocking_read: bool = False          # -b
    icp_threshold: float = 1e-5          # -l
    no_gui: bool = True                  # -q/-e in reference GUI builds
    render_volume_fullsize: bool = False
    bilateral_filter: bool = False       # -F
    colour_voxels: bool = False

    # --- TPU build extensions (not in the reference) ---
    block_capacity: Optional[int] = None   # max allocated blocks (None: auto)
    map_partitions: int = 1                # owner partitions (multi-device)
    raycast_normals: str = "volume"        # "volume" (reference grad) |
                                           # "stored" (precomputed table) |
                                           # "hybrid" | "exact" (rejected
                                           # variants: pipeline/experimental)
    raycast_second_window: bool = True     # deep-surface rescue scan
    icp_finest_decimate: int = 1           # stride the finest ICP level's
                                           # input maps (2 = quarter the
                                           # association descriptors of
                                           # the costliest level)
    raycast_span_factor: float = 1.6       # fine window: span*diag + 2*band
    raycast_near_rescue: bool = True       # activate no-splat rays near
                                           # close blocks from the wide-pool
                                           # tmin (ADVICE r2 blind zone)
    raycast_scan_stride: float = 0.5       # fine-scan step, in band
                                           # thicknesses (0.5 = canonical)
    incremental_view: bool = False         # keep the raycast read view in
                                           # FrameState: single-scale
                                           # fields scatter only the rows
                                           # fusion touched; multiscale
                                           # rebuilds on integration frames
                                           # only (vs every raycast)
    raycast_full_res_scan: bool = False   # march every pixel in the fine
                                           # scan (reference-style) instead
                                           # of half-res + per-pixel refine
    raycast_grad_decim: int = 1            # hybrid-normal lateral gradient
                                           # subsampling beyond half-res
                                           # (2 = quarter-res taps; the
                                           # along-ray component stays
                                           # per-pixel)
    alloc_rate: int = 1                    # run the allocation march every
                                           # Nth frame (fusion still every
                                           # integration frame; new regions
                                           # allocate <=N-1 frames late)
    alloc_adaptive_deg: float = 0.0        # >0: replace alloc_rate with a
                                           # motion gate (march once the
    alloc_adaptive_dist: float = 0.24      # pose rotated deg / moved m
                                           # since the last march).  The
                                           # dist default matches the CLI
                                           # frontends' validated 0.24 so
                                           # Configuration-only users who
                                           # set only the deg knob get the
                                           # intended gating, not a march
                                           # on any motion (ADVICE r4)
    alloc_on_demand: float = 0.0           # >0: gate the march on data —
                                           # fire when > this fraction of
                                           # valid depth pixels hits an
                                           # unallocated block
    alloc_on_demand_border: float = 0.0    # crop this image fraction per
                                           # side before measuring (ignore
                                           # frustum-edge slivers)
    raycast_midsolve: bool = False         # half-res secant re-solve between
                                           # scan and full-res refine (pairs
                                           # with a coarse scan_stride)
    raycast_w2_budget: int = 8192          # compacted second-window ray
                                           # budget (each slot costs a full
                                           # sample column whether used or
                                           # not; needy rays are typically
                                           # a few % at silhouettes)
    raycast_refine: str = "secant"         # full-res re-solve: "secant"
                                           # (2-sample field re-solve) |
                                           # "plane" (gather-free stored-
                                           # normal plane intersection;
                                           # measured negative: ATE 2.8->7.2
                                           # at -z4, bench_data/*_pl*)
    raycast_rate: int = 1                  # refresh the reference model
                                           # maps every Nth frame (1 =
                                           # reference behavior: every
                                           # frame); ICP tracks against the
                                           # last refresh via raycast_pose
    raycast_adaptive_deg: float = 0.0      # >0: motion-adaptive model
                                           # refresh — raycast only once the
                                           # pose has rotated this many
                                           # degrees (or translated
                                           # raycast_adaptive_dist metres)
                                           # since the last refresh
                                           # (raycast_pose).  Replaces the
                                           # fixed raycast_rate schedule
                                           # with a staleness bound in
                                           # MOTION space: slow segments
                                           # amortize the raycast like a
                                           # high raycast_rate, fast ones
                                           # refresh every frame.  The
                                           # validated envelope on the 96-
                                           # frame orbits (bench_data): ~5°
                                           # of accumulated rotation holds
                                           # ATE on both the base and the
                                           # 1.5x-rate held-out sequence;
                                           # fixed rates that exceed it on
                                           # the fast orbit (rr5/rr6)
                                           # measured 11.7/26.2 cm there
    raycast_adaptive_dist: float = 0.12    # translation trigger (m) paired
                                           # with raycast_adaptive_deg
    max_alloc_per_frame: int = 8192        # candidate new blocks per frame
    alloc_stride: float = 1.0              # band-march sample spacing in
                                           # voxels (1 = reference-exact).
                                           # MEASURED NEGATIVE at 2: +3.5
                                           # fps but ATE 1.91->3.12 cm
                                           # (missing sliver band blocks
                                           # bias the TSDF surface); keep 1
    integrate_budget: int = 0              # >0: fuse at most this many
                                           # frustum-candidate blocks per
                                           # frame (compacted rows) instead
                                           # of streaming the whole
                                           # capacity axis; 0 = dense
    integrate_patch: int = 16              # depth patch side per block:
                                           # blocks whose pixel footprint
                                           # exceeds it sample a stride-
                                           # decimated depth (the fusion
                                           # oracle measured the stride
                                           # atlas as the ONLY per-voxel
                                           # fusion deviation from the
                                           # reference; 32 halves the
                                           # stride at 256^3 for ~2x patch
                                           # gather rows)
    raycast_coarse_samples: int = 96
    raycast_fine_samples: int = 16
    field_type: str = "sdf"                # "sdf" | "ofusion"
    bootstrap_frames: int = 3              # integrate-while-untracked
                                           # window (reference parity:
                                           # `_tracked || frame <= 3`,
                                           # kernels.cpp).  Fine-voxel +
                                           # noise streams need a longer
                                           # averaging window before the
                                           # first ICP lock (512^3 noisy
                                           # diagnosis r5: the frame-4
                                           # map yields 857 inlier px vs
                                           # 24k at 256^3)
    f2f_fallback: bool = False             # frame-to-frame RECOVERY:
                                           # when model tracking fails
                                           # (divergence gate), publish
                                           # the frame's input maps as
                                           # the reference so the pose
                                           # rides f2f odometry through
                                           # the failure streak (fusion
                                           # suppressed on odometry
                                           # frames via
                                           # FrameState.model_ref).
                                           # MEASURED NEGATIVE on the
                                           # Kinect-noise matrix (r5
                                           # chains 45-46: tracked
                                           # frames rise to 83-92/96
                                           # but far-wall odometry
                                           # drift lands 18-73 cm vs
                                           # 9.88 plain) — the streaks
                                           # happen exactly where f2f
                                           # ICP is worst; kept as a
                                           # knob with records
    bootstrap_f2f: bool = False            # frame-to-frame bootstrap
                                           # tracking: before the first
                                           # model raycast, the previous
                                           # frame's input vertex/normal
                                           # maps serve as the reference
                                           # model (the reference leaves
                                           # those frames untracked and
                                           # smears the bootstrap map).
                                           # On clean orbits MEASURED
                                           # NEGATIVE (f2f poses carry
                                           # the single-frame ICP noise
                                           # floor: headline 1.85 ->
                                           # 2.95, 512^3 base 2.24 ->
                                           # 7.37 — r5 chain 41); a
                                           # fine-voxel noise-bootstrap
                                           # lever only, off by default
    raycast_from_frame: int = 3            # first reference-map refresh
                                           # (reference parity: 3, i.e.
                                           # `frame > 2`; 1 = refresh
                                           # right after the frame-0
                                           # bootstrap integration so
                                           # frame-1 tracking sees a
                                           # model map and the
                                           # untracked-bootstrap pose
                                           # smear never accumulates)
    fuse_filtered: bool = False            # fuse the bilateral-filtered
                                           # depth instead of raw (the
                                           # reference fuses raw; see
                                           # integration_stage note —
                                           # a fine-voxel noise lever)
    ofusion_sigma_floor: float = 0.0       # occupancy sensor-model sigma
                                           # floor decoupled from voxel
                                           # size (fields/ofusion.py);
                                           # 0 = reference 2*voxel_size
    # Beyond-reference ICP solver levers (the reference solve,
    # `tracking.cpp:226-336`, uses hard gates + plain point-to-plane with
    # nearest association; these are descriptor-cheap refinements):
    icp_robust: str = "none"               # "none" | "huber" | "tukey" —
                                           # IRLS weight on the residual
    icp_robust_delta: float = 0.01         # Huber delta / Tukey c (metres)
    icp_assoc: str = "nearest"             # "nearest" (reference rounding)
                                           # | "bilinear" (sub-pixel blend
                                           # of 4 reference rows, nearest
                                           # fallback at discontinuities)
    icp_symmetric: object = False          # symmetric point-to-plane
                                           # (normal-bisector residual):
                                           # False | True | "auto".
                                           # True: sequence-level lever —
                                           # measured wins on rotation-
                                           # moderate clean streams
                                           # (256^3 quality 1.73->1.53,
                                           # 512^3 base 2.9->1.32, room2,
                                           # jit) and LOSSES on
                                           # translation-dominant motion
                                           # (+20 cm on the dolly) and
                                           # the fast held-out orbit;
                                           # adopted per-preset (quality,
                                           # demo512-sdf), with the
                                           # runner's motion dispatcher
                                           # routing dolly streams away.
                                           # "auto" (per-frame motion
                                           # gate on prev_pose rotation)
                                           # measured NO-OP on clean
                                           # orbits — at sub-mm normal
                                           # agreement the bisector IS
                                           # the reference normal, so
                                           # gate-on frames change
                                           # nothing (bit-identical
                                           # trajectories) — and fired
                                           # exactly on the dolly's
                                           # jitter frames where it
                                           # hurts (42 vs 18 cm);
                                           # kept for the knob surface,
                                           # not used by any preset
                                           # (bench_data/*_sya_* r5)
    icp_sym_min_deg: float = 0.5           # auto-gate rotation window
    icp_sym_max_deg: float = 4.5

    def pyramid_levels(self) -> int:
        return len(self.pyramid)


#: Named configuration presets: the validated knob stacks from the
#: bench_data records (STATUS.md "Measured records" table), promoted to
#: code so users select a stack by name instead of an 8-knob string.
#: Reference analog: its single default config
#: (`se_apps/include/default_parameters.h:26-49`) plus the Makefile demo
#: targets (`Makefile:38-42`).  Values are Configuration field overrides;
#: apply with :func:`apply_preset`.
PRESETS = {
    # 256^3 SDF throughput headline: 143.9 fps @ 1.85 cm (bench.py;
    # bench_data/ate_icp_256_hybrid_ad3.8x0.07_id2_ib3072_ss1_ar3_gd2)
    "headline": dict(
        field_type="sdf",
        raycast_normals="hybrid",
        raycast_adaptive_deg=3.8, raycast_adaptive_dist=0.07,
        icp_finest_decimate=2, integrate_budget=3072,
        raycast_scan_stride=1.0, alloc_rate=3, raycast_grad_decim=2,
        integration_rate=1,
    ),
    # 256^3 SDF quality point: 39.3 fps @ 1.53 cm with the symmetric
    # point-to-plane residual (full ICP, volume normals;
    # bench_data/ate_icp_256_sy_nr — plain was 1.73).  Symmetric is a
    # rotation-moderate-stream lever: the runner's motion dispatcher
    # reroutes translation-dominant streams (where it costs ATE) to the
    # "trans" preset
    "quality": dict(
        field_type="sdf",
        raycast_normals="volume", raycast_near_rescue=False,
        integration_rate=1, icp_symmetric=True,
    ),
    # 256^3 OFusion throughput: 64.3 fps @ 2.21 cm
    # (bench_data/ate_icp_ofusion_256_hybrid_id2_ib3072_ss1_iv_nr_z4)
    "ofusion": dict(
        field_type="ofusion", mu=0.05,
        raycast_normals="hybrid", icp_finest_decimate=2,
        integrate_budget=3072, raycast_scan_stride=1.0,
        incremental_view=True, raycast_near_rescue=False,
        integration_rate=4,
    ),
    # 256^3 OFusion precision point (r5 chains 52-55): the FULL
    # reference-fidelity stack — exact blended gradients, full ICP,
    # -z4, the reference demo mu 0.008, trilinear re-solve — whose
    # levers measured negative individually but COMPOSE: 8.7 fps @
    # 1.51 cm clean (ref 0.61 @ 9.3), jit 1.64 (best occupancy cell),
    # alt 4.13, room2 4.49.  Clean-data precision only; the noise
    # regime stays the "noise" preset
    "ofusion-fidelity": dict(
        field_type="ofusion", mu=0.008,
        raycast_normals="exact", raycast_refine="interp",
        raycast_near_rescue=False, integration_rate=4,
    ),
    # Translation-dominant regime (dolly/corridor motion): the occupancy
    # quality stack — the only stack that holds the 25 mm/frame dolly
    # (5.79 cm vs 18-44 for every SDF config tried, r4-r5 chains;
    # bench_data/ate_icp_ofusion_256_trans_nr_z4).  Selected by the
    # runner's motion-class dispatcher (apps/runner.py auto_regime).
    "trans": dict(
        field_type="ofusion", mu=0.05,
        raycast_normals="volume", raycast_near_rescue=False,
        integration_rate=4,
    ),
    # Kinect-noise regime: OFusion quality stack, 34-38 fps @ 9.88 cm on
    # the noise model — beats the reference's best noisy run on both axes
    # (bench_data/ate_icp_ofusion_256_bf_noisy_nr_z4); selected
    # automatically by -F with default flags (apply_noise_regime)
    "noise": dict(
        field_type="ofusion", mu=0.05,
        raycast_normals="volume", raycast_near_rescue=False,
        integration_rate=4, bilateral_filter=True,
    ),
    # 512^3 SDF at the reference's demo-kfusion scale
    # (`Makefile:38-42`), validated across the r5 sequence matrix:
    # full-res scan + full integrate budget + -z1 are what keep held-out
    # room geometry (3.8 cm) and the translation dolly (7.3 cm, beats
    # the reference's 12.3) from the half-res stack's divergence
    # (bench_data/ate_icp_512_*fr*; chain-26 bisect)
    # (symmetric ICP: 512^3 base 2.90 -> 1.32 cm, room2 3.84 -> 3.09;
    # translation-dominant streams lose with it and are the dispatcher's
    # job — plain z1 holds the dolly at 7.3 cm if pinned manually)
    "demo512-sdf": dict(
        field_type="sdf",
        volume_resolution=(512, 512, 512),
        block_capacity=24576, integrate_budget=24576,
        raycast_normals="hybrid", icp_finest_decimate=2,
        raycast_scan_stride=1.0, raycast_grad_decim=2,
        incremental_view=True, raycast_full_res_scan=True,
        integration_rate=1, icp_symmetric=True,
    ),
    # 512^3 OFusion demo scale: the never-failed allocation gate
    # (on-demand 0.01), 32 fps @ 2.26 cm, room2 9.7 / alt 15.1 / jit 3.7
    # (bench_data/ate_icp_ofusion_512_hybrid_id2_ib6144_ss1_aod0.01_iv_nr_z4)
    "demo512-ofusion": dict(
        field_type="ofusion", mu=0.05,
        volume_resolution=(512, 512, 512),
        block_capacity=24576, integrate_budget=6144,
        raycast_normals="hybrid", icp_finest_decimate=2,
        raycast_scan_stride=1.0, incremental_view=True,
        alloc_on_demand=0.01, raycast_near_rescue=False,
        integration_rate=4,
    ),
    # 1024^3 (beyond the reference's shipped scales): OFusion quality +
    # the r5 frontier levers — 12.4 fps @ 2.97 cm base, 5.14 room2,
    # 6.46 jit, 92/96 everywhere, zero overflow (chains 37-38;
    # bench_data/ate_icp_ofusion_1024_id2_ib98304_ss1_aad16x0.3_iv_nr_z4).
    # The frame is descriptor-roofline-bound by the coarse raycast scan
    # (~71 of 119 ms at 7.4M descriptors — speed-of-light)
    "1024-quality": dict(
        field_type="ofusion", mu=0.05,
        volume_resolution=(1024, 1024, 1024),
        block_capacity=196608, integrate_budget=98304,
        raycast_normals="volume", raycast_near_rescue=False,
        icp_finest_decimate=2, raycast_scan_stride=1.0,
        incremental_view=True,
        alloc_adaptive_deg=16.0, alloc_adaptive_dist=0.3,
        integration_rate=4,
    ),
}


def apply_preset(name: str, cfg: Optional[Configuration] = None,
                 pinned=()) -> Configuration:
    """Return ``cfg`` (default-constructed if None) with the named
    preset's overrides applied.  ``pinned`` field names keep their
    current value (CLI frontends pass explicitly-set flags so a user can
    start from a preset and override single knobs)."""
    if name not in PRESETS:
        raise ValueError(
            f"unknown preset {name!r}; have {sorted(PRESETS)}")
    cfg = cfg if cfg is not None else Configuration()
    upd = {k: v for k, v in PRESETS[name].items() if k not in pinned}
    return dataclasses.replace(cfg, **upd)


#: The noise-validated stack (VERDICT r3 item 3): on the Kinect-noise
#: validation sequence the default SDF headline drifts to 23.4 cm while
#: this occupancy configuration measures 9.88 cm — beating the
#: reference's best noisy run (SDF CPU 11.18 cm) on both axes
#: (bench_data/ate_icp_ofusion_256_bf_noisy_nr_z4.json).  Log-odds
#: fusion rides sensor noise better than TSDF averaging, consistent
#: with the bfusion design intent (`bfusion/mapping_impl.hpp`).
NOISE_REGIME = dict(
    field_type="ofusion",
    raycast_normals="volume",
    integration_rate=4,
    raycast_near_rescue=False,
    mu=0.05,                    # the validated record's occupancy
                                # noiseFactor (not SDF's 0.1 band)
)


def apply_noise_regime(cfg: Configuration, pinned=()) -> Configuration:
    """Auto-select the noise stack when the bilateral filter — the
    noisy-sensor signal (`-F`, the flag the reference docs tie to real
    camera input) — is on.

    ``pinned`` lists Configuration field names the user set explicitly;
    those keep the user's value (passing ``field_type`` pins the whole
    stack: an explicit field choice means the user is past the default
    policy).  Returns ``cfg`` unchanged when bilateral is off.
    """
    if not cfg.bilateral_filter or "field_type" in pinned:
        return cfg
    upd = {k: v for k, v in NOISE_REGIME.items() if k not in pinned}
    return dataclasses.replace(cfg, **upd)
