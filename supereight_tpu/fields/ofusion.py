"""Bayesian occupancy fusion (OFusion): log-odds field with time decay.

Reference semantics: `se_denseslam/include/se/volume_traits.hpp:58-81`
(channels: log-odds x, timestamp y; empty=init={0,0}; SURF_BOUNDARY=0,
clamps +/-1000, window DELTA_T=1, CAPITAL_T=4) and
`se_denseslam/src/bfusion/mapping_impl.hpp:94-191` (truncated-bspline inverse
sensor model, log-odds accumulation, decay window).

The reference memoizes the bspline CDF in a lookup table
(`bspline_lookup.cc`); on TPU the closed form is a handful of fused VPU ops,
cheaper than a gather, so we evaluate it directly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from supereight_tpu.core.octree import ChannelSpec

DELTA_T = 1.0
CAPITAL_T = 4.0
SURF_BOUNDARY = 0.0
TOP_CLAMP = 1000.0
BOTTOM_CLAMP = -1000.0


def bspline_cdf(t):
    """Integral of the cubic bspline sensor kernel (`mapping_impl.hpp:94-106`):
    0 below -3, 1 above 3, piecewise cubic between."""
    t = jnp.asarray(t, jnp.float32)
    v1 = (3.0 + t) ** 3 / 48.0                       # [-3, -1]
    v2 = 0.5 + (t * (3.0 + t) * (3.0 - t)) / 24.0    # (-1, 1]
    v3 = 1.0 - (3.0 - t) ** 3 / 48.0                 # (1, 3]
    out = jnp.where(t <= -3.0, 0.0,
          jnp.where(t <= -1.0, v1,
          jnp.where(t <= 1.0, v2,
          jnp.where(t <= 3.0, v3, 1.0))))
    return out


def h_occupancy(val):
    """Inverse sensor model H (`mapping_impl.hpp:108-112,139-143`):
    P(occupied | distance-behind-surface val, in sigmas)."""
    return bspline_cdf(val) - 0.5 * bspline_cdf(val - 3.0)


@dataclasses.dataclass(frozen=True)
class OFusionField:
    name: str = "ofusion"
    mu: float = 0.008                # noiseFactor (Makefile:42 demo: 0.008)
    voxel_size: float = 0.01875      # set by the pipeline at construction
    #: TPU extension: lower bound on the sensor-model sigma DECOUPLED
    #: from voxel size.  The reference floor is 2*voxel_size
    #: (`mapping_impl.hpp:163`), which halves at every resolution
    #: doubling — at 512^3 (9.4 mm voxels) single-voxel sensor noise
    #: flips log-odds signs and occupancy ICP loses every frame on the
    #: Kinect-noise sequence (bench_data, r4).  0.0 = reference
    #: semantics; ~0.0375 restores the 256^3 floor at finer grids.
    sigma_floor: float = 0.0

    select_channel: str = "occupancy"
    invert_normals: bool = False
    multiscale_alloc: bool = True

    @property
    def channels(self):
        return (
            ChannelSpec(name="occupancy", dtype=jnp.float32, init=0.0, empty=0.0),
            # f32 frame timestamp instead of the reference's double
            # (`volume_traits.hpp:66-69`); see SURVEY.md section 7 hard part (e).
            ChannelSpec(name="timestamp", dtype=jnp.float32, init=0.0, empty=0.0),
        )

    def alloc_band(self) -> float:
        """band = 6*mu (`DenseSLAMSystem.cpp:228`)."""
        return 6.0 * self.mu

    def update(self, data: Dict[str, jnp.ndarray], pos_cam: jnp.ndarray,
               depth_sample: jnp.ndarray, valid: jnp.ndarray,
               timestamp) -> Dict[str, jnp.ndarray]:
        """Per-voxel log-odds update (`bfusion/mapping_impl.hpp:157-180`)."""
        z = pos_cam[..., 2]
        zsafe = jnp.where(z == 0, 1.0, z)
        norm = jnp.sqrt(1.0 + (pos_cam[..., 0] / zsafe) ** 2
                        + (pos_cam[..., 1] / zsafe) ** 2)
        diff = (z - depth_sample) * norm
        # reference clamp is max(lo, min(v, hi)) (`math_utils.h:101-103`):
        # when 2*voxel_size > 0.05 (coarse maps) the LOWER bound wins,
        # unlike jnp.clip — mirror it exactly
        sigma = jnp.maximum(max(2.0 * self.voxel_size, self.sigma_floor),
                            jnp.minimum(self.mu * z * z, 0.05))
        sample = h_occupancy(diff / sigma)
        do = valid & (depth_sample > 0) & (sample != 0.5)
        sample = jnp.clip(sample, 0.03, 0.97)

        occ = data["occupancy"]
        ts = data["timestamp"]
        delta_t = timestamp - ts
        frac = jnp.maximum(0.5, 1.0 / (1.0 + delta_t / CAPITAL_T))
        decayed = occ * frac
        new_occ = jnp.clip(decayed + jnp.log2(sample / (1.0 - sample)),
                           BOTTOM_CLAMP, TOP_CLAMP)
        return {
            "occupancy": jnp.where(do, new_occ, occ),
            "timestamp": jnp.where(do, jnp.asarray(timestamp, jnp.float32), ts),
        }

    # ----- raycast semantics (`bfusion/rendering_impl.hpp:35-68`) -----

    surf_boundary: float = SURF_BOUNDARY

    def is_inside(self, f):
        return f > self.surf_boundary

    def sample_valid(self, data):
        """Only voxels actually fused (timestamp > 0) and not free-locked
        contribute (`bfusion/rendering_impl.hpp:52`)."""
        return (data["occupancy"] > -100.0) & (data["timestamp"] > 0.0)


def compute_stepsize(dist_travelled, hf_band, voxel_size):
    """Distance-adaptive allocation step (`bfusion/alloc_impl.hpp:37-45`):
    1 voxel inside the band, 10 voxels just outside, 30 voxels far out."""
    return jnp.where(dist_travelled < hf_band, voxel_size,
           jnp.where(dist_travelled < hf_band * 1.5, 10.0 * voxel_size,
                     30.0 * voxel_size))


def step_to_depth(step, max_depth, voxel_size):
    """Octree level for an allocation step (`bfusion/alloc_impl.hpp:48-51`)."""
    return jnp.floor(jnp.log2(voxel_size / step)).astype(jnp.int32) + max_depth
