"""KinectFusion-style truncated signed distance field (SDF).

Reference semantics: `se_denseslam/include/se/volume_traits.hpp:40-51`
(channels: tsdf value x, weight y; empty={1,-1}, init={1,0}),
`se_denseslam/src/kfusion/mapping_impl.hpp:35-65` (update rule), and
`se_denseslam/src/kfusion/rendering_impl.hpp:34-74` (raycast semantics).
Re-designed as batched jnp over struct-of-arrays channels.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from supereight_tpu.core.octree import ChannelSpec


@dataclasses.dataclass(frozen=True)
class SDFField:
    name: str = "sdf"
    mu: float = 0.1                 # truncation band (m)
    max_weight: float = 100.0       # weight cap (DenseSLAMSystem.cpp:235)

    #: channel marched / interpolated by the raycaster
    select_channel: str = "tsdf"
    #: SDF surfaces need the gradient negated (`rendering.cpp:80-82`)
    invert_normals: bool = True
    #: allocation is single-scale (blocks only)
    multiscale_alloc: bool = False

    @property
    def channels(self):
        return (
            ChannelSpec(name="tsdf", dtype=jnp.float32, init=1.0, empty=1.0),
            ChannelSpec(name="weight", dtype=jnp.float32, init=0.0, empty=-1.0),
        )

    def alloc_band(self) -> float:
        """Allocate a +/- mu band around the surface: band = 2*mu
        (`DenseSLAMSystem.cpp:219-223`)."""
        return 2.0 * self.mu

    def update(self, data: Dict[str, jnp.ndarray], pos_cam: jnp.ndarray,
               depth_sample: jnp.ndarray, valid: jnp.ndarray,
               timestamp) -> Dict[str, jnp.ndarray]:
        """Per-voxel projective TSDF update (`kfusion/mapping_impl.hpp:38-55`).

        ``pos_cam``[..., 3] camera-space voxel centres, ``depth_sample`` the
        depth image value at the projected pixel, ``valid`` gates voxels whose
        projection landed in-frame.  Pure: returns the new channel dict.
        """
        z = pos_cam[..., 2]
        zsafe = jnp.where(z == 0, 1.0, z)
        # scale depth difference to distance along the ray
        norm = jnp.sqrt(1.0 + (pos_cam[..., 0] / zsafe) ** 2
                        + (pos_cam[..., 1] / zsafe) ** 2)
        diff = (depth_sample - z) * norm
        do = valid & (depth_sample > 0) & (diff > -self.mu)

        sdf = jnp.minimum(1.0, diff / self.mu)
        w = data["weight"]
        tsdf = data["tsdf"]
        new_tsdf = jnp.clip((w * tsdf + sdf) / (w + 1.0), -1.0, 1.0)
        new_w = jnp.minimum(w + 1.0, self.max_weight)
        return {
            "tsdf": jnp.where(do, new_tsdf, tsdf),
            "weight": jnp.where(do, new_w, w),
        }

    # ----- raycast semantics (`kfusion/rendering_impl.hpp:34-74`) -----

    #: surface is the + -> - zero crossing of tsdf
    surf_boundary: float = 0.0

    def is_inside(self, f):
        return f < self.surf_boundary

    def sample_valid(self, data):
        """weight == 0 marks allocated-but-never-fused voxels, skipped at
        largestep (`rendering_impl.hpp:49-53`)."""
        return data["weight"] != 0
