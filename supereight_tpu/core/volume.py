"""Continuous metric-space view over the voxel map.

Reference: `se_denseslam/include/se/continuous/volume_template.hpp:49-115`
(``VolumeTemplate``): pos<->voxel scaling for get / interp / grad, the
interface the raycast and rendering kernels consume.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import octree
from .octree import VoxelMap


class Volume:
    """Metric-space adapter: positions in meters, data from the map."""

    def __init__(self, m: VoxelMap, select_channel: str):
        self.map = m
        self.channel = select_channel

    @property
    def dim(self) -> float:
        return self.map.dim

    @property
    def size(self) -> int:
        return self.map.size

    def _scale(self, pos):
        return jnp.asarray(pos) * self.map.inverse_voxel_size

    def get(self, pos, channel=None):
        """Nearest-voxel value at metric pos [..., 3]
        (``VolumeTemplate::get`` -> get_fine, `volume_template.hpp:77-84`)."""
        v = self._scale(pos).astype(jnp.int32)
        return octree.get(self.map, channel or self.channel,
                          v[..., 0], v[..., 1], v[..., 2])

    def get_multiscale(self, pos, channel=None):
        """Deepest-allocated-octant value (``operator[]`` -> Octree::get)."""
        v = self._scale(pos).astype(jnp.int32)
        return octree.get_multiscale(self.map, channel or self.channel,
                                     v[..., 0], v[..., 1], v[..., 2])

    def interp(self, pos, channel=None):
        """Trilinear interpolation at metric pos
        (`volume_template.hpp:88-93`)."""
        return octree.interp(self.map, channel or self.channel,
                             self._scale(pos))

    def interp_multiscale(self, pos, channel=None):
        """Trilinear interpolation whose corners fall back to the deepest
        allocated node value where leaf blocks are missing — the
        reference's interp gather through coarse octants
        (`interpolation/interp_gather.hpp:105-237`); the right interp for
        multiscale (occupancy) maps whose unallocated space carries node
        values."""
        return octree.interp_multiscale(self.map, channel or self.channel,
                                        self._scale(pos))

    def grad(self, pos, channel=None):
        """Field gradient at metric pos (`volume_template.hpp:95-101`)."""
        return octree.grad(self.map, channel or self.channel,
                           self._scale(pos))
