"""Voxel field types (the ``voxel_traits`` axis of the reference).

Reference: `se_denseslam/include/se/volume_traits.hpp:41-81` — SDF (TSDF
value + weight) and OFusion (log-odds occupancy + timestamp).  Here a field
type is a plain object bundling the channel specs with its update / raycast
semantics; the octree and pipeline are generic over it.
"""

from .sdf import SDFField  # noqa: F401
from .ofusion import OFusionField  # noqa: F401

FIELDS = {"sdf": SDFField, "ofusion": OFusionField}


def make_field(name: str, **kw):
    return FIELDS[name](**kw)
