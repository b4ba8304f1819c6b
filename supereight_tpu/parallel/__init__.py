"""Multi-device scale-out: map-space sharding + collectives.

See SURVEY.md section 7 step 8.  The reference has no distributed layer
(OpenMP only, section 2.4); this is the TPU-native extension.
"""

from .sharding import (MAP_AXIS, make_mesh, map_sharding, shard_state)  # noqa: F401
from .tracking_dist import sharded_reduce, track_step_sharded  # noqa: F401
from .allocation_dist import sharded_sdf_wanted_mask  # noqa: F401
from .frame_dist import frame_sharding, make_process_frame_sharded  # noqa: F401
