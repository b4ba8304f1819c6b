"""SLAM pipeline: preprocessing, ICP tracking, fusion, raycasting, rendering.

TPU-native rebuild of `se_denseslam/` (see SURVEY.md sections 2.2, 3).
"""

from .system import DenseSLAMSystem, FrameState, init_state, process_frame  # noqa: F401
