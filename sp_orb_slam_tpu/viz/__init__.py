"""Host-side visualization / debug rendering.

Equivalent capability to the reference viz layer (src/viz/viewer.cpp,
frame_drawer.cpp, map_drawer.cpp — a Pangolin window) as offline artifact
dumps: per-frame overlay PNGs with the dust-status coloring and map
snapshot renders.  Not on the metric path; enabled via System.debug_dir /
the --debug-dir CLI flag.
"""

from sp_orb_slam_tpu.viz.frame_drawer import draw_frame, save_png
from sp_orb_slam_tpu.viz.map_drawer import draw_map

__all__ = ["draw_frame", "draw_map", "save_png"]
