"""Loop closing must survive a system reset (VERDICT r2 #6).

Before round 3, `Map.clear()` re-ran `__init__` and nulled the
System-installed `global_desc_fn`, so every post-reset keyframe was born
without a global descriptor and loop closing went silently dead.  This
test resets a live System, then drives a full drifted-loop scenario
through ITS map/looper and requires the loop to actually close."""

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.slam.system import System
from tests.test_loop_closing import build_drifted_loop_map


def test_loop_closes_after_system_reset():
    cfg = _merge_dataclass(Config(), {
        "dataset": "synthetic", "use_loop": True,
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "loop": {"use_loop": True},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })
    s = System(cfg)
    # simulate some pre-reset life, then reset the whole system
    s.reset()
    # the place-recognition hook must have survived the reset
    assert s.map.global_desc_fn is not None

    # post-reset: a fresh drifted loop must still be detected and corrected
    ds, kfs = build_drifted_loop_map(cfg, s.map)
    for kf in kfs:
        s.looper.insert_keyframe(kf.kf_id)
        s.looper.spin_once()
    assert s.looper.n_loops_closed >= 1
