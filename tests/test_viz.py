"""Observability layer: debug-artifact rendering (viz/*, the offline
equivalent of the reference's Pangolin viewer) and the hierarchical timing
table (utils/timing.py; reference utils/timing.h:114-177)."""

import os

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam.system import System


def test_debug_artifacts(tmp_path):
    cfg = _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })
    ds = SyntheticDataset(cfg, n_frames=25, n_points=5000, seed=6,
                          pixel_noise=0.3)
    sys_ = System(cfg)
    sys_.set_debug_dir(str(tmp_path))
    sys_.spin(ds)

    frames = sorted(os.listdir(tmp_path / "frames"))
    maps = sorted(os.listdir(tmp_path / "map"))
    assert len(frames) == 25
    assert len(maps) >= 1

    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "frames" / frames[-1]))
    assert img.shape == (240, 320, 3)
    assert img.max() > 0  # something was drawn
    mp_img = np.asarray(Image.open(tmp_path / "map" / maps[-1]))
    assert mp_img.ndim == 3 and mp_img.shape[0] > 100

    # dust-status colors appear once tracking is established (yellow
    # not-in-view / red unmatched / green matched boxes)
    colored = (np.abs(img.astype(int) - img.mean(-1, keepdims=True))
               .max(-1) > 40)
    assert colored.sum() > 50


def test_timing_table():
    from sp_orb_slam_tpu.utils.timing import Timer

    t = Timer()
    for dt in (0.01, 0.02, 0.03):
        t.add("tracking/frame", dt)
    t.add("mapping", 0.5)
    tbl = t.table()
    assert "frame" in tbl and "mapping" in tbl
    assert "+-" in tbl  # sigma column present
    # min/max of tracking/frame in ms
    line = [ln for ln in tbl.splitlines() if "frame" in ln][0]
    assert "10.00" in line and "30.00" in line
