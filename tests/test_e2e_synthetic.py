"""End-to-end VO on the synthetic injected-feature dataset: the full
pipeline (two-view init -> dust tracking -> local map tracking -> keyframe
creation -> triangulation -> fuse -> local BA -> culling) with a known
ground-truth trajectory, evaluated with the reference's Sim3-APE protocol."""

import numpy as np
import pytest

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.eval.ate import ate_sim3
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam.system import System
from sp_orb_slam_tpu.slam import tracking as tr


@pytest.fixture(scope="module")
def small_cfg():
    return _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })


def test_synthetic_vo_end_to_end(small_cfg):
    ds = SyntheticDataset(small_cfg, n_frames=50, n_points=5000, seed=6,
                          pixel_noise=0.3)
    sys_ = System(small_cfg)
    sys_.spin(ds)

    rep = sys_.report()
    assert rep["n_keyframes"] >= 10, rep
    # the depth filter + offline KF pacing deliberately insert fewer,
    # cleaner points than the round-1 fire-hose (which asserted >300)
    assert rep["n_points"] > 200, rep
    assert sys_.tracker.state == tr.OK, rep
    assert rep["n_lost"] == 0, rep

    ts_est, poses_est = sys_.trajectory()
    assert len(ts_est) > 30
    ts_gt, poses_gt = ds.gt_trajectory()
    res = ate_sim3(ts_est, poses_est[:, :3, 3], ts_gt, poses_gt[:, :3, 3])
    # Post-SE3-shear-fix (round 3, NOTES): the 10-seed rail scores ATE
    # mean 0.0076 / max 0.018 — the old 0.1-0.5 "chaotic" spread was the
    # shear defect compounding, not float32 reduction order.  0.1 gives
    # ~5x headroom over the measured envelope while still catching any
    # return of the defect (which scored 0.1-0.5).
    assert res.rmse < 0.1, res

    # trajectory files write and parse
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "traj.txt")
        sys_.save_trajectory_tum(p)
        data = np.loadtxt(p)
        assert data.shape[1] == 8
        sys_.save_keyframe_trajectory_tum(os.path.join(d, "kf.txt"))
        sys_.save_trajectory_kitti(os.path.join(d, "kitti.txt"))


def test_export_dataset_roundtrip(small_cfg, tmp_path):
    """ExportDataset (the reference Export-loader equivalent): synthetic
    frames saved to disk and replayed produce an identical pipeline run."""
    from sp_orb_slam_tpu.io.dataset import ExportDataset

    ds = SyntheticDataset(small_cfg, n_frames=8, n_points=4000, seed=6,
                          pixel_noise=0.3)
    root = str(tmp_path / "export")
    ts = []
    for i, raw in enumerate(ds):
        ExportDataset.save_frame(root, i, raw.injected, raw.global_desc)
        ts.append(raw.timestamp)
    import os

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "timestamps.txt"), "w") as f:
        f.write("\n".join(str(t) for t in ts))

    replay = ExportDataset(root)
    assert len(replay) == 8
    sys_a = System(small_cfg)
    sys_a.spin(ds, max_frames=8)
    sys_b = System(small_cfg)
    sys_b.spin(replay)
    ra, rb = sys_a.report(), sys_b.report()
    assert ra["n_keyframes"] == rb["n_keyframes"]
    assert ra["n_points"] == rb["n_points"]
