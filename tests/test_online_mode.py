"""Online (threaded-pipeline) drive mode.

The reference's defining execution structure runs tracking and
LocalMapping::Run concurrently with a stop/accept/interruptBA protocol
(src/mapping/local_mapper.cpp:129-229, src/system.cpp:92-115).  These tests
drive the same synthetic rail as the offline e2e test but with
cfg.online=True: mapping lags tracking on its own thread, and the run must
still produce a comparable trajectory.
"""

import numpy as np
import pytest

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.eval.ate import ate_sim3
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam.system import System
from sp_orb_slam_tpu.slam import tracking as tr


@pytest.fixture(scope="module")
def online_cfg():
    return _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "online": True,
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })


def test_online_synthetic_vo(online_cfg):
    ds = SyntheticDataset(online_cfg, n_frames=50, n_points=5000, seed=6,
                          pixel_noise=0.3)
    sys_ = System(online_cfg)
    sys_.spin(ds)  # starts the mapping thread, joins it at the end

    assert sys_.mapper._thread is None  # shutdown joined the thread
    assert not sys_.mapper.queue       # fully drained

    rep = sys_.report()
    assert rep["n_keyframes"] >= 8, rep
    # mapping lags tracking online, so fewer points than offline's >300
    assert rep["n_points"] > 250, rep
    assert sys_.tracker.state == tr.OK, rep
    assert rep["n_lost"] == 0, rep

    ts_est, poses_est = sys_.trajectory()
    assert len(ts_est) > 30
    ts_gt, poses_gt = ds.gt_trajectory()
    res = ate_sim3(ts_est, poses_est[:, :3, 3], ts_gt, poses_gt[:, :3, 3])
    # evidence-based bound (round-3, post-SE3-shear-fix,
    # CPU_SWEEP_ONLINE_r3b): 10-seed online sweep ATE mean 0.0096 / max
    # 0.022 (offline: 0.0076 / 0.018 — threaded timing jitter is within
    # seed noise); 0.1 gives ~5x headroom for scheduler variance
    assert res.rmse < 0.1, res


def test_stop_accept_protocol():
    """RequestStop freezes the pipeline; Release resumes it
    (local_mapper.h:42-56)."""
    from sp_orb_slam_tpu.slam.kernels import TrackingKernels
    from sp_orb_slam_tpu.slam.local_mapping import LocalMapping
    from sp_orb_slam_tpu.slam.map import Map

    cfg = _merge_dataclass(Config(), {
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096},
    })
    mapper = LocalMapping(cfg, Map(), TrackingKernels(cfg))
    mapper.start()
    try:
        mapper.request_stop()
        assert mapper.wait_until_stopped(timeout=5.0)
        # queued keyframes are NOT consumed while stopped
        mapper.queue.append(12345)  # no such KF; _pop discards it when run
        import time

        time.sleep(0.05)
        assert 12345 in mapper.queue
        mapper.release()
        t0 = time.monotonic()
        while mapper.queue and time.monotonic() - t0 < 5.0:
            time.sleep(1e-3)
        assert not mapper.queue  # resumed and drained (bogus id discarded)
    finally:
        mapper._shutdown = True
        mapper._thread.join(timeout=10.0)
        mapper._thread = None


def test_interrupt_ba_flag():
    """InsertKeyFrame sets the BA-abort flag (local_mapper.cpp:231-235)."""
    from sp_orb_slam_tpu.slam.kernels import TrackingKernels
    from sp_orb_slam_tpu.slam.local_mapping import LocalMapping
    from sp_orb_slam_tpu.slam.map import Map

    cfg = _merge_dataclass(Config(), {
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096},
    })
    mapper = LocalMapping(cfg, Map(), TrackingKernels(cfg))
    mapper.abort_ba = False
    mapper.insert_keyframe(7)
    assert mapper.abort_ba
    assert list(mapper.queue) == [7]
