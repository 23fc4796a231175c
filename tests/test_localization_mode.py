"""Localization (tracking-only) mode + the single-shot `run` API.

Reference semantics (system.cpp:202-233): `System::run` applies pending
b_local_on/b_local_off/b_system_reset toggles before tracking the frame;
ActivateLocalizationMode stops the mapper (freezing the map — KF creation
is gated on the stopped mapper, tracker.cpp:619) and calls
InformOnlyTracking(true), which relaxes the inlier counting in
TrackLocalMap (tracker.cpp:580-585).
"""

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam import tracking as tr
from sp_orb_slam_tpu.slam.system import System


def test_localization_mode_freezes_map_and_tracks():
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
    ds = SyntheticDataset(cfg, n_frames=60, n_points=5000, seed=6,
                          pixel_noise=0.3)
    frames = list(ds)
    sys_ = System(cfg)

    # phase 1: build a map normally
    for raw in frames[:35]:
        sys_.process(raw)
    assert sys_.tracker.state == tr.OK
    kfs_before = sys_.map.n_keyframes()
    pts_before = sys_.map.n_points()
    assert kfs_before >= 5

    # phase 2: localization mode — map must freeze, tracking must continue
    sys_.activate_localization_mode()
    poses = []
    for raw in frames[35:50]:
        Tcw = sys_.run(raw)
        poses.append(Tcw)
    assert sys_.tracker.only_tracking
    assert sys_.mapper.stopped
    assert sys_.tracker.state == tr.OK, sys_.tracker.last_fail
    assert sys_.map.n_keyframes() == kfs_before  # no new KFs
    assert sys_.map.n_points() == pts_before     # no new points
    assert all(p is not None for p in poses)
    # poses keep moving (tracking, not stuck)
    deltas = [np.linalg.norm(np.linalg.inv(a)[:3, 3] - np.linalg.inv(b)[:3, 3])
              for a, b in zip(poses, poses[1:])]
    assert max(deltas) > 1e-4

    # phase 3: deactivate — mapping resumes, KFs grow again
    sys_.deactivate_localization_mode()
    for raw in frames[50:]:
        sys_.run(raw)
    assert not sys_.tracker.only_tracking
    assert not sys_.mapper.stopped
    assert sys_.tracker.state == tr.OK
    assert sys_.map.n_keyframes() > kfs_before


def test_pause_step_gate():
    """The spin pause/step gate processes exactly one frame per step."""
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
    ds = SyntheticDataset(cfg, n_frames=6, n_points=3000, seed=1)
    frames = list(ds)
    sys_ = System(cfg)
    sys_.paused = True

    import threading

    done = threading.Event()

    def drive():
        sys_.spin(frames)
        done.set()

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    import time

    for expect in range(1, len(frames) + 1):
        sys_.step_once = True
        deadline = time.time() + 30.0
        while sys_.frame_id < expect and time.time() < deadline:
            time.sleep(1e-3)
        assert sys_.frame_id == expect
    sys_.paused = False
    done.wait(10.0)
    assert done.is_set()
    t.join(5.0)
