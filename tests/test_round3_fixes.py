"""Regression tests for the round-3 correctness fixes (round-2 VERDICT item
6 + ADVICE findings): reset-surviving hooks, single-shot API validity, and
mid-stream loader fallback indexing."""

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.slam.map import Map


def _cfg():
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


def test_map_clear_preserves_global_desc_fn():
    """A mid-run reset must not silently disable in-process place
    recognition: Map.clear() re-runs __init__, which used to null out the
    System-installed global_desc_fn (VERDICT r2 weak #4)."""
    world = Map(64)
    calls = []

    def fn(frame):
        calls.append(frame)
        return np.ones(8, np.float32)

    world.global_desc_fn = fn
    world.clear()
    assert world.global_desc_fn is fn


def test_system_run_returns_none_when_lost():
    """System.run must signal tracking failure: after a LOST frame,
    last_frame.Tcw holds a failed stage's predicted pose and must not be
    returned as if tracked (ADVICE r2)."""
    from sp_orb_slam_tpu.slam import tracking as tr
    from sp_orb_slam_tpu.slam.frame import FrameData
    from sp_orb_slam_tpu.slam.system import RawFrame, System

    cfg = _cfg()
    s = System(cfg)

    class _StubTracker:
        state = tr.LOST
        last_frame = None
        request_reset = False

    lf = object.__new__(FrameData)
    lf.Tcw = np.eye(4, dtype=np.float32)
    stub = _StubTracker()
    stub.last_frame = lf
    s.tracker = stub
    s.process = lambda raw: None  # pose comes from the stubbed tracker
    assert s.run(RawFrame(timestamp=0.0, image=None)) is None
    stub.state = tr.OK
    out = s.run(RawFrame(timestamp=0.0, image=None))
    assert out is not None and np.allclose(out, np.eye(4))


def test_iter_gray_images_resumes_after_midstream_failure(monkeypatch, tmp_path):
    """A decode failure after k native frames must resume the PIL fallback
    at index k, not restart from 0 (consumers zip with timestamps; a restart
    pairs every later timestamp with the wrong image) (ADVICE r2)."""
    from PIL import Image

    from sp_orb_slam_tpu.io import native_loader

    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.png"
        Image.fromarray(np.full((4, 4), i, np.uint8)).save(p)
        paths.append(str(p))

    class _FailsAfterTwo:
        def __init__(self, paths, *a, **k):
            self._n = 0

        def __iter__(self):
            return self

        def __next__(self):
            if self._n >= 2:
                raise IOError("corrupt frame")
            img = np.full((4, 4), self._n, np.uint8)
            self._n += 1
            return img

    monkeypatch.setattr(native_loader, "available", lambda: True)
    monkeypatch.setattr(native_loader, "PngPrefetcher", _FailsAfterTwo)
    got = [int(img[0, 0]) for img in native_loader.iter_gray_images(paths)]
    assert got == [0, 1, 2, 3, 4], got
