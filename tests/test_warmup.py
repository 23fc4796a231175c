"""Warmup precompilation coverage (VERDICT r3 weak #7).

The round-3 online sweeps measured frame_ms_max of 650-7900 ms — every
spike a first-hit compile of some kernel variant (wide window, reloc
rescue, batched fleet stage) landing mid-run.  warmup() must compile every
variant a serving run can hit ON ITS PRODUCTION CALL PATTERN: the
PackedInput adapters key compiled programs on the host/device argument
split and shapes, so these tests assert a full run after warmup() creates
NO new adapter variants.
"""

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam import tracking as tr
from sp_orb_slam_tpu.slam.system import System


def _cfg(**over):
    base = {
        "dataset": "synthetic",
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    }
    base.update(over)
    return _merge_dataclass(Config(), base)


def _variant_keys(k):
    out = {}
    for name in ("_dust", "_heat", "_fused", "_fused_wide", "_motion",
                 "_ref", "_reloc", "_local", "_local_wide", "_init",
                 "_tri", "_fuse", "_gather"):
        out[name] = set(getattr(k, name)._variants.keys())
    return out


def test_system_warmup_covers_full_run():
    cfg = _cfg()
    ds = SyntheticDataset(cfg, n_frames=40, n_points=5000, seed=6,
                          pixel_noise=0.3)
    sys_ = System(cfg)
    sys_.warmup()
    before = _variant_keys(sys_.kernels)
    sys_.spin(ds)
    after = _variant_keys(sys_.kernels)
    rep = sys_.report()
    assert sys_.tracker.state == tr.OK, rep
    new = {n: after[n] - before[n] for n in after if after[n] - before[n]}
    assert not new, f"variants compiled mid-run after warmup: {new}"


def test_fleet_warmup_covers_ticks():
    from sp_orb_slam_tpu.slam.fleet import StreamFleet

    cfg = _cfg()
    streams = [list(SyntheticDataset(cfg, n_frames=30, n_points=5000,
                                     seed=s, pixel_noise=0.3))
               for s in (3, 4)]
    fleet = StreamFleet(cfg, 2, params=None)
    fleet.warmup()
    before = _variant_keys(fleet.kernels)
    for k in range(30):
        fleet.tick([streams[0][k], streams[1][k]])
    fleet.shutdown()
    after = _variant_keys(fleet.kernels)
    for i, rep in enumerate(fleet.report()):
        assert fleet.systems[i].tracker.state == tr.OK, (i, rep)
    new = {n: after[n] - before[n] for n in after if after[n] - before[n]}
    assert not new, f"variants compiled mid-tick after warmup: {new}"
