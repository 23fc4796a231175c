"""Degenerate-motion (turn-apex, near-zero baseline) replay.

Measures Sim3-APE of the full VO pipeline on the `_degenerate_trajectory`
synthetic sequence, for a sweep of seeds, with the depth filter on/off.
This is the measurement harness behind tests/test_depth_filter.py and the
mono-drift work item (reference context: src/cv/depth_filter.cpp:35-60,
vestigial SVO-style seeds the reference never wired up).

Usage: python scripts/replay_degenerate.py [--seeds 0 1 2] [--df on|off|both]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sp_orb_slam_tpu.config import Config, _merge_dataclass  # noqa: E402
from sp_orb_slam_tpu.eval.ate import ate_sim3  # noqa: E402
from sp_orb_slam_tpu.io.dataset import SyntheticDataset  # noqa: E402
from sp_orb_slam_tpu.slam.system import System  # noqa: E402


def run_one(seed: int, depth_filter: bool, n_frames: int = 80,
            df_overrides: dict = None):
    cfg = _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "mapping": {"depth_filter": {"enabled": depth_filter,
                                     **(df_overrides or {})}},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })
    ds = SyntheticDataset(cfg, n_frames=n_frames, n_points=5000, seed=seed,
                          pixel_noise=0.3, trajectory="degenerate")
    sys_ = System(cfg)
    sys_.spin(ds)
    rep = sys_.report()
    ts_est, poses_est = sys_.trajectory()
    ts_gt, poses_gt = ds.gt_trajectory()
    if len(ts_est) < 10:
        return dict(seed=seed, df=depth_filter, rmse=float("inf"),
                    n_lost=rep["n_lost"], n_kf=rep["n_keyframes"],
                    n_pts=rep["n_points"], n_est=len(ts_est))
    res = ate_sim3(ts_est, poses_est[:, :3, 3], ts_gt, poses_gt[:, :3, 3])
    out = dict(seed=seed, df=depth_filter, rmse=float(res.rmse),
               n_lost=rep["n_lost"], n_kf=rep["n_keyframes"],
               n_pts=rep["n_points"], n_est=len(ts_est))
    f = sys_.mapper.depth_filter
    if f is not None:
        out.update(seeded=f.n_seeded, promoted=f.n_promoted,
                   expired=f.n_expired, updates=f.n_updates,
                   rescued=f.n_rescued)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    ap.add_argument("--df", choices=["on", "off", "both"], default="both")
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--rel", type=float, default=None,
                    help="override max_rel_sigma")
    ap.add_argument("--div", type=float, default=None,
                    help="override convergence_div")
    ap.add_argument("--floor", type=int, default=None,
                    help="override min_direct_inserts")
    args = ap.parse_args()
    ov = {}
    if args.rel is not None:
        ov["max_rel_sigma"] = args.rel
    if args.div is not None:
        ov["convergence_div"] = args.div
    if args.floor is not None:
        ov["min_direct_inserts"] = args.floor
    modes = {"on": [True], "off": [False], "both": [False, True]}[args.df]
    for df in modes:
        rmses = []
        for seed in args.seeds:
            r = run_one(seed, df, args.frames, ov)
            rmses.append(r["rmse"])
            extra = (f" seeded={r['seeded']} prom={r['promoted']} "
                     f"exp={r['expired']} upd={r['updates']} "
                     f"resc={r['rescued']}" if "seeded" in r else "")
            print(f"df={'on ' if df else 'off'} seed={seed} "
                  f"rmse={r['rmse']:.4f} lost={r['n_lost']} kf={r['n_kf']} "
                  f"pts={r['n_pts']} est={r['n_est']}{extra}", flush=True)
        ok = [x for x in rmses if np.isfinite(x)]
        print(f"df={'on ' if df else 'off'} mean_rmse="
              f"{np.mean(ok) if ok else float('inf'):.4f} "
              f"fail={len(rmses) - len(ok)}/{len(rmses)}", flush=True)


if __name__ == "__main__":
    main()
