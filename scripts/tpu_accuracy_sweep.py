#!/usr/bin/env python
"""10-seed synthetic-rail accuracy sweep on a chosen backend (VERDICT r2 #1).

The north-star accuracy number is a TPU number, but through round 2 the
accuracy rail only ever passed on the CPU backend: the default TPU matmul
precision truncates the optimizer Hessian/Schur accumulations to bf16
(round-2 NOTES measured ATE 0.22-0.31 on TPU vs 0.17-0.21 on CPU for the
same rail).  Round 3 pins the whole solver path to HIGHEST f32
(utils/precision.py); this script is the acceptance gate: run it through
the axon TPU backend and through the forced-CPU backend and compare.

Usage:
    python scripts/tpu_accuracy_sweep.py                  # default backend
                                                          # (TPU under axon)
    JAX_PLATFORM_NAME=cpu python scripts/tpu_accuracy_sweep.py
    python scripts/tpu_accuracy_sweep.py --seeds 1,4 --frames 80

One process runs every seed so kernels compile once per shape (first TPU
compile over the tunnel costs minutes; subsequent seeds reuse).  Prints a
per-seed table plus one summary JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="1,2,3,4,5,6,7,8,9,10")
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--out", default="")
    ap.add_argument("--online", action="store_true",
                    help="threaded-pipeline mode (mapper + looper on their "
                         "own threads; the reference protocol's regime)")
    ap.add_argument("--no-warmup", dest="warmup", action="store_false",
                    help="skip the pre-run warmup (diagnostics only: the "
                         "DEFAULT warms every kernel variant once so "
                         "frame_ms_max measures the steady state — the r4 "
                         "sweep was captured cold and its 13.9-22.7 s "
                         "frame_ms_max rows were all first-hit compiles)")
    ap.set_defaults(warmup=True)
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    # Persistent compile cache only on CPU: loading TPU cache entries
    # written by a previous tunnel session reproducibly hangs the axon
    # client (verify skill, "TPU tunnel discipline"); CPU AOT entries are
    # also machine-specific, hence the backend-keyed directory.
    if backend == "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/root/repo/.jax_cache/cpu")
        except Exception:
            pass

    import numpy as np

    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.eval.ate import ate_sim3
    from sp_orb_slam_tpu.io.dataset import SyntheticDataset
    from sp_orb_slam_tpu.slam import tracking as tr
    from sp_orb_slam_tpu.slam.system import System

    # the round-2 NOTES rail: 80 frames, 250 features, small camera
    cfg = _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "online": bool(args.online),
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })

    from sp_orb_slam_tpu.slam.kernels import TrackingKernels

    # ONE kernel set shared across seeds: jit caches live on the
    # TrackingKernels closures, so per-seed instances would recompile
    # every program per seed (the other reason the r4 sweep rows carried
    # multi-second frame_ms_max) — warmed once, reused by every System
    kernels = TrackingKernels(cfg)
    rows = []
    warmed = False
    for seed in [int(s) for s in args.seeds.split(",") if s]:
        t0 = time.time()
        ds = SyntheticDataset(cfg, n_frames=args.frames, n_points=5000,
                              seed=seed, pixel_noise=0.3)
        sys_ = System(cfg, kernels=kernels)
        if args.warmup and not warmed:
            sys_.warmup()
            warmed = True
        sys_.spin(ds)
        rep = sys_.report()
        ts_est, poses_est = sys_.trajectory()
        ts_gt, poses_gt = ds.gt_trajectory()
        res = ate_sim3(ts_est, poses_est[:, :3, 3], ts_gt, poses_gt[:, :3, 3])
        acc = sys_.timer.tags.get("tracking/total")
        row = dict(seed=seed, ate_rmse=round(float(res.rmse), 4),
                   ate_mean=round(float(res.mean), 4),
                   n_lost=rep["n_lost"], n_kfs=rep["n_keyframes"],
                   min_fine_inliers=int(min(sys_.tracker.inlier_fine[5:],
                                            default=0)),
                   # the [5:] minimum lands in the early-map ramp (init map
                   # ~130-220 points; inliers grow monotonically as the map
                   # builds — round-5 NOTES); the mature-map minimum is the
                   # binding-health signal
                   min_fine_mature=int(min(sys_.tracker.inlier_fine[20:],
                                           default=0)),
                   ok=bool(sys_.tracker.state == tr.OK),
                   frame_ms_mean=(round(acc.total / acc.count * 1e3, 2)
                                  if acc and acc.count else None),
                   frame_ms_max=(round(acc.max * 1e3, 2)
                                 if acc and acc.count else None),
                   wall_s=round(time.time() - t0, 1))
        # post-warmup serving tail bound (VERDICT r4 weak #4): the worst
        # frame must stay within 4x the mean once compiles are out of the
        # run.  Only meaningful on warmed runs.
        if args.warmup and row["frame_ms_mean"]:
            row["tail_ok"] = bool(
                row["frame_ms_max"] < 4.0 * row["frame_ms_mean"])
        rows.append(row)
        print(f"  seed {seed:2d}: ATE {row['ate_rmse']:.3f} "
              f"lost={row['n_lost']} kfs={row['n_kfs']} "
              f"min_inl={row['min_fine_inliers']} ({row['wall_s']}s)",
              flush=True)

    ates = np.array([r["ate_rmse"] for r in rows])
    summary = dict(backend=backend, n_seeds=len(rows),
                   warmup=bool(args.warmup),
                   ate_rmse_mean=round(float(ates.mean()), 4),
                   ate_rmse_max=round(float(ates.max()), 4),
                   n_lost_total=int(sum(r["n_lost"] for r in rows)),
                   n_failed=int(sum(not r["ok"] for r in rows)),
                   n_tail_violations=int(sum(
                       not r.get("tail_ok", True) for r in rows)),
                   rows=rows)
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
