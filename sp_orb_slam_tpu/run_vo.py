"""CLI entrypoint — the `mono_node` equivalent (node/mono_node.cc:23-40).

Usage:
    python -m sp_orb_slam_tpu.run_vo --config cfg.yaml --data-path ... \
        --seq MH_05_difficult [--weights superpoint.pt] [--max-frames N]
    python -m sp_orb_slam_tpu.run_vo --dataset synthetic [--loop]

Runs the full VO/SLAM pipeline over the dataset, writes traj.txt / kf.txt
(TUM format, like system.cpp:197-198), prints the tracking report and — when
ground truth is available — the Sim3-APE evaluation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="TPU-native learned VO/SLAM")
    ap.add_argument("--config", help="YAML config (reference cfg/*.yaml schema)")
    ap.add_argument("--dataset", default=None,
                    help="euroc | tsukuba | synthetic (overrides config)")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--seq", default=None)
    ap.add_argument("--weights", default=None,
                    help="SuperPoint checkpoint (.pt/.pth/.npz); random "
                         "weights if omitted (only sensible for --dataset "
                         "synthetic, which injects features)")
    ap.add_argument("--output", default=None,
                    help="trajectory output dir (default: config "
                         "output_path, the reference's common/output_path)")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--loop", action="store_true", help="enable loop closing")
    ap.add_argument("--synthetic-frames", type=int, default=120)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--debug-dir", default=None,
                    help="write per-frame overlay PNGs + map snapshots "
                         "(the offline viewer equivalent)")
    ap.add_argument("--live-port", type=int, default=None,
                    help="serve the live viewer (frame overlay, map, "
                         "pause/step/reset/localization controls) on this "
                         "HTTP port; 0 picks a free port")
    ap.add_argument("--save-map", default=None, metavar="PATH",
                    help="persist the built map (slam/serialize.py) after "
                         "the run")
    ap.add_argument("--load-map", default=None, metavar="PATH",
                    help="start from a saved map (cold-start "
                         "relocalization instead of two-view init)")
    ap.add_argument("--localization", action="store_true",
                    help="tracking-only mode (freeze the map; typically "
                         "with --load-map)")
    args = ap.parse_args(argv)

    from sp_orb_slam_tpu.config import load_config

    overrides = {}
    for key, val in (("dataset", args.dataset), ("data_path", args.data_path),
                     ("seq", args.seq), ("verbose", args.verbose or None)):
        if val is not None:
            overrides[key] = val
    if args.loop:
        overrides["use_loop"] = True
    cfg = load_config(args.config, overrides)
    if args.output is None:
        args.output = cfg.output_path

    params = None
    weights = args.weights or cfg.model_path  # CLI overrides the YAML's
    #                                           model_path (sp_params.cpp
    #                                           reads it from config)
    if weights:
        from sp_orb_slam_tpu.models.weights import load_checkpoint

        params = load_checkpoint(weights)
    elif cfg.dataset != "synthetic":
        import jax

        from sp_orb_slam_tpu.models.superpoint import init_params

        print("WARNING: no --weights given; using random frontend weights",
              file=sys.stderr)
        params = init_params(jax.random.PRNGKey(0))

    from sp_orb_slam_tpu.io.dataset import SyntheticDataset, make_dataset
    from sp_orb_slam_tpu.slam.system import System

    if cfg.dataset == "synthetic":
        dataset = SyntheticDataset(cfg, n_frames=args.synthetic_frames,
                                   loop=args.loop)
    else:
        dataset = make_dataset(cfg)

    system = System(cfg, params=params)
    if args.load_map:
        system.load_map(args.load_map)
    if args.localization:
        system.activate_localization_mode()
    if args.debug_dir:
        system.set_debug_dir(args.debug_dir)
    viewer = None
    if args.live_port is not None:
        from sp_orb_slam_tpu.viz.live import LiveViewer

        viewer = LiveViewer(system, port=args.live_port)
        print(f"live viewer: {viewer.url}", file=sys.stderr)
    system.spin(dataset, max_frames=args.max_frames)
    if viewer is not None:
        viewer.close()
    if args.save_map:
        parent = os.path.dirname(os.path.abspath(args.save_map))
        os.makedirs(parent, exist_ok=True)
        system.save_map(args.save_map)

    os.makedirs(args.output, exist_ok=True)
    system.save_trajectory_tum(os.path.join(args.output, "traj.txt"))
    system.save_keyframe_trajectory_tum(os.path.join(args.output, "kf.txt"))

    report = system.report()
    if system.looper is not None:
        report["n_loops_closed"] = system.looper.n_loops_closed
    if hasattr(dataset, "gt_trajectory"):
        from sp_orb_slam_tpu.eval.ate import ate_sim3

        ts_gt, poses_gt = dataset.gt_trajectory()
        ts_est, poses_est = system.trajectory()
        if len(ts_est) >= 3:
            res = ate_sim3(ts_est, poses_est[:, :3, 3], ts_gt,
                           poses_gt[:, :3, 3])
            report["ate_rmse"] = res.rmse
            report["ate_mean"] = res.mean
    print(json.dumps(report, default=float))
    print(system.timer.table(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
