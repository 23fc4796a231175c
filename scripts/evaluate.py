#!/usr/bin/env python
"""Batch evaluation driver — the reference's evaluate_{euroc,tsukuba}_vo.sh
protocol (5 runs x N sequences, Sim3-APE mean/RMSE, failure counting) as one
command.

Examples:
    python scripts/evaluate.py --dataset synthetic --runs 5 --seqs 1,2,3
    python scripts/evaluate.py --dataset euroc --data-path /data/euroc \\
        --model-path weights.npz --runs 5
    python scripts/evaluate.py --dataset tsukuba --data-path /data/tsukuba \\
        --model-path weights.npz --seqs lamps --runs 5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic",
                    help="synthetic | rendered | euroc | tsukuba | export")
    ap.add_argument("--loop", action="store_true",
                    help="enable loop closing (computed place-recognition "
                         "descriptors; the rendered dress-rehearsal rail)")
    ap.add_argument("--data-path", default="")
    ap.add_argument("--model-path", default="",
                    help="SuperPoint weights (.npz); required for image datasets")
    ap.add_argument("--config", default="", help="YAML config overrides")
    ap.add_argument("--seqs", default="",
                    help="comma-separated; defaults to the full benchmark set "
                         "(11 EuRoC / 4 Tsukuba / seeds 1-3 synthetic)")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default="expr",
                    help="output dir for per-run trajectories + results.json")
    ap.add_argument("--online", action="store_true",
                    help="threaded-pipeline mode (the reference protocol runs "
                         "online; offline is the deterministic baseline)")
    args = ap.parse_args()

    from sp_orb_slam_tpu.config import Config, _merge_dataclass, load_config
    from sp_orb_slam_tpu.eval import batch

    if args.config:
        cfg = load_config(args.config)
    else:
        cfg = Config()
    overrides = {"dataset": args.dataset, "data_path": args.data_path,
                 "online": bool(args.online)}
    if args.loop:
        overrides["use_loop"] = True
        overrides["loop"] = {"use_loop": True, "global_desc_source": "vlad"}
    if args.dataset.startswith("tsukuba"):
        overrides["eval_failure_threshold"] = 100.0  # cm-scale GT
        overrides["camera"] = {"width": 640, "height": 480, "fx": 615.0,
                               "fy": 615.0, "cx": 320.0, "cy": 240.0}
    cfg = _merge_dataclass(cfg, overrides)

    if args.seqs:
        seqs = args.seqs.split(",")
    elif args.dataset.startswith("euroc"):
        seqs = batch.EUROC_SEQUENCES
    elif args.dataset.startswith("tsukuba"):
        seqs = batch.TSUKUBA_SEQUENCES
    else:
        seqs = ["1", "2", "3"]

    params = None
    if args.model_path:
        from sp_orb_slam_tpu.models import weights

        params = weights.load_checkpoint(args.model_path)
    elif not args.dataset.startswith(("synthetic", "export")):
        ap.error("--model-path required for image datasets")

    if args.dataset.startswith("rendered") and not args.seqs:
        # held-out rooms: superpoint_train.build_pool trains on texture
        # seeds 0-3, so the benchmark set must be disjoint or the frontend
        # is evaluated on its own training scenes
        seqs = ["4", "5", "6"]

    out = batch.evaluate(cfg, seqs, runs=args.runs, params=params,
                         out_dir=args.out, max_frames=args.max_frames)
    n_fail = sum(s["failures"] for s in out["sequences"].values())
    print(f"total failures: {n_fail} / {args.runs * len(seqs)} runs")


if __name__ == "__main__":
    main()
