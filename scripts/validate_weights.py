#!/usr/bin/env python
"""Validate a trained SuperPoint checkpoint on the rendered image rail.

The reference assumes trained-SuperPoint descriptor statistics: its matcher
gates (TH_LOW=0.3 / TH_HIGH=0.7, sp_matcher.cpp:18-19) and the dust
association threshold (0.75) are absolute L2 distances between unit
descriptors.  Random weights collapse descriptors into a ~0.2-diameter
cluster (NOTES round 4), putting every gate in its always-pass regime.
This script measures whether a checkpoint restores the calibrated regime:

  - extract two rendered frames (exact ray-cast GT from io/render.py)
  - ground-truth keypoint correspondences by raycast->project (<2 px)
  - report matched/random descriptor L2 distributions, the fraction of GT
    pairs under TH_LOW / TH_HIGH, and search_for_initialization precision
    against geometry (a match is "correct" when it lands within 3 px of
    the GT reprojection)

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/validate_weights.py --weights out/sp_rendered.npz
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def project(Twc, K, X):
    """World points (N, 3) -> pixel uv (N, 2), z>0 mask, via Tcw = inv(Twc)."""
    R = Twc[:3, :3]
    t = Twc[:3, 3]
    Xc = (X - t[None, :]) @ R  # R^T (X - t)
    z = Xc[:, 2]
    u = K[0] * Xc[:, 0] / z + K[2]
    v = K[1] * Xc[:, 1] / z + K[3]
    return np.stack([u, v], -1), z > 0.1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="out/sp_rendered.npz")
    ap.add_argument("--frames", default="0,2",
                    help="two frame indices of the rendered loop sequence")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.io.render import RenderedDataset
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.models.weights import load_checkpoint
    from sp_orb_slam_tpu.ops import matching

    cfg = Config()
    ds = RenderedDataset(cfg, seed=args.seed, noise_seed=0)
    ia, ib = (int(x) for x in args.frames.split(","))
    fa, fb = ds.frame(ia), ds.frame(ib)

    if args.weights == "random":
        params = superpoint.init_params(jax.random.PRNGKey(0))
    else:
        params = load_checkpoint(args.weights)

    images = jnp.asarray(
        np.stack([fa.image, fb.image]).astype(np.float32) / 255.0)
    feats = extract(params, images,
                    num_features=cfg.tracking.num_features,
                    max_keypoints=cfg.runtime.max_keypoints,
                    conf_thresh=cfg.extractor.conf_thresh,
                    nms_dist=cfg.extractor.nms_dist,
                    border=cfg.extractor.border,
                    nms_iters=cfg.extractor.nms_iters,
                    cov_radius=cfg.extractor.cov_window,
                    cov_iters=cfg.extractor.cov_iters)
    uv = np.asarray(feats.uv)
    desc = np.asarray(feats.desc)
    valid = np.asarray(feats.valid)
    na, nb = int(valid[0].sum()), int(valid[1].sum())

    # GT correspondences: raycast A's keypoints, project into B, pair with
    # the nearest B keypoint under 2 px
    X, hit = ds.raycast(fa.gt_pose, uv[0][valid[0]])
    uvb_gt, infront = project(fb.gt_pose, ds.K, X)
    d2 = np.linalg.norm(uvb_gt[:, None, :] - uv[1][valid[1]][None, :, :],
                        axis=-1)
    jbest = d2.argmin(1)
    dbest = d2.min(1)
    gt_ok = hit & infront & (dbest < 2.0)
    da = desc[0][valid[0]][gt_ok]
    db = desc[1][valid[1]][jbest[gt_ok]]
    matched = np.linalg.norm(da - db, axis=-1)

    rng = np.random.default_rng(0)
    ra = desc[0][valid[0]][rng.integers(0, na, 4000)]
    rb = desc[1][valid[1]][rng.integers(0, nb, 4000)]
    random_d = np.linalg.norm(ra - rb, axis=-1)

    # matcher precision against geometry
    m = matching.search_for_initialization(
        feats.desc[0], feats.valid[0], feats.uv[0],
        feats.desc[1], feats.uv[1], feats.valid[1], window=100, ratio=0.9)
    midx = np.asarray(m.match12)  # per-A-keypoint B index or -1
    sel = midx >= 0
    Xall, hitall = ds.raycast(fa.gt_pose, uv[0])
    uvb_all, infront_all = project(fb.gt_pose, ds.K, Xall)
    reproj_err = np.linalg.norm(uvb_all - uv[1][np.maximum(midx, 0)], axis=-1)
    correct = sel & hitall & infront_all & (reproj_err < 3.0)

    q = lambda a: [round(float(np.quantile(a, p)), 4)
                   for p in (0.1, 0.5, 0.9)] if len(a) else None
    out = {
        "weights": args.weights,
        "n_kp": [na, nb],
        "n_gt_pairs": int(gt_ok.sum()),
        "matched_l2_p10_p50_p90": q(matched),
        "random_l2_p10_p50_p90": q(random_d),
        "separation_p50": (round(float(np.median(random_d)
                                       / max(np.median(matched), 1e-9)), 2)
                           if len(matched) else None),
        "gt_under_TH_LOW": round(float((matched <= 0.3).mean()), 3)
                           if len(matched) else None,
        "gt_under_TH_HIGH": round(float((matched <= 0.7).mean()), 3)
                            if len(matched) else None,
        "random_under_TH_HIGH": round(float((random_d <= 0.7).mean()), 3),
        "init_matches": int(sel.sum()),
        "init_precision": round(float(correct.sum() / max(sel.sum(), 1)), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
