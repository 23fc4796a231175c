#!/usr/bin/env python
"""Place-recognition statistics of the in-process VLAD on the rendered rail.

Drives the REAL image path: rendered frames -> trained SuperPoint ->
netvlad.global_descriptor, then reports the similarity structure the loop
detector consumes (loop_closer_vlad.cpp:120-255): revisit pairs (end of the
circle vs its start) must score above the adjacent-KF covisibility floor,
and far-apart viewpoints must score below it.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/vlad_rendered_stats.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="out/sp_rendered.npz")
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument("--n-frames", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.io.render import RenderedDataset
    from sp_orb_slam_tpu.models import netvlad
    from sp_orb_slam_tpu.models.weights import load_checkpoint

    cfg = Config()
    ds = RenderedDataset(cfg, n_frames=args.n_frames, seed=0, noise_seed=0)
    params = load_checkpoint(args.weights)
    vparams = netvlad.init_params(n_clusters=cfg.loop.netvlad_clusters,
                                  out_dim=cfg.loop.global_desc_dim)

    idxs = list(range(0, args.n_frames, args.stride))
    run = jax.jit(lambda im: extract(
        params, im, num_features=cfg.tracking.num_features,
        max_keypoints=cfg.runtime.max_keypoints,
        conf_thresh=cfg.extractor.conf_thresh,
        nms_dist=cfg.extractor.nms_dist, border=cfg.extractor.border,
        nms_iters=cfg.extractor.nms_iters,
        cov_radius=cfg.extractor.cov_window,
        cov_iters=cfg.extractor.cov_iters))

    gds = []
    for i in idxs:
        f = ds.frame(i)
        feats = run(jnp.asarray(f.image[None].astype(np.float32) / 255.0))
        gd = netvlad.global_descriptor(vparams, feats.desc[0], feats.valid[0])
        gds.append(np.asarray(gd))
    G = np.stack(gds)
    S = G @ G.T
    n = len(idxs)

    # classify pairs by camera-pose geometry: revisit = position within
    # 0.6 m AND viewing directions within 30 deg; distinct = position > 2 m
    # apart or facing >90 deg apart
    pos = np.stack([ds.poses[i][:3, 3] for i in idxs])
    fwd = np.stack([ds.poses[i][:3, :3] @ np.array([0, 0, 1.0]) for i in idxs])
    dp = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    dv = (fwd[:, None] * fwd[None, :]).sum(-1)
    sep = np.abs(np.subtract.outer(idxs, idxs))
    far_in_time = sep > 40  # exclude temporal neighbors (covisible anyway)
    revisit = far_in_time & (dp < 0.6) & (dv > np.cos(np.radians(30)))
    distinct = far_in_time & ((dp > 2.0) | (dv < 0.0))
    adjacent = (sep > 0) & (sep <= args.stride)

    q = lambda m: ([round(float(np.quantile(S[m], p)), 3)
                    for p in (0.1, 0.5, 0.9)] if m.any() else None)
    print(json.dumps({
        "n_frames_sampled": n,
        "revisit_pairs": int(revisit.sum() // 2),
        "revisit_sim_p10_p50_p90": q(revisit),
        "distinct_sim_p10_p50_p90": q(distinct),
        "adjacent_sim_p10_p50_p90": q(adjacent),
    }))


if __name__ == "__main__":
    main()
