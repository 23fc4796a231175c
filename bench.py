#!/usr/bin/env python
"""Headline benchmark: SuperPoint extract+match throughput per chip.

Runs the full learned frontend (conv stack + NMS + occ-grid + covariance +
descriptor sampling) plus consecutive-frame descriptor matching, batched
over streams, on whatever accelerator jax exposes, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

vs_baseline is relative to the reference system's designed operating point
of 20 frames/s (the online mode is paced at camera fps with a <=50 ms/frame
whole-pipeline budget on the reference GPU; system.cpp:141,190-192,
cfg/euroc_mono.yaml:18).  The round target is >= 500 f/s/chip (BASELINE.json).
"""

import json
import time

import numpy as np

REF_FPS = 20.0  # reference designed frame budget


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.ops import matching

    cfg = Config()  # EuRoC operating point: 752x480, 800 features
    H, W = cfg.camera.height, cfg.camera.width
    B = 32  # streams per batch (v5e extract+match sweep after the round-2
    #         matcher/NMS work: 32 -> 686 f/s, 48 -> 643, 64 -> 661;
    #         32 is the throughput knee)

    params = superpoint.init_params(jax.random.PRNGKey(0))

    @jax.jit
    def step(images, prev_desc, prev_uv, prev_valid):
        feats = extract(
            params, images,
            num_features=cfg.tracking.num_features,
            max_keypoints=cfg.runtime.max_keypoints,
            conf_thresh=cfg.extractor.conf_thresh,
            nms_dist=cfg.extractor.nms_dist,
            border=cfg.extractor.border,
            nms_iters=cfg.extractor.nms_iters,
            cov_radius=cfg.extractor.cov_window,
            cov_iters=cfg.extractor.cov_iters,
            compute_dtype=jnp.bfloat16,
        )

        def match_one(desc, uv, valid, pdesc, puv, pvalid):
            m = matching.search_for_initialization(
                pdesc, puv, pvalid, puv, desc, uv, valid,
                window=100, ratio=0.9)
            return m.n_matches

        n = jax.vmap(match_one)(feats.desc, feats.uv, feats.valid,
                                prev_desc, prev_uv, prev_valid)
        return feats, n

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    K = cfg.runtime.max_keypoints
    prev_desc = jnp.asarray(rng.random((B, K, 256), np.float32))
    prev_desc = prev_desc / jnp.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 400)
    prev_valid = jnp.ones((B, K), bool)

    # compile + warm
    feats, n = step(images, prev_desc, prev_uv, prev_valid)
    jax.block_until_ready(n)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        feats, n = step(images, feats.desc, feats.uv, feats.valid)
    jax.block_until_ready(n)
    dt = (time.perf_counter() - t0) / iters

    fps = B / dt
    print(json.dumps({
        "metric": "superpoint_extract_match_fps_per_chip_752x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 2),
    }))


if __name__ == "__main__":
    main()
