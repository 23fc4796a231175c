#!/usr/bin/env python
"""Round-4 covariance-stage decomposition on the real chip.

The r4 tail bisect (scripts/profile_r4.py) charges +3.07 ms/batch to the
covariance stage in-graph, while the kernel standalone was once measured at
~0.12 ms (round-2 note: "custom-call scheduling barrier").  This script
separates the candidate costs on production shapes (B=32, 480x752, K=896):

  pad        : the jnp.pad lane-alignment copy of heat_inv alone
  kernel     : pallas_covariance standalone (includes its pad)
  kernel512  : same with the 512-lane chunk cap (if it compiles)
  graph_none : full extract, cov_method="none"
  graph_pal  : full extract, cov_method="pallas"
  graph_win  : full extract, cov_method="windowed"

Each timing: compile + 3 warmup + median of 3x10-iter blocks.
"""

import json
import time
import sys, os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, iters=10, repeats=3, warmup=3):
    import jax
    jax.block_until_ready(fn())
    for _ in range(warmup):
        fn()
    jax.block_until_ready(fn())
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        blocks.append((time.perf_counter() - t0) / iters * 1e3)
    blocks.sort()
    return blocks[len(blocks) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.ops import pallas_cov

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    B, K = 32, cfg.runtime.max_keypoints
    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    heat = jnp.asarray(rng.random((B, H, W), np.float32))
    uv = jnp.asarray(
        np.stack([rng.uniform(8, W - 8, (B, K)),
                  rng.uniform(8, H - 8, (B, K))], -1).astype(np.float32))
    valid = jnp.ones((B, K), bool)

    out = {}

    Wp = (W // 128) * 128 + 256
    pad = jax.jit(lambda h: jnp.pad(h, ((0, 0), (0, 0), (0, Wp - W))))
    out["pad_ms"] = round(timed(lambda: pad(heat)), 3)

    kern = jax.jit(partial(pallas_cov.pallas_covariance,
                           radius=cfg.extractor.cov_window,
                           iters=cfg.extractor.cov_iters))
    out["kernel_ms"] = round(timed(lambda: kern(heat, uv, valid)), 3)

    def ex(cov_method):
        f = jax.jit(lambda im: extract(
            params, im,
            num_features=cfg.tracking.num_features,
            max_keypoints=K,
            conf_thresh=cfg.extractor.conf_thresh,
            nms_dist=cfg.extractor.nms_dist,
            border=cfg.extractor.border,
            nms_iters=cfg.extractor.nms_iters,
            cov_radius=cfg.extractor.cov_window,
            cov_iters=cfg.extractor.cov_iters,
            cov_method=cov_method,
            compute_dtype=jnp.bfloat16))
        return timed(lambda: f(images))

    for m in ("none", "pallas", "windowed"):
        out[f"graph_{m}_ms"] = round(ex(m), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
