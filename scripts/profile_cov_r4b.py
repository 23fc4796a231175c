#!/usr/bin/env python
"""Round-4 cov-stage fix candidates, timed on the real chip.

profile_cov_r4.py decomposed the +3.3 ms in-graph covariance cost: the
kernel standalone is ~20 us and the pad copy ~17 us, so the cost is the
*interaction* — most plausibly XLA rematerializing the 47 MB
softmax/log/pixel-shuffle producer chain into both the heat_inv output
fusion and the kernel's pad fusion.  Candidates:

  base      : production program (extract cov=pallas + init match)
  barrier   : same, with lax.optimization_barrier pinning heat_inv to a
              single materialization before the cov pad
  split     : extract(cov=none)+match as program 1, pallas cov as program
              2 reading program 1's device-resident heat_inv/uv (no
              readback between; dispatches pipeline)

Prints ms/batch for each on B=32 production shapes.
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
    from sp_orb_slam_tpu import extractor as ext_mod
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.ops import matching, pallas_cov

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    B, K = 32, cfg.runtime.max_keypoints
    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    prev_desc = jnp.asarray(rng.random((B, K, 256), np.float32))
    prev_desc = prev_desc / jnp.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 400)
    prev_valid = jnp.ones((B, K), bool)

    kw = dict(num_features=cfg.tracking.num_features, max_keypoints=K,
              conf_thresh=cfg.extractor.conf_thresh,
              nms_dist=cfg.extractor.nms_dist, border=cfg.extractor.border,
              nms_iters=cfg.extractor.nms_iters,
              cov_radius=cfg.extractor.cov_window,
              cov_iters=cfg.extractor.cov_iters,
              compute_dtype=jnp.bfloat16)

    def match(feats):
        def one(desc, uv, valid):
            m = matching.search_for_initialization(
                prev_desc[0], prev_valid[0], prev_uv[0], desc, uv, valid,
                window=100, ratio=0.9)
            return m.n_matches
        return jax.vmap(one)(feats.desc, feats.uv, feats.valid)

    out = {}

    @jax.jit
    def base(im):
        feats = extract(params, im, **kw)
        return feats, match(feats)
    out["base_ms"] = round(timed(lambda: base(images)), 3)

    # barrier variant: monkeypatch a barrier in front of the cov call
    orig = pallas_cov.pallas_covariance

    def barriered(heat_inv, uv, valid, **k):
        heat_inv, uv = jax.lax.optimization_barrier((heat_inv, uv))
        return orig(heat_inv, uv, valid, **k)

    pallas_cov.pallas_covariance = barriered
    try:
        @jax.jit
        def barrier(im):
            feats = extract(params, im, **kw)
            return feats, match(feats)
        out["barrier_ms"] = round(timed(lambda: barrier(images)), 3)
    finally:
        pallas_cov.pallas_covariance = orig

    @jax.jit
    def split_main(im):
        feats = extract(params, im, **{**kw, "cov_method": "none"})
        return feats, match(feats)

    cov_fn = jax.jit(partial(orig, radius=cfg.extractor.cov_window,
                             iters=cfg.extractor.cov_iters))

    def split():
        feats, n = split_main(images)
        cov2, cov2_inv, resp = cov_fn(feats.heat_inv, feats.uv, feats.valid)
        return n, cov2
    out["split_ms"] = round(timed(split), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
