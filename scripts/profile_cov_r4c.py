#!/usr/bin/env python
"""Round-4 cov/heat interaction, experiment 2: localize the 3.3 ms.

Variants (all B=32 production shapes, bf16 conv path, full extract+match):

  base        : production program (pallas cov), heat_inv in outputs
  noheatout   : same program but heat_inv/dense_dust dropped from the jit
                outputs (cov still consumes heat_inv internally)
  chain       : standalone jit of the semi->softmax->log->pixel-shuffle->
                normalize chain from a materialized semi input (the true
                cost of one heat materialization)
  chain_pad   : same chain, but padding the cell layout BEFORE the
                transpose (what a pad-aware producer would emit)
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

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.ops import matching

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    B, K = 32, cfg.runtime.max_keypoints
    hc, wc = H // 8, W // 8
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

    @jax.jit
    def noheatout(im):
        feats = extract(params, im, **kw)
        return (feats.uv, feats.score, feats.valid, feats.desc, feats.cov2,
                feats.cov2_inv, feats.occ_grid, feats.count, match(feats))
    out["noheatout_ms"] = round(timed(lambda: noheatout(images)), 3)

    semi = jnp.asarray(rng.normal(size=(B, hc, wc, 65)).astype(np.float32))

    @jax.jit
    def chain(s):
        dense = jax.nn.softmax(s, axis=-1)
        nodust = dense[..., :64]
        heat_log = jnp.log(jnp.clip(nodust, 1e-3, None))
        mn = jnp.min(-heat_log, axis=(1, 2, 3)).reshape(B, 1, 1)
        mx = jnp.max(-heat_log, axis=(1, 2, 3)).reshape(B, 1, 1)
        hf = heat_log.reshape(B, hc, wc, 8, 8)
        hf = jnp.transpose(hf, (0, 1, 3, 2, 4)).reshape(B, H, W)
        return (mx + hf) / (mx - mn)
    out["chain_ms"] = round(timed(lambda: chain(semi)), 3)

    Wp = (W // 128) * 128 + 256
    wcp = Wp // 8

    @jax.jit
    def chain_pad(s):
        dense = jax.nn.softmax(s, axis=-1)
        nodust = dense[..., :64]
        heat_log = jnp.log(jnp.clip(nodust, 1e-3, None))
        mn = jnp.min(-heat_log, axis=(1, 2, 3)).reshape(B, 1, 1)
        mx = jnp.max(-heat_log, axis=(1, 2, 3)).reshape(B, 1, 1)
        hf = heat_log.reshape(B, hc, wc, 8, 8)
        hf = jnp.pad(hf, ((0, 0), (0, 0), (0, wcp - wc), (0, 0), (0, 0)))
        hf = jnp.transpose(hf, (0, 1, 3, 2, 4)).reshape(B, H, Wp)
        return (mx + hf) / (mx - mn)
    out["chain_pad_ms"] = round(timed(lambda: chain_pad(semi)), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
