#!/usr/bin/env python
"""Round-4g tail A/B on the real chip: fused Pallas match kernel and the
channel-slice pixel shuffle, inside the full bench program.

For each variant combo, times the exact bench step (extract bf16 B=32 +
init match) and prints ms/batch; also golden-checks the Pallas match
against the XLA path on-chip (compiled, HIGHEST-precision dots) before
trusting its numbers.  ONE process against the chip (verify skill).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.ops import matching, pallas_match

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    B = 32
    K = cfg.runtime.max_keypoints
    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    prev_desc = rng.normal(size=(B, K, 256)).astype(np.float32)
    prev_desc /= np.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_desc = jnp.asarray(prev_desc)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 400)
    prev_valid = jnp.ones((B, K), bool)

    # --- 1. on-chip golden: pallas match == xla match, compiled ---------
    feats = jax.jit(lambda im: extract(
        params, im, num_features=cfg.tracking.num_features,
        max_keypoints=K, conf_thresh=cfg.extractor.conf_thresh,
        nms_dist=cfg.extractor.nms_dist, border=cfg.extractor.border,
        nms_iters=cfg.extractor.nms_iters,
        cov_radius=cfg.extractor.cov_window,
        cov_iters=cfg.extractor.cov_iters, with_heat_inv=False,
        compute_dtype=jnp.bfloat16))(images)

    def gold_one(pd, pv, puv, dd, duv, dv):
        m = matching.search_for_initialization(pd, pv, puv, dd, duv, dv,
                                               window=100, ratio=0.9)
        return m.match12, m.n_matches

    g12, gn = jax.jit(jax.vmap(gold_one))(
        prev_desc, prev_valid, prev_uv, feats.desc, feats.uv, feats.valid)
    p12, pn, _ = pallas_match.match_init_batch(
        prev_desc, prev_valid, prev_uv, feats.desc, feats.uv, feats.valid,
        window=100, ratio=0.9)
    g12, gn, p12, pn = map(np.asarray, (g12, gn, p12, pn))
    mism = int((g12 != p12).sum())
    print(f"golden: match12 mismatches {mism}/{g12.size}, "
          f"n xla={gn.tolist()} pallas={pn.tolist()}", flush=True)
    if mism:
        raise SystemExit("pallas match kernel does not match XLA on-chip")

    # --- 2. variant timing, full bench program --------------------------
    def make_step(match_method, heat_shuffle):
        @jax.jit
        def step(images, prev_desc, prev_uv, prev_valid):
            feats = extract(
                params, images, num_features=cfg.tracking.num_features,
                max_keypoints=K, conf_thresh=cfg.extractor.conf_thresh,
                nms_dist=cfg.extractor.nms_dist,
                border=cfg.extractor.border,
                nms_iters=cfg.extractor.nms_iters,
                cov_radius=cfg.extractor.cov_window,
                cov_iters=cfg.extractor.cov_iters, with_heat_inv=False,
                heat_shuffle=heat_shuffle, compute_dtype=jnp.bfloat16)
            if match_method == "pallas":
                _, n, _ = pallas_match.match_init_batch(
                    prev_desc, prev_valid, prev_uv,
                    feats.desc, feats.uv, feats.valid,
                    window=100, ratio=0.9)
                return feats, n

            def match_one(desc, uv, valid, pdesc, puv, pvalid):
                m = matching.search_for_initialization(
                    pdesc, pvalid, puv, desc, uv, valid,
                    window=100, ratio=0.9)
                return m.n_matches

            n = jax.vmap(match_one)(feats.desc, feats.uv, feats.valid,
                                    prev_desc, prev_uv, prev_valid)
            return feats, n
        return step

    for mm in ("xla", "pallas"):
        for hs in ("transpose", "slices"):
            step = make_step(mm, hs)
            try:
                f, n = step(images, prev_desc, prev_uv, prev_valid)
                jax.block_until_ready(n)
            except Exception as e:  # compile failure: report, keep going
                print(f"match={mm:6s} heat={hs:9s}: FAILED {type(e).__name__}"
                      f" {str(e)[:200]}", flush=True)
                continue
            for _ in range(4):
                f, n = step(images, f.desc, f.uv, f.valid)
            jax.block_until_ready(n)
            blocks = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(10):
                    f, n = step(images, f.desc, f.uv, f.valid)
                jax.block_until_ready(n)
                blocks.append((time.perf_counter() - t0) / 10 * 1e3)
            blocks.sort()
            med = blocks[len(blocks) // 2]
            print(f"match={mm:6s} heat={hs:9s}: {med:6.2f} ms/batch "
                  f"({B / med * 1e3:7.2f} f/s)  "
                  f"[{blocks[0]:.2f}, {blocks[-1]:.2f}]", flush=True)


if __name__ == "__main__":
    main()
