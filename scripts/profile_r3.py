#!/usr/bin/env python
"""Round-3 extractor stage profiling on the real chip (ablation deltas on
the full fused program — tunnel microbenchmarks vary +-50%, NOTES r2).

Variants, each timed over the full extract+match step at the bench
operating point (B=32, 752x480, bf16):
  full-gather   : production round-2 path (desc_method=gather)
  full-dense    : 9-tap stencil descriptor sampling (desc_method=dense)
  no-cov        : covariance stage ablated (cov output zeros) — isolates
                  the in-graph cost of the pallas covariance custom call
  cov-standalone: pallas_covariance alone on the same shapes
"""

import argparse
import json
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants",
                    default="full-gather,full-dense,full-packed,no-cov,"
                            "cov-standalone")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # NOTE: no persistent compile cache here — loading cache entries
    # written by a previous tunnel session reproducibly hangs the axon
    # client (see .claude/skills/verify/SKILL.md "TPU tunnel discipline").

    from functools import partial

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.ops import matching

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    B = args.batch
    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    K = cfg.runtime.max_keypoints
    prev_desc = jnp.asarray(rng.random((B, K, 256), np.float32))
    prev_desc = prev_desc / jnp.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 400)
    prev_valid = jnp.ones((B, K), bool)

    def make_step(desc_method="gather", cov="pallas", packing="none"):
        @jax.jit
        def step(images, prev_desc, prev_uv, prev_valid):
            feats = extract(
                params, images, num_features=cfg.tracking.num_features,
                max_keypoints=K, conf_thresh=cfg.extractor.conf_thresh,
                nms_dist=cfg.extractor.nms_dist, border=cfg.extractor.border,
                nms_iters=cfg.extractor.nms_iters,
                cov_radius=cfg.extractor.cov_window,
                cov_iters=cfg.extractor.cov_iters,
                cov_method="none" if cov == "none" else "pallas",
                nms_method="pallas", desc_method=desc_method,
                conv_packing=packing, compute_dtype=jnp.bfloat16)

            def match_one(desc, uv, valid, pdesc, puv, pvalid):
                m = matching.search_for_initialization(
                    pdesc, puv, pvalid, puv, desc, uv, valid,
                    window=100, ratio=0.9)
                return m.n_matches

            n = jax.vmap(match_one)(feats.desc, feats.uv, feats.valid,
                                    prev_desc, prev_uv, prev_valid)
            return feats, n
        return step

    def timeit(fn, *a, iters=args.iters):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}
    want = set(args.variants.split(","))
    if "full-gather" in want:
        ms = timeit(make_step("gather"), images, prev_desc, prev_uv, prev_valid)
        results["full_gather_ms"] = round(ms, 2)
        results["full_gather_fps"] = round(B / ms * 1e3, 1)
        print("full-gather:", results["full_gather_ms"], "ms/batch", flush=True)
    if "full-dense" in want:
        ms = timeit(make_step("dense"), images, prev_desc, prev_uv, prev_valid)
        results["full_dense_ms"] = round(ms, 2)
        results["full_dense_fps"] = round(B / ms * 1e3, 1)
        print("full-dense:", results["full_dense_ms"], "ms/batch", flush=True)
    if "full-packed" in want:
        ms = timeit(make_step("dense", packing="s2d"), images, prev_desc,
                    prev_uv, prev_valid)
        results["full_packed_ms"] = round(ms, 2)
        results["full_packed_fps"] = round(B / ms * 1e3, 1)
        print("full-packed:", results["full_packed_ms"], "ms/batch", flush=True)
    for lvl in ("s2d", "s2d2", "s2d3"):
        if f"full-gather-{lvl}" in want:
            ms = timeit(make_step("gather", packing=lvl), images, prev_desc,
                        prev_uv, prev_valid)
            results[f"full_gather_{lvl}_ms"] = round(ms, 2)
            results[f"full_gather_{lvl}_fps"] = round(B / ms * 1e3, 1)
            print(f"full-gather-{lvl}:", results[f"full_gather_{lvl}_ms"],
                  "ms/batch", flush=True)
    if "no-cov" in want:
        # windowed+iters=0 ablation removes the pallas custom call entirely
        ms = timeit(make_step("dense", cov="none"), images, prev_desc,
                    prev_uv, prev_valid)
        results["no_cov_ms"] = round(ms, 2)
        print("no-cov:", results["no_cov_ms"], "ms/batch", flush=True)
    if "cov-standalone" in want:
        from sp_orb_slam_tpu.ops import pallas_cov

        heat_inv = jnp.asarray(rng.random((B, H, W), np.float32))
        uv = jnp.asarray(
            rng.uniform(8, 470, (B, K, 2)).astype(np.float32))
        valid = jnp.ones((B, K), bool)
        fn = jax.jit(partial(pallas_cov.pallas_covariance, radius=8, iters=16))
        ms = timeit(fn, heat_inv, uv, valid)
        results["cov_standalone_ms"] = round(ms, 2)
        print("cov-standalone:", results["cov_standalone_ms"], "ms/batch",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
