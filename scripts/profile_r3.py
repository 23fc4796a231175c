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

    def make_step(desc_method="gather", cov="pallas", packing="none",
                  emission="scatter"):
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
                conv_packing=packing, emission=emission,
                compute_dtype=jnp.bfloat16)

            def match_one(desc, uv, valid, pdesc, puv, pvalid):
                m = matching.search_for_initialization(
                    pdesc, pvalid, puv, desc, uv, valid,
                    window=100, ratio=0.9)
                return m.n_matches

            n = jax.vmap(match_one)(feats.desc, feats.uv, feats.valid,
                                    prev_desc, prev_uv, prev_valid)
            return feats, n
        return step

    def make_forward_only():
        @jax.jit
        def fwd(images):
            return superpoint.forward(params, images, with_heat=False,
                                      compute_dtype=jnp.bfloat16)
        return fwd

    def make_truncated(depth):
        """Encoder prefix only: depth pairs of the VGG stack (bf16)."""
        from sp_orb_slam_tpu.models.superpoint import _conv, _maxpool2

        @jax.jit
        def fwd(images):
            x = images[..., None].astype(jnp.bfloat16)
            names = (("conv1a", "conv1b"), ("conv2a", "conv2b"),
                     ("conv3a", "conv3b"), ("conv4a", "conv4b"))
            for i in range(depth):
                na, nb = names[i]
                x = _conv(_conv(x, params[na]), params[nb])
                if i < 3:
                    x = _maxpool2(x)
            return x
        return fwd

    def make_single(name, cin):
        from sp_orb_slam_tpu.models.superpoint import _conv

        @jax.jit
        def fwd(x):
            return _conv(x, params[name])
        rng2 = np.random.default_rng(1)
        x = jnp.asarray(rng2.random((B, H, W, cin), np.float32)
                        ).astype(jnp.bfloat16)
        return fwd, x

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
    if "full-pallasdesc" in want:
        ms = timeit(make_step("pallas"), images, prev_desc, prev_uv,
                    prev_valid)
        results["full_pallasdesc_ms"] = round(ms, 2)
        results["full_pallasdesc_fps"] = round(B / ms * 1e3, 1)
        print("full-pallasdesc:", results["full_pallasdesc_ms"], "ms/batch",
              flush=True)
    if "full-sortemit" in want:
        ms = timeit(make_step("gather", emission="sort"), images, prev_desc,
                    prev_uv, prev_valid)
        results["full_sortemit_ms"] = round(ms, 2)
        results["full_sortemit_fps"] = round(B / ms * 1e3, 1)
        print("full-sortemit:", results["full_sortemit_ms"], "ms/batch",
              flush=True)
    if "full-sparsedesc" in want:
        ms = timeit(make_step("pallas_sparse"), images, prev_desc, prev_uv,
                    prev_valid)
        results["full_sparsedesc_ms"] = round(ms, 2)
        results["full_sparsedesc_fps"] = round(B / ms * 1e3, 1)
        print("full-sparsedesc:", results["full_sparsedesc_ms"], "ms/batch",
              flush=True)
    if "forward-only" in want:
        ms = timeit(make_forward_only(), images)
        results["forward_only_ms"] = round(ms, 2)
        print("forward-only:", results["forward_only_ms"], "ms/batch",
              flush=True)
    if "pair1-fused-only" in want:
        from sp_orb_slam_tpu.ops import pallas_pair1

        fn = jax.jit(lambda im: pallas_pair1.fused_pair1(im, params))
        ms = timeit(fn, images)
        results["pair1_fused_only_ms"] = round(ms, 2)
        print("pair1-fused-only:", results["pair1_fused_only_ms"],
              "ms/batch", flush=True)
    for st in ("conva", "convb", "dots"):
        if f"pair1-{st}" in want:
            from sp_orb_slam_tpu.ops import pallas_pair1 as pp1

            fn = jax.jit(lambda im, st=st: pp1.fused_pair1(im, params,
                                                           stage=st))
            ms = timeit(fn, images)
            results[f"pair1_{st}_ms"] = round(ms, 2)
            print(f"pair1-{st}:", results[f"pair1_{st}_ms"], "ms/batch",
                  flush=True)
    if "full-gather-pair1" in want:
        ms = timeit(make_step("gather", packing="pair1"), images, prev_desc,
                    prev_uv, prev_valid)
        results["full_gather_pair1_ms"] = round(ms, 2)
        results["full_gather_pair1_fps"] = round(B / ms * 1e3, 1)
        print("full-gather-pair1:", results["full_gather_pair1_ms"],
              "ms/batch", flush=True)
    if "pair1t-fused-only" in want:
        from sp_orb_slam_tpu.ops import pallas_pair1t

        fn = jax.jit(lambda im: pallas_pair1t.fused_pair1t(im, params))
        ms = timeit(fn, images)
        results["pair1t_fused_only_ms"] = round(ms, 2)
        print("pair1t-fused-only:", results["pair1t_fused_only_ms"],
              "ms/batch", flush=True)
    for tp in (8, 12):
        if f"pair1t-tp{tp}" in want:
            from sp_orb_slam_tpu.ops import pallas_pair1t

            fn = jax.jit(lambda im, tp=tp: pallas_pair1t.fused_pair1t(
                im, params, tp=tp))
            ms = timeit(fn, images)
            results[f"pair1t_tp{tp}_ms"] = round(ms, 2)
            print(f"pair1t-tp{tp}:", results[f"pair1t_tp{tp}_ms"],
                  "ms/batch", flush=True)
    for st in ("conva", "convb"):
        if f"pair1t-{st}" in want:
            from sp_orb_slam_tpu.ops import pallas_pair1t as pp1t

            fn = jax.jit(lambda im, st=st: pp1t.fused_pair1t(im, params,
                                                             stage=st))
            ms = timeit(fn, images)
            results[f"pair1t_{st}_ms"] = round(ms, 2)
            print(f"pair1t-{st}:", results[f"pair1t_{st}_ms"], "ms/batch",
                  flush=True)
    if "full-gather-pair1t" in want:
        ms = timeit(make_step("gather", packing="pair1t"), images, prev_desc,
                    prev_uv, prev_valid)
        results["full_gather_pair1t_ms"] = round(ms, 2)
        results["full_gather_pair1t_fps"] = round(B / ms * 1e3, 1)
        print("full-gather-pair1t:", results["full_gather_pair1t_ms"],
              "ms/batch", flush=True)
    for nm, cin in (("conv1a", 1), ("conv1b", 64)):
        if f"{nm}-only" in want:
            fn, x = make_single(nm, cin)
            ms = timeit(fn, x)
            results[f"{nm}_only_ms"] = round(ms, 2)
            print(f"{nm}-only:", results[f"{nm}_only_ms"], "ms/batch",
                  flush=True)
    for d in (1, 2, 4):
        if f"encoder{d}" in want:
            ms = timeit(make_truncated(d), images)
            results[f"encoder{d}_ms"] = round(ms, 2)
            print(f"encoder{d}:", results[f"encoder{d}_ms"], "ms/batch",
                  flush=True)
    if "heads-conv-only" in want:
        # the four head convs alone on a random encoder output
        from sp_orb_slam_tpu.models.superpoint import _conv

        @jax.jit
        def heads(x):
            semi = _conv(_conv(x, params["convPa"]), params["convPb"],
                         relu=False).astype(jnp.float32)
            coarse = _conv(_conv(x, params["convDa"]), params["convDb"],
                           relu=False).astype(jnp.float32)
            return semi, coarse
        rng2 = np.random.default_rng(2)
        xh = jnp.asarray(rng2.random((B, H // 8, W // 8, 128), np.float32)
                         ).astype(jnp.bfloat16)
        ms = timeit(heads, xh)
        results["heads_conv_only_ms"] = round(ms, 2)
        print("heads-conv-only:", results["heads_conv_only_ms"], "ms/batch",
              flush=True)
    if "heads-tail-only" in want:
        # softmax/score/candidate/heat block on random head outputs
        @jax.jit
        def tail(semi, coarse):
            hc, wc = H // 8, W // 8
            coarse = coarse / jnp.linalg.norm(coarse, axis=-1, keepdims=True)
            dense = jax.nn.softmax(semi, axis=-1)
            nodust = dense[..., :64]
            score = jnp.max(nodust, axis=-1)
            idx = jnp.argmax(nodust, axis=-1).astype(jnp.int32)
            heat_log = jnp.log(jnp.clip(nodust, 1e-3, None))
            mn = jnp.min(-heat_log, axis=(1, 2, 3)).reshape(B, 1, 1)
            mx = jnp.max(-heat_log, axis=(1, 2, 3)).reshape(B, 1, 1)
            hf = heat_log.reshape(B, hc, wc, 8, 8)
            hf = jnp.transpose(hf, (0, 1, 3, 2, 4)).reshape(B, H, W)
            heat_inv = (mx + hf) / (mx - mn)
            return coarse, dense[..., 64], score, idx, heat_inv
        rng2 = np.random.default_rng(3)
        semi = jnp.asarray(
            rng2.random((B, H // 8, W // 8, 65), np.float32))
        coarse = jnp.asarray(
            rng2.random((B, H // 8, W // 8, 256), np.float32))
        ms = timeit(tail, semi, coarse)
        results["heads_tail_only_ms"] = round(ms, 2)
        print("heads-tail-only:", results["heads_tail_only_ms"], "ms/batch",
              flush=True)
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
