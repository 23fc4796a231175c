#!/usr/bin/env python
"""Per-stage extractor profile on the real accelerator.

Each probe is a separate jit that returns tiny reductions over EVERY stage
output (so XLA cannot dead-code-eliminate a head), timed over `iters`
dispatches with one small readback at the end.  Stage cost = difference
between consecutive probes (they share all earlier work).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.ops import covariance as cov_ops
    from sp_orb_slam_tpu.ops import matching
    from sp_orb_slam_tpu.ops import nms as nms_ops
    from functools import partial

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    B = 8
    NF = cfg.tracking.num_features
    K = cfg.runtime.max_keypoints
    dtype = jnp.bfloat16

    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))

    def fwd(images):
        return superpoint.forward(params, images, compute_dtype=dtype)

    def reduce_all(*arrs):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)

    @jax.jit
    def p_forward(images):
        o = fwd(images)
        return reduce_all(o.semi_dust, o.dense_dust, o.score, o.cand_uv,
                          o.cand_valid, o.coarse_desc, o.heat, o.heat_inv)

    @jax.jit
    def p_nms(images):
        o = fwd(images)
        kps = jax.vmap(partial(
            nms_ops.select_keypoints, num_features=NF, max_keypoints=K,
            image_hw=(H, W), dist=cfg.extractor.nms_dist,
            border=cfg.extractor.border, nms_iters=cfg.extractor.nms_iters,
        ))(o.score, o.cand_uv, o.cand_valid)
        return reduce_all(o.semi_dust, o.dense_dust, o.coarse_desc, o.heat,
                          o.heat_inv, kps.uv, kps.score, kps.valid,
                          kps.occ_grid, kps.count)

    @jax.jit
    def p_desc(images):
        o = fwd(images)
        kps = jax.vmap(partial(
            nms_ops.select_keypoints, num_features=NF, max_keypoints=K,
            image_hw=(H, W), dist=cfg.extractor.nms_dist,
            border=cfg.extractor.border, nms_iters=cfg.extractor.nms_iters,
        ))(o.score, o.cand_uv, o.cand_valid)
        desc = jax.vmap(partial(superpoint.sample_descriptors,
                                image_hw=(H, W)))(o.coarse_desc, kps.uv)
        return reduce_all(o.semi_dust, o.dense_dust, o.heat, o.heat_inv,
                          kps.uv, kps.score, kps.valid, kps.occ_grid,
                          kps.count, desc)

    def p_cov_build(method):
        @jax.jit
        def p(images):
            o = fwd(images)
            kps = jax.vmap(partial(
                nms_ops.select_keypoints, num_features=NF, max_keypoints=K,
                image_hw=(H, W), dist=cfg.extractor.nms_dist,
                border=cfg.extractor.border,
                nms_iters=cfg.extractor.nms_iters,
            ))(o.score, o.cand_uv, o.cand_valid)
            desc = jax.vmap(partial(superpoint.sample_descriptors,
                                    image_hw=(H, W)))(o.coarse_desc, kps.uv)
            if method == "dense":
                cov2, cov2_inv, resp = jax.vmap(
                    partial(cov_ops.dense_covariance,
                            iters=cfg.extractor.cov_iters)
                )(o.heat_inv, kps.occ_grid, kps.uv, kps.valid)
            else:
                cov2, cov2_inv, resp = jax.vmap(
                    partial(cov_ops.keypoint_covariance,
                            radius=cfg.extractor.cov_window,
                            iters=cfg.extractor.cov_iters)
                )(o.heat_inv, kps.uv, kps.valid)
            return reduce_all(o.semi_dust, o.dense_dust, o.heat, o.heat_inv,
                              kps.uv, kps.score, kps.valid, kps.occ_grid,
                              kps.count, desc, cov2, cov2_inv, resp)
        return p

    prev_desc = jnp.asarray(rng.random((B, K, 256), np.float32))
    prev_desc = prev_desc / jnp.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 400)
    prev_valid = jnp.ones((B, K), bool)

    from sp_orb_slam_tpu.extractor import extract

    @jax.jit
    def p_full(images):
        feats = extract(params, images, num_features=NF, max_keypoints=K,
                        compute_dtype=dtype)

        def match_one(desc, uv, valid, pdesc, puv, pvalid):
            m = matching.search_for_initialization(
                pdesc, pvalid, puv, desc, uv, valid,
                window=100, ratio=0.9)
            return m.n_matches

        n = jax.vmap(match_one)(feats.desc, feats.uv, feats.valid,
                                prev_desc, prev_uv, prev_valid)
        return reduce_all(feats.uv, feats.desc, feats.cov2_inv,
                          feats.occ_grid, feats.heat, feats.dense_dust,
                          feats.semi_dust, n)

    probes = [
        ("forward", p_forward),
        ("forward+nms", p_nms),
        ("forward+nms+desc", p_desc),
        ("full_windowed_cov", p_cov_build("windowed")),
        ("full_dense_cov", p_cov_build("dense")),
        ("full_extract+match", p_full),
    ]

    results = {}
    iters = 30
    for name, p in probes:
        t_c0 = time.perf_counter()
        out = p(images)
        np.asarray(out)  # force completion
        compile_s = time.perf_counter() - t_c0
        # warm steady state
        for _ in range(3):
            out = p(images)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = p(images)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        results[name] = {"ms_per_batch": round(dt * 1e3, 3),
                         "fps": round(B / dt, 1),
                         "compile_s": round(compile_s, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
