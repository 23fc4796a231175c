#!/usr/bin/env python
"""Round-4 extraction-tail bisect on the real chip.

The round-3 stage split left ~12.5 ms/batch (of 36.3) in the softmax/heat
tail + post-forward stages with no kernel attempt (VERDICT r3 weak #4).
This script times CUMULATIVE prefixes of the production program (B=32,
752x480, bf16, pair1t + pallas NMS/cov + sort emission + gather desc) so
each stage's in-graph cost is a clean delta on real data:

  convs        : encoder + head convs only (no softmax/score/heat)
  +softmax     : + softmax/dust/score/argmax block
  +heat        : + heat_log pixel-shuffle + min/max normalization
  +nms         : + pallas grid NMS
  +select      : + keypoint selection/emission (sort)
  +desc        : + 4-corner descriptor gather
  +cov         : + pallas covariance (consumes heat_inv)
  +match       : + init matcher (= the full bench step)

plus optional batch sweeps on the full step.
"""

import argparse
import json
import time
import sys, os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", default="convs,softmax,heat,nms,select,"
                                        "desc,cov,match")
    ap.add_argument("--batch-sweep", default="",
                    help="comma-separated batch sizes for full-step sweeps")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from sp_orb_slam_tpu.config import Config
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.models.superpoint import _conv, _maxpool2
    from sp_orb_slam_tpu.ops import matching, nms as nms_ops
    from sp_orb_slam_tpu.ops import pallas_nms, pallas_cov

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    B = args.batch
    K = cfg.runtime.max_keypoints
    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    prev_desc = jnp.asarray(rng.random((B, K, 256), np.float32))
    prev_desc = prev_desc / jnp.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 400)
    prev_valid = jnp.ones((B, K), bool)
    on_tpu = jax.default_backend() == "tpu"
    cell = 8
    hc, wc = H // cell, W // cell

    def staged(stage):
        """Cumulative prefix of the production extract program."""

        @jax.jit
        def run(images, prev_desc, prev_uv, prev_valid):
            x = images
            from sp_orb_slam_tpu.ops import pallas_pair1t

            if on_tpu:
                x = pallas_pair1t.fused_pair1t(images, params)
            else:
                x = images[..., None].astype(jnp.bfloat16)
                x = _maxpool2(_conv(_conv(x, params["conv1a"]),
                                    params["conv1b"]))
            for na, nb in (("conv2a", "conv2b"), ("conv3a", "conv3b")):
                x = _maxpool2(_conv(_conv(x, params[na]), params[nb]))
            x = _conv(x, params["conv4a"])
            x = _conv(x, params["conv4b"])
            semi = _conv(_conv(x, params["convPa"]), params["convPb"],
                         relu=False).astype(jnp.float32)
            coarse = _conv(_conv(x, params["convDa"]), params["convDb"],
                           relu=False).astype(jnp.float32)
            coarse = coarse / jnp.linalg.norm(coarse, axis=-1, keepdims=True)
            if stage == "convs":
                return semi, coarse

            # lse formulation (models/superpoint.py round-4): no dense
            # softmax materialization
            lse = jax.scipy.special.logsumexp(semi, axis=-1)
            semi_nodust = semi[..., :64]
            dense_dust = jnp.exp(semi[..., 64] - lse)
            cellmax = jnp.max(semi_nodust, axis=-1)
            score = jnp.exp(cellmax - lse)
            idx = jnp.argmax(semi_nodust, axis=-1).astype(jnp.int32)
            dy, dx = idx // cell, idx % cell
            cell_v = jax.lax.broadcasted_iota(jnp.int32, (B, hc, wc), 1) * cell
            cell_u = jax.lax.broadcasted_iota(jnp.int32, (B, hc, wc), 2) * cell
            cand_uv = jnp.stack([cell_u + dx, cell_v + dy], axis=-1)
            cand_valid = score >= cfg.extractor.conf_thresh
            if stage == "softmax":
                return dense_dust, score, cand_uv, coarse

            log_eps = jnp.log(jnp.float32(1e-3))
            heat_log = jnp.maximum(semi_nodust - lse[..., None], log_eps)
            mn = -jnp.max(jnp.maximum(cellmax - lse, log_eps),
                          axis=(1, 2)).reshape(B, 1, 1)
            mx = -jnp.min(jnp.maximum(jnp.min(semi_nodust, axis=-1) - lse,
                                      log_eps), axis=(1, 2)).reshape(B, 1, 1)
            hf = heat_log.reshape(B, hc, wc, cell, cell)
            hf = jnp.transpose(hf, (0, 1, 3, 2, 4)).reshape(B, H, W)
            heat_inv = (mx + hf) / (mx - mn)
            if stage == "heat":
                return dense_dust, score, cand_uv, coarse, heat_inv

            if on_tpu:
                alive = pallas_nms.batched_grid_nms(
                    score, cand_uv, cand_valid, dist=cfg.extractor.nms_dist,
                    iters=cfg.extractor.nms_iters)
            else:
                alive = jax.vmap(partial(
                    nms_ops.greedy_grid_nms, dist=cfg.extractor.nms_dist,
                    iters=cfg.extractor.nms_iters))(score, cand_uv,
                                                    cand_valid)
            if stage == "nms":
                return dense_dust, score, cand_uv, coarse, heat_inv, alive

            kps = jax.vmap(lambda s, cu, cv, al: nms_ops.select_keypoints(
                s, cu, cv, num_features=cfg.tracking.num_features,
                max_keypoints=K, image_hw=(H, W),
                dist=cfg.extractor.nms_dist, border=cfg.extractor.border,
                nms_iters=cfg.extractor.nms_iters, alive=al,
                emission="sort"))(score, cand_uv, cand_valid, alive)
            if stage == "select":
                return kps, heat_inv, coarse

            desc = jax.vmap(partial(superpoint.sample_descriptors,
                                    image_hw=(H, W)))(coarse, kps.uv)
            desc = jnp.where(kps.valid[..., None], desc, 0.0)
            if stage == "desc":
                return kps, desc, heat_inv

            if on_tpu:
                cov2, cov2_inv, response = pallas_cov.pallas_covariance(
                    heat_inv, kps.uv, kps.valid,
                    radius=cfg.extractor.cov_window,
                    iters=cfg.extractor.cov_iters)
            else:
                from sp_orb_slam_tpu.ops import covariance as cov_ops

                cov2, cov2_inv, response = jax.vmap(partial(
                    cov_ops.keypoint_covariance,
                    radius=cfg.extractor.cov_window,
                    iters=cfg.extractor.cov_iters))(heat_inv, kps.uv,
                                                    kps.valid)
            if stage == "cov":
                return kps, desc, cov2_inv

            def match_one(desc, uv, valid, pdesc, puv, pvalid):
                m = matching.search_for_initialization(
                    pdesc, pvalid, puv, desc, uv, valid,
                    window=100, ratio=0.9)
                return m.n_matches

            n = jax.vmap(match_one)(desc, kps.uv, kps.valid,
                                    prev_desc, prev_uv, prev_valid)
            return kps, desc, cov2_inv, n

        return run

    def timeit(fn, *a, iters=args.iters):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}
    prev = None
    for stage in args.stages.split(","):
        if not stage:
            continue
        ms = timeit(staged(stage), images, prev_desc, prev_uv, prev_valid)
        results[f"{stage}_ms"] = round(ms, 2)
        delta = None if prev is None else round(ms - prev, 2)
        prev = ms
        print(f"{stage}: {ms:.2f} ms/batch"
              + (f"  (delta {delta:+.2f})" if delta is not None else ""),
              flush=True)

    if args.batch_sweep:
        from sp_orb_slam_tpu.extractor import extract

        for bs in [int(x) for x in args.batch_sweep.split(",")]:
            imgs = jnp.asarray(rng.random((bs, H, W), np.float32))
            pd = prev_desc[:1].repeat(bs, 0)
            pu = prev_uv[:1].repeat(bs, 0)
            pv = prev_valid[:1].repeat(bs, 0)

            @jax.jit
            def step(images, pd, pu, pv):
                feats = extract(
                    params, images, num_features=cfg.tracking.num_features,
                    max_keypoints=K, compute_dtype=jnp.bfloat16)

                def match_one(desc, uv, valid, pdesc, puv, pvalid):
                    m = matching.search_for_initialization(
                        pdesc, pvalid, puv, desc, uv, valid,
                        window=100, ratio=0.9)
                    return m.n_matches

                n = jax.vmap(match_one)(feats.desc, feats.uv, feats.valid,
                                        pd, pu, pv)
                return feats, n

            ms = timeit(step, imgs, pd, pu, pv)
            results[f"full_b{bs}_ms"] = round(ms, 2)
            results[f"full_b{bs}_fps"] = round(bs / ms * 1e3, 1)
            print(f"full b={bs}: {ms:.2f} ms/batch = "
                  f"{bs / ms * 1e3:.0f} f/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
