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
import sys
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

    import os
    # SP_BENCH_MATCH / SP_BENCH_HEAT_SHUFFLE: on-chip A/B knobs for the
    # round-4/5 tail work (scripts/profile_r4g.py); the defaults are the
    # measured winners (r5b chip A/B, full fused program at B=32:
    # xla/transpose 35.08 ms, xla/slices 34.79, pallas/transpose 34.13,
    # pallas/slices 33.90 = 944 f/s)
    match_method = os.environ.get("SP_BENCH_MATCH", "pallas")
    heat_shuffle = os.environ.get("SP_BENCH_HEAT_SHUFFLE", "slices")

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
            with_heat_inv=False,  # dead 46 MB output otherwise (r4 tail work)
            heat_shuffle=heat_shuffle,
            compute_dtype=jnp.bfloat16,
        )

        if match_method == "pallas":
            from sp_orb_slam_tpu.ops import pallas_match

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

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    K = cfg.runtime.max_keypoints
    prev_desc = jnp.asarray(rng.random((B, K, 256), np.float32))
    prev_desc = prev_desc / jnp.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 400)
    prev_valid = jnp.ones((B, K), bool)

    # capture protocol (round-4 hygiene): compile, then WARMUP iterations to
    # absorb post-compile stragglers, then REPEATS timed blocks of ITERS
    # each; the headline is the MEDIAN block (robust to tunnel hiccups),
    # and the spread is printed so a drifting number is visible in the
    # artifact instead of needing a NOTES forensic.
    WARMUP, REPEATS, ITERS = 4, 5, 10
    feats, n = step(images, prev_desc, prev_uv, prev_valid)
    jax.block_until_ready(n)
    for _ in range(WARMUP):
        feats, n = step(images, feats.desc, feats.uv, feats.valid)
    jax.block_until_ready(n)

    block_dt = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            feats, n = step(images, feats.desc, feats.uv, feats.valid)
        jax.block_until_ready(n)
        block_dt.append((time.perf_counter() - t0) / ITERS)
    block_dt.sort()
    dt = block_dt[len(block_dt) // 2]

    fps = B / dt
    print(json.dumps({
        "metric": "superpoint_extract_match_fps_per_chip_752x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 2),
        "capture": {"batch": B, "warmup_iters": WARMUP, "repeats": REPEATS,
                    "iters_per_repeat": ITERS,
                    "fps_min": round(B / block_dt[-1], 2),
                    "fps_median": round(fps, 2),
                    "fps_max": round(B / block_dt[0], 2)},
    }))
    bench_tracking_step(cfg, extract_ms_per_frame=dt / B * 1e3)


def bench_tracking_step(cfg, extract_ms_per_frame: float) -> None:
    """Second metric: the full per-frame SLAM tracking step on-device.

    Measures the two hot per-frame kernels of the OK path — dust coarse
    alignment (40-iter LM + occ-grid association + post optimization) and
    local-map tracking (frustum + projection match + 4x10 pose LM) — as the
    host calls them (one packed readback each, axon-tunnel latency
    included), plus the amortized frontend, against the reference's
    <= 50 ms/frame whole-pipeline budget (system.cpp:141,190-192).
    Fallback-stage latencies (motion/ref) land in the same host-call regime
    and are reported to NOTES.md rather than here."""
    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.slam.kernels import TrackingKernels

    rng = np.random.default_rng(7)
    k = TrackingKernels(cfg)
    K = cfg.runtime.max_keypoints
    P_dust = cfg.runtime.dust_points_cap
    P_loc = cfg.runtime.local_points_cap
    hc, wc = cfg.grid_h, cfg.grid_w

    def mk_points(P):
        pos = np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                        rng.uniform(4.0, 8.0, P)], 1).astype(np.float32)
        desc = rng.normal(size=(P, 256)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        # map-point descriptors are device-resident in the production path
        # (MapPointPool.device_bank + on-device row gather): the steady-
        # state per-frame cost carries no descriptor upload
        return pos, jnp.asarray(desc)

    Tcw = np.eye(4, dtype=np.float32)
    pos_d, desc_d = mk_points(P_dust)
    pos_l, desc_l = mk_points(P_loc)
    kp_uv = np.stack([rng.uniform(8, cfg.camera.width - 8, K),
                      rng.uniform(8, cfg.camera.height - 8, K)],
                     1).astype(np.float32)
    kp_desc = rng.normal(size=(K, 256)).astype(np.float32)
    kp_desc /= np.linalg.norm(kp_desc, axis=-1, keepdims=True)
    kp_desc = jnp.asarray(kp_desc)
    kp_cov = np.ones((K, 2), np.float32)
    kp_valid = np.ones(K, bool)
    dust = jnp.asarray(rng.random((hc, wc), np.float32))
    occ = jnp.asarray(rng.integers(-1, K, (hc, wc)).astype(np.int32))
    ones_d = np.ones(P_dust, bool)
    mp_normal = np.tile(np.array([0, 0, -1.0], np.float32), (P_loc, 1))
    ones_l = np.ones(P_loc, bool)
    zeros_l = np.zeros(P_loc, bool)
    kp2mp0 = np.full(K, -1, np.int32)

    def run_dust():
        return k.dust_track(Tcw, pos_d, desc_d, ones_d, dust, occ, kp_desc,
                            kp_uv, kp_cov, kp_valid)

    def run_local():
        return k.local_map_track(Tcw, pos_l, desc_l, mp_normal,
                                 ones_l, zeros_l, kp2mp0, kp_desc, kp_uv,
                                 kp_cov, kp_valid)

    # the production OK path (tracking._try_fused): coarse + fine as ONE
    # device program / ONE roundtrip per frame
    dust2local = np.arange(P_dust, dtype=np.int32)
    fused_args = (Tcw, pos_d, desc_d, ones_d, dust, occ,
                  pos_l, desc_l, mp_normal, ones_l, dust2local,
                  kp_desc, kp_uv, kp_cov, kp_valid)

    def run_fused():
        return k.fused_track(*fused_args)

    # --- device-side normalization (VERDICT r4 weak #3) -----------------
    # The wall number rides the axon tunnel (~25 ms/call roundtrip a local
    # chip never pays) and its day-to-day drift is what made the r4 step
    # claim fragile (37.18 vs 47.83 ms across two same-round captures).
    # Two tunnel-independent probes, both with EXACTLY the production
    # call's transfer profile (same PackedInput split, same packed sizes):
    #   fused_x2: the fused body run TWICE in-graph (pose chained) — its
    #     wall minus the single-pass wall is one extra in-graph body
    #     execution, i.e. the pure device compute of the fused stage;
    #   fused_null: same inputs, same-size output, ~zero compute — the
    #     per-call transfer+dispatch floor at the production byte sizes.
    from sp_orb_slam_tpu.slam import kernels as kmod

    dcfg = cfg.tracking.dust
    mcfg = cfg.tracking.map
    body_kw = dict(dust_iters=dcfg.iters, huber_delta=dcfg.huber_delta,
                   chi2_inlier=dcfg.chi2_inlier,
                   view_cos_th=mcfg.th_view_cos,
                   window_th=float(mcfg.th_window_size),
                   match_adaptive=mcfg.match_adaptive,
                   c2_thresh=dcfg.c2_thresh)
    K_intr, bounds = k.K_intr, k.bounds

    def fused_body_x2(*args):
        out1 = kmod.fused_track_body(*args, K_intr, bounds, **body_kw)
        out2 = kmod.fused_track_body(out1["l_Tcw"], *args[1:], K_intr,
                                     bounds, **body_kw)
        return k.fused_layout.pack(**out2)

    def fused_body_null(*args):
        # touches every input, emits the production-size packed output,
        # does no real work: the sized per-call floor
        s = sum(jnp.sum(a[..., :1].astype(jnp.float32)) for a in args)
        return jnp.full((k.fused_layout.total,), 0.0, jnp.float32) + s * 0.0

    fused_x2 = kmod.PackedInput(fused_body_x2)
    fused_null = kmod.PackedInput(fused_body_null)

    def run_fused_x2():
        return np.asarray(fused_x2(*fused_args))

    def run_fused_null():
        return np.asarray(fused_null(*fused_args))

    def timed(fn, iters=10, repeats=3, warmup=3):
        fn()  # compile
        for _ in range(warmup):
            fn()
        blocks = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            blocks.append((time.perf_counter() - t0) / iters * 1e3)
        blocks.sort()
        return blocks[len(blocks) // 2]  # median block, robust to hiccups

    # per-call floor of this environment: one tiny upload + dispatch + one
    # tiny readback through the axon tunnel (a local chip pays ~none of it);
    # the two tracking stages each ride exactly one such roundtrip pair
    null_in = np.zeros(8, np.float32)

    @jax.jit
    def null_fn(x):
        return x + 1.0

    def run_null():
        return np.asarray(null_fn(null_in))

    null_ms = timed(run_null)
    dust_ms = timed(run_dust)
    local_ms = timed(run_local)

    # The fused-stage probes are INTERLEAVED per repeat block: the axon
    # tunnel drifts on minute scales (r4: 37.18 vs 47.83 ms same-round;
    # r5a: 53.3 vs 36.1 within ONE bench run), so single/x2/null measured
    # minutes apart see different tunnels and their differences are
    # garbage.  Within one repeat the three run back-to-back; the device
    # compute is the median of the PER-REPEAT (x2 - single) deltas.
    for fn in (run_fused, run_fused_x2, run_fused_null):
        fn()  # compile
        fn()
        fn()  # absorb post-compile stragglers
    REPEATS_F, ITERS_F = 7, 8
    singles, doubles, nulls = [], [], []
    for _ in range(REPEATS_F):
        for fn, acc in ((run_fused, singles), (run_fused_x2, doubles),
                        (run_fused_null, nulls)):
            t0 = time.perf_counter()
            for _ in range(ITERS_F):
                fn()
            acc.append((time.perf_counter() - t0) / ITERS_F * 1e3)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    fused_ms = med(singles)
    fused_null_ms = med(nulls)
    deltas = [d - s for d, s in zip(doubles, singles)]
    fused_device_ms = max(med(deltas), 0.0)
    # same-session reproducibility split: medians of the first and second
    # halves of the interleaved capture must agree within 10%
    half = REPEATS_F // 2
    fused_ms_a = med(singles[:half])
    fused_ms_b = med(singles[half:])
    # production OK path = amortized extraction + ONE fused coarse+fine
    # program per frame (tracking._try_fused); the split dust/local stages
    # are the fallback-cascade costs, reported for diagnostics
    step_ms = extract_ms_per_frame + fused_ms
    # device-side step: what a LOCAL chip pays — amortized extraction
    # (device-bound at B=32; its per-frame share of the block roundtrip is
    # null_ms/B) + the fused stage's pure device compute
    step_device_ms = (max(extract_ms_per_frame - null_ms / 32.0, 0.0)
                      + fused_device_ms)
    # stderr: the driver contract is ONE JSON line on stdout (the headline
    # frames/s metric printed by main); this secondary metric rides stderr
    print(json.dumps({
        "metric": "slam_full_frame_step_ms_752x480",
        "value": round(step_ms, 2),
        "unit": "ms/frame",
        # reference whole-pipeline budget is <= 50 ms/frame on its GPU
        "vs_baseline": round(50.0 / step_ms, 2),
        "stages_ms": {"extract_amortized": round(extract_ms_per_frame, 2),
                      "fused_coarse_fine": round(fused_ms, 2),
                      "fused_coarse_fine_half1": round(fused_ms_a, 2),
                      "fused_coarse_fine_half2": round(fused_ms_b, 2),
                      "dust_track_unfused": round(dust_ms, 2),
                      "local_map_track_unfused": round(local_ms, 2),
                      "tunnel_roundtrip_floor": round(null_ms, 2)},
        "device_ms": {
            # step as a local (untunneled) deployment would see it
            "step_device": round(step_device_ms, 2),
            # fused-stage pure device compute: wall(body x2) - wall(body x1)
            "fused_compute": round(fused_device_ms, 2),
            # per-call floor at the production transfer sizes (packed
            # input ~0.6 MB up, packed output ~40 KB down, zero compute)
            "fused_sized_roundtrip_floor": round(fused_null_ms, 2),
            # consistency check: compute + sized floor should bracket the
            # wall number; a gap means tunnel drift mid-capture
            "fused_wall_minus_parts": round(
                fused_ms - fused_device_ms - fused_null_ms, 2)},
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
