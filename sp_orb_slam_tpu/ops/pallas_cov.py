"""Pallas TPU kernel for the per-keypoint covariance flood fill.

Same semantics as ops/covariance.keypoint_covariance (windowed monotone-
descent fill; reference BFS at src/cv/sp_extractor.cpp:252-340), but the
whole stage — window extraction, fill iterations, moment reduction — runs in
one kernel with VMEM-resident data.  The XLA version is gather-bound: the
per-keypoint dynamic_slice windows cost ~10 ms/batch (the fill itself is
~2.6 ms), and every XLA re-layout alternative (take / transpose /
scalar-gather) measured 30-160 ms on v5e.

Mosaic constraints that shaped this kernel (each one found the hard way):
- dynamic *lane* stores (win[..., pl.ds(k, 1)]) crash the compiler
  (round-1 kernel);
- DMA slices of VMEM refs must be tile-aligned (shape multiple of 8
  sublanes), which a 17-row window violates;
- vector loads allow dynamic offsets, but the sublane offset must be
  provably a multiple of 8.

Resulting design:
- windows live in a (KHI, 24, 512) f32 scratch: 512 lanes = 16 keypoints x
  32 columns, so every VPU op runs lane-dense;
- keypoint k of a chunk maps to (khi, klo) = (k // 16, k % 16); a 24-row
  patch is vector-loaded from heat at the 8-aligned row v0a = 8*floor(v0/8)
  and stored at a *static* lane offset (klo is a python unroll);
- the window's vertical position inside the 24-row patch varies per
  keypoint: the center row index rides a per-lane int32 input (crow), and
  all row masks/moment offsets are computed against it;
- column neighbors come from single-lane rolls; lanes 17..31 of each group
  stay -inf so rolls cannot leak between keypoints;
- per-group moment sums run on the MXU against a constant 0/1 selection
  matrix, with the f32 operand split into three exact bf16 limbs, so the
  reduction is exact up to f32 summation rounding;
- the kernel emits (4, nchunk, KHI, 16) moment slabs; the (tiny) reshape to
  (4, K) happens in XLA where it is free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32      # lanes per keypoint (window cols live in [0, size))
KPG = 16        # keypoints per lane-slab (512 lanes total)
LANES = GROUP * KPG
PATCH_ROWS = 24  # 8-aligned load covering a 17-row window at any v0 % 8


def _cov_kernel(vu_ref, heat_ref, crow_ref, out_ref, win_ref, *, radius,
                iters, chunk, khi_n):
    size = 2 * radius + 1
    H, W = heat_ref.shape[1], heat_ref.shape[2]
    c = pl.program_id(1)

    neg = jnp.float32(-jnp.inf)
    win_ref[:, :, :] = jnp.full((khi_n, PATCH_ROWS, LANES), neg, jnp.float32)

    def load_slab(khi, _):
        for klo in range(KPG):  # python unroll: static lane offsets
            kk = c * chunk + khi * KPG + klo
            # offsets are aligned by construction (dynamic vector-load
            # offsets must be 8-aligned in sublanes, 128-aligned in lanes);
            # Mosaic needs the proofs as hints
            u0a = pl.multiple_of(vu_ref[0, 0, kk], 128)
            v0a = pl.multiple_of(vu_ref[0, 1, kk], 8)
            su = vu_ref[0, 2, kk]  # window col offset within the 256 lanes
            patch = heat_ref[0, pl.ds(v0a, PATCH_ROWS), pl.ds(u0a, 256)]
            # compact the window to the lane front with a dynamic rotate
            # (value-level dynamic_slice is unimplemented in Pallas TPU)
            w = pltpu.roll(patch, (256 - su) % 256, 1)[:, :size]
            win_ref[khi, :, klo * GROUP:klo * GROUP + size] = w
        return 0

    jax.lax.fori_loop(0, khi_n, load_slab, 0)

    win = win_ref[:, :, :]
    crow = crow_ref[0, 0, :, :]  # (khi_n, LANES) center row per lane

    rid = jax.lax.broadcasted_iota(jnp.int32, (khi_n, PATCH_ROWS, LANES), 1)
    cid = jax.lax.broadcasted_iota(jnp.int32, (khi_n, PATCH_ROWS, LANES), 2)
    col = jnp.bitwise_and(cid, GROUP - 1)   # column within the lane group
    drow = rid - crow[:, None, :]
    center = (drow == 0) & (col == radius)
    in_rows = (drow >= -radius) & (drow <= radius)

    pos = ((win > 0.0) & in_rows).astype(jnp.float32)
    reach0 = jnp.where(center, 1.0, 0.0).astype(jnp.float32)

    # hoist the loop-invariant descent masks: whether the neighbor in each
    # direction has a HIGHER heat value depends only on `win`, not on the
    # fill state, and `grow * pos` distributes onto the per-direction masks
    # (same hoist that carried the NMS kernel, ops/pallas_nms.py)
    def shift_rows(x, dv, fill):
        return jnp.concatenate(
            [x[:, 1:, :], jnp.full((khi_n, 1, LANES), fill)]
            if dv == 1 else
            [jnp.full((khi_n, 1, LANES), fill), x[:, :-1, :]], axis=1)

    masks = []
    for dv in (-1, 1):
        nv = shift_rows(win, dv, neg)
        masks.append((win < nv).astype(jnp.float32) * pos)
    for du in (-1, 1):
        # rolls wrap across lane groups, but lanes >= size hold -inf and
        # zero reach, so wrapped-in values can never grow the fill
        nv = pltpu.roll(win, (-du) % LANES, 2)
        masks.append((win < nv).astype(jnp.float32) * pos)

    def body(_, reach):
        grow = jnp.maximum(
            masks[0] * shift_rows(reach, -1, jnp.float32(0.0)),
            masks[1] * shift_rows(reach, 1, jnp.float32(0.0)))
        grow = jnp.maximum(grow, masks[2] * pltpu.roll(reach, 1 % LANES, 2))
        grow = jnp.maximum(grow, masks[3] * pltpu.roll(reach, LANES - 1, 2))
        return jnp.maximum(reach, grow)

    reach = jax.lax.fori_loop(0, iters, body, reach0)

    # moments: [wsum, sum w*dx^2, sum w*dy^2, response]
    w = reach * jnp.maximum(win, 0.0)
    dx = (col - radius).astype(jnp.float32)
    dy = drow.astype(jnp.float32)
    m0 = jnp.sum(w, axis=1)                    # (khi_n, LANES)
    m1 = jnp.sum(w * dx * dx, axis=1)
    m2 = jnp.sum(w * dy * dy, axis=1)
    m3 = jnp.sum(jnp.where(center, win, 0.0), axis=1)
    m = jnp.concatenate([m0, m1, m2, m3], axis=0)  # (4*khi_n, LANES)

    # exact group reduction on the MXU: split f32 into three bf16 limbs and
    # contract each against the 0/1 group-selection matrix
    gsel = (jax.lax.broadcasted_iota(jnp.int32, (LANES, KPG), 0) // GROUP
            == jax.lax.broadcasted_iota(jnp.int32, (LANES, KPG), 1)
            ).astype(jnp.bfloat16)
    hi = m.astype(jnp.bfloat16)
    r1 = m - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = (jnp.dot(hi, gsel, preferred_element_type=jnp.float32)
           + jnp.dot(mid, gsel, preferred_element_type=jnp.float32)
           + jnp.dot(lo, gsel, preferred_element_type=jnp.float32))
    out_ref[0, :, 0, :, :] = acc.reshape(4, khi_n, KPG)


@partial(jax.jit, static_argnames=("radius", "iters"))
def pallas_covariance(heat_inv: jnp.ndarray, uv: jnp.ndarray,
                      valid: jnp.ndarray, *, radius: int = 8,
                      iters: int = 16):
    """(cov2, cov2_inv, response) for a batch of images.

    heat_inv (B, H, W) f32; uv (B, K, 2) float with K % 16 == 0;
    valid (B, K) bool.  Matches ops/covariance.keypoint_covariance.
    """
    B, H, W = heat_inv.shape
    K = uv.shape[1]
    assert K % KPG == 0
    size = 2 * radius + 1
    assert size <= GROUP and size <= PATCH_ROWS - 7

    # keypoints per grid step: the largest divisor of K that is <= 256 and
    # a multiple of KPG (always exists since K % KPG == 0).  256 (not 512)
    # keeps the scratch slab + blocks inside the 16 MB scoped-VMEM budget
    # when the kernel is fused into large batched programs (B=32 streams
    # at 752x480 OOM'd the remote compiler with 512-keypoint chunks).
    chunk = next(c for c in range(min(KPG * 16, K), 0, -KPG)
                 if K % c == 0)
    khi_n = chunk // KPG
    nchunk = K // chunk

    u0 = jnp.clip(uv[..., 0].astype(jnp.int32) - radius, 0, W - size)
    v0 = jnp.clip(uv[..., 1].astype(jnp.int32) - radius, 0, H - size)
    v0a = jnp.clip((v0 // 8) * 8, 0, H - PATCH_ROWS)
    u0a = (u0 // 128) * 128      # lane-aligned block start; block size 256
    su = u0 - u0a                # window col offset within the block
    crow = v0 - v0a + radius     # center row within the 24-row patch
    # minor dim = K: an SMEM block shaped (1, K, 3) pads 3 -> 128
    # lanes and double-buffers to ~1 MB, blowing the 1 MB SMEM budget
    vu = jnp.stack([u0a, v0a, su], axis=1)  # (B, 3, K) int32
    # pad the lane dim so the (24, 256) aligned block always exists
    Wp = (W // 128) * 128 + 256
    heat_p = jnp.pad(heat_inv, ((0, 0), (0, 0), (0, Wp - W)))
    # lane l = klo*GROUP + col of slab khi holds keypoint khi*KPG + klo
    crow_lane = jnp.repeat(
        crow.reshape(B, nchunk, khi_n, KPG), GROUP, axis=-1)  # (..., LANES)

    grid = (B, nchunk)
    out = pl.pallas_call(
        partial(_cov_kernel, radius=radius, iters=iters, chunk=chunk,
                khi_n=khi_n),
        out_shape=jax.ShapeDtypeStruct((B, 4, nchunk, khi_n, KPG),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, K), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, Wp), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, khi_n, LANES), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 1, khi_n, KPG),
                               lambda b, c: (b, 0, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((khi_n, PATCH_ROWS, LANES), jnp.float32),
        ],
    )(vu, heat_p, crow_lane)

    m = out.reshape(B, 4, K)  # k = c*chunk + khi*KPG + klo, matching loads
    wsum = jnp.maximum(m[:, 0], 1e-12)
    cov_x = m[:, 1] / wsum
    cov_y = m[:, 2] / wsum
    resp = m[:, 3]
    cov2 = jnp.stack([jnp.maximum(cov_x, 1.0), jnp.maximum(cov_y, 1.0)], -1)
    cov2 = jnp.where(valid[..., None], cov2, 1.0)
    return cov2, 1.0 / cov2, jnp.where(valid, resp, 0.0)
