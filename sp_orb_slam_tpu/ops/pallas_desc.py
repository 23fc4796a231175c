"""Pallas TPU kernels for bilinear descriptor sampling (dense + sparse).

Samples every cell's candidate keypoint descriptor from the coarse
descriptor map — the same math as models/superpoint.sample_descriptors_dense
(9-tap stencil reformulation of torch grid_sampler_2d align_corners=True;
reference semantics at src/cv/sp_extractor.cpp:134-148) — in one pass with
VMEM-resident tiles.

Why: the XLA lowerings both miss bandwidth by an order of magnitude on v5e
(round-2/3 measurements at B=32, 752x480): the per-keypoint 4-corner row
gather costs ~3.0 ms/batch (~20x off ideal), and the XLA dense stencil is
slower still (~+3 ms) because the nine shifted (hc*wc, 256) reads
materialize instead of fusing.  Here the stencil is nine static-offset
slice-FMAs over row chunks that never leave VMEM: the only HBM traffic is
one read of the coarse map, one read of the (16x smaller) tap weights, and
one write of the sampled map.

Layout/design:
- cells flatten to rows: coarse (hc*wc, 256) f32, row r = i*wc + j; a tap
  (dy, dx) is then a single static row shift s = dy*wc + dx;
- tap weights are folded from the 4 bilinear corner weights in XLA (tiny
  (hc, wc) scalar math, fuses away) and passed as (rows, 16) f32 with the
  9 taps in lanes 0..8;
- the row dimension is chunked (grid = B x nchunks) so blocks double-buffer
  within VMEM; each step assembles a 3-chunk window (prev|cur|next) in a
  VMEM scratch, giving every tap of the chunk a static in-window slice.
  The chunk size satisfies chunk >= wc + 2 so taps reach at most one chunk
  over.  Block indices clamp at the sequence ends and the final blocks may
  be partial, so parts of the window can hold unrelated or undefined rows —
  safe because (a) corner clamping makes any tap that would leave the cell
  grid carry weight exactly 0, (b) the multiply is guarded by a
  where(w > 0, x, 0) select so even non-finite garbage cannot leak, and
  (c) rows past hc*wc are zeroed before the store;
- rows are L2-renormalized in-kernel (guarded rsqrt), matching
  sample_descriptors' renormalize step.

The kernel emits the full dense (hc*wc, 256) sampled map; picking each
surviving keypoint's own cell row is the same cheap take_along_axis the
uv/score emission already pays (extractor.py dense path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WPAD = 16     # weight lanes (9 taps used)


def _taps(wc: int):
    """Tap order t <-> (dy, dx), shift s = dy*wc + dx."""
    return [((dy + 1) * 3 + (dx + 1), dy * wc + dx)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _desc_kernel(prev_ref, cur_ref, nxt_ref, w_ref, out_ref, win_ref, *,
                 wc: int, n_valid: int, chunk: int):
    c = pl.program_id(1)
    D = cur_ref.shape[-1]

    win_ref[0:chunk] = prev_ref[0]
    win_ref[chunk:2 * chunk] = cur_ref[0]
    win_ref[2 * chunk:] = nxt_ref[0]

    acc = jnp.zeros((chunk, D), jnp.float32)
    for t, s in _taps(wc):
        w = w_ref[0, :, t:t + 1]                      # (chunk, 1)
        x = win_ref[chunk + s:2 * chunk + s]          # static slice
        acc = acc + w * jnp.where(w > 0.0, x, 0.0)

    # L2 renormalize (sample_descriptors' final step); guarded so padded /
    # beyond-image rows emit exact zeros instead of NaN
    ss = jnp.sum(acc * acc, axis=1, keepdims=True)
    acc = acc * jnp.where(ss > 0.0, jax.lax.rsqrt(ss), 0.0)

    # zero rows past the image (the last chunk may overhang hc*wc)
    row = (c * chunk
           + jax.lax.broadcasted_iota(jnp.int32, (chunk, D), 0))
    out_ref[0] = jnp.where(row < n_valid, acc, 0.0)


def _fold_weights(cand_uv: jnp.ndarray, hc: int, wc: int,
                  image_hw: tuple) -> jnp.ndarray:
    """Fold the 4 bilinear corner weights of each cell's candidate onto the
    3x3 tap stencil (same math as sample_descriptors_dense's hit-mask
    fold).  cand_uv: (hc, wc, 2) pixel coords.  Returns (hc*wc, WPAD) f32,
    taps in lanes 0..8."""
    H, W = image_hw
    gx = cand_uv[..., 0].astype(jnp.float32) * (wc - 1) / W
    gy = cand_uv[..., 1].astype(jnp.float32) * (hc - 1) / H
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 1)
    x1 = jnp.minimum(x0 + 1, wc - 1)
    y1 = jnp.minimum(y0 + 1, hc - 1)
    du = gx - x0.astype(jnp.float32)
    dv = gy - y0.astype(jnp.float32)

    ci = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    corners = ((y0, x0, (1 - du) * (1 - dv)), (y0, x1, du * (1 - dv)),
               (y1, x0, (1 - du) * dv), (y1, x1, du * dv))
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = jnp.zeros((hc, wc), jnp.float32)
            for yy, xx, wt in corners:
                hit = ((yy - ci == dy) & (xx - cj == dx)).astype(jnp.float32)
                acc = acc + hit * wt
            taps.append(acc)
    taps += [jnp.zeros((hc, wc), jnp.float32)] * (WPAD - len(taps))
    return jnp.stack(taps, axis=-1).reshape(hc * wc, WPAD)


def _chunk_rows(n: int, wc: int) -> int:
    """Rows per grid step: multiple of 8, >= wc + 2 (taps reach at most the
    adjacent chunk), <= 512 to keep blocks + the 3-chunk window scratch +
    the unrolled tap temporaries inside the 16 MB scoped-VMEM stack limit
    (chunk=1024 measured 19.95M > 16M on v5e)."""
    lo = -(-(wc + 2) // 8) * 8
    return max(lo, min(512, -(-n // 8) * 8))


@partial(jax.jit, static_argnames=("image_hw", "interpret"))
def pallas_sample_descriptors_dense(coarse: jnp.ndarray,
                                    cand_uv: jnp.ndarray,
                                    image_hw: tuple,
                                    interpret: bool = False) -> jnp.ndarray:
    """Batched dense bilinear sampling: coarse (B, hc, wc, D) L2-normalized,
    cand_uv (B, hc, wc, 2) -> (B, hc, wc, D) unit-norm sampled descriptors.

    Matches jax.vmap(superpoint.sample_descriptors_dense) up to f32
    rounding; golden-tested in tests/test_pallas_desc.py.
    """
    B, hc, wc, D = coarse.shape
    n = hc * wc
    chunk = _chunk_rows(n, wc)
    nc = -(-n // chunk)

    flat = coarse.reshape(B, n, D).astype(jnp.float32)
    w = jax.vmap(partial(_fold_weights, hc=hc, wc=wc, image_hw=image_hw)
                 )(cand_uv)

    def idx_prev(b, c):
        return (b, jnp.maximum(c - 1, 0), 0)

    def idx_cur(b, c):
        return (b, c, 0)

    def idx_nxt(b, c):
        return (b, jnp.minimum(c + 1, nc - 1), 0)

    out = pl.pallas_call(
        partial(_desc_kernel, wc=wc, n_valid=n, chunk=chunk),
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, chunk, D), idx_prev),
            pl.BlockSpec((1, chunk, D), idx_cur),
            pl.BlockSpec((1, chunk, D), idx_nxt),
            pl.BlockSpec((1, chunk, WPAD), idx_cur),
        ],
        out_specs=pl.BlockSpec((1, chunk, D), idx_cur),
        out_shape=jax.ShapeDtypeStruct((B, n, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * chunk, D), jnp.float32)],
        interpret=interpret,
    )(flat, flat, flat, w)
    return out.reshape(B, hc, wc, D)


# ---------------------------------------------------------------------------
# sparse per-keypoint gather
# ---------------------------------------------------------------------------
#
# The dense kernel above still hands XLA a 1024-row pick afterwards, and the
# round-3 numbers say the XLA row gather's cost is ROW-COUNT bound (~3
# ms/batch at B=32 whether gathering 4 corners directly or picking rows of a
# pre-sampled dense map).  The only way under it is to do the per-keypoint
# addressing inside a kernel: with the coarse map VMEM-resident and
# flattened to (hc*wc, D), a keypoint's four align_corners bilinear corners
# are two ADJACENT-row pairs (rows r0, r0+1 and r0+wc, r0+wc+1 with
# r0 = y0*wc + x0; x1 = x0+1 / y1 = y0+1 never clamp because the NMS border
# filter keeps keypoints >= 8 px inside the image, extractor.py).  Row
# indices ride the scalar-prefetch path (SMEM); corner weights are
# precomputed in XLA and live in VMEM lanes.
#
# Mosaic alignment rules shape the addressing (first TPU compile of the
# naive version failed with "cannot statically prove that index in
# dimension 1 is a multiple of 8"): dynamic sublane offsets of f32
# loads/stores must be provably 8-aligned.  So each row pair is fetched as
# one ALIGNED 16-row block from base = 8*(r0//8) (16 covers r0, r0+1 for
# any r0 % 8, incl. the 7 -> next-block crossing) and the two rows are
# folded out in-register by a masked-weighted reduce (one reduce per pair:
# the bilinear weights ride the row mask).  Keypoints are processed in
# groups of 8 so the output store is an aligned (8, D) block.  The coarse
# map is padded by 16 zero rows so the last block's 16-row window never
# reads out of bounds.


@partial(jax.jit, static_argnames=("image_hw", "interpret"))
def pallas_sample_descriptors_sparse(coarse: jnp.ndarray, uv: jnp.ndarray,
                                     image_hw: tuple,
                                     interpret: bool = False) -> jnp.ndarray:
    """Batched sparse bilinear sampling: coarse (B, hc, wc, D) L2-normalized
    f32, uv (B, K, 2) keypoint pixel coords -> (B, K, D) unit-norm sampled
    descriptors (invalid slots included — mask outside, as the gather path
    does).  Matches jax.vmap(superpoint.sample_descriptors) up to f32
    rounding; golden-tested in tests/test_pallas_desc.py."""
    B, hc, wc, D = coarse.shape
    K = uv.shape[1]
    H, W = image_hw
    n = hc * wc

    gx = uv[..., 0] * (wc - 1) / W
    gy = uv[..., 1] * (hc - 1) / H
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 2)
    du = jnp.clip(gx - x0.astype(jnp.float32), 0.0, 1.0)
    dv = jnp.clip(gy - y0.astype(jnp.float32), 0.0, 1.0)
    rows = y0 * wc + x0                               # (B, K) int32
    wts = jnp.stack([(1 - du) * (1 - dv), du * (1 - dv),
                     (1 - du) * dv, du * dv], axis=-1)  # (B, K, 4)

    assert K % 8 == 0, "keypoint capacity must be a multiple of 8"
    n_pad = n + 16  # aligned 16-row windows never read past the pad
    flat = coarse.reshape(B, n, D).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, 0), (0, n_pad - n), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, 4), lambda b, rows: (b, 0, 0)),
            pl.BlockSpec((1, n_pad, D), lambda b, rows: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, D), lambda b, rows: (b, 0, 0)),
    )

    def kernel(rows_all_ref, wts_ref, coarse_ref, out_ref):
        b = pl.program_id(0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (16, D), 0)

        def pair(r, w_lo, w_hi):
            """Weighted sum w_lo*row[r] + w_hi*row[r+1] via one aligned
            16-row load + masked-weighted reduce."""
            base = pl.multiple_of(8 * (r // 8), 8)
            off = r - base
            blk = coarse_ref[0, pl.dslice(base, 16), :]       # (16, D)
            wv = (jnp.where(ri == off, w_lo, 0.0)
                  + jnp.where(ri == off + 1, w_hi, 0.0))
            return jnp.sum(blk * wv, axis=0)                  # (D,)

        def body(g, _):
            k0 = pl.multiple_of(g * 8, 8)
            w_g = wts_ref[0, pl.dslice(k0, 8), :]             # (8, 4)
            acc = jnp.zeros((8, D), jnp.float32)
            gi = jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)
            for j in range(8):
                r0 = rows_all_ref[b, g * 8 + j]
                d = (pair(r0, w_g[j, 0], w_g[j, 1])
                     + pair(r0 + wc, w_g[j, 2], w_g[j, 3]))
                ss = jnp.sum(d * d)
                d = d * jnp.where(ss > 0.0, jax.lax.rsqrt(ss), 0.0)
                acc = jnp.where(gi == j, d[None, :], acc)
            out_ref[0, pl.dslice(k0, 8), :] = acc
            return 0

        jax.lax.fori_loop(0, K // 8, body, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, D), jnp.float32),
        interpret=interpret,
    )(rows, wts, flat)
    return out
