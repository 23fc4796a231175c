"""Pallas TPU kernel fusing the SuperPoint encoder's first conv pair.

Computes maxpool2(relu(conv1b(relu(conv1a(x))))) — the reference pair at
src/cv/sp_extractor.cpp:81-86 — in one kernel, for the bfloat16 compute
path.

Why: the first pair dominates the whole frontend on v5e.  Round-3 stage
split at B=32, 752x480 bf16: pair 1 alone is 24.1 ms of the 45.2 ms
extract+match total (standalone: conv1a 13.9 ms at ~1 TFLOP/s — XLA's
1-input-channel conv lowering is pathological — and conv1b 27.7 ms at 16%
MXU), while the pair's roofline is ~8 ms.  XLA also pays full-resolution
HBM round trips for every intermediate ((B, H, W, 64) activations are
1.5 GB/batch each, ~6.3 GB of traffic).  This kernel streams row tiles:
the only HBM traffic is the grayscale input (23 MB/batch) and the pooled
output (370 MB/batch), and both convs run as large matmuls.

Design (per grid step = one image x one 4-pooled-row tile):

- the input arrives pre-split into even/odd image columns (an XLA strided
  slice of the 23 MB grayscale batch).  Everything in-kernel runs as two
  half-width parallel streams, which makes the 2x2 pool's COLUMN max a
  plain elementwise max of two same-shaped results at the end — no
  stride-2 access or lane-changing reshape anywhere (Mosaic rejects
  vector reshapes that change the lane dimension);
- row blocks (1, 8, W/2) per parity arrive as prev|cur|next (clamped index
  maps) and assemble into 24-row windows; rows outside the image zero out
  (conv zero padding);
- conv1a via im2col on the MXU: each window transposes once (XLU) so image
  columns live in sublanes; the 9 taps of each of the 10 needed y1 rows
  are written as static single-lane columns of a (10, W/2, 16) scratch.
  Tap (dy, dx) of the even stream reads the odd-transposed column for
  odd dx (and vice versa), with +-1 sublane shifts — all static.  One
  (10*W/2, 16) x (16, 64) matmul per parity replaces the 1-channel conv;
- conv1b packs OUTPUT ROW PAIRS into lanes: full-res out rows (2r, 2r+1)
  need y1 rows 2r-1..2r+2, so with q = 0..3 indexing those rows the
  weights become a (256, 128) block matrix
  RHS_dx[64q+ci, 64h+co] = w1b[q-h][dx][ci][co] (zero where q-h falls
  outside the 3x3 kernel).  Per output-column parity, three of six
  half-width (4*W/2, 256) x (256, 128) matmuls accumulate the result:
  full-res col 2c2   reads cols 2c2-1, 2c2, 2c2+1 = odd[c2-1], even[c2], odd[c2]
  full-res col 2c2+1 reads cols 2c2,  2c2+1, 2c2+2 = even[c2], odd[c2], even[c2+1]
  Full contraction (256) + full output lanes (128); the 2/8 zero blocks
  cost 1.33x padded FLOPs vs 2x lost lanes for a naive 64-channel matmul;
- bias + relu in the f32 accumulators, column max (the two parities),
  lane-half max (the packed row pair), cast bf16, store (TP, W/2, 64).

Numerics match the XLA bf16 path in structure: bf16 operands, f32
accumulation, f32 bias+relu, bf16 store (max pooling commutes with the
monotone bf16 rounding).  Golden-tested in tests/test_pallas_pair1.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 4          # pooled rows per tile
RT = 2 * TP     # full-res rows per tile
Y1R = RT + 2    # y1 rows needed (halo 1)
WIN = 3 * RT    # assembled window rows
C = 64          # channel count of the pair


def _build_x9(xT_m1, xT_0, xT_p1, x9_ref):
    """Write the 9 tap columns for one parity stream.

    xT_m1/xT_0/xT_p1 are the (W2, 16) transposed windows supplying the
    dx = -1/0/+1 taps of this stream (pre-shifted in lane space before the
    transpose — Mosaic rejects narrow-vector sublane concatenates, and
    non-128-multiple lane rotates).

    Each row plane assembles as a sum of lane-one-hot broadcast FMAs (9
    tiny (W2, 16) vector ops) followed by ONE full-plane store — NOT as 9
    single-lane column stores, which Mosaic lowers as masked
    read-modify-writes of every (8, 128) tile they touch (~90 of them per
    stream per grid step dominated the first working version of this
    kernel).  Pad lanes 9..15 are exact zeros by construction.
    """
    W2 = xT_0.shape[0]
    srcs = {-1: xT_m1, 0: xT_0, 1: xT_p1}
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
    for j in range(Y1R):
        plane = jnp.zeros((W2, 16), jnp.bfloat16)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                tap = (dy + 1) * 3 + (dx + 1)
                onehot = (lane == tap).astype(jnp.bfloat16)
                plane = plane + srcs[dx][:, 5 + j + dy:6 + j + dy] * onehot
        x9_ref[j] = plane


def _pair1_kernel(pe_ref, ce_ref, ne_ref, po_ref, co_ref, no_ref,
                  pm_ref, cm_ref, nm_ref, pp_ref, cp_ref, np_ref,
                  w1a_ref, b1a_ref, rhs_ref, b2_ref, out_ref,
                  wine_ref, wino_ref, winm_ref, winp_ref,
                  x9e_ref, x9o_ref, y1e_ref, y1o_ref,
                  le_ref, lo_ref, *, H: int, W2: int, stage: str = "all"):
    t = pl.program_id(1)

    # --- assemble 24-row windows per stream; zero rows outside the image
    for win_ref, blocks in ((wine_ref, (pe_ref, ce_ref, ne_ref)),
                            (wino_ref, (po_ref, co_ref, no_ref)),
                            (winm_ref, (pm_ref, cm_ref, nm_ref)),
                            (winp_ref, (pp_ref, cp_ref, np_ref))):
        win_ref[0:RT] = blocks[0][0]
        win_ref[RT:2 * RT] = blocks[1][0]
        win_ref[2 * RT:] = blocks[2][0]
    grow = (t * RT - RT
            + jax.lax.broadcasted_iota(jnp.int32, (WIN, W2), 0))
    inimg = (grow >= 0) & (grow < H)
    wine = jnp.where(inimg, wine_ref[...], jnp.bfloat16(0))
    wino = jnp.where(inimg, wino_ref[...], jnp.bfloat16(0))
    winm = jnp.where(inimg, winm_ref[...], jnp.bfloat16(0))
    winp = jnp.where(inimg, winp_ref[...], jnp.bfloat16(0))

    # --- conv1a as one (Y1R*W2, 16) x (16, 64) matmul per parity --------
    # Full-res tap columns per parity: even row c2 reads cols 2c2+dx =
    # odd[c2-1] / even[c2] / odd[c2]; odd row reads even[c2] / odd[c2] /
    # even[c2+1].  The +-1 parity shifts (odd[c2-1], even[c2+1]) arrive
    # PRE-SHIFTED from XLA (winm/winp) — Mosaic rejects both narrow
    # sublane concatenates and non-128-multiple lane rotates in-kernel.
    # Each window transposes (XLU) so image columns live in sublanes;
    # y1 row j (image row t*RT-1+j) tap dy reads column 5 + j + dy.
    if stage not in ("convb", "dots"):  # ablations skip the conv1a path
        xTe = jnp.transpose(wine[2:2 + 2 * RT], (1, 0))  # (W2, 16)
        xTo = jnp.transpose(wino[2:2 + 2 * RT], (1, 0))
        xTo_m1 = jnp.transpose(winm[2:2 + 2 * RT], (1, 0))
        xTe_p1 = jnp.transpose(winp[2:2 + 2 * RT], (1, 0))
        _build_x9(xTo_m1, xTe, xTo, x9e_ref)
        _build_x9(xTe, xTo, xTe_p1, x9o_ref)

    for x9_ref, y1_ref in (() if stage == "dots" else
                           ((x9e_ref, y1e_ref), (x9o_ref, y1o_ref))):
        if stage == "convb":
            y1_ref[...] = jnp.zeros((Y1R, W2, C), jnp.bfloat16)
            continue
        y1 = jax.lax.dot_general(
            x9_ref[...].reshape(Y1R * W2, 16), w1a_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Y1R*W2, 64)
        y1 = jnp.maximum(y1 + b1a_ref[...], 0.0)
        y1_ref[...] = y1.astype(jnp.bfloat16).reshape(Y1R, W2, C)
        # rows outside the image are conv1b zero padding, NOT conv1a of a
        # zero input (bias+relu would make them nonzero)
        for j in range(Y1R):
            row_g = t * RT - 1 + j

            @pl.when((row_g < 0) | (row_g >= H))
            def _zero(j=j, y1_ref=y1_ref):
                y1_ref[j] = jnp.zeros((W2, C), jnp.bfloat16)

    if stage == "conva":  # ablation: conv1a path only, skip conv1b+pool
        out_ref[0] = y1e_ref[0:TP]
        return

    # --- conv1b + pool, row pairs packed in lanes -----------------------
    for l_ref, y1_ref in (() if stage == "dots" else
                          ((le_ref, y1e_ref), (lo_ref, y1o_ref))):
        l_ref[:, 0:1, :] = jnp.zeros((TP, 1, 4 * C), jnp.bfloat16)
        l_ref[:, W2 + 1:W2 + 2, :] = jnp.zeros((TP, 1, 4 * C), jnp.bfloat16)
        for rp in range(TP):
            for q in range(4):
                l_ref[rp, 1:W2 + 1, C * q:C * (q + 1)] = y1_ref[2 * rp + q]

    def shifted(l_ref, dc):
        return l_ref[:, 1 + dc:W2 + 1 + dc, :].reshape(TP * W2, 4 * C)

    def mm(lhs, dxi):
        return jax.lax.dot_general(
            lhs, rhs_ref[dxi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # full-res col 2c2:   (dx=-1) odd[c2-1], (dx=0) even[c2], (dx=+1) odd[c2]
    acc_a = (mm(shifted(lo_ref, -1), 0) + mm(shifted(le_ref, 0), 1)
             + mm(shifted(lo_ref, 0), 2))
    # full-res col 2c2+1: (dx=-1) even[c2], (dx=0) odd[c2], (dx=+1) even[c2+1]
    acc_b = (mm(shifted(le_ref, 0), 0) + mm(shifted(lo_ref, 0), 1)
             + mm(shifted(le_ref, 1), 2))

    acc = jnp.maximum(jnp.maximum(acc_a + b2_ref[...], 0.0),
                      jnp.maximum(acc_b + b2_ref[...], 0.0))
    pooled = jnp.maximum(acc[:, :C], acc[:, C:])         # (TP*W2, 64)
    out_ref[0] = pooled.astype(jnp.bfloat16).reshape(TP, W2, C)


def _weights(params):
    """Repack conv1a/conv1b weights for the kernel (pure jnp; runs once
    under jit)."""
    w1a = params["conv1a"]["w"].astype(jnp.bfloat16)     # (3, 3, 1, 64)
    # tap order t = (dy+1)*3 + (dx+1)
    w1a16 = jnp.zeros((16, C), jnp.bfloat16)
    w1a16 = w1a16.at[:9].set(w1a[:, :, 0, :].reshape(9, C))
    b1a = params["conv1a"]["b"].astype(jnp.float32).reshape(1, C)

    w1b = params["conv1b"]["w"].astype(jnp.bfloat16)     # (3, 3, 64, 64)
    rhs = jnp.zeros((3, 4 * C, 2 * C), jnp.bfloat16)
    for dxi in range(3):
        for q in range(4):
            for h in range(2):
                dyi = q - h  # = dy + 1
                if 0 <= dyi <= 2:
                    rhs = rhs.at[dxi, C * q:C * (q + 1),
                                 C * h:C * (h + 1)].set(w1b[dyi, dxi])
    b1b = params["conv1b"]["b"].astype(jnp.float32)
    b2 = jnp.concatenate([b1b, b1b]).reshape(1, 2 * C)
    return w1a16, b1a, rhs, b2


@partial(jax.jit, static_argnames=("interpret", "stage"))
def fused_pair1(images: jnp.ndarray, params,
                interpret: bool = False, stage: str = "all") -> jnp.ndarray:
    """images (B, H, W) in [0, 1] -> pooled (B, H/2, W/2, 64) bf16:
    maxpool2(relu(conv1b(relu(conv1a(x))))) on the bfloat16 path.

    Requires H % 8 == 0 and W % 2 == 0 (EuRoC 480x752, Tsukuba 480x640).
    """
    B, H, W = images.shape
    assert H % RT == 0 and W % 2 == 0, (H, W)
    W2 = W // 2
    nt = H // RT
    w1a16, b1a, rhs, b2 = _weights(params)
    x = images.astype(jnp.bfloat16)
    xe = x[:, :, 0::2]
    xo = x[:, :, 1::2]
    zcol = jnp.zeros((B, H, 1), jnp.bfloat16)
    xom1 = jnp.concatenate([zcol, xo[:, :, :-1]], axis=2)  # odd[c2-1]
    xep1 = jnp.concatenate([xe[:, :, 1:], zcol], axis=2)   # even[c2+1]

    def idx_prev(b, t):
        return (b, jnp.maximum(t - 1, 0), 0)

    def idx_cur(b, t):
        return (b, t, 0)

    def idx_nxt(b, t):
        return (b, jnp.minimum(t + 1, nt - 1), 0)

    def idx_full(b, t):
        return (0, 0)

    def idx_full3(b, t):
        return (0, 0, 0)

    row_spec = [pl.BlockSpec((1, RT, W2), im)
                for im in (idx_prev, idx_cur, idx_nxt)]
    return pl.pallas_call(
        partial(_pair1_kernel, H=H, W2=W2, stage=stage),
        grid=(B, nt),
        in_specs=row_spec * 4 + [
            pl.BlockSpec((16, C), idx_full),
            pl.BlockSpec((1, C), idx_full),
            pl.BlockSpec((3, 4 * C, 2 * C), idx_full3),
            pl.BlockSpec((1, 2 * C), idx_full),
        ],
        out_specs=pl.BlockSpec((1, TP, W2, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W2, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((WIN, W2), jnp.bfloat16),           # window even
            pltpu.VMEM((WIN, W2), jnp.bfloat16),           # window odd
            pltpu.VMEM((WIN, W2), jnp.bfloat16),           # window odd-m1
            pltpu.VMEM((WIN, W2), jnp.bfloat16),           # window even-p1
            pltpu.VMEM((Y1R, W2, 16), jnp.bfloat16),       # im2col even
            pltpu.VMEM((Y1R, W2, 16), jnp.bfloat16),       # im2col odd
            pltpu.VMEM((Y1R, W2, C), jnp.bfloat16),        # y1 even
            pltpu.VMEM((Y1R, W2, C), jnp.bfloat16),        # y1 odd
            pltpu.VMEM((TP, W2 + 2, 4 * C), jnp.bfloat16),  # lhs even
            pltpu.VMEM((TP, W2 + 2, 4 * C), jnp.bfloat16),  # lhs odd
        ],
        interpret=interpret,
    )(xe, xe, xe, xo, xo, xo, xom1, xom1, xom1, xep1, xep1, xep1,
      w1a16, b1a, rhs, b2)
