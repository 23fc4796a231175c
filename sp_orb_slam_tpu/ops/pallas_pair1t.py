"""Transposed-layout Pallas TPU kernel for the SuperPoint first conv pair.

Computes maxpool2(relu(conv1b(relu(conv1a(x))))) — the reference pair at
src/cv/sp_extractor.cpp:81-86 — in one kernel on the bfloat16 path, like
ops/pallas_pair1.py, but with every tensor kept in a channels-in-sublanes /
image-columns-in-lanes layout end to end.

Why a second design: the first kernel (pallas_pair1.py) measured 33 ms at
B=32 752x480 vs XLA's 24.1 ms for the same pair.  The bisect put 23.4 ms in
the conv1a half — the in-kernel (rows, cols)->(cols, taps) transposes plus
9-tap lane-column builds (whether as masked single-lane stores or one-hot
FMA assembles) dominate, and the conv1b half paid 3 MB/step of row-pair
repack copies.  This layout removes all of it:

- image columns live in LANES everywhere; nothing is ever transposed
  in-kernel (the one transpose left — pooled output channels-last — is a
  single XLA transpose of the 185 MB result, ~1 ms);
- conv1a's im2col becomes CONTIGUOUS-ROW stores: with tap-major ordering
  x9t[Y1R*k + j] = window[dy(k) + 1 + j], each tap k is ONE (Y1R, W2p)
  sublane-range copy from the assembled window — 9 wide stores per parity
  stream instead of 90 column builds;
- conv1a itself is a constant block-diagonal matmul: y1T (Y1R*64, W2p) =
  Wblk (Y1R*64, 9*Y1R) @ x9t, Wblk[64j+ch, Y1R*k+j'] = w1a[k, ch] iff
  j == j' — channels land in sublanes, already in conv1b's layout;
- conv1b needs y1 rows 2r-1..2r+2 for the output row pair (2r, 2r+1);
  with y1 rows stacked 64-channels-per-row in sublanes those four rows are
  the CONTIGUOUS sublane slice y1T[128*rp : 128*rp + 256] — so each
  row-pair is three (128, 256) @ (256, W2p) matmuls (full contraction,
  rhsT[dx][64h+co, 64q+ci] = w1b[q-h, dx, ci, co]) with no repacking;
- the +-1 full-res column shifts between the even/odd streams that conv1b
  needs are single pltpu.roll lane rotations of y1T (W2p is a multiple of
  128 by construction) with the boundary lane zeroed;
- 2x2 maxpool = elementwise max of the two column-parity accumulators
  (column pool) and of the two 64-sublane halves (row pool).

Per grid step (one image x one 8-row tile): 12 window-assembly stores,
18 tap-range stores, 2 (640, 96) x (96, W2p) + 24 (128, 256) x (256, W2p)
matmuls, 2 lane rolls — no transposes, no broadcasts-into-lanes, no
masked read-modify-write stores.  HBM traffic is the grayscale input
(read ~3x) and the pooled output, as in v1.

Numerics are identical in structure to the XLA bf16 path: bf16 operands,
f32 matmul accumulation, f32 bias+relu, bf16 store (pooling commutes with
the monotone bf16 rounding).  Golden-tested in tests/test_pallas_pair1t.py.
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
WINR = RT + 4   # window rows: t*RT-2 .. t*RT+RT+1
K9 = 9 * Y1R    # im2col contraction size
K9P = ((K9 + 7) // 8) * 8
C = 64          # channel count of the pair


def _pair1t_kernel(pe_ref, ce_ref, ne_ref, po_ref, co_ref, no_ref,
                   pm_ref, cm_ref, nm_ref, pp_ref, cp_ref, np_ref,
                   wblk_ref, b1a_ref, rhs_ref, b2_ref, out_ref,
                   wine_ref, wino_ref, winm_ref, winp_ref,
                   x9e_ref, x9o_ref,
                   y1e_ref, y1o_ref, y1m_ref, y1p_ref,
                   *, H: int, W2: int, nt: int, stage: str = "all"):
    t = pl.program_id(1)
    W2P = wine_ref.shape[1]

    if stage != "convb":
        # --- window assembly: rows t*RT-2 .. t*RT+RT+1 per stream --------
        # (clamped prev/next index maps supply real-but-wrong rows at the
        # image boundary; every tap they feed is zeroed below)
        for win_ref, (p, c, n) in ((wine_ref, (pe_ref, ce_ref, ne_ref)),
                                   (wino_ref, (po_ref, co_ref, no_ref)),
                                   (winm_ref, (pm_ref, cm_ref, nm_ref)),
                                   (winp_ref, (pp_ref, cp_ref, np_ref))):
            win_ref[0:2] = p[0, RT - 2:RT]
            win_ref[2:2 + RT] = c[0]
            win_ref[2 + RT:4 + RT] = n[0, 0:2]

        # --- im2col, tap-major: x9t[Y1R*k + j] = win_dx[dy + 1 + j] ------
        # Full-res col taps per parity: even (col 2c2) reads dx=-1/0/+1
        # from om1/e/o; odd (col 2c2+1) from e/o/ep1.
        for x9_ref, srcs in ((x9e_ref, (winm_ref, wine_ref, wino_ref)),
                             (x9o_ref, (wine_ref, wino_ref, winp_ref))):
            x9_ref[K9P - 8:K9P] = jnp.zeros((8, W2P), jnp.bfloat16)
            for k in range(9):
                dy, dx = k // 3 - 1, k % 3 - 1
                x9_ref[Y1R * k:Y1R * (k + 1)] = (
                    srcs[dx + 1][dy + 1:dy + 1 + Y1R])
            # taps that read image rows < 0 or >= H are conv zero padding
            # (only where the destination y1 row is itself valid; invalid
            # y1 rows are zeroed wholesale after conv1a)
            @pl.when(t == 0)
            def _zero_top(x9_ref=x9_ref):
                for k in (0, 1, 2):            # dy = -1, j = 1
                    x9_ref[Y1R * k + 1:Y1R * k + 2] = (
                        jnp.zeros((1, W2P), jnp.bfloat16))

            @pl.when(t == nt - 1)
            def _zero_bot(x9_ref=x9_ref):
                for k in (6, 7, 8):            # dy = +1, j = RT
                    x9_ref[Y1R * k + RT:Y1R * k + RT + 1] = (
                        jnp.zeros((1, W2P), jnp.bfloat16))

    # --- conv1a: block-diagonal (Y1R*C, K9P) x (K9P, W2P) matmul --------
    for x9_ref, y1_ref in ((x9e_ref, y1e_ref), (x9o_ref, y1o_ref)):
        if stage == "convb":
            @pl.when(t == 0)
            def _fill(y1_ref=y1_ref):
                y1_ref[...] = jnp.zeros((Y1R * C, W2P), jnp.bfloat16)
            continue
        y1 = jax.lax.dot_general(
            wblk_ref[...], x9_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Y1R*C, W2P)
        y1 = jnp.maximum(y1 + b1a_ref[...], 0.0)
        y1_ref[...] = y1.astype(jnp.bfloat16)
        # y1 rows outside the image are conv1b zero padding, NOT
        # bias+relu of a zero input
        @pl.when(t == 0)
        def _zero_first(y1_ref=y1_ref):
            y1_ref[0:C] = jnp.zeros((C, W2P), jnp.bfloat16)

        @pl.when(t == nt - 1)
        def _zero_last(y1_ref=y1_ref):
            y1_ref[C * (Y1R - 1):] = jnp.zeros((C, W2P), jnp.bfloat16)

    if stage == "conva":  # ablation: conv1a path only
        out_ref[0] = y1e_ref[0:TP * C].reshape(TP, C, W2P)
        return

    # --- +-1 column shifts between parity streams (lane rolls) ----------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W2P), 1)
    y1m_ref[...] = jnp.where(lane == 0, jnp.bfloat16(0),
                             pltpu.roll(y1o_ref[...], 1, 1))     # odd[c2-1]
    y1p_ref[...] = jnp.where(lane == W2 - 1, jnp.bfloat16(0),
                             pltpu.roll(y1e_ref[...], W2P - 1, 1))  # even[c2+1]

    # --- conv1b + pool: per row pair, three (128, 256) x (256, W2P) -----
    def mm(dxi, src_ref, s):
        return jax.lax.dot_general(
            rhs_ref[dxi], src_ref[s:s + 4 * C], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (2C, W2P)

    b2 = b2_ref[...]
    for rp in range(TP):
        s = 2 * rp * C
        # full-res col 2c2:   odd[c2-1], even[c2], odd[c2]
        acc_a = mm(0, y1m_ref, s) + mm(1, y1e_ref, s) + mm(2, y1o_ref, s)
        # full-res col 2c2+1: even[c2], odd[c2], even[c2+1]
        acc_b = mm(0, y1e_ref, s) + mm(1, y1o_ref, s) + mm(2, y1p_ref, s)
        m = jnp.maximum(jnp.maximum(acc_a + b2, 0.0),
                        jnp.maximum(acc_b + b2, 0.0))    # column pool
        pooled = jnp.maximum(m[:C], m[C:])               # row pool
        out_ref[0, rp] = pooled.astype(jnp.bfloat16)


def _weights_t(params):
    """Repack conv1a/conv1b weights for the transposed kernel (pure jnp;
    constant-folded into the surrounding jit program)."""
    w1a = params["conv1a"]["w"].astype(jnp.bfloat16)     # (3, 3, 1, 64)
    w1a9 = w1a[:, :, 0, :].reshape(9, C)                 # k = (dy+1)*3+(dx+1)
    # Wblk[C*j + ch, Y1R*k + j'] = w1a9[k, ch] iff j == j'
    w4 = (jnp.transpose(w1a9)[None, :, :, None]
          * jnp.eye(Y1R, dtype=jnp.bfloat16)[:, None, None, :])
    wblk = w4.reshape(Y1R * C, K9)
    wblk = jnp.pad(wblk, ((0, 0), (0, K9P - K9)))
    b1a = jnp.tile(params["conv1a"]["b"].astype(jnp.float32), Y1R)
    b1a = b1a.reshape(Y1R * C, 1)

    w1b = params["conv1b"]["w"].astype(jnp.bfloat16)     # (3, 3, 64, 64)
    # rhsT[dxi, C*h + co, C*q + ci] = w1b[q - h, dxi, ci, co]
    rhs = jnp.zeros((3, 2 * C, 4 * C), jnp.bfloat16)
    for dxi in range(3):
        for q in range(4):
            for h in range(2):
                dyi = q - h  # = dy + 1
                if 0 <= dyi <= 2:
                    rhs = rhs.at[dxi, C * h:C * (h + 1),
                                 C * q:C * (q + 1)].set(
                                     jnp.transpose(w1b[dyi, dxi]))
    b2 = jnp.concatenate([params["conv1b"]["b"]] * 2).astype(jnp.float32)
    return wblk, b1a, rhs, b2.reshape(2 * C, 1)


@partial(jax.jit, static_argnames=("interpret", "stage"))
def fused_pair1t(images: jnp.ndarray, params,
                 interpret: bool = False, stage: str = "all") -> jnp.ndarray:
    """images (B, H, W) in [0, 1] -> pooled (B, H/2, W/2, 64) bf16:
    maxpool2(relu(conv1b(relu(conv1a(x))))) on the bfloat16 path.

    Requires H % 8 == 0 and W % 2 == 0 (EuRoC 480x752, Tsukuba 480x640).
    """
    B, H, W = images.shape
    assert H % RT == 0 and W % 2 == 0, (H, W)
    W2 = W // 2
    W2P = ((W2 + 127) // 128) * 128
    nt = H // RT
    wblk, b1a, rhs, b2 = _weights_t(params)
    x = images.astype(jnp.bfloat16)
    xe = x[:, :, 0::2]
    xo = x[:, :, 1::2]
    zcol = jnp.zeros((B, H, 1), jnp.bfloat16)
    xom1 = jnp.concatenate([zcol, xo[:, :, :-1]], axis=2)  # odd[c2-1]
    xep1 = jnp.concatenate([xe[:, :, 1:], zcol], axis=2)   # even[c2+1]
    if W2P != W2:  # zero-pad lanes so every in-kernel store is full-width
        pad = ((0, 0), (0, 0), (0, W2P - W2))
        xe, xo = jnp.pad(xe, pad), jnp.pad(xo, pad)
        xom1, xep1 = jnp.pad(xom1, pad), jnp.pad(xep1, pad)

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

    row_spec = [pl.BlockSpec((1, RT, W2P), im)
                for im in (idx_prev, idx_cur, idx_nxt)]
    outT = pl.pallas_call(
        partial(_pair1t_kernel, H=H, W2=W2, nt=nt, stage=stage),
        grid=(B, nt),
        in_specs=row_spec * 4 + [
            pl.BlockSpec((Y1R * C, K9P), idx_full),
            pl.BlockSpec((Y1R * C, 1), idx_full),
            pl.BlockSpec((3, 2 * C, 4 * C), idx_full3),
            pl.BlockSpec((2 * C, 1), idx_full),
        ],
        out_specs=pl.BlockSpec((1, TP, C, W2P), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, C, W2P), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((WINR + 4, W2P), jnp.bfloat16),     # window even
            pltpu.VMEM((WINR + 4, W2P), jnp.bfloat16),     # window odd
            pltpu.VMEM((WINR + 4, W2P), jnp.bfloat16),     # window odd[c2-1]
            pltpu.VMEM((WINR + 4, W2P), jnp.bfloat16),     # window even[c2+1]
            pltpu.VMEM((K9P, W2P), jnp.bfloat16),          # im2col even
            pltpu.VMEM((K9P, W2P), jnp.bfloat16),          # im2col odd
            pltpu.VMEM((Y1R * C, W2P), jnp.bfloat16),      # y1T even
            pltpu.VMEM((Y1R * C, W2P), jnp.bfloat16),      # y1T odd
            pltpu.VMEM((Y1R * C, W2P), jnp.bfloat16),      # y1T odd[c2-1]
            pltpu.VMEM((Y1R * C, W2P), jnp.bfloat16),      # y1T even[c2+1]
        ],
        interpret=interpret,
    )(xe, xe, xe, xo, xo, xo, xom1, xom1, xom1, xep1, xep1, xep1,
      wblk, b1a, rhs, b2)
    # single XLA transpose back to channels-last (~1 ms on the 185 MB
    # result at B=32); pad lanes sliced away
    return jnp.transpose(outT[:, :, :, :W2], (0, 1, 3, 2))
