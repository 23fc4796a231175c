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
repack copies.  This layout removes all of it.

The 2x2 pool splits image columns into even/odd parity streams, and
conv1b's +-1 full-res column taps need the parity streams shifted by one
column as well.  Mosaic has no bf16 lane rotate ("Rotate with non-32-bit
data"), so instead of shifting in-kernel, ALL column streams the kernel
ever reads are precomputed in XLA as one lane-concatenated array:

    xcomb (B, H, 6*W2P) = [ even[c2-1] | odd[c2-1] | even | odd
                            | even[c2+1] | odd[c2+1] ]

(W2P = W/2 rounded up to a lane multiple; each stream zero-padded).  The
kernel computes conv1a for FOUR output streams — m = full-res cols 2c2-1,
e = 2c2, o = 2c2+1, p = 2c2+2 — which makes every value conv1b needs a
plain aligned lane-block slice:

- window assembly: 3 wide stores build rows t*RT-2..t*RT+RT+1 of all six
  input streams at once (wincomb, (RT+4, 6*W2P));
- im2col, tap-major: x9all[Y1R*k + j, 384*s + c2] = stream s's tap k at
  y1 row j.  Tap k = (dy+1)*3 + (dx+1) of stream s reads input stream
  s + dx + 1 — for fixed k the four source blocks are CONTIGUOUS, so the
  whole build is 9 wide (Y1R, 4*W2P) copies at lane offset (dx+1)*W2P;
- conv1a: ONE constant block-diagonal matmul y1all (Y1R*64, 4*W2P) =
  Wblk (Y1R*64, 9*Y1R) @ x9all, Wblk[64j+ch, Y1R*k+j'] = w1a[k, ch] iff
  j == j' — channels land in sublanes, already in conv1b's layout;
- conv1b needs y1 rows 2r-1..2r+2 of streams (m, e, o) / (e, o, p) for
  the output row pair (2r, 2r+1) at even/odd output columns; those are
  the contiguous slices y1all[128*rp : 128*rp + 256, W2P*dxi : +W2P]
  (sublanes: 64-channel y1 rows stacked; lanes: stream blocks), so each
  row pair is six (128, 256) @ (256, W2P) matmuls with rhsT[dx][64h+co,
  64q+ci] = w1b[q-h, dx, ci, co] — full contraction, no repacking;
- 2x2 maxpool = elementwise max of the even/odd-column accumulators
  (column pool) and of the two 64-sublane halves (row pool).

Per grid step (one image x one 8-row tile): 3 + 9 wide aligned stores,
1 (640, 96) x (96, 1536) + 24 (128, 256) x (256, W2P) matmuls — no
transposes, no rotates, no broadcasts-into-lanes, no masked
read-modify-write stores.  HBM traffic is the 6-stream input copy and the
pooled output; the only XLA post-processing is one transpose of the
pooled result back to channels-last (~1 ms at B=32).

Numerics are identical in structure to the XLA bf16 path: bf16 operands,
f32 matmul accumulation, f32 bias+relu, bf16 store (pooling commutes with
the monotone bf16 rounding); the m/p streams recompute exactly the e/o
products one column over, so parity with the two-stream math is exact.
Golden-tested bit-comparable in tests/test_pallas_pair1t.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 4          # default pooled rows per tile (8 sweeps larger matmuls
#                 against more VMEM per step; exactness is tile-invariant)
C = 64          # channel count of the pair
NS = 4          # conv1a output streams: m, e, o, p


def _tile_dims(tp: int):
    """Derived tile constants: full-res rows per tile, y1 rows (halo 1),
    window rows (t*RT-2 .. t*RT+RT+1), im2col contraction size + pad."""
    rt = 2 * tp
    y1r = rt + 2
    winr = rt + 4
    k9 = 9 * y1r
    k9p = ((k9 + 7) // 8) * 8
    return rt, y1r, winr, k9, k9p


def _pair1t_kernel(prev_ref, cur_ref, nxt_ref,
                   wblk_ref, b1a_ref, rhs_ref, b2_ref, out_ref,
                   win_ref, x9_ref, y1_ref,
                   *, H: int, W2: int, W2P: int, nt: int, tp: int = TP,
                   stage: str = "all"):
    TP = tp                     # shadow the module default inside the body
    RT, Y1R, WINR, K9, K9P = _tile_dims(tp)
    t = pl.program_id(1)
    N4 = NS * W2P

    if stage != "convb":
        # --- window assembly: rows t*RT-2 .. t*RT+RT+1, all 6 streams ----
        # (clamped prev/next index maps supply real-but-wrong rows at the
        # image boundary; every tap they feed is zeroed below)
        win_ref[0:2] = prev_ref[0, RT - 2:RT]
        win_ref[2:2 + RT] = cur_ref[0]
        win_ref[2 + RT:4 + RT] = nxt_ref[0, 0:2]

        # --- im2col, tap-major: one contiguous copy per tap -------------
        # x9all[Y1R*k + j, W2P*s + c2] = stream s, tap k, y1 row j; tap
        # (dy, dx) of stream s reads input stream s + dx + 1, so for
        # fixed k all four source blocks are the contiguous lane range
        # [(dx+1)*W2P, (dx+5)*W2P) of window rows dy+1 .. dy+1+Y1R.
        x9_ref[K9P - 8:K9P] = jnp.zeros((8, N4), jnp.bfloat16)
        for k in range(9):
            dy, dx = k // 3 - 1, k % 3 - 1
            x9_ref[Y1R * k:Y1R * (k + 1)] = (
                win_ref[dy + 1:dy + 1 + Y1R,
                        (dx + 1) * W2P:(dx + 1) * W2P + N4])
        # taps that read image rows < 0 or >= H are conv zero padding
        # (only where the destination y1 row is itself valid; invalid
        # y1 rows are zeroed wholesale after conv1a)
        @pl.when(t == 0)
        def _zero_top():
            for k in (0, 1, 2):            # dy = -1, j = 1
                x9_ref[Y1R * k + 1:Y1R * k + 2] = (
                    jnp.zeros((1, N4), jnp.bfloat16))

        @pl.when(t == nt - 1)
        def _zero_bot():
            for k in (6, 7, 8):            # dy = +1, j = RT
                x9_ref[Y1R * k + RT:Y1R * k + RT + 1] = (
                    jnp.zeros((1, N4), jnp.bfloat16))

    # --- conv1a: block-diagonal (Y1R*C, K9P) x (K9P, NS*W2P) matmul -----
    if stage == "convb":
        @pl.when(t == 0)
        def _fill():
            y1_ref[...] = jnp.zeros((Y1R * C, N4), jnp.bfloat16)
    else:
        y1 = jax.lax.dot_general(
            wblk_ref[...], x9_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Y1R*C, NS*W2P)
        y1 = jnp.maximum(y1 + b1a_ref[...], 0.0)
        # stream m's col 0 (full-res col -1) and stream p's col W2-1
        # (full-res col W) are conv1b zero padding, not conv1a of zeros
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N4), 1)
        y1 = jnp.where((lane == 0) | (lane == 3 * W2P + W2 - 1), 0.0, y1)
        y1_ref[...] = y1.astype(jnp.bfloat16)
        # y1 rows outside the image are conv1b zero padding as well
        @pl.when(t == 0)
        def _zero_first():
            y1_ref[0:C] = jnp.zeros((C, N4), jnp.bfloat16)

        @pl.when(t == nt - 1)
        def _zero_last():
            y1_ref[C * (Y1R - 1):] = jnp.zeros((C, N4), jnp.bfloat16)

    if stage == "conva":  # ablation: conv1a path only
        out_ref[0] = y1_ref[0:TP * C, W2P:2 * W2P].reshape(TP, C, W2P)
        return

    # --- conv1b + pool: per row pair, six (128, 256) x (256, W2P) -------
    def mm(dxi, blk):
        return jax.lax.dot_general(
            rhs_ref[dxi],
            y1_ref[2 * rp * C:2 * rp * C + 4 * C,
                   blk * W2P:(blk + 1) * W2P],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (2C, W2P)

    b2 = b2_ref[...]
    for rp in range(TP):
        # even output cols (full-res 2c2) read streams m, e, o; odd output
        # cols (2c2+1) read e, o, p — stream block = dxi (+1)
        acc_a = mm(0, 0) + mm(1, 1) + mm(2, 2)
        acc_b = mm(0, 1) + mm(1, 2) + mm(2, 3)
        m = jnp.maximum(jnp.maximum(acc_a + b2, 0.0),
                        jnp.maximum(acc_b + b2, 0.0))    # column pool
        pooled = jnp.maximum(m[:C], m[C:])               # row pool
        out_ref[0, rp] = pooled.astype(jnp.bfloat16)


def _weights_t(params, tp: int = TP):
    """Repack conv1a/conv1b weights for the transposed kernel (pure jnp;
    constant-folded into the surrounding jit program)."""
    _, Y1R, _, K9, K9P = _tile_dims(tp)
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


@partial(jax.jit, static_argnames=("interpret", "stage", "tp"))
def fused_pair1t(images: jnp.ndarray, params,
                 interpret: bool = False, stage: str = "all",
                 tp: int = TP) -> jnp.ndarray:
    """images (B, H, W) in [0, 1] -> pooled (B, H/2, W/2, 64) bf16:
    maxpool2(relu(conv1b(relu(conv1a(x))))) on the bfloat16 path.

    Requires H % (2*tp) == 0 and W % 2 == 0 (EuRoC 480x752 at tp=4 or 8,
    Tsukuba 480x640).
    """
    RT, Y1R, WINR, K9, K9P = _tile_dims(tp)
    B, H, W = images.shape
    assert H % RT == 0 and W % 2 == 0, (H, W)
    W2 = W // 2
    W2P = ((W2 + 127) // 128) * 128
    nt = H // RT
    wblk, b1a, rhs, b2 = _weights_t(params, tp)
    x = images.astype(jnp.bfloat16)
    xe = x[:, :, 0::2]
    xo = x[:, :, 1::2]
    zcol = jnp.zeros((B, H, 1), jnp.bfloat16)
    zpad = jnp.zeros((B, H, W2P - W2), jnp.bfloat16)
    # input stream b for tap dx of conv1a stream s is b = s + dx + 1:
    # [even[c2-1], odd[c2-1], even, odd, even[c2+1], odd[c2+1]]
    xcomb = jnp.concatenate([
        zcol, xe[:, :, :-1], zpad,
        zcol, xo[:, :, :-1], zpad,
        xe, zpad,
        xo, zpad,
        xe[:, :, 1:], zcol, zpad,
        xo[:, :, 1:], zcol, zpad,
    ], axis=2)

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

    outT = pl.pallas_call(
        partial(_pair1t_kernel, H=H, W2=W2, W2P=W2P, nt=nt, tp=tp,
                stage=stage),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, RT, 6 * W2P), im)
            for im in (idx_prev, idx_cur, idx_nxt)
        ] + [
            pl.BlockSpec((Y1R * C, K9P), idx_full),
            pl.BlockSpec((Y1R * C, 1), idx_full),
            pl.BlockSpec((3, 2 * C, 4 * C), idx_full3),
            pl.BlockSpec((2 * C, 1), idx_full),
        ],
        out_specs=pl.BlockSpec((1, tp, C, W2P), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, C, W2P), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((WINR + 4, 6 * W2P), jnp.bfloat16),  # 6-stream window
            pltpu.VMEM((K9P, NS * W2P), jnp.bfloat16),      # im2col, 4 streams
            pltpu.VMEM((Y1R * C, NS * W2P), jnp.bfloat16),  # y1T, 4 streams
        ],
        interpret=interpret,
    )(xcomb, xcomb, xcomb, wblk, b1a, rhs, b2)
    # single XLA transpose back to channels-last (~1 ms on the 185 MB
    # result at B=32); pad lanes sliced away
    return jnp.transpose(outT[:, :, :, :W2], (0, 1, 3, 2))
