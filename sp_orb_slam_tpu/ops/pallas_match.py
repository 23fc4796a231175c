"""Pallas TPU kernel for the fused init-match stage (distances + 2-NN +
mutual resolution in one kernel, no HBM distance matrix).

Same semantics as ops/matching.search_for_initialization
(SearchForInitialization, src/cv/sp_matcher.cpp:666-734): windowed
best+second with ratio test at TH_LOW, mutual uniqueness with min-distance
column resolution and smaller-row tie-breaks.

Why: the XLA path materializes the (M, N) distance matrix in HBM and then
makes ~10 elementwise/reduction passes over it (mask, best, argmin, second,
claim, column-min, tie-break) — ~1.6-1.7 ms of the 32-stream bench batch
where the MXU distance matmul itself is ~0.5 ms (round-4 tail bisect,
NOTES.md).  Here each row tile's distances live only in VMEM: the kernel
computes per-row best/second/argmin immediately and folds the mutual
column-minimum into two running (1, N) accumulators across row tiles, so
HBM traffic is just the descriptors in and five tiny per-row/per-column
vectors out.

Exactness: distances use a HIGHEST-precision f32 dot (same as
matching.pairwise_dist); best/second/argmin reproduce masked_best2's
first-minimal-index tie semantics (argmin == min over cols where d equals
the row minimum); the column accumulators reproduce resolve_mutual's
stage-1 min distance / stage-2 min row index exactly (equal partial minima
take the smaller row index).  tests/test_pallas_match.py asserts index-level
equality against the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # matches matching.BIG


def _match_kernel(a1_ref, a2_ref, d1_ref, d2_ref,
                  best_ref, idx_ref, rowok_ref, colmin_ref, colrow_ref,
                  *, window, ratio, th, tm):
    t = pl.program_id(1)
    big = jnp.float32(BIG)
    d1 = d1_ref[0]            # (TM, D) f32 row-tile descriptors (prev frame)
    d2 = d2_ref[0]            # (N, D) f32 column descriptors (current frame)
    N = d2.shape[0]

    dots = jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)            # (TM, N)
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))

    u1 = a1_ref[0, :, 0:1]    # (TM, 1)
    v1 = a1_ref[0, :, 1:2]
    ok1 = a1_ref[0, :, 2:3] > 0.0
    u2 = a2_ref[0, 0:1, :]    # (1, N)
    v2 = a2_ref[0, 1:2, :]
    ok2 = a2_ref[0, 2:3, :] > 0.0

    mask = ((jnp.abs(u1 - u2) < window) & (jnp.abs(v1 - v2) < window)
            & ok1 & ok2)
    d = jnp.where(mask, dist, big)

    col = jax.lax.broadcasted_iota(jnp.int32, (tm, N), 1)
    best = jnp.min(d, axis=1, keepdims=True)           # (TM, 1)
    # first minimal index == jnp.argmin tie semantics
    idx = jnp.min(jnp.where(d == best, col, N), axis=1, keepdims=True)
    second = jnp.min(jnp.where(col == idx, big, d), axis=1, keepdims=True)
    row_ok = ok1 & (best <= th) & (best < ratio * second)

    best_ref[0] = best
    idx_ref[0] = idx
    rowok_ref[0] = row_ok.astype(jnp.float32)

    # mutual resolution, stage 1+2 partials for this row tile: per column,
    # the min claimed distance and the smallest row index attaining it
    claim = row_ok & (col == idx)
    dmat = jnp.where(claim, best, big)                 # broadcasts (TM,1)
    pmin = jnp.min(dmat, axis=0, keepdims=True)        # (1, N)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (tm, N), 0)
            + t * tm)
    m_sent = pl.num_programs(1) * tm                   # == M, the sentinel
    prow = jnp.min(jnp.where(claim & (dmat == pmin), rows, m_sent),
                   axis=0, keepdims=True)              # (1, N)

    @pl.when(t == 0)
    def _init():
        colmin_ref[0] = pmin
        colrow_ref[0] = prow

    @pl.when(t > 0)
    def _fold():
        cm = colmin_ref[0]
        cr = colrow_ref[0]
        better = pmin < cm
        equal = pmin == cm
        colrow_ref[0] = jnp.where(
            better, prow, jnp.where(equal, jnp.minimum(cr, prow), cr))
        colmin_ref[0] = jnp.minimum(cm, pmin)


@partial(jax.jit, static_argnames=("window", "ratio", "th", "tm",
                                   "interpret"))
def match_init_batch(desc1: jnp.ndarray, valid1: jnp.ndarray,
                     prev_uv: jnp.ndarray, desc2: jnp.ndarray,
                     uv2: jnp.ndarray, valid2: jnp.ndarray, *,
                     window: int = 100, ratio: float = 0.9,
                     th: float = 0.3, tm: int = 256,
                     interpret: bool = False):
    """Batched SearchForInitialization: (B, M, D) x (B, N, D) descriptors.

    Returns (match12 (B, M) int32 into frame-2 keypoints or -1,
    n_matches (B,) int32, match21 (B, N) int32 or -1).  Matches
    jax.vmap(matching.search_for_initialization) index-for-index.
    """
    B, M, D = desc1.shape
    N = desc2.shape[1]
    # row-tile: the largest divisor of M that is <= tm and sublane-aligned
    # (the production K=896 is 7*128 — a fixed 256 would not divide it)
    assert M % 8 == 0, M
    tm = next(c for c in range(min(tm, M), 0, -8) if M % c == 0)

    a1 = jnp.concatenate(
        [prev_uv.astype(jnp.float32),
         valid1.astype(jnp.float32)[..., None],
         jnp.zeros((B, M, 1), jnp.float32)], axis=-1)          # (B, M, 4)
    a2 = jnp.concatenate(
        [jnp.swapaxes(uv2.astype(jnp.float32), 1, 2),
         valid2.astype(jnp.float32)[:, None, :],
         jnp.zeros((B, 1, N), jnp.float32)], axis=1)           # (B, 4, N)

    nt = M // tm
    kernel = partial(_match_kernel, window=float(window), ratio=float(ratio),
                     th=float(th), tm=tm)
    best, idx, rowok, colmin, colrow = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
        ],
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tm, 4), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, D), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(a1, a2, desc1.astype(jnp.float32), desc2.astype(jnp.float32))

    idx = idx[..., 0]                                  # (B, M), always < N
    row_ok = rowok[..., 0] > 0.0
    colrow = colrow[:, 0, :]                           # (B, N)
    rows = jnp.arange(M, dtype=jnp.int32)[None, :]
    winner = row_ok & (jnp.take_along_axis(colrow, idx, axis=1) == rows)
    match12 = jnp.where(winner, idx, -1)
    match21 = jnp.where(colrow < M, colrow, -1)
    n = jnp.sum((match12 >= 0).astype(jnp.int32), axis=1)
    return match12, n, match21
