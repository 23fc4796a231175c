"""Pallas TPU kernel for the per-keypoint covariance flood fill.

Same algorithm as ops/covariance.keypoint_covariance (windowed monotone-
descent fill), but the window extraction and all fill iterations happen in
VMEM inside one kernel: the XLA version spends ~12 ms/batch in the window
gather + un-fused fill ops; here the heat map is VMEM-resident and windows
are register copies.

Layout: keypoints ride the lane axis in chunks of 128; windows live in a
(size, size, 128) VMEM scratch.

STATUS (round 1): numerically exact vs the XLA windowed implementation in
interpret mode, but the axon *remote* mosaic compiler crashes with an
opaque HTTP 500 on this kernel (tpu_compile_helper exit 1 — no stderr is
surfaced through the tunnel).  Wire-up into the extractor is deferred until
the kernel can be compiled (or the helper's logs become visible); the
suspected trigger is the per-keypoint dynamic window store
win_ref[1:1+size, 1:1+size, pl.ds(k, 1)].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _cov_kernel(uv_ref, heat_ref, out_ref, win_ref, reach_ref, *, radius,
                iters, K):
    size = 2 * radius + 1
    buf = 24  # aligned guard buffer; window occupies [1:1+size, 1:1+size]
    n_chunks = K // LANES
    H, W = heat_ref.shape

    def chunk_body(c, _):
        win_ref[:, :, :] = jnp.full((buf, buf, LANES), -jnp.inf, jnp.float32)

        def load_one(k, __):
            u = uv_ref[c * LANES + k, 0]
            v = uv_ref[c * LANES + k, 1]
            u0 = jnp.clip(u - radius, 0, W - size)
            v0 = jnp.clip(v - radius, 0, H - size)
            win_ref[1:1 + size, 1:1 + size, pl.ds(k, 1)] = heat_ref[
                pl.ds(v0, size), pl.ds(u0, size)].reshape(size, size, 1)
            return 0

        jax.lax.fori_loop(0, LANES, load_one, 0)

        win = win_ref[:, :, :]
        pos = (win > 0.0).astype(jnp.float32)
        n_vals = [win_ref[1 + dv:1 + dv + size, 1 + du:1 + du + size, :]
                  for dv, du in ((1, 0), (-1, 0), (0, 1), (0, -1))]
        wc_ = win_ref[1:1 + size, 1:1 + size, :]
        pos_c = (wc_ > 0.0).astype(jnp.float32)

        rid = jax.lax.broadcasted_iota(jnp.int32, (buf, buf, LANES), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (buf, buf, LANES), 1)
        reach_ref[:, :, :] = ((rid == radius + 1)
                              & (cid == radius + 1)).astype(jnp.float32)

        def fill(_, __):
            grow = jnp.zeros((size, size, LANES), jnp.float32)
            for nv, (dv, du) in zip(n_vals,
                                    ((1, 0), (-1, 0), (0, 1), (0, -1))):
                nr = reach_ref[1 + dv:1 + dv + size, 1 + du:1 + du + size, :]
                grow = jnp.maximum(grow, nr * (wc_ < nv).astype(jnp.float32))
            reach_ref[1:1 + size, 1:1 + size, :] = jnp.maximum(
                reach_ref[1:1 + size, 1:1 + size, :], grow * pos_c)
            return 0

        jax.lax.fori_loop(0, iters, fill, 0)
        reach_c = reach_ref[1:1 + size, 1:1 + size, :]

        dy = (jax.lax.broadcasted_iota(jnp.int32, (size, size, LANES), 0)
              - radius).astype(jnp.float32)
        dx = (jax.lax.broadcasted_iota(jnp.int32, (size, size, LANES), 1)
              - radius).astype(jnp.float32)
        w = reach_c * jnp.maximum(wc_, 0.0)
        wsum = jnp.maximum(jnp.sum(w, axis=(0, 1)), 1e-12)
        cov_x = jnp.maximum(jnp.sum(w * dx * dx, axis=(0, 1)) / wsum, 1.0)
        cov_y = jnp.maximum(jnp.sum(w * dy * dy, axis=(0, 1)) / wsum, 1.0)
        out_ref[0, pl.ds(c * LANES, LANES)] = cov_x
        out_ref[1, pl.ds(c * LANES, LANES)] = cov_y
        out_ref[2, pl.ds(c * LANES, LANES)] = wc_[radius, radius, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@partial(jax.jit, static_argnames=("radius", "iters"))
def pallas_covariance(heat_inv: jnp.ndarray, uv: jnp.ndarray,
                      valid: jnp.ndarray, *, radius: int = 8,
                      iters: int = 16):
    """(cov2, cov2_inv, response) for one image via the Pallas kernel.

    heat_inv (H, W); uv (K, 2) with K a multiple of 128; valid (K,).
    """
    K = uv.shape[0]
    assert K % LANES == 0
    size = 2 * radius + 1
    uv_i = uv.astype(jnp.int32)

    out = pl.pallas_call(
        partial(_cov_kernel, radius=radius, iters=iters, K=K),
        out_shape=jax.ShapeDtypeStruct((3, K), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((24, 24, LANES), jnp.float32),
                        pltpu.VMEM((24, 24, LANES), jnp.float32)],
    )(uv_i, heat_inv)

    cov2 = jnp.stack([out[0], out[1]], axis=-1)
    cov2 = jnp.where(valid[:, None], jnp.maximum(cov2, 1.0), 1.0)
    resp = jnp.where(valid, out[2], 0.0)
    return cov2, 1.0 / cov2, resp
