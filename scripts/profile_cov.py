#!/usr/bin/env python
"""Micro-profile of the covariance stage: gather vs fill vs variants."""

import json
import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.ops import covariance as cov_ops

    B, H, W, K = 8, 480, 752, 1024
    radius, iters = 8, 16
    size = 2 * radius + 1

    rng = np.random.default_rng(0)
    heat = jnp.asarray(rng.random((B, H, W), np.float32))
    uv = jnp.asarray(
        np.stack([rng.integers(8, W - 8, (B, K)),
                  rng.integers(8, H - 8, (B, K))], -1).astype(np.float32))
    valid = jnp.ones((B, K), bool)
    win = jnp.asarray(rng.random((B, size, size, K), np.float32))

    def timeit(name, fn, *args, iters_t=30):
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        for _ in range(3):
            out = fn(*args)
        jax.tree.map(np.asarray, out)
        t0 = time.perf_counter()
        for _ in range(iters_t):
            out = fn(*args)
        jax.tree.map(np.asarray, out)
        dt = (time.perf_counter() - t0) / iters_t
        print(json.dumps({name: round(dt * 1e3, 3)}), flush=True)
        return out

    # 1. full current windowed covariance
    f_full = jax.jit(jax.vmap(partial(cov_ops.keypoint_covariance,
                                      radius=radius, iters=iters)))
    timeit("windowed_full", lambda: f_full(heat, uv, valid))

    # 2. gather only
    @jax.jit
    def f_gather(heat, uv):
        return jax.vmap(partial(cov_ops._window_gather, radius=radius))(
            heat, uv)
    timeit("gather_only", lambda: f_gather(heat, uv))

    # 3. fill only (pre-gathered windows, same ops as keypoint_covariance
    #    after the gather)
    def fill_one(win):
        pos = win > 0.0
        win_pad = jnp.pad(win, ((1, 1), (1, 1), (0, 0)),
                          constant_values=-jnp.inf)
        n_vals = [win_pad[1 + dv:1 + dv + size, 1 + du:1 + du + size, :]
                  for dv, du in ((1, 0), (-1, 0), (0, 1), (0, -1))]
        center = jnp.zeros((size, size, K), bool).at[radius, radius, :].set(True)

        def body(_, reach):
            reach_pad = jnp.pad(reach, ((1, 1), (1, 1), (0, 0)))
            grow = jnp.zeros_like(reach)
            for nv, (dv, du) in zip(n_vals, ((1, 0), (-1, 0), (0, 1), (0, -1))):
                nr = reach_pad[1 + dv:1 + dv + size, 1 + du:1 + du + size, :]
                grow |= nr & (win < nv)
            return reach | (grow & pos)

        reach = jax.lax.fori_loop(0, iters, body, center)
        dy = (jnp.arange(size, dtype=jnp.float32) - radius)[:, None, None]
        dx = (jnp.arange(size, dtype=jnp.float32) - radius)[None, :, None]
        w = jnp.where(reach, win, 0.0)
        wsum = jnp.maximum(jnp.sum(w, axis=(0, 1)), 1e-12)
        cov_x = jnp.sum(w * dx * dx, axis=(0, 1)) / wsum
        cov_y = jnp.sum(w * dy * dy, axis=(0, 1)) / wsum
        return cov_x, cov_y

    f_fill = jax.jit(jax.vmap(fill_one))
    timeit("fill_only", lambda: f_fill(win))

    cell = 8
    hc, wc = H // cell, W // cell

    # 4b. direct: per-keypoint 32x32 block gather by flat cell id
    @jax.jit
    def f_blockgather(heat, uv):
        def one(heat1, uv1):
            cp = heat1.reshape(hc, cell, wc, cell)
            cpp = jnp.pad(cp, ((1, 2), (0, 0), (1, 2), (0, 0)))
            # supwin as (hc, wc, 32, 32): rows j-block, cols k-block
            sup = jnp.stack([
                jnp.concatenate([
                    jnp.concatenate([cpp[j:j + hc, :, k:k + wc, :]
                                     for k in range(4)], axis=3)
                    for j in range(4)], axis=1)
            ], axis=0)[0]
            # sup axes: (hc, 4*8=32, wc, 4*8=32) -> (hc, wc, 32, 32)
            sup = jnp.transpose(sup, (0, 2, 1, 3)).reshape(hc * wc, 32, 32)
            cy = (uv1[:, 1].astype(jnp.int32) // cell)
            cx = (uv1[:, 0].astype(jnp.int32) // cell)
            cid = cy * wc + cx
            return jnp.take(sup, cid, axis=0)  # (K, 32, 32)

        return jax.vmap(one)(heat, uv)

    timeit("supwin_blockgather", lambda: f_blockgather(heat, uv))

    # 5. masked fill on 32x32 superwindows, lane axis = K
    @jax.jit
    def f_fill32(heat, uv):
        sup = f_blockgather(heat, uv)  # (B, K, 32, 32)

        def one(sup1, uv1):
            w32 = jnp.transpose(sup1, (1, 2, 0))  # (32, 32, K)
            ov = (uv1[:, 1].astype(jnp.int32) % cell) + cell
            ou = (uv1[:, 0].astype(jnp.int32) % cell) + cell
            rid = jax.lax.broadcasted_iota(jnp.int32, (32, 32, K), 0)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (32, 32, K), 1)
            inwin = ((jnp.abs(rid - ov[None, None, :]) <= radius)
                     & (jnp.abs(cidx - ou[None, None, :]) <= radius))
            pos = (w32 > 0.0) & inwin
            center = (rid == ov[None, None, :]) & (cidx == ou[None, None, :])
            wp = jnp.pad(w32, ((1, 1), (1, 1), (0, 0)),
                         constant_values=jnp.inf)  # inf blocks descent
            n_vals = [wp[1 + dv:1 + dv + 32, 1 + du:1 + du + 32, :]
                      for dv, du in ((1, 0), (-1, 0), (0, 1), (0, -1))]

            def body(_, reach):
                rp = jnp.pad(reach, ((1, 1), (1, 1), (0, 0)))
                grow = jnp.zeros_like(reach)
                for nv, (dv, du) in zip(n_vals,
                                        ((1, 0), (-1, 0), (0, 1), (0, -1))):
                    nr = rp[1 + dv:1 + dv + 32, 1 + du:1 + du + 32, :]
                    grow |= nr & (w32 < nv)
                return reach | (grow & pos)

            reach = jax.lax.fori_loop(0, iters, body, center)
            dyf = (rid - ov[None, None, :]).astype(jnp.float32)
            dxf = (cidx - ou[None, None, :]).astype(jnp.float32)
            w = jnp.where(reach, w32, 0.0)
            wsum = jnp.maximum(jnp.sum(w, axis=(0, 1)), 1e-12)
            cov_x = jnp.sum(w * dxf * dxf, axis=(0, 1)) / wsum
            cov_y = jnp.sum(w * dyf * dyf, axis=(0, 1)) / wsum
            return cov_x, cov_y

        return jax.vmap(one)(sup, uv)

    timeit("supwin_fill32_full", lambda: f_fill32(heat, uv))


if __name__ == "__main__":
    main()
