#!/usr/bin/env python
"""Round 2 of covariance micro-profiling: gather formulations."""

import json
import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    B, H, W, K = 8, 480, 752, 1024
    radius, iters = 8, 16
    size = 2 * radius + 1

    rng = np.random.default_rng(0)
    heat = jnp.asarray(rng.random((B, H, W), np.float32))
    uv = jnp.asarray(
        np.stack([rng.integers(8, W - 8, (B, K)),
                  rng.integers(8, H - 8, (B, K))], -1).astype(np.float32))
    kw = jnp.asarray(rng.random((B, K, 32, 32), np.float32))

    def timeit(name, fn, iters_t=30):
        out = fn()
        jax.tree.map(np.asarray, out)
        for _ in range(3):
            out = fn()
        jax.tree.map(np.asarray, out)
        t0 = time.perf_counter()
        for _ in range(iters_t):
            out = fn()
        jax.tree.map(np.asarray, out)
        dt = (time.perf_counter() - t0) / iters_t
        print(json.dumps({name: round(dt * 1e3, 3)}), flush=True)

    # A) flat scalar gather: (s*s, K) indices into heat.reshape(-1)
    @jax.jit
    def f_scalar_gather(heat, uv):
        def one(h1, uv1):
            hf = h1.reshape(-1)
            u0 = uv1[:, 0].astype(jnp.int32) - radius
            v0 = uv1[:, 1].astype(jnp.int32) - radius
            dy = jnp.arange(size, dtype=jnp.int32)
            dx = jnp.arange(size, dtype=jnp.int32)
            idx = ((v0[None, None, :] + dy[:, None, None]) * W
                   + u0[None, None, :] + dx[None, :, None])  # (s, s, K)
            return hf[idx]

        return jax.vmap(one)(heat, uv)

    timeit("scalar_gather_ssK", lambda: f_scalar_gather(heat, uv))

    # A2) same but output (K, s, s)
    @jax.jit
    def f_scalar_gather_k(heat, uv):
        def one(h1, uv1):
            hf = h1.reshape(-1)
            u0 = uv1[:, 0].astype(jnp.int32) - radius
            v0 = uv1[:, 1].astype(jnp.int32) - radius
            dy = jnp.arange(size, dtype=jnp.int32)
            dx = jnp.arange(size, dtype=jnp.int32)
            idx = ((v0[:, None, None] + dy[None, :, None]) * W
                   + u0[:, None, None] + dx[None, None, :])  # (K, s, s)
            return hf[idx]

        return jax.vmap(one)(heat, uv)

    timeit("scalar_gather_Kss", lambda: f_scalar_gather_k(heat, uv))

    # B) pure transpose (B, K, 32, 32) -> (B, 32, 32, K)
    @jax.jit
    def f_transpose(kw):
        return jnp.transpose(kw, (0, 2, 3, 1)) * 1.000001

    timeit("transpose_K_to_lane", lambda: f_transpose(kw))

    # C) row gather: one gather over rows (B*H, W) taking 17 rows per kp,
    # then a lane-dynamic slice via take_along_axis on columns
    @jax.jit
    def f_rowcol(heat, uv):
        def one(h1, uv1):
            v0 = uv1[:, 1].astype(jnp.int32) - radius
            u0 = uv1[:, 0].astype(jnp.int32) - radius
            dy = jnp.arange(size, dtype=jnp.int32)
            rows = h1[(v0[:, None] + dy[None, :]).reshape(-1)]  # (K*s, W)
            rows = rows.reshape(K, size, W)
            dx = jnp.arange(size, dtype=jnp.int32)
            cols = u0[:, None, None] + dx[None, None, :]
            return jnp.take_along_axis(
                rows, jnp.broadcast_to(cols, (K, size, size)), axis=2)

        return jax.vmap(one)(heat, uv)

    timeit("row_then_col_gather", lambda: f_rowcol(heat, uv))


if __name__ == "__main__":
    main()
