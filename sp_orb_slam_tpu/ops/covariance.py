"""Per-keypoint repeatability covariance from the heat map, TPU-formulated.

Reference (src/cv/sp_extractor.cpp:252-340 computeCovariance): for each
keypoint, a BFS flood fill on the *inverted* heat map (`heat_inv_`, which
peaks at keypoints) expands to 4-neighbors whose value is positive and
strictly below the value of the pixel it is reached from (monotone descent);
the visited pixels' values weight their squared offsets from the keypoint:

    cov = sum_p (w_p / sum w) * (p - kp)^2   (per axis, diagonal 2-vector)

clamped to >= 1, and its reciprocal `cov2_inv` becomes the information matrix
for every reprojection factor downstream (optimizer.cpp:298-304,
local_mapper.cpp:720-758).  The keypoint's response is set to its heat value.

TPU reformulation: the BFS becomes a bounded-window (radius `window`)
iterative mask propagation — reach(p) if any 4-neighbor q is reached with
heat[p] < heat[q] and heat[p] > 0 — which is exactly the monotone-descent
reachability, restricted to the window.  Keypoints live >= border(=8) px from
the image edge, so a radius<=8 window never leaves the image.  Two knowing
deviations from the reference, both conservative: (a) pixels whose descent
path would leave the window are not counted (the reference BFS is unbounded;
such far-flung pixels carry tiny weights in flat regions only); (b) the
reference BFS can enqueue a pixel twice before it is first popped and then
counts it twice in the sums — a mask cannot, so each pixel is counted once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _window_gather(heat: jnp.ndarray, uv: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather (2r+1, 2r+1, K) windows centered at integer uv for K keypoints.

    Keypoints live on the trailing (lane) axis: K is a multiple of 128 by
    config, so every subsequent elementwise op vectorizes fully; a
    (K, s, s) layout leaves the 8x128 VPU ~13% utilized and dominated
    extraction time.
    """
    size = 2 * radius + 1
    H, W = heat.shape

    def one(uv1):
        u = jnp.clip(uv1[0].astype(jnp.int32) - radius, 0, W - size)
        v = jnp.clip(uv1[1].astype(jnp.int32) - radius, 0, H - size)
        return jax.lax.dynamic_slice(heat, (v, u), (size, size))

    # gather per keypoint (dynamic_slice vectorizes well), then transpose
    # once so the fill iterations run lane-major
    return jnp.transpose(jax.vmap(one)(uv), (1, 2, 0))  # (s, s, K)


def keypoint_covariance(heat_inv: jnp.ndarray, uv: jnp.ndarray,
                        valid: jnp.ndarray, *, radius: int = 8,
                        iters: int = 16):
    """Compute (cov2, cov2_inv, response) for K keypoints of one image.

    heat_inv: (H, W) normalized inverted heat (peaks at keypoints);
    uv: (K, 2) float (integer-valued) pixel coords; valid: (K,) bool.
    Returns cov2 (K, 2), cov2_inv (K, 2), response (K,).
    """
    K = uv.shape[0]
    size = 2 * radius + 1
    win = _window_gather(heat_inv, uv, radius)  # (s, s, K)
    response = win[radius, radius, :]

    pos = win > 0.0

    # neighbor access via a padded buffer + static slices over the leading
    # (sublane-friendly) dims; K stays on the lane axis throughout
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
    cov2 = jnp.stack([jnp.maximum(cov_x, 1.0), jnp.maximum(cov_y, 1.0)], axis=-1)
    cov2 = jnp.where(valid[:, None], cov2, 1.0)
    return cov2, 1.0 / cov2, jnp.where(valid, response, 0.0)


def covariance_reference(heat_inv, uv, valid, radius=None):
    """Sequential numpy golden model of the reference BFS (single-count
    variant), used in tests.  With `radius` set, the fill is restricted to
    the same bounded window as the TPU kernel (exact comparison); without,
    it reproduces the reference's unbounded BFS."""
    import numpy as np
    from collections import deque

    heat_inv = np.asarray(heat_inv)
    H, W = heat_inv.shape
    K = uv.shape[0]
    cov2 = np.ones((K, 2), np.float32)
    resp = np.zeros((K,), np.float32)
    for k in range(K):
        if not valid[k]:
            continue
        u0, v0 = int(uv[k, 0]), int(uv[k, 1])
        resp[k] = heat_inv[v0, u0]
        seen = {(u0, v0)}
        q = deque([(u0, v0)])
        deltas, scores = [], []
        while q:
            u, v = q.popleft()
            val = heat_inv[v, u]
            deltas.append(((u - u0) ** 2, (v - v0) ** 2))
            scores.append(val)
            for du, dv in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                uu, vv = u + du, v + dv
                if not (0 <= uu < W and 0 <= vv < H):
                    continue
                if radius is not None and (abs(uu - u0) > radius or abs(vv - v0) > radius):
                    continue
                hv = heat_inv[vv, uu]
                if (uu, vv) not in seen and hv > 0.0 and hv < val:
                    seen.add((uu, vv))
                    q.append((uu, vv))
        s = np.asarray(scores, np.float32)
        d = np.asarray(deltas, np.float32)
        w = s / max(s.sum(), 1e-12)
        c = (w[:, None] * d).sum(0)
        cov2[k] = np.maximum(c, 1.0)
    return cov2, 1.0 / cov2, resp
