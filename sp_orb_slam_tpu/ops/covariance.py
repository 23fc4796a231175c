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


def dense_covariance(heat_inv: jnp.ndarray, occ_grid: jnp.ndarray,
                     uv: jnp.ndarray, valid: jnp.ndarray, *,
                     cell: int = 8, iters: int = 16):
    """Dense-ownership formulation of the covariance flood fill.

    Instead of per-keypoint windows (dominated by a ~23 ms gather on TPU),
    propagate a basin-ownership *label image* over the full heat map with
    aligned shift ops, then reduce the weighted moments per keypoint with
    5x5-cell masked block sums (keypoints live one-per-cell in `occ_grid`).

    Semantics deviation from the per-keypoint BFS (documented): pixels on
    the boundary between two basins are counted for exactly one keypoint
    (first-come) instead of both; such pixels carry the smallest weights.

    heat_inv (H, W); occ_grid (hc, wc) int; uv (K, 2); valid (K,).
    Returns (cov2 (K, 2), cov2_inv (K, 2), response (K,)).
    """
    H, W = heat_inv.shape
    hc, wc = occ_grid.shape
    K = uv.shape[0]

    u_kp = jnp.clip(uv[:, 0].astype(jnp.int32), 0, W - 1)
    v_kp = jnp.clip(uv[:, 1].astype(jnp.int32), 0, H - 1)
    response = jnp.where(valid, heat_inv[v_kp, u_kp], 0.0)

    # seed the label image at keypoint pixels with the *flat cell index*
    # (occ_grid maps it back to the keypoint slot)
    cell_of_kp = ((v_kp // cell) * wc + u_kp // cell).astype(jnp.int32)
    label = jnp.full((H, W), -1, jnp.int32)
    label = label.at[jnp.where(valid, v_kp, 0),
                     jnp.where(valid, u_kp, 0)].set(
        jnp.where(valid, cell_of_kp, -1), mode="drop")

    pos = heat_inv > 0.0

    # pad once; neighbor views are static slices (rolls are gathers on TPU)
    def nview(x_pad, dv, du):
        return jax.lax.dynamic_slice(x_pad, (1 + dv, 1 + du), (H, W))

    heat_pad = jnp.pad(heat_inv, 1, constant_values=-jnp.inf)
    n_heat = {d: nview(heat_pad, *d)
              for d in ((1, 0), (-1, 0), (0, 1), (0, -1))}

    def body(_, L):
        L_pad = jnp.pad(L, 1, constant_values=-1)
        for d in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nL = nview(L_pad, *d)
            take = (L < 0) & (nL >= 0) & (heat_inv < n_heat[d]) & pos
            L = jnp.where(take, nL, L)
            L_pad = jnp.pad(L, 1, constant_values=-1)
        return L

    label = jax.lax.fori_loop(0, iters, body, label)

    # Per-pixel owner-offset code o in [0, 25): the owner cell sits at
    # (dcv, dcu) = owner - own_cell, truncated to |d| <= 2 cells (16 px).
    # NOTE: propagation itself can travel farther (each fori iteration
    # applies 4 sequential direction passes, so a monotone zigzag ridge can
    # be labeled up to ~4 px/iteration); pixels whose owner lies beyond the
    # +-2-cell code table are dropped from the moments BY DESIGN — a wider
    # table would blow the one-hot contraction up quadratically, and the
    # production windowed kernel truncates at 8 px (tighter) anyway.  This
    # variant deviates from the unbounded reference BFS only on such
    # long-ridge pixels.
    r = 2
    side = 2 * r + 1
    own_cell = ((jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) // cell) * wc
                + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) // cell)
    dcell = jnp.where(label >= 0, label - own_cell, 10 ** 6)
    # decompose dcell = dcv * wc + dcu with dcu in [-wc/2, wc/2)
    dcv = jnp.where(label >= 0,
                    jnp.floor_divide(dcell + wc // 2, wc), 10 ** 6)
    dcu = dcell - dcv * wc
    in_range = (label >= 0) & (jnp.abs(dcv) <= r) & (jnp.abs(dcu) <= r)
    code = jnp.where(in_range, (dcv + r) * side + (dcu + r), side * side)

    # weighted moments in *cell-local* coordinates (absolute-pixel moments
    # cancel catastrophically in float32): [w, w*lu, w*lu2, w*lv, w*lv2]
    uu = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) % cell
    vv = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) % cell
    w = heat_inv
    quant = jnp.stack([w, w * uu, w * uu * uu, w * vv, w * vv * vv])  # (5,H,W)

    # one-hot block contraction: per cell, the 5 moments split by offset
    # code — one small matmul per block instead of 25 full-res passes
    n_codes = side * side + 1
    onehot = jax.nn.one_hot(code, n_codes, dtype=jnp.float32)  # (H, W, 26)
    q_blk = quant.reshape(5, hc, cell, wc, cell)
    o_blk = onehot.reshape(hc, cell, wc, cell, n_codes)
    contrib = jnp.einsum("qhawb,hawbo->qhwo", q_blk, o_blk)  # (5, hc, wc, 26)

    acc = jnp.zeros((5, hc, wc), jnp.float32)
    for dv_ in range(-r, r + 1):
        for du_ in range(-r, r + 1):
            o = (dv_ + r) * side + (du_ + r)
            # pixels with code o in cell c contribute to cell c + (dv_, du_);
            # roll the small (5, hc, wc) slab accordingly
            m = jnp.roll(contrib[..., o], shift=(dv_, du_), axis=(1, 2))
            # their local coords relative to the target cell's origin
            ou = jnp.float32(-du_ * cell)
            ov = jnp.float32(-dv_ * cell)
            acc = acc + jnp.stack([
                m[0],
                m[1] + ou * m[0],
                m[2] + 2.0 * ou * m[1] + ou * ou * m[0],
                m[3] + ov * m[0],
                m[4] + 2.0 * ov * m[3] + ov * ov * m[0],
            ])

    # per-keypoint sums via the keypoint's own cell (coords relative to the
    # cell origin keep everything O(cell * r) — no cancellation)
    cy = cell_of_kp // wc
    cx = cell_of_kp % wc
    s_w = jnp.maximum(acc[0, cy, cx], 1e-12)
    s_u = acc[1, cy, cx]
    s_u2 = acc[2, cy, cx]
    s_v = acc[3, cy, cx]
    s_v2 = acc[4, cy, cx]
    uf = uv[:, 0] - (cx * cell).astype(jnp.float32)
    vf = uv[:, 1] - (cy * cell).astype(jnp.float32)
    cov_x = s_u2 / s_w - 2.0 * uf * s_u / s_w + uf * uf
    cov_y = s_v2 / s_w - 2.0 * vf * s_v / s_w + vf * vf
    cov2 = jnp.stack([jnp.maximum(cov_x, 1.0), jnp.maximum(cov_y, 1.0)], -1)
    cov2 = jnp.where(valid[:, None], cov2, 1.0)
    return cov2, 1.0 / cov2, response


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
