"""Pinhole camera: projection, frustum checks, undistortion/rectification.

Reference behavior:
- projection u = fx*x/z + cx (type/frame.cpp:330-380 isInFrustum,
  sp_matcher.cpp projections);
- the EuRoC loader pre-rectifies via initUndistortRectifyMap + remap with the
  radial-tangential model (io/data_loader.cc:470-489,517-527), so the SLAM
  core only ever sees undistorted pixels;
- undistorted image bounds from warping the 4 corners
  (frame.cpp:115-131 ComputeImageBounds).

TPU-first notes: rectification is expressed as a precomputed sampling grid +
one batched bilinear `remap` (pure XLA gather+fma, HBM-friendly); it is part
of the jitted per-frame preprocessing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def project(K: jnp.ndarray, pts_cam: jnp.ndarray, eps: float = 1e-9):
    """Project camera-frame points (..., 3) -> pixels (..., 2) and depth."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < eps, eps, z)
    u = fx * pts_cam[..., 0] * inv_z + cx
    v = fy * pts_cam[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1), z


def back_project(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel (..., 2) -> unit-depth camera ray (..., 3)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply the radial-tangential (plumb-bob) model to normalized coords.

    dist = [k1, k2, p1, p2, k3] — the model OpenCV's initUndistortRectifyMap
    uses in the reference loader (data_loader.cc:470-489).
    """
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    x_d = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    y_d = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x_d, y_d], axis=-1)


def rectify_map(K_new: jnp.ndarray, K_raw: jnp.ndarray, dist: jnp.ndarray,
                height: int, width: int) -> jnp.ndarray:
    """Precompute the (H, W, 2) raw-image sampling grid for rectification.

    Semantics of cv::initUndistortRectifyMap with R = I: for every rectified
    pixel, unproject with K_new, distort, reproject with K_raw.
    """
    v, u = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                        jnp.arange(width, dtype=jnp.float32), indexing="ij")
    uv = jnp.stack([u, v], axis=-1)
    xy = back_project(K_new, uv)[..., :2]
    xy_d = distort_normalized(xy, dist)
    fx, fy, cx, cy = K_raw[0], K_raw[1], K_raw[2], K_raw[3]
    return jnp.stack([xy_d[..., 0] * fx + cx, xy_d[..., 1] * fy + cy], axis=-1)


def bilinear_remap(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `image` (H, W) at `grid` (..., 2) of (u, v) pixel coords.

    Out-of-bounds samples clamp to the border (cv::remap BORDER_CONSTANT
    differences only matter at the frame edge, outside the feature border).
    """
    H, W = image.shape[-2], image.shape[-1]
    u = jnp.clip(grid[..., 0], 0.0, W - 1.000001)
    v = jnp.clip(grid[..., 1], 0.0, H - 1.000001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    i00 = image[..., v0, u0]
    i01 = image[..., v0, u1]
    i10 = image[..., v1, u0]
    i11 = image[..., v1, u1]
    return ((1 - du) * (1 - dv) * i00 + du * (1 - dv) * i01
            + (1 - du) * dv * i10 + du * dv * i11)


def undistort_points(uv: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray,
                     iters: int = 5) -> jnp.ndarray:
    """Iteratively invert the distortion model (cv::undistortPoints semantics;
    reference Frame::UndistortKeyPoints, frame.cpp:489-515)."""
    xy_d = back_project(K, uv)[..., :2]

    # fixed-point iteration for distort(xy) == xy_d:
    #   xy <- xy_d - (distort(xy) - xy)
    # (keeping xy_d as the target; iterating xy - (distort(xy) - xy) instead
    # converges to the wrong fixed point distort(x) == x)
    def body(_, xy):
        return xy_d - (distort_normalized(xy, dist) - xy)

    xy = jax.lax.fori_loop(0, iters, body, xy_d)
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    return jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)


def in_frustum(Tcw: jnp.ndarray, K: jnp.ndarray, pts_w: jnp.ndarray,
               bounds: jnp.ndarray, normals: jnp.ndarray,
               min_dist: jnp.ndarray, max_dist: jnp.ndarray,
               view_cos_limit: float):
    """Batched Frame::isInFrustum (frame.cpp:330-380).

    pts_w: (N, 3) world points; normals: (N, 3) mean viewing directions;
    min/max_dist: (N,) scale-invariance range; bounds = [minX, maxX, minY, maxY].
    Returns (visible (N,), uv (N, 2), depth (N,), view_cos (N,), dist (N,))
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts_w @ R.T + t
    uv, z = project(K, pc)
    Ow = -R.T @ t
    po = pts_w - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * normals, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = (
        (z > 0)
        & (uv[..., 0] >= bounds[0]) & (uv[..., 0] <= bounds[1])
        & (uv[..., 1] >= bounds[2]) & (uv[..., 1] <= bounds[3])
        & (dist >= min_dist) & (dist <= max_dist)
        & (view_cos >= view_cos_limit)
    )
    return ok, uv, z, view_cos, dist
