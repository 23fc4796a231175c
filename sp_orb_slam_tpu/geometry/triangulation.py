"""Batched DLT triangulation + the reference's acceptance gates.

Reference: Initializer::Triangulate (initializer.cpp:681-696) and the
triangulation loop of LocalMapping::CreateNewMapPointsOverride
(local_mapper.cpp:653-791): parallax window, positive depth in both views,
and covariance-weighted chi^2 <= 5.991 reprojection gates in both views.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def triangulate(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray,
                uv2: jnp.ndarray) -> jnp.ndarray:
    """DLT: projection matrices P (3, 4), pixel coords (N, 2) -> (N, 3).

    Solves via the SVD of the 4x4 design matrix per point (vmapped — tiny
    matrices batch well on-device).
    """
    def one(u1, u2):
        A = jnp.stack([
            u1[0] * P1[2] - P1[0],
            u1[1] * P1[2] - P1[1],
            u2[0] * P2[2] - P2[0],
            u2[1] * P2[2] - P2[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        x = vt[3]
        w = jnp.where(jnp.abs(x[3]) < 1e-12, 1e-12, x[3])
        return x[:3] / w

    return jax.vmap(one)(uv1, uv2)


def depth_and_tau(X: jnp.ndarray, O_self: jnp.ndarray, O_other: jnp.ndarray,
                  px_error_angle) -> tuple:
    """Along-ray depth of X from O_self and its 1-observation uncertainty.

    The SVO triangulation-uncertainty construction the reference's vestigial
    DepthFilter presupposes (Seed::updateSeed consumes (x, tau^2),
    depth_filter.cpp:35-60): perturb the observing ray in the *other* camera
    by the pixel-noise angle and intersect with the baseline triangle; the
    induced depth change tau is the 1-sigma depth error.  Batched over
    points; degenerate triangles (gamma <= 0) get tau = +inf so downstream
    relative-uncertainty gates reject them.

    Returns (z, tau) with z = |X - O_self| (depth along the unit bearing
    ray, the quantity the seed's inverse-depth state parameterizes).
    """
    t = O_other - O_self
    t_norm = jnp.linalg.norm(t)
    f = X - O_self
    z = jnp.linalg.norm(f, axis=-1)
    zs = jnp.maximum(z, 1e-9)
    f_unit = f / zs[:, None]
    a = X - O_other
    a_norm = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-9)
    alpha = jnp.arccos(jnp.clip(f_unit @ t / jnp.maximum(t_norm, 1e-9),
                                -1.0, 1.0))
    beta = jnp.arccos(jnp.clip(-(a @ t) / (a_norm * jnp.maximum(t_norm, 1e-9)),
                               -1.0, 1.0))
    beta_plus = beta + px_error_angle
    gamma = jnp.pi - alpha - beta_plus
    sin_g = jnp.sin(gamma)
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.where(sin_g <= 1e-6, 1.0,
                                                     sin_g)
    tau = jnp.where(sin_g <= 1e-6, jnp.inf, jnp.abs(z_plus - z))
    return z, tau


class TriGates(NamedTuple):
    good: jnp.ndarray          # (N,) all gates passed
    rej_parallax: jnp.ndarray  # per-gate masks, for the reference's counters
    rej_depth: jnp.ndarray
    rej_reproj: jnp.ndarray


def triangulation_gates(X: jnp.ndarray, Tcw1, Tcw2, K, uv1, uv2,
                        cov2_inv1, cov2_inv2, valid) -> TriGates:
    """The gate chain of local_mapper.cpp:665-778 (batched)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    R1, t1 = Tcw1[:3, :3], Tcw1[:3, 3]
    R2, t2 = Tcw2[:3, :3], Tcw2[:3, 3]
    O1 = -R1.T @ t1
    O2 = -R2.T @ t2

    # parallax between back-projected rays (:664-678)
    xn1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy,
                     jnp.ones_like(uv1[:, 0])], axis=-1)
    xn2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy,
                     jnp.ones_like(uv2[:, 0])], axis=-1)
    ray1 = xn1 @ R1
    ray2 = xn2 @ R2
    cos_par = jnp.sum(ray1 * ray2, axis=-1) / (
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1))
    par_ok = (cos_par > 0) & (cos_par < 0.9998)

    pc1 = X @ R1.T + t1
    pc2 = X @ R2.T + t2
    depth_ok = (pc1[:, 2] > 0) & (pc2[:, 2] > 0)

    def reproj_chi2(pc, uv, w):
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        return ((u - uv[:, 0]) ** 2 * w[:, 0] + (v - uv[:, 1]) ** 2 * w[:, 1])

    chi1 = reproj_chi2(pc1, uv1, cov2_inv1)
    chi2_ = reproj_chi2(pc2, uv2, cov2_inv2)
    reproj_ok = (chi1 <= 5.991) & (chi2_ <= 5.991)

    dist_ok = (jnp.linalg.norm(X - O1, axis=-1) > 0) & (
        jnp.linalg.norm(X - O2, axis=-1) > 0)

    good = valid & par_ok & depth_ok & reproj_ok & dist_ok
    return TriGates(good,
                    valid & ~par_ok,
                    valid & par_ok & ~depth_ok,
                    valid & par_ok & depth_ok & ~reproj_ok)
