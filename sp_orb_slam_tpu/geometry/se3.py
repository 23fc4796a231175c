"""SO(3)/SE(3)/Sim(3) operations as pure, batched JAX functions.

The reference relies on g2o's `SE3Quat`/`Sim3` types (quaternion + translation)
and its `exp`/`log` maps for the expmap vertex parameterization
(g2o VertexSE3Expmap, used throughout src/mapping/optimizer*.cpp).  Here poses
are 4x4 row-major matrices `Tcw` (world->camera, like the reference's cv::Mat
convention in type/frame.cpp:316-328) and tangent increments follow g2o's
SE3Quat::exp ordering: xi = [omega(3), upsilon(3)] with left-multiplicative
update T <- exp(xi) * T.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3), safe at theta -> 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    # Taylor fallbacks near zero
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3).

    atan2/series formulation with finite autodiff gradients at the identity
    (the arccos form has d/dx -> inf at cos = 1, which poisons jacfwd through
    pose-graph residuals).  Near theta = pi precision degrades; incremental
    pose updates stay far from pi.
    """
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = (trace - 1.0) * 0.5
    s2 = jnp.sum(vee * vee, axis=-1) * 0.25  # sin^2(theta)
    small = s2 < 1e-10
    # branch-safe operands (keep sqrt away from 0 on the taken branch)
    s2_safe = jnp.where(small, 1.0, s2)
    sin_t = jnp.sqrt(s2_safe)
    theta = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(small,
                      0.5 + s2 / 12.0,           # series in sin^2
                      theta / (2.0 * sin_t))
    return scale[..., None] * vee


def _V(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3) (the 'V' matrix of SE(3) exp)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """g2o-ordered tangent [omega, upsilon] (..., 6) -> (..., 4, 4)."""
    w, u = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_V(w) @ u[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> [omega, upsilon] (..., 6)."""
    w = so3_log(T[..., :3, :3])
    Vinv = jnp.linalg.inv(_V(w))
    u = (Vinv @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([w, u], axis=-1)


def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3:].set(-Rt @ t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def se3_apply(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if x.ndim == T.ndim - 1:  # (..., N, 3)
        return x @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return (R @ x[..., None])[..., 0] + t


def camera_center(Tcw: jnp.ndarray) -> jnp.ndarray:
    """twc = -Rcw^T tcw (reference frame.cpp:316-328 cached mOw)."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3:]
    return (-jnp.swapaxes(R, -1, -2) @ t)[..., 0]


# ---------------------------------------------------------------------------
# Sim(3) — used by loop closing (Sim3Solver / OptimizeSim3 / essential graph)
# ---------------------------------------------------------------------------


def sim3_matrix(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) Sim3 with scaled rotation block sR."""
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R * s[..., None, None])
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def sim3_inv(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * (Rt @ t[..., None])[..., 0]
    return Rt, t_inv, s_inv


def sim3_apply(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply s*R*x + t to points (..., 3) / (..., N, 3)."""
    if x.ndim >= R.ndim - 1 and x.shape[-2:] != (3,):
        pass
    if x.ndim == R.ndim - 1:  # batch of points
        return s[..., None, None] * (x @ jnp.swapaxes(R, -1, -2)) + t[..., None, :]
    return s[..., None] * (R @ x[..., None])[..., 0] + t
