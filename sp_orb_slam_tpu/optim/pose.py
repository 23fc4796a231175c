"""Pose-only optimizers: covariance-weighted reprojection and direct dustbin
alignment, as fixed-iteration LM under `jax.lax` loops.

Rebuilds (capability-level, file:line citations into the reference):
- Optimizer::PoseOptimization (src/mapping/optimizer.cpp:231-443): 4 rounds
  x 10 LM iterations, each round restarting from the *initial* pose on the
  current inlier set; information = diag(cov2_inv); Huber sqrt(5.991) dropped
  after round 3 (`it == 2` resets the kernel); between rounds every edge is
  reclassified by chi2 > 5.991.
- Optimizer::PoseOptimizationDust (src/mapping/optimizer_dust.cpp:170-294):
  1-d residual = bilinear sample of the 1/8-resolution dustbin probability
  map at the projection, with 1/8-scaled intrinsics fx/8, (cx-3.5)/8
  (:223-226); Huber delta 0.9; 40 LM iterations; edges leaving the image or
  going behind the camera are deactivated permanently (types_dust_tracking.
  cpp:62-94 setLevel(1) latch); inlier = active and chi2 <= 0.9, and inlier
  projections are reported back for patch association (:260-267).
- Optimizer::PoseOptimizationDustPost (optimizer_dust.cpp:35-168):
  reprojection pose-only; 10 Huber iterations, reclassify at chi2 > 7.378,
  10 more non-robust iterations continuing from the optimized pose.

Jacobian of the dust edge matches the reference's hybrid scheme
(types_dust_tracking.cpp:96-141): analytic 2x6 projection Jacobian composed
with a central-difference image gradient of the bilinearly-sampled map.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sp_orb_slam_tpu.geometry import se3
from sp_orb_slam_tpu.optim import lm
from sp_orb_slam_tpu.utils.precision import jit_f32

CHI2_MONO = 5.991
HUBER_MONO = jnp.sqrt(5.991)


def _proj_jacobian(pc: jnp.ndarray, fx, fy):
    """d(u,v)/d xi for xi = [omega, upsilon] (g2o ordering), per point.

    pc: (N, 3) camera-frame points.  Returns (N, 2, 6) = d proj / d xi
    (of the *projection*; residual obs - proj negates it).
    """
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)  # see _reproj_chi2
    invz = 1.0 / zsafe
    invz2 = invz * invz
    zeros = jnp.zeros_like(x)
    # d proj / d pc
    ju = jnp.stack([fx * invz, zeros, -fx * x * invz2], axis=-1)
    jv = jnp.stack([zeros, fy * invz, -fy * y * invz2], axis=-1)
    J_pc = jnp.stack([ju, jv], axis=1)  # (N, 2, 3)
    # d pc / d xi = [-[pc]x | I]
    dxi = jnp.concatenate([-se3.hat(pc), jnp.broadcast_to(
        jnp.eye(3, dtype=pc.dtype), pc.shape[:1] + (3, 3))], axis=-1)  # (N, 3, 6)
    return J_pc @ dxi  # (N, 2, 6)


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray       # (4, 4)
    inlier: jnp.ndarray    # (N,) bool (active & chi2 below gate)
    n_inlier: jnp.ndarray  # () int32
    chi2: jnp.ndarray      # (N,) final chi2 per edge


def _reproj_chi2(Tcw, Xw, obs, w_info, K):
    fx, fy, cx, cy = K
    pc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
    # sign-preserving depth clamp (like ba.py zsafe): a multi-start
    # relocalization fan can put points exactly on the camera plane, and
    # z == 0 would NaN-poison the cost (every LM step rejected) and the
    # chi2 gate (NaN > gate is False -> counted as inlier)
    z = pc[:, 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * pc[:, 0] / zsafe + cx
    v = fy * pc[:, 1] / zsafe + cy
    r = obs - jnp.stack([u, v], axis=-1)
    return jnp.sum(r * r * w_info, axis=-1), r, pc


def _lm_reproj_rounds(Tcw0, Xw, obs, w_info, K, active, *, iters: int,
                      huber_delta, use_huber: bool):
    """One g2o optimize(iters) call on the active reprojection edges."""
    fx, fy = K[0], K[1]

    def system(Tcw):
        chi2, r, pc = _reproj_chi2(Tcw, Xw, obs, w_info, K)
        w_rob = lm.huber_weight(chi2, huber_delta) if use_huber else jnp.ones_like(chi2)
        w = jnp.where(active, w_rob, 0.0)
        J = -_proj_jacobian(pc, fx, fy)  # residual = obs - proj
        # weighted normal equations: H = sum J^T diag(W_info * w_rob) J
        Wr = w_info * w[:, None]
        H = jnp.einsum("nia,ni,nib->ab", J, Wr, J)
        b = -jnp.einsum("nia,ni->a", J, Wr * r)
        cost = jnp.sum(jnp.where(active,
                                 lm.huber_rho(chi2, huber_delta) if use_huber else chi2,
                                 0.0))
        return H, b, cost

    H0, b0, cost0 = system(Tcw0)
    lam0 = lm.lm_init_lambda(H0)

    def body(_, state):
        Tcw, lam, nu, cost = state
        H, b, _ = system(Tcw)
        dx = lm.solve_damped(H, b, lam)
        T_new = se3.se3_exp(dx) @ Tcw
        _, _, cost_new = system(T_new)
        rho = lm.gain_ratio(cost, cost_new, dx, b, lam)
        ok = (cost_new < cost) & jnp.isfinite(cost_new)
        lam, nu = lm.lm_update(ok, rho, lam, nu)
        Tcw = jnp.where(ok, T_new, Tcw)
        cost = jnp.where(ok, cost_new, cost)
        return Tcw, lam, nu, cost

    Tcw, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (Tcw0, lam0, jnp.float32(2.0), cost0))
    return Tcw


@partial(jit_f32, static_argnames=("rounds", "iters"))
def pose_optimization(Tcw0: jnp.ndarray, Xw: jnp.ndarray, obs: jnp.ndarray,
                      cov2_inv: jnp.ndarray, valid: jnp.ndarray,
                      K: jnp.ndarray, *, rounds: int = 4,
                      iters: int = 10) -> PoseOptResult:
    """Optimizer::PoseOptimization (optimizer.cpp:231-443).

    Xw (N, 3) world points, obs (N, 2) keypoint pixels, cov2_inv (N, 2)
    diagonal information, valid (N,) edge mask, K = [fx, fy, cx, cy].
    """
    n_init = jnp.sum(valid.astype(jnp.int32))
    outlier = jnp.zeros_like(valid)

    def round_body(it, carry):
        Tcw, outlier = carry
        active = valid & ~outlier
        # the robust kernel is removed *after* round it == 2
        # (optimizer.cpp:408), so rounds 0-2 are Huber, round 3 is not
        use_huber = it <= 2
        Tcw_new = jax.lax.cond(
            use_huber,
            lambda T: _lm_reproj_rounds(Tcw0, Xw, obs, cov2_inv, K, active,
                                        iters=iters, huber_delta=HUBER_MONO,
                                        use_huber=True),
            lambda T: _lm_reproj_rounds(Tcw0, Xw, obs, cov2_inv, K, active,
                                        iters=iters, huber_delta=HUBER_MONO,
                                        use_huber=False),
            Tcw,
        )
        chi2, _, pc = _reproj_chi2(Tcw_new, Xw, obs, cov2_inv, K)
        outlier = valid & (chi2 > CHI2_MONO)
        return Tcw_new, outlier

    Tcw, outlier = jax.lax.fori_loop(0, rounds, round_body, (Tcw0, outlier))
    chi2, _, _ = _reproj_chi2(Tcw, Xw, obs, cov2_inv, K)
    inlier = valid & ~outlier
    return PoseOptResult(Tcw, inlier, jnp.sum(inlier.astype(jnp.int32)), chi2)


@partial(jit_f32, static_argnames=("iters",))
def pose_optimization_post(Tcw0, Xw, obs, cov2_inv, valid, K, *,
                           iters: int = 10) -> PoseOptResult:
    """Optimizer::PoseOptimizationDustPost (optimizer_dust.cpp:35-168):
    10 Huber iterations from Tcw0, reclassify at chi2 > 7.378, 10 more
    non-robust iterations continuing from the optimized pose."""
    T1 = _lm_reproj_rounds(Tcw0, Xw, obs, cov2_inv, K, valid, iters=iters,
                           huber_delta=HUBER_MONO, use_huber=True)
    chi2, _, _ = _reproj_chi2(T1, Xw, obs, cov2_inv, K)
    outlier = valid & (chi2 > 7.378)
    active = valid & ~outlier
    T2 = _lm_reproj_rounds(T1, Xw, obs, cov2_inv, K, active, iters=iters,
                           huber_delta=HUBER_MONO, use_huber=False)
    chi2f, _, _ = _reproj_chi2(T2, Xw, obs, cov2_inv, K)
    return PoseOptResult(T2, active, jnp.sum(active.astype(jnp.int32)), chi2f)


# ---------------------------------------------------------------------------
# Direct dustbin alignment
# ---------------------------------------------------------------------------


def _sample_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """getPixelValue semantics (types_dust_tracking.cpp:43-55): floor-based
    bilinear interpolation.  Coordinates must be in-image; callers mask."""
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    xx = u - x0
    yy = v - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return ((1 - xx) * (1 - yy) * i00 + xx * (1 - yy) * i01
            + (1 - xx) * yy * i10 + xx * yy * i11)


class DustResult(NamedTuple):
    Tcw: jnp.ndarray
    inlier: jnp.ndarray    # (N,) active & chi2 <= chi2_inlier
    n_inlier: jnp.ndarray
    proj_uv: jnp.ndarray   # (N, 2) dust-grid projections at the final pose


@partial(jit_f32, static_argnames=("iters",))
def pose_optimization_dust(Tcw0: jnp.ndarray, Xw: jnp.ndarray,
                           valid: jnp.ndarray, dust: jnp.ndarray,
                           K_full: jnp.ndarray, *, iters: int = 40,
                           huber_delta: float = 0.9,
                           chi2_inlier: float = 0.9) -> DustResult:
    """Optimizer::PoseOptimizationDust (optimizer_dust.cpp:170-294).

    dust: (hc, wc) dustbin probability map; K_full = full-res [fx, fy, cx,
    cy], scaled internally to the 1/8 grid (fx/8, (cx-3.5)/8, :223-226).
    """
    h, w = dust.shape
    fx = K_full[0] / 8.0
    fy = K_full[1] / 8.0
    cx = (K_full[2] - 3.5) / 8.0
    cy = (K_full[3] - 3.5) / 8.0

    def in_image(u, v, border=1.0):
        # types_dust_tracking.cpp:36-41
        return (u >= border) & (u + border + 1 < w) & (v >= border) & (v + border + 1 < h)

    def evaluate(Tcw, alive):
        pc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[:, 2]
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        ok = alive & (z > 0.0) & in_image(u, v)
        err = jnp.where(ok, _sample_bilinear(dust, u, v), 0.0)
        return err, u, v, pc, ok

    def system(Tcw, alive):
        err, u, v, pc, ok = evaluate(Tcw, alive)
        chi2 = err * err
        w_rob = jnp.where(ok, lm.huber_weight(chi2, huber_delta), 0.0)
        # central-difference image gradient (types_dust_tracking.cpp:131-137)
        gu = (_sample_bilinear(dust, u + 1.0, v) - _sample_bilinear(dust, u - 1.0, v)) / 2.0
        gv = (_sample_bilinear(dust, u, v + 1.0) - _sample_bilinear(dust, u, v - 1.0)) / 2.0
        Jp = _proj_jacobian(pc, fx, fy)  # (N, 2, 6)
        J = gu[:, None] * Jp[:, 0, :] + gv[:, None] * Jp[:, 1, :]  # (N, 6)
        H = jnp.einsum("na,n,nb->ab", J, w_rob, J)
        b = -jnp.einsum("na,n->a", J, w_rob * err)
        cost = jnp.sum(jnp.where(ok, lm.huber_rho(chi2, huber_delta), 0.0))
        return H, b, cost, ok

    # latch the initially-invalid edges exactly like computeError's
    # setLevel(1) on the first evaluation
    H0, b0, cost0, alive0 = system(Tcw0, valid)
    lam0 = lm.lm_init_lambda(H0)

    def body(_, state):
        Tcw, alive, lam, nu, cost = state
        H, b, _, ok = system(Tcw, alive)
        alive = alive & ok  # setLevel(1) latch: once out, stays out
        dx = lm.solve_damped(H, b, lam)
        T_new = se3.se3_exp(dx) @ Tcw
        _, _, cost_new, ok_new = system(T_new, alive)
        rho = lm.gain_ratio(cost, cost_new, dx, b, lam)
        # step-sanity guard: the masked cost REWARDS flinging points out of
        # the image (their residuals leave the sum), so a garbage solver
        # step that moves the camera wildly scores cost_new == 0 and would
        # be "accepted", latching every edge dead (the round-4 TPU failure;
        # see lm.solve_damped).  Genuine dust steps are ~1e-3..1e-1 in
        # se3-log units; anything near 1e3 is solver debris, never signal.
        sane = jnp.sum(dx * dx) < 1e6
        accept = sane & (cost_new < cost) & jnp.isfinite(cost_new)
        lam, nu = lm.lm_update(accept, rho, lam, nu)
        Tcw = jnp.where(accept, T_new, Tcw)
        alive = jnp.where(accept, alive & ok_new, alive)
        cost = jnp.where(accept, cost_new, cost)
        return Tcw, alive, lam, nu, cost

    Tcw, alive, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (Tcw0, alive0, lam0, jnp.float32(2.0), cost0))

    err, u, v, _, ok = evaluate(Tcw, alive)
    chi2 = err * err
    inlier = valid & alive & ok & (chi2 <= chi2_inlier)
    return DustResult(Tcw, inlier, jnp.sum(inlier.astype(jnp.int32)),
                      jnp.stack([u, v], axis=-1))


@partial(jit_f32, static_argnames=("iters",))
def pose_optimization_heat(Tcw0: jnp.ndarray, Xw: jnp.ndarray,
                           valid: jnp.ndarray, heat: jnp.ndarray,
                           K_full: jnp.ndarray, *, iters: int = 40,
                           huber_delta: float = 0.9,
                           chi2_inlier: float = 0.02) -> DustResult:
    """Optimizer::PoseOptimizationHeat (optimizer_dust.cpp:415-522): the
    retained experimental full-resolution variant of the dust alignment —
    same direct-alignment machinery on the normalized heat map with
    full-resolution intrinsics and the 0.02 chi2 inlier gate."""
    h, w = heat.shape
    fx, fy, cx, cy = K_full[0], K_full[1], K_full[2], K_full[3]

    def in_image(u, v, border=1.0):
        return (u >= border) & (u + border + 1 < w) & (v >= border) & (v + border + 1 < h)

    def evaluate(Tcw, alive):
        pc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[:, 2]
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        ok = alive & (z > 0.0) & in_image(u, v)
        err = jnp.where(ok, _sample_bilinear(heat, u, v), 0.0)
        return err, u, v, pc, ok

    def system(Tcw, alive):
        err, u, v, pc, ok = evaluate(Tcw, alive)
        chi2 = err * err
        w_rob = jnp.where(ok, lm.huber_weight(chi2, huber_delta), 0.0)
        gu = (_sample_bilinear(heat, u + 1.0, v) - _sample_bilinear(heat, u - 1.0, v)) / 2.0
        gv = (_sample_bilinear(heat, u, v + 1.0) - _sample_bilinear(heat, u, v - 1.0)) / 2.0
        Jp = _proj_jacobian(pc, fx, fy)
        J = gu[:, None] * Jp[:, 0, :] + gv[:, None] * Jp[:, 1, :]
        H = jnp.einsum("na,n,nb->ab", J, w_rob, J)
        b = -jnp.einsum("na,n->a", J, w_rob * err)
        cost = jnp.sum(jnp.where(ok, lm.huber_rho(chi2, huber_delta), 0.0))
        return H, b, cost, ok

    H0, b0, cost0, alive0 = system(Tcw0, valid)
    lam0 = lm.lm_init_lambda(H0)

    def body(_, state):
        Tcw, alive, lam, nu, cost = state
        H, b, _, ok = system(Tcw, alive)
        alive = alive & ok
        dx = lm.solve_damped(H, b, lam)
        T_new = se3.se3_exp(dx) @ Tcw
        _, _, cost_new, ok_new = system(T_new, alive)
        rho = lm.gain_ratio(cost, cost_new, dx, b, lam)
        # step-sanity guard: see pose_optimization_dust (same masked-cost
        # pathology on the heat map)
        sane = jnp.sum(dx * dx) < 1e6
        accept = sane & (cost_new < cost) & jnp.isfinite(cost_new)
        lam, nu = lm.lm_update(accept, rho, lam, nu)
        Tcw = jnp.where(accept, T_new, Tcw)
        alive = jnp.where(accept, alive & ok_new, alive)
        cost = jnp.where(accept, cost_new, cost)
        return Tcw, alive, lam, nu, cost

    Tcw, alive, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (Tcw0, alive0, lam0, jnp.float32(2.0), cost0))
    err, u, v, _, ok = evaluate(Tcw, alive)
    chi2 = err * err
    inlier = valid & alive & ok & (chi2 <= chi2_inlier)
    return DustResult(Tcw, inlier, jnp.sum(inlier.astype(jnp.int32)),
                      jnp.stack([u, v], axis=-1))
