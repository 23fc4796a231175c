"""Bundle adjustment as batched Schur-complement LM, fully on-device.

Rebuilds (capability-level):
- Optimizer::LocalBundleAdjustment (src/mapping/optimizer.cpp:445-774):
  local KFs free (KF id 0 pinned), boundary observers fixed, mono edges
  weighted by diag(cov2_inv) (:603-609) with Huber sqrt(5.991); phase 1 =
  5 iterations, then deactivate edges with chi2 > 5.991 or non-positive
  depth and drop the robust kernel, phase 2 = 10 iterations; the final
  classification marks observations for erasure (:688-724).
- Optimizer::BundleAdjustment / GlobalBundleAdjustemnt (optimizer.cpp:
  42-229): single phase, optional Huber, unit information (the reference
  uses the single-level pyramid sigma there, = 1).

TPU-native design: instead of g2o's sparse CHOLMOD-style elimination, the
point blocks are eliminated with a *dense-capacity* Schur complement —
the camera-point coupling blocks live in a (P, C, 6, 3) array (a few MB at
local-BA capacities), so the reduced camera system

    S = Hcc - W Hpp^-1 W^T

is two einsums lowering to MXU matmuls, and the whole solve is one XLA
program with static shapes.  Fixed cameras are handled by zeroing their
rows/columns of S and pinning their diagonal blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sp_orb_slam_tpu.geometry import se3
from sp_orb_slam_tpu.optim import lm
from sp_orb_slam_tpu.optim.pose import _proj_jacobian
from sp_orb_slam_tpu.utils.precision import jit_f32

CHI2_MONO = 5.991
HUBER_MONO = float(jnp.sqrt(5.991))


class BAResult(NamedTuple):
    poses: jnp.ndarray     # (C, 4, 4) optimized Tcw
    points: jnp.ndarray    # (P, 3) optimized world points
    bad_obs: jnp.ndarray   # (O,) observations failing the final gate
    chi2: jnp.ndarray      # (O,) final per-observation chi2


def _evaluate(poses, points, obs_cam, obs_pt, obs_uv, obs_w, K):
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Tcw = poses[obs_cam]                      # (O, 4, 4)
    Xw = points[obs_pt]                       # (O, 3)
    pc = (Tcw[:, :3, :3] @ Xw[..., None])[..., 0] + Tcw[:, :3, 3]
    z = pc[:, 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * pc[:, 0] / zsafe + cx
    v = fy * pc[:, 1] / zsafe + cy
    r = obs_uv - jnp.stack([u, v], axis=-1)
    chi2 = jnp.sum(r * r * obs_w, axis=-1)
    return r, chi2, pc, z


def _build_system(poses, points, obs_cam, obs_pt, obs_uv, obs_w, K, active,
                  huber_delta, use_huber, C, P):
    r, chi2, pc, _ = _evaluate(poses, points, obs_cam, obs_pt, obs_uv, obs_w, K)
    w_rob = lm.huber_weight(chi2, huber_delta) if use_huber else jnp.ones_like(chi2)
    w_rob = jnp.where(active, w_rob, 0.0)
    W = obs_w * w_rob[:, None]                # (O, 2)

    fx, fy = K[0], K[1]
    Jc = -_proj_jacobian(pc, fx, fy)          # (O, 2, 6) d r / d xi_cam
    R = poses[obs_cam][:, :3, :3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    invz = 1.0 / z
    invz2 = invz * invz
    zeros = jnp.zeros_like(x)
    ju = jnp.stack([fx * invz, zeros, -fx * x * invz2], axis=-1)
    jv = jnp.stack([zeros, fy * invz, -fy * y * invz2], axis=-1)
    J_pc = jnp.stack([ju, jv], axis=1)        # (O, 2, 3)
    Jp = -(J_pc @ R)                          # (O, 2, 3) d r / d X_w

    # block accumulations
    Hcc = jnp.zeros((C, 6, 6)).at[obs_cam].add(
        jnp.einsum("oia,oi,oib->oab", Jc, W, Jc))
    Hpp = jnp.zeros((P, 3, 3)).at[obs_pt].add(
        jnp.einsum("oia,oi,oib->oab", Jp, W, Jp))
    bc = jnp.zeros((C, 6)).at[obs_cam].add(
        -jnp.einsum("oia,oi->oa", Jc, W * r))
    bp = jnp.zeros((P, 3)).at[obs_pt].add(
        -jnp.einsum("oia,oi->oa", Jp, W * r))
    Wcp = jnp.zeros((P, C, 6, 3)).at[obs_pt, obs_cam].add(
        jnp.einsum("oia,oi,oib->oab", Jc, W, Jp))

    cost = jnp.sum(jnp.where(active,
                             lm.huber_rho(chi2, huber_delta) if use_huber else chi2,
                             0.0))
    return Hcc, Hpp, bc, bp, Wcp, cost


def _schur_step(Hcc, Hpp, bc, bp, Wcp, lam, fixed, C, P):
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + lam * eye3
    Hpp_inv = jnp.linalg.inv(Hpp_d)           # (P, 3, 3)
    T = jnp.einsum("pcax,pxy->pcay", Wcp, Hpp_inv)   # (P, C, 6, 3)
    S = -jnp.einsum("piax,pjbx->iajb", T, Wcp)       # (C, 6, C, 6)
    # add the block-diagonal camera Hessian + damping
    ci = jnp.arange(C)
    di = jnp.arange(6)
    S = S.at[ci[:, None, None], di[None, :, None],
             ci[:, None, None], di[None, None, :]].add(Hcc + lam * eye6)
    b_red = bc - jnp.einsum("pcax,px->ca", T, bp)

    # pin fixed cameras: zero rows/cols, identity diagonal
    free = (~fixed).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S.at[ci[:, None, None], di[None, :, None],
             ci[:, None, None], di[None, None, :]].add(
        jnp.where(fixed[:, None, None], eye6, 0.0))
    b_red = b_red * free[:, None]

    dc = jnp.linalg.solve(S.reshape(C * 6, C * 6), b_red.reshape(C * 6))
    dc = dc.reshape(C, 6) * free[:, None]
    # back-substitute points: dp = Hpp^-1 (bp - sum_c Wcp^T dc)
    rhs = bp - jnp.einsum("pcax,ca->px", Wcp, dc)
    dp = jnp.einsum("pxy,py->px", Hpp_inv, rhs)
    return dc, dp


def _apply(poses, points, dc, dp, fixed):
    dT = se3.se3_exp(dc)
    new_poses = jnp.where(fixed[:, None, None], poses, dT @ poses)
    return new_poses, points + dp


def _lm_phase(poses, points, obs_cam, obs_pt, obs_uv, obs_w, K, active, fixed,
              pt_valid, *, iters, use_huber, huber_delta=HUBER_MONO):
    C, P = poses.shape[0], points.shape[0]

    def cost_of(po, pt):
        _, chi2, _, _ = _evaluate(po, pt, obs_cam, obs_pt, obs_uv, obs_w, K)
        rho = lm.huber_rho(chi2, huber_delta) if use_huber else chi2
        return jnp.sum(jnp.where(active, rho, 0.0))

    Hcc0, *_ = _build_system(poses, points, obs_cam, obs_pt, obs_uv, obs_w, K,
                             active, huber_delta, use_huber, C, P)
    lam0 = lm.TAU * jnp.max(jax.vmap(jnp.diag)(Hcc0))
    lam0 = jnp.maximum(lam0, 1e-10)

    def body(_, state):
        poses, points, lam, nu, cost = state
        Hcc, Hpp, bc, bp, Wcp, _ = _build_system(
            poses, points, obs_cam, obs_pt, obs_uv, obs_w, K, active,
            huber_delta, use_huber, C, P)
        dc, dp = _schur_step(Hcc, Hpp, bc, bp, Wcp, lam, fixed, C, P)
        dp = dp * pt_valid[:, None]
        new_poses, new_points = _apply(poses, points, dc, dp, fixed)
        cost_new = cost_of(new_poses, new_points)
        # gain ratio over the stacked update
        denom = (jnp.sum(dc * (lam * dc + bc)) + jnp.sum(dp * (lam * dp + bp)))
        rho = (cost - cost_new) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        # require a *relative* decrease: mono BA with an empty fixed-camera
        # boundary has a free scale gauge, and in float32 a plain
        # cost_new < cost accept lets numeric noise random-walk along the
        # gauge direction, corrupting a converged map a little more on every
        # call (g2o avoids this only by virtue of double precision)
        accept = (cost_new < cost * (1.0 - 1e-5)) & jnp.isfinite(cost_new)
        lam, nu = lm.lm_update(accept, rho, lam, nu)
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        cost = jnp.where(accept, cost_new, cost)
        return poses, points, lam, nu, cost

    poses, points, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (poses, points, lam0, jnp.float32(2.0),
                         cost_of(poses, points)))
    return poses, points


@partial(jit_f32, static_argnames=("iters1", "iters2", "two_phase", "robust"))
def bundle_adjust(poses, fixed, points, pt_valid, obs_cam, obs_pt, obs_uv,
                  obs_w, obs_valid, K, *, iters1: int = 5, iters2: int = 10,
                  two_phase: bool = True, robust: bool = True) -> BAResult:
    """Run local-BA (two_phase) or plain BA (single phase, optional robust).

    poses (C, 4, 4) Tcw; fixed (C,) bool; points (P, 3); pt_valid (P,);
    obs_* (O,) with obs_w (O, 2) diagonal information; K = [fx, fy, cx, cy].
    Invalid observations must carry in-range (clipped) indices.
    """
    active = obs_valid
    poses, points = _lm_phase(poses, points, obs_cam, obs_pt, obs_uv, obs_w,
                              K, active, fixed, pt_valid,
                              iters=iters1, use_huber=robust)
    if two_phase:
        _, chi2, _, z = _evaluate(poses, points, obs_cam, obs_pt, obs_uv, obs_w, K)
        active = active & (chi2 <= CHI2_MONO) & (z > 0)
        poses, points = _lm_phase(poses, points, obs_cam, obs_pt, obs_uv,
                                  obs_w, K, active, fixed, pt_valid,
                                  iters=iters2, use_huber=False)
    _, chi2, _, z = _evaluate(poses, points, obs_cam, obs_pt, obs_uv, obs_w, K)
    bad = obs_valid & ((chi2 > CHI2_MONO) | (z <= 0))
    return BAResult(poses, points, bad, chi2)
