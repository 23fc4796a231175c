"""Sim(3) estimation and optimization for loop closing.

Rebuilds (capability-level):
- Sim3Solver (src/mapping/sim3_solver.{h,cpp}): Horn closed-form Sim3 from
  3 correspondences inside RANSAC(0.99, 20, 300), inliers checked by
  reprojection in *both* images against chi2 9.210 (the reference's
  mvnMaxError with unit pyramid sigma);
- Optimizer::OptimizeSim3 (src/mapping/optimizer.cpp:1062-1254): Sim3
  vertex with paired forward/backward projection edges, Huber sqrt(10),
  5 iterations -> prune chi2 > 10 -> 10 (or 5) more, returns inliers;
- Optimizer::OptimizeEssentialGraph (optimizer.cpp:776-1060): Sim3 pose
  graph over loop connections + spanning tree + loop edges + strong
  covisibility (weight >= 100), lambda0 = 1e-16, 20 iterations.

TPU-first: RANSAC hypotheses evaluate as one batched program; the pose
graph solves dense 7N x 7N normal equations on-device with autodiff edge
Jacobians (g2o falls back to numeric differentiation here; we get exact
Jacobians for free).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sp_orb_slam_tpu.geometry import se3
from sp_orb_slam_tpu.optim import lm
from sp_orb_slam_tpu.utils.precision import jit_f32

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Sim(3) exp/log (g2o sim3.h conventions: xi = [omega, upsilon, sigma])
# ---------------------------------------------------------------------------


def _sim3_W(omega: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim3 'V' matrix W with t = W upsilon (g2o sim3.h)."""
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    Om = se3.hat(omega)
    Om2 = Om @ Om
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5

    C = jnp.where(small_sigma, 1.0, (s - 1.0) / jnp.where(small_sigma, 1.0, sigma))

    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + sigma * sigma

    A = jnp.where(
        small_sigma,
        jnp.where(small_theta, 0.5, (1.0 - jnp.cos(theta)) / theta2),
        jnp.where(
            small_theta,
            ((sigma - 1.0) * s + 1.0) / jnp.where(small_sigma, 1.0, sigma * sigma),
            (a * sigma + (1.0 - b) * theta) / (theta * c),
        ),
    )
    B = jnp.where(
        small_sigma,
        jnp.where(small_theta, 1.0 / 6.0, (theta - jnp.sin(theta)) / (theta2 * theta)),
        jnp.where(
            small_theta,
            ((0.5 * sigma * sigma - sigma + 1.0) * s - 1.0)
            / jnp.where(small_sigma, 1.0, sigma * sigma * sigma),
            (C - ((b - 1.0) * sigma + a * theta) / c) / theta2,
        ),
    )
    return A * Om + B * Om2 + C * jnp.eye(3)


def sim3_exp(xi: jnp.ndarray):
    """xi = [omega(3), upsilon(3), sigma] -> (R, t, s)."""
    omega, upsilon, sigma = xi[:3], xi[3:6], xi[6]
    R = se3.so3_exp(omega)
    s = jnp.exp(sigma)
    t = _sim3_W(omega, sigma) @ upsilon
    return R, t, s


def sim3_log(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    omega = se3.so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(omega, sigma)
    upsilon = jnp.linalg.solve(W, t)
    return jnp.concatenate([omega, upsilon, sigma[None]])


@jit_f32
def sim3_log_batch(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Batched ``sim3_log``: (N,3,3),(N,3),(N,) -> (N,7) in ONE device
    program.  The un-jitted scalar version executes eagerly primitive by
    primitive — over the axon tunnel that is dozens of ~25 ms roundtrips
    per call, and the essential graph calls it per node AND per edge
    (measured: the loop-event spin dominated by these tiny dispatches)."""
    return jax.vmap(sim3_log)(R, t, s)


@jit_f32
def sim3_exp_batch(xi: jnp.ndarray):
    """Batched ``sim3_exp``: (N,7) -> ((N,3,3),(N,3),(N,))."""
    return jax.vmap(sim3_exp)(xi)


def sim3_mul(A, B):
    """(R, t, s) composition: A * B."""
    Ra, ta, sa = A
    Rb, tb, sb = B
    return Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb


def sim3_inverse(S):
    R, t, s = S
    Rinv = R.T
    sinv = 1.0 / s
    return Rinv, -sinv * (Rinv @ t), sinv


# ---------------------------------------------------------------------------
# Horn closed-form + RANSAC (Sim3Solver)
# ---------------------------------------------------------------------------


def sim3_horn(p1: jnp.ndarray, p2: jnp.ndarray):
    """Closed-form Sim3 aligning p1 -> p2 from (N, 3) correspondences
    (Horn 1987 via SVD, with the reference's non-symmetric scale)."""
    c1 = p1.mean(axis=0)
    c2 = p2.mean(axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = q2.T @ q1
    U, D, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.concatenate([jnp.ones(2), d[None]]))
    R = U @ S @ Vt
    # reference (non-fixed-scale): s = sum(q2 . R q1) / sum(|q1|^2)
    s = jnp.sum(q2 * (q1 @ R.T)) / jnp.maximum(jnp.sum(q1 * q1), 1e-12)
    t = c2 - s * (R @ c1)
    return R, t, s


class Sim3RansacResult(NamedTuple):
    ok: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@partial(jit_f32, static_argnames=("iters", "min_inliers"))
def sim3_ransac(X1, X2, uv1, uv2, valid, K_intr, key, *, iters: int = 300,
                min_inliers: int = 20, chi2_th: float = 9.210):
    """Sim3Solver RANSAC: X1/X2 (N, 3) camera-frame points of KF1/KF2 for
    matched pairs, uv1/uv2 their observed pixels; inlier = both-way
    reprojection chi2 below 9.210 (sim3_solver.cpp mvnMaxError)."""
    N = X1.shape[0]
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    order = jnp.argsort(~valid)
    draws = jax.random.randint(key, (iters, 3), 0, n_valid)
    sets = order[draws]

    fx, fy, cx, cy = K_intr[0], K_intr[1], K_intr[2], K_intr[3]

    def project(X):
        z = jnp.where(jnp.abs(X[:, 2]) < 1e-9, 1e-9, X[:, 2])
        return jnp.stack([fx * X[:, 0] / z + cx, fy * X[:, 1] / z + cy], -1)

    def score(R, t, s):
        X2_in_1 = (1.0 / s) * ((X2 - t) @ R)       # S12 applied to X2
        X1_in_2 = s * (X1 @ R.T) + t               # S21 applied to X1
        e1 = jnp.sum((project(X2_in_1) - uv1) ** 2, -1)
        e2 = jnp.sum((project(X1_in_2) - uv2) ** 2, -1)
        inl = valid & (e1 < chi2_th) & (e2 < chi2_th)
        return inl, jnp.sum(inl.astype(jnp.int32))

    def one(idx):
        R, t, s = sim3_horn(X1[idx], X2[idx])
        _, n = score(R, t, s)
        return n, R, t, s

    ns, Rs, ts, ss = jax.vmap(one)(sets)
    best = jnp.argmax(ns)
    R, t, s = Rs[best], ts[best], ss[best]
    inl, n = score(R, t, s)
    return Sim3RansacResult(n >= min_inliers, R, t, s, inl, n)


# ---------------------------------------------------------------------------
# OptimizeSim3
# ---------------------------------------------------------------------------


@partial(jit_f32, static_argnames=("iters",))
def optimize_sim3(R0, t0, s0, X1, X2, uv1, uv2, w1, w2, valid, K_intr, *,
                  iters: int = 10, huber: float = 3.1622776601683795):
    """Optimizer::OptimizeSim3 (optimizer.cpp:1062-1254): refine S21 over
    paired projection residuals, prune chi2 > 10 after 5 iterations,
    continue on inliers; returns the refined Sim3 + inlier count."""
    fx, fy, cx, cy = K_intr[0], K_intr[1], K_intr[2], K_intr[3]

    def project(X):
        z = jnp.where(jnp.abs(X[:, 2]) < 1e-9, 1e-9, X[:, 2])
        return jnp.stack([fx * X[:, 0] / z + cx, fy * X[:, 1] / z + cy], -1)

    def residuals(xi, active):
        dR, dt, ds = sim3_exp(xi)
        R = dR @ R0
        t = ds * (dR @ t0) + dt
        s = ds * s0
        X1_in_2 = s * (X1 @ R.T) + t
        X2_in_1 = (1.0 / s) * ((X2 - t) @ R)
        r2 = (project(X1_in_2) - uv2)
        r1 = (project(X2_in_1) - uv1)
        chi1 = jnp.sum(r1 * r1 * w1, -1)
        chi2_ = jnp.sum(r2 * r2 * w2, -1)
        return r1, r2, chi1, chi2_

    def system(xi, active):
        def stacked(x):
            r1, r2, _, _ = residuals(x, active)
            return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

        r = stacked(xi)
        J = jax.jacfwd(stacked)(xi)
        _, _, chi1, chi2_ = residuals(xi, active)
        wrob1 = lm.huber_weight(chi1, huber) * active
        wrob2 = lm.huber_weight(chi2_, huber) * active
        wvec = jnp.concatenate([
            (w1 * wrob1[:, None]).reshape(-1),
            (w2 * wrob2[:, None]).reshape(-1)])
        H = J.T @ (J * wvec[:, None])
        b = -J.T @ (r * wvec)
        cost = jnp.sum(lm.huber_rho(chi1, huber) * active
                       + lm.huber_rho(chi2_, huber) * active)
        return H, b, cost

    def run(xi, active, n):
        def body(_, state):
            xi, lam, nu, cost = state
            H, b, _ = system(xi, active)
            dx = lm.solve_damped(H, b, lam)
            xi_new = sim3_log(*sim3_mul(sim3_exp(dx), sim3_exp(xi)))
            _, _, cost_new = system(xi_new, active)
            accept = (cost_new < cost) & jnp.isfinite(cost_new)
            rho = lm.gain_ratio(cost, cost_new, dx, b, lam)
            lam, nu = lm.lm_update(accept, rho, lam, nu)
            xi = jnp.where(accept, xi_new, xi)
            cost = jnp.where(accept, cost_new, cost)
            return xi, lam, nu, cost

        H0, _, c0 = system(xi, active)
        lam0 = lm.lm_init_lambda(H0)
        xi, _, _, _ = jax.lax.fori_loop(0, n, body, (xi, lam0, jnp.float32(2.0), c0))
        return xi

    active0 = valid.astype(jnp.float32)
    xi = jnp.zeros(7)
    xi = run(xi, active0, 5)
    _, _, chi1, chi2_ = residuals(xi, active0)
    keep = valid & (chi1 <= 10.0) & (chi2_ <= 10.0)
    xi = run(xi, keep.astype(jnp.float32), iters)
    _, _, chi1, chi2_ = residuals(xi, keep.astype(jnp.float32))
    inlier = keep & (chi1 <= 10.0) & (chi2_ <= 10.0)
    dR, dt, ds = sim3_exp(xi)
    R = dR @ R0
    t = ds * (dR @ t0) + dt
    s = ds * s0
    return R, t, s, inlier, jnp.sum(inlier.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Essential-graph (Sim3 pose graph) optimization
# ---------------------------------------------------------------------------


@partial(jit_f32, static_argnames=("iters",))
def optimize_pose_graph(xi_nodes, fixed, edge_i, edge_j, edge_meas,
                        edge_valid, *, iters: int = 20):
    """Sim3 pose graph: nodes xi (N, 7) = log Siw; edges measure
    Sji = Sjw * Swi; residual = log(Sji_meas * Siw * Swj) with unit
    information (optimizer.cpp:776-1060, lambda0 = 1e-16).

    edge_meas: (E, 7) = log of the measured Sji.  Dense 7N normal equations.
    """
    N = xi_nodes.shape[0]

    def cost_of(x_flat):
        x = x_flat.reshape(N, 7)

        def one(i, j, meas, v):
            Si = sim3_exp(x[i])
            Sj_inv = sim3_inverse(sim3_exp(x[j]))
            err = sim3_mul(sim3_mul(sim3_exp(meas), Si), Sj_inv)
            r = sim3_log(*err)
            return jnp.where(v, r, jnp.zeros(7))

        r = jax.vmap(one)(edge_i, edge_j, edge_meas, edge_valid)
        return jnp.sum(r * r)

    def system(x_flat):
        x = x_flat.reshape(N, 7)

        def one(i, j, meas, v):
            # residual of the *perturbed* nodes composed directly in the
            # group — exactly one log at the end (intermediate log/exp
            # roundtrips make float32 jacfwd knife-edge unstable)
            def r_of(dxi, dxj):
                Si = sim3_mul(sim3_exp(dxi), sim3_exp(x[i]))
                Sj = sim3_mul(sim3_exp(dxj), sim3_exp(x[j]))
                err = sim3_mul(sim3_mul(sim3_exp(meas), Si),
                               sim3_inverse(Sj))
                return sim3_log(*err)

            z = jnp.zeros(7)
            r = r_of(z, z)
            Ji = jax.jacfwd(r_of, argnums=0)(z, z)
            Jj = jax.jacfwd(r_of, argnums=1)(z, z)
            m = v.astype(jnp.float32)
            return r * m, Ji * m, Jj * m

        r, Ji, Jj = jax.vmap(one)(edge_i, edge_j, edge_meas, edge_valid)
        H = jnp.zeros((N, 7, N, 7))
        H = H.at[edge_i, :, edge_i, :].add(
            jnp.einsum("eri,erj->eij", Ji, Ji))
        H = H.at[edge_j, :, edge_j, :].add(
            jnp.einsum("eri,erj->eij", Jj, Jj))
        H = H.at[edge_i, :, edge_j, :].add(
            jnp.einsum("eri,erj->eij", Ji, Jj))
        H = H.at[edge_j, :, edge_i, :].add(
            jnp.einsum("eri,erj->eij", Jj, Ji))
        b = jnp.zeros((N, 7))
        b = b.at[edge_i].add(-jnp.einsum("eri,er->ei", Ji, r))
        b = b.at[edge_j].add(-jnp.einsum("eri,er->ei", Jj, r))
        return H, b

    def apply(x_flat, dx):
        x = x_flat.reshape(N, 7)
        dxm = dx.reshape(N, 7) * (~fixed)[:, None]

        def upd(xi, d):
            return sim3_log(*sim3_mul(sim3_exp(d), sim3_exp(xi)))

        return jax.vmap(upd)(x, dxm).reshape(-1)

    x = xi_nodes.reshape(-1)

    def body(_, state):
        x, lam, nu, cost = state
        H, b = system(x)
        free = (~fixed).astype(jnp.float32)
        Hm = (H * free[:, None, None, None] * free[None, None, :, None]).reshape(N * 7, N * 7)
        diag_fix = jnp.repeat(fixed.astype(jnp.float32), 7)
        Hm = Hm + jnp.diag(diag_fix)
        bm = (b * free[:, None]).reshape(-1)
        dx = jnp.linalg.solve(Hm + lam * jnp.eye(N * 7), bm)
        x_new = apply(x, dx)
        cost_new = cost_of(x_new)
        accept = (cost_new < cost) & jnp.isfinite(cost_new)
        rho = lm.gain_ratio(cost, cost_new, dx, bm, lam)
        lam, nu = lm.lm_update(accept, rho, lam, nu)
        x = jnp.where(accept, x_new, x)
        cost = jnp.where(accept, cost_new, cost)
        return x, lam, nu, cost

    # g2o seeds lambda at 1e-16 (fine in double); in float32 a rejected
    # near-GN step only doubles lambda per trip and the solve can stall for
    # the whole budget — seed relative to the Hessian scale instead.
    H0, _ = system(x)
    lam0 = jnp.maximum(1e-6 * jnp.max(jnp.abs(jnp.diagonal(
        H0.reshape(N * 7, N * 7)))), 1e-12)
    x, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (x, lam0, jnp.float32(10.0), cost_of(x)))
    return x.reshape(N, 7)
