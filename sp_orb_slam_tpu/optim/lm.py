"""Shared Levenberg-Marquardt machinery for fixed-iteration on-device solves.

The reference drives every optimization through g2o's
OptimizationAlgorithmLevenberg (optimizer.cpp, optimizer_dust.cpp).  g2o's
damping schedule is reproduced here: lambda0 = tau * max(diag H) with
tau = 1e-5, accept/reject with the gain-ratio polynomial update
(scale = max(1/3, 1 - (2 rho - 1)^3), nu doubling on rejection).  The one
structural difference — unavoidable and intended under XLA — is a fixed trip
count (`lax.fori_loop`) where a rejected step consumes an iteration instead
of g2o's inner retry loop; with the reference's generous iteration budgets
(10-40) the solves converge to the same optima (validated in tests by
comparing against scipy reference solves).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TAU = 1e-5


def huber_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """g2o RobustKernelHuber IRLS weight as a function of chi2 = e^T W e:
    rho'(s) = 1 for sqrt(s) <= delta else delta / sqrt(s)."""
    s = jnp.sqrt(jnp.maximum(chi2, 1e-20))
    return jnp.where(s <= delta, 1.0, delta / s)


def huber_rho(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """g2o robustified cost: rho(s) = s if sqrt(s) <= delta else
    2 delta sqrt(s) - delta^2."""
    s = jnp.sqrt(jnp.maximum(chi2, 1e-20))
    return jnp.where(s <= delta, chi2, 2.0 * delta * s - delta * delta)


def lm_init_lambda(H: jnp.ndarray) -> jnp.ndarray:
    """g2o: lambda0 = tau * max diag of the (damped-free) Hessian."""
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    return TAU * jnp.max(diag, axis=-1)


def lm_update(accepted, rho, lam, nu):
    """One g2o-style damping update.  rho = gain ratio."""
    scale = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    lam_acc = lam * scale
    lam_rej = lam * nu
    lam_new = jnp.where(accepted, lam_acc, lam_rej)
    nu_new = jnp.where(accepted, 2.0, nu * 2.0)
    return lam_new, nu_new


def solve_damped(H: jnp.ndarray, b: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Solve (H + lam I) dx = b (g2o adds lambda to the diagonal).

    Jacobi-preconditioned: the TPU f32 solve on the raw normal equations is
    the round-4 dust-tracker failure mode — reprojection/dust Hessians mix
    rotation and translation blocks whose diagonals differ by ~1e4-1e6
    (|J| ~ fx), and on ill-conditioned frames the TPU LU returned a garbage
    `dx` that CPU LAPACK handled (diag_dust replay: NaN poses / n_coarse=0
    on 32/36 frames from byte-identical inputs).  Scaling to unit diagonal
    before the solve keeps f32 factorization well-conditioned on every
    backend; non-finite solutions (exactly-singular H, e.g. all edges dead)
    degrade to a zero step instead of poisoning the pose.  g2o solves the
    same systems in double precision (optimizer.cpp LinearSolverDense) —
    this is the f32-native equivalent, not a behavior change.
    """
    n = H.shape[-1]
    Hd = H + lam[..., None, None] * jnp.eye(n, dtype=H.dtype)
    diag = jnp.diagonal(Hd, axis1=-2, axis2=-1)
    d = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    Hs = Hd * d[..., :, None] * d[..., None, :]
    bs = b * d
    ys = jnp.linalg.solve(Hs, bs[..., None])[..., 0]
    dx = ys * d
    return jnp.where(jnp.all(jnp.isfinite(dx), axis=-1, keepdims=True),
                     dx, 0.0)


def gain_ratio(chi2_old, chi2_new, dx, b, lam):
    """g2o: rho = (F(x) - F(x+dx)) / (dx^T (lambda dx + b))."""
    denom = jnp.sum(dx * (lam[..., None] * dx + b), axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return (chi2_old - chi2_new) / denom
