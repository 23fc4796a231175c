"""Two-view monocular initialization: parallel H/F RANSAC + reconstruction.

Rebuilds Initializer (src/tracking/initializer.{h,cpp}) TPU-first: the
reference runs homography and fundamental RANSAC in two host threads
(initializer.cpp:98-104); here all `iters` hypotheses of *both* models run
as one batched XLA program (vmapped 8-point solves + vectorized scoring),
then model selection RH = SH/(SH+SF) > 0.40 (:106-113) and reconstruction:

- ReconstructF (:436-530): E = K^T F K, DecomposeE (:849-881), 4 motion
  hypotheses through CheckRT, winner needs maxGood >= max(0.9 N, 50),
  a unique winner (nsimilar <= 1 at 0.7 maxGood), parallax > 1 deg;
- ReconstructH (:531-680): Faugeras SVD decomposition, 8 motion hypotheses,
  secondBest < 0.75 best, bestGood > max(50, 0.9 N), parallax >= 1 deg;
- CheckRT (:744-847): triangulate, finite, cheirality in both views with
  the 0.99998 low-parallax escape, reprojection error <= 4 sigma^2 both
  views, parallax = acos of the 50th-smallest cosine;
- scoring: CheckHomography symmetric transfer (:281-361, th 5.991),
  CheckFundamental epipolar distances (:362-435, th 3.841 / score th 5.991);
- point normalization by mean absolute deviation (:698-742).

All arrays are fixed capacity with validity masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sp_orb_slam_tpu.geometry.triangulation import triangulate
from sp_orb_slam_tpu.utils.precision import jit_f32

TH_H = 5.991
TH_F = 3.841
TH_F_SCORE = 5.991


def _normalize(uv: jnp.ndarray, valid: jnp.ndarray):
    """Mean-absolute-deviation normalization (initializer.cpp:698-742)."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], uv, 0.0), axis=0) / n
    dev = jnp.sum(jnp.where(valid[:, None], jnp.abs(uv - mean), 0.0), axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    norm_uv = (uv - mean) * s
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]])
    return norm_uv, T


def _h_dlt(p1: jnp.ndarray, p2: jnp.ndarray, mask=None) -> jnp.ndarray:
    """H21 DLT from normalized correspondences; optional row mask zeroes
    non-inlier rows (the all-inlier refit path)."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    if mask is not None:
        m = mask.astype(p1.dtype)[:, None]
        r1 = r1 * m
        r2 = r2 * m
    A = jnp.concatenate([r1, r2], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[-1].reshape(3, 3)


def _f_8point(p1: jnp.ndarray, p2: jnp.ndarray, mask=None) -> jnp.ndarray:
    """F21 from normalized correspondences + rank-2 projection; optional
    row mask zeroes non-inlier rows (the all-inlier refit path)."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o],
                  axis=-1)
    if mask is not None:
        A = A * mask.astype(p1.dtype)[:, None]
        _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    else:
        # minimal case: A is (8, 9) — the null vector exists only in the
        # FULL right singular basis (reduced SVD returns 8 rows of vt)
        _, _, vt = jnp.linalg.svd(A)
    Fpre = vt[-1].reshape(3, 3)
    u, w, vt2 = jnp.linalg.svd(Fpre)
    w = w.at[2].set(0.0)
    return (u * w[None, :]) @ vt2


def _score_h(H21, uv1, uv2, valid):
    H12 = jnp.linalg.inv(H21)

    def transfer(H, src, dst):
        p = jnp.concatenate([src, jnp.ones_like(src[:, :1])], axis=-1) @ H.T
        w = jnp.where(jnp.abs(p[:, 2]) < 1e-12, 1e-12, p[:, 2])
        return jnp.sum((dst - p[:, :2] / w[:, None]) ** 2, axis=-1)

    chi1 = transfer(H12, uv2, uv1)
    chi2 = transfer(H21, uv1, uv2)
    in1 = chi1 <= TH_H
    in2 = chi2 <= TH_H
    score = jnp.sum(jnp.where(valid & in1, TH_H - chi1, 0.0)
                    + jnp.where(valid & in2, TH_H - chi2, 0.0))
    return score, valid & in1 & in2


def _score_f(F21, uv1, uv2, valid):
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1)
    p2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=-1)

    def epi_dist(l, pts):
        num = jnp.sum(l[:, :2] * pts, axis=-1) + l[:, 2]
        den = jnp.maximum(l[:, 0] ** 2 + l[:, 1] ** 2, 1e-12)
        return num * num / den

    l2 = p1 @ F21.T  # line in image 2
    l1 = p2 @ F21    # line in image 1
    chi1 = epi_dist(l2, uv2)
    chi2 = epi_dist(l1, uv1)
    in1 = chi1 <= TH_F
    in2 = chi2 <= TH_F
    score = jnp.sum(jnp.where(valid & in1, TH_F_SCORE - chi1, 0.0)
                    + jnp.where(valid & in2, TH_F_SCORE - chi2, 0.0))
    return score, valid & in1 & in2


def _check_rt(R, t, uv1, uv2, inliers, K, th2):
    """CheckRT (initializer.cpp:744-847), batched over matches."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    # triangulate in normalized coordinates (float32 conditioning; the
    # pixel-space DLT the reference uses here survives only thanks to
    # double precision + the subsequent global BA)
    xn1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy], -1)
    xn2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy], -1)
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate(P1, P2, xn1, xn2)

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    O2 = -R.T @ t
    n1 = X
    n2 = X - O2
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)

    Xc2 = X @ R.T + t
    z1, z2 = X[:, 2], Xc2[:, 2]
    low_par = cos_par >= 0.99998
    cheir = ((z1 > 0) | low_par) & ((z2 > 0) | low_par)

    def reproj_err(pc, uv):
        zsafe = jnp.where(jnp.abs(pc[:, 2]) < 1e-12, 1e-12, pc[:, 2])
        u = fx * pc[:, 0] / zsafe + cx
        v = fy * pc[:, 1] / zsafe + cy
        return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2

    e_ok = (reproj_err(X, uv1) <= th2) & (reproj_err(Xc2, uv2) <= th2)

    counted = inliers & finite & cheir & e_ok  # contributes to nGood
    good = counted & (cos_par < 0.99998)       # vbGood (triangulated)
    n_good = jnp.sum(counted.astype(jnp.int32))

    # parallax = acos of the 50th smallest cosine among counted
    cos_sorted = jnp.sort(jnp.where(counted, cos_par, 2.0))
    idx = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    par_cos = jnp.clip(cos_sorted[idx], -1.0, 1.0)
    parallax = jnp.where(n_good > 0, jnp.degrees(jnp.arccos(par_cos)), 0.0)
    return n_good, parallax, X, good


def _decompose_e(E):
    u, w, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.linalg.norm(t)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = u @ W.T @ vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t


def _faugeras_motions(H21, K):
    """The 8 Faugeras hypotheses of ReconstructH (initializer.cpp:541-641).

    Returns (ok, R (8, 3, 3), t (8, 3))."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    A = jnp.linalg.inv(Km) @ H21 @ Km
    U, w, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]
    ok = (d1 / d2 >= 1.00001) & (d2 / d3 >= 1.00001)

    eps = 1e-12
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + eps), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # d' > 0 branch
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 + d3) * d2)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    sthetas = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def pos_case(i):
        st = sthetas[i]
        Rp = jnp.array([[ctheta, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, ctheta]])
        Rp = Rp.at[0, 2].set(-st).at[2, 0].set(st)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), eps)

    # d' < 0 branch
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 - d3) * d2 + eps)
    cphi = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2 + eps)
    sphis = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def neg_case(i):
        sp = sphis[i]
        Rp = jnp.array([[cphi, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -cphi]])
        Rp = Rp.at[0, 2].set(sp).at[2, 0].set(sp)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), eps)

    idx = jnp.arange(4)
    Rp_list, tp_list = jax.vmap(pos_case)(idx)
    Rn_list, tn_list = jax.vmap(neg_case)(idx)
    R = jnp.concatenate([Rp_list, Rn_list], axis=0)
    t = jnp.concatenate([tp_list, tn_list], axis=0)
    return ok, R, t


class InitResult(NamedTuple):
    ok: jnp.ndarray            # () bool
    used_h: jnp.ndarray        # () bool (model selection outcome)
    R21: jnp.ndarray           # (3, 3)
    t21: jnp.ndarray           # (3,)
    points: jnp.ndarray        # (N, 3) triangulated in camera-1 frame
    triangulated: jnp.ndarray  # (N,) bool per match


@partial(jit_f32, static_argnames=("iters", "min_triangulated"))
def initialize(uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray,
               K: jnp.ndarray, key: jax.Array, *, iters: int = 200,
               sigma: float = 1.0, min_parallax: float = 1.0,
               min_triangulated: int = 50) -> InitResult:
    """Full two-view bootstrap on matched pairs uv1/uv2 (N, 2) + valid mask."""
    N = uv1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    nuv1, T1 = _normalize(uv1, valid)
    nuv2, T2 = _normalize(uv2, valid)
    T2inv = jnp.linalg.inv(T2)

    # random 8-point sets over the valid matches: sample positions in the
    # valid set via uniform ints mod n_valid (duplicates are possible but
    # merely waste a hypothesis; the reference draws without replacement)
    valid_idx = jnp.argsort(~valid)  # valid entries first, stable
    draws = jax.random.randint(key, (iters, 8), 0, jnp.maximum(n_valid, 1))
    sets = valid_idx[draws]

    def one_h(set_idx):
        Hn = _h_dlt(nuv1[set_idx], nuv2[set_idx])
        H21 = T2inv @ Hn @ T1
        score, _ = _score_h(H21, uv1, uv2, valid)
        return score, H21

    def one_f(set_idx):
        Fn = _f_8point(nuv1[set_idx], nuv2[set_idx])
        F21 = T2.T @ Fn @ T1
        score, _ = _score_f(F21, uv1, uv2, valid)
        return score, F21

    h_scores, Hs = jax.vmap(one_h)(sets)
    f_scores, Fs = jax.vmap(one_f)(sets)
    H21 = Hs[jnp.argmax(h_scores)]
    F21 = Fs[jnp.argmax(f_scores)]
    SH0, h_in0 = _score_h(H21, uv1, uv2, valid)
    SF0, f_in0 = _score_f(F21, uv1, uv2, valid)

    # Improvement over the reference: re-estimate each model from *all*
    # inliers of its best hypothesis (weighted DLT via the validity mask)
    # before scoring/model selection — markedly tightens the pre-BA
    # reconstruction under pixel noise.  Guard against a DEGENERATE refit:
    # with < 8 effective inliers (or clustered ones) the masked DLT is
    # rank-deficient and returns an arbitrary null-space model, whose score
    # craters — fall back to the RANSAC winner then.  (A small score dip is
    # tolerated: the all-inlier refit is better conditioned geometrically
    # even when the inlier-margin score slips slightly.)
    H21r = T2inv @ _h_dlt(nuv1, nuv2, h_in0) @ T1
    F21r = T2.T @ _f_8point(nuv1, nuv2, f_in0) @ T1
    SHr, h_inr = _score_h(H21r, uv1, uv2, valid)
    SFr, f_inr = _score_f(F21r, uv1, uv2, valid)
    use_hr = SHr >= 0.5 * SH0
    use_fr = SFr >= 0.5 * SF0
    H21 = jnp.where(use_hr, H21r, H21)
    SH = jnp.where(use_hr, SHr, SH0)
    h_inliers = jnp.where(use_hr, h_inr, h_in0)
    F21 = jnp.where(use_fr, F21r, F21)
    SF = jnp.where(use_fr, SFr, SF0)
    f_inliers = jnp.where(use_fr, f_inr, f_in0)

    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40
    th2 = 4.0 * sigma * sigma

    def reconstruct_h(_):
        ok_dec, Rs, ts = _faugeras_motions(H21, K)
        n_in = jnp.sum(h_inliers.astype(jnp.int32))
        ng, par, X, good = jax.vmap(
            lambda R, t: _check_rt(R, t, uv1, uv2, h_inliers, K, th2))(Rs, ts)
        order = jnp.argsort(-ng)
        best, second = order[0], order[1]
        ok = (ok_dec & (ng[second] < 0.75 * ng[best])
              & (par[best] >= min_parallax)
              & (ng[best] > min_triangulated)
              & (ng[best] > 0.9 * n_in))
        return ok, Rs[best], ts[best], X[best], good[best]

    def reconstruct_f(_):
        fx, fy, cx, cy = K[0], K[1], K[2], K[3]
        Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        E = Km.T @ F21 @ Km
        R1, R2, t = _decompose_e(E)
        Rs = jnp.stack([R1, R2, R1, R2])
        ts = jnp.stack([t, t, -t, -t])
        n_in = jnp.sum(f_inliers.astype(jnp.int32))
        ng, par, X, good = jax.vmap(
            lambda R, t_: _check_rt(R, t_, uv1, uv2, f_inliers, K, th2))(Rs, ts)
        max_good = jnp.max(ng)
        best = jnp.argmax(ng)
        n_min = jnp.maximum((0.9 * n_in).astype(jnp.int32), min_triangulated)
        n_similar = jnp.sum((ng > 0.7 * max_good).astype(jnp.int32))
        ok = ((max_good >= n_min) & (n_similar == 1)
              & (par[best] > min_parallax))
        return ok, Rs[best], ts[best], X[best], good[best]

    ok, R21, t21, X, good = jax.lax.cond(use_h, reconstruct_h, reconstruct_f,
                                         None)
    return InitResult(ok & (n_valid >= 8), use_h, R21, t21, X, good)
