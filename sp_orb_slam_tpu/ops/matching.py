"""Descriptor matching as batched masked distance ops (MXU matmuls + top-k).

Rebuilds the reference SPMatcher family (src/cv/sp_matcher.cpp) without
FLANN kd-trees or per-candidate loops: with 256-d unit descriptors and <=1k
keypoints, the full pairwise L2 matrix is one MXU matmul
(||a-b|| = sqrt(2 - 2 a.b)), and every Search* variant is a different mask
over that matrix.  The reference's FLANN paths (KeyFrame::buildIndexes,
SearchForTriByFlann) were approximate 2-NN; ours are exact.

Constants (sp_matcher.cpp:18-19): TH_HIGH = 0.7, TH_LOW = 0.3.

Window semantics follow Frame::GetFeaturesInArea (frame.cpp:382-420): square
window |du| < r and |dv| < r over the occupancy grid (one keypoint per 8x8
cell), no scale filtering (scale_check is False in the shipped configs).

Known behavioral deviations (documented, all order-independence fixes):
- SearchForInitialization's sequential "steal" bookkeeping
  (sp_matcher.cpp:697-725) becomes mutual-best resolution by minimum
  distance (column argmin over row winners);
- SearchForTri*'s last-writer-wins on duplicate train indices becomes
  best-distance-wins.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

TH_HIGH = 0.7
TH_LOW = 0.3
BIG = jnp.float32(1e9)


def pairwise_dist(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """L2 distances between unit descriptors: (M, D) x (N, D) -> (M, N).

    Matches cv::norm(a, b, NORM_L2) (sp_matcher.cpp:1636-1640) via
    ||a-b||^2 = 2 - 2 a.b for unit vectors.
    """
    dots = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.maximum(2.0 - 2.0 * dots, 0.0))


def masked_best2(dist: jnp.ndarray, mask: jnp.ndarray):
    """Per-row best & second-best over masked entries.

    Returns (best_dist, best_idx, second_dist); masked-out rows get BIG.

    Implemented as three min-reductions instead of `lax.top_k(k=2)`: TPU
    top_k lowers to a sort and measured ~2x slower at (1024, 1024)
    (NOTES.md round 2 perf).  Tie semantics match top_k: argmin returns the
    first minimal index; the second-best excludes only that index, so an
    equal-distance duplicate still surfaces as `second`.
    """
    d = jnp.where(mask, dist, BIG)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    best = jnp.min(d, axis=-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    second = jnp.min(jnp.where(cols == idx[..., None], BIG, d), axis=-1)
    return best, idx, second


def resolve_mutual(best_idx: jnp.ndarray, best_dist: jnp.ndarray,
                   row_ok: jnp.ndarray, num_cols: int):
    """Resolve row->column claims so each column keeps its min-dist claimant.

    Returns (match12 (M,) int32 col index or -1, match21 (N,) int32 row or -1).
    Ties break toward the smaller row index (segment-min over fused keys).
    """
    M = best_idx.shape[0]
    rows = jnp.arange(M, dtype=jnp.int32)
    cols = jnp.arange(num_cols, dtype=jnp.int32)
    # Dense (M, N) column-min instead of scatter-min: TPU scatters lower to
    # serialized updates and measured ~1.3 ms at M=N=1024 where the dense
    # reduction is a few memory-bound passes (NOTES.md round 2 perf).
    claim = row_ok[:, None] & (best_idx[:, None] == cols[None, :])
    dmat = jnp.where(claim, best_dist[:, None], BIG)
    # stage 1: min distance per column
    min_d = jnp.min(dmat, axis=0)
    # stage 2: break exact-distance ties toward the smaller row index
    cand = claim & (dmat == min_d[None, :])
    min_r = jnp.min(jnp.where(cand, rows[:, None], M), axis=0)
    safe_col = jnp.clip(best_idx, 0, num_cols - 1)
    winner = row_ok & (min_r[safe_col] == rows)
    match12 = jnp.where(winner, best_idx, -1)
    match21 = jnp.where(min_r < M, min_r, -1)
    return match12, match21


def window_mask(uv_a: jnp.ndarray, valid_a: jnp.ndarray, uv_b: jnp.ndarray,
                valid_b: jnp.ndarray, radius) -> jnp.ndarray:
    """(M, N) mask: b within the square window of radius r around a
    (GetFeaturesInArea semantics: strict |du| < r and |dv| < r)."""
    du = jnp.abs(uv_a[:, None, 0] - uv_b[None, :, 0])
    dv = jnp.abs(uv_a[:, None, 1] - uv_b[None, :, 1])
    return (du < radius) & (dv < radius) & valid_a[:, None] & valid_b[None, :]


class InitMatches(NamedTuple):
    match12: jnp.ndarray  # (M,) index into frame-2 keypoints, -1 if none
    n_matches: jnp.ndarray


def search_for_initialization(desc1, valid1, prev_uv, desc2, uv2, valid2,
                              *, window: int = 100, ratio: float = 0.9) -> InitMatches:
    """SearchForInitialization (sp_matcher.cpp:666-734): windowed best+second
    with ratio test at TH_LOW, mutual uniqueness."""
    dist = pairwise_dist(desc1, desc2)
    mask = window_mask(prev_uv, valid1, uv2, valid2, window)
    best, idx, second = masked_best2(dist, mask)
    row_ok = valid1 & (best <= TH_LOW) & (best < ratio * second)
    match12, _ = resolve_mutual(idx, best, row_ok, desc2.shape[0])
    return InitMatches(match12, jnp.sum((match12 >= 0).astype(jnp.int32)))


def search_by_projection_points(mp_desc, mp_proj_uv, mp_view_cos, mp_valid,
                                kp_desc, kp_uv, kp_valid, kp_free,
                                *, th: float, match_adaptive: bool,
                                c2_thresh: float, th_dist: float = TH_HIGH):
    """SearchByProjection frame vs. local-map points (sp_matcher.cpp:344-432).

    Window radius = RadiusByViewingCos (2.5 if viewCos > 0.998 else 4.0,
    :434-438) scaled by `th`; only keypoints not already bound to an observed
    map point are candidates (`kp_free`).  Accept best distance <= th_dist,
    else the adaptive gate 1.2 * c2 / (c2 + duv) (:416-427).

    Returns (match (P,) kp index or -1, match21 (K,) point index or -1 —
    the exact inverse, saving callers a second resolve pass).  Duplicate
    keypoint claims resolve by min distance (the reference processes points
    sequentially, first-come-first-served; order-independent here).
    """
    radius = jnp.where(mp_view_cos > 0.998, 2.5, 4.0) * th
    du = kp_uv[None, :, 0] - mp_proj_uv[:, None, 0]
    dv = kp_uv[None, :, 1] - mp_proj_uv[:, None, 1]
    mask = ((jnp.abs(du) < radius[:, None]) & (jnp.abs(dv) < radius[:, None])
            & mp_valid[:, None] & (kp_valid & kp_free)[None, :])
    dist = pairwise_dist(mp_desc, kp_desc)
    best, idx, _ = masked_best2(dist, mask)
    duv = (jnp.take_along_axis(du, idx[:, None], 1)[:, 0] ** 2
           + jnp.take_along_axis(dv, idx[:, None], 1)[:, 0] ** 2)
    if match_adaptive:
        fallback = best < (1.2 * c2_thresh / (c2_thresh + duv))
    else:
        fallback = best < 0.7
    row_ok = mp_valid & (best < BIG) & ((best <= th_dist) | fallback)
    return resolve_mutual(idx, best, row_ok, kp_desc.shape[0])


def search_by_projection_frame(mp_desc, mp_proj_uv, mp_depth_ok, mp_valid,
                               kp_desc, kp_uv, kp_valid, kp_free,
                               *, radius: float, bounds):
    """SearchByProjection current vs. last frame (sp_matcher.cpp:1439-1543):
    fixed radius window around the projection of each last-frame map point,
    accept best <= TH_HIGH."""
    in_img = ((mp_proj_uv[:, 0] >= bounds[0]) & (mp_proj_uv[:, 0] <= bounds[1])
              & (mp_proj_uv[:, 1] >= bounds[2]) & (mp_proj_uv[:, 1] <= bounds[3]))
    ok = mp_valid & mp_depth_ok & in_img
    mask = window_mask(mp_proj_uv, ok, kp_uv, kp_valid & kp_free, radius)
    dist = pairwise_dist(mp_desc, kp_desc)
    best, idx, _ = masked_best2(dist, mask)
    row_ok = ok & (best <= TH_HIGH)
    return resolve_mutual(idx, best, row_ok, kp_desc.shape[0])


def search_by_brute_force(mp_desc, mp_valid, kp_desc, kp_valid):
    """SearchByBruteForce KF->Frame (sp_matcher.cpp:1642-1674): BFMatcher
    cross-check = mutual nearest neighbors, no distance threshold.

    Returns (K,) index into mp rows for each keypoint, -1 if not mutual-best.
    """
    dist = pairwise_dist(mp_desc, kp_desc)  # (P, K)
    d = jnp.where(mp_valid[:, None] & kp_valid[None, :], dist, BIG)
    best_k_for_p = jnp.argmin(d, axis=1)
    best_p_for_k = jnp.argmin(d, axis=0)
    K = kp_desc.shape[0]
    mutual = (best_k_for_p[best_p_for_k] == jnp.arange(K)) & kp_valid
    finite = jnp.take_along_axis(d, best_p_for_k[None, :], axis=0)[0] < BIG
    return jnp.where(mutual & finite, best_p_for_k, -1)


def search_for_triangulation(desc1, valid1, free1, desc2, uv2, valid2, free2,
                             epipole2_uv, F12, uv1, cov2_inv2,
                             *, ratio: float = 0.7):
    """SearchForTriByFlann (sp_matcher.cpp:183-262), exact instead of FLANN.

    Matches the *free* (map-point-less) features of KF2 against those of KF1:
    2-NN ratio test at `ratio` (hardcoded 0.7 in the reference), epipole
    proximity rejection (dist^2 < 100 from the KF1-epipole in image 2,
    :228-233), and the covariance-scaled epipolar line gate
    CheckDistEpipolarLine (:441-469): d^2 < 3.84 / min(cov2_inv).

    Returns match21: (N2,) index into KF1 features or -1.
    """
    dist = pairwise_dist(desc2, desc1)  # rows = KF2 queries (like the ref)
    mask = (valid2 & free2)[:, None] & (valid1 & free1)[None, :]
    best, idx1, second = masked_best2(dist, mask)
    row_ok = (valid2 & free2) & (best < BIG) & (best < ratio * second)

    # epipole proximity (scale factor is 1 with the single-level SP pyramid)
    de = uv2 - epipole2_uv[None, :]
    row_ok &= jnp.sum(de * de, axis=-1) >= 100.0

    # epipolar line of kp1 (the matched one) in image 2
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1)  # (N1, 3)
    lines = p1 @ F12  # a, b, c per KF1 feature (row-vector convention, :445-451)
    line = lines[idx1]  # (N2, 3)
    num = line[:, 0] * uv2[:, 0] + line[:, 1] * uv2[:, 1] + line[:, 2]
    den = line[:, 0] ** 2 + line[:, 1] ** 2
    dsqr = num * num / jnp.maximum(den, 1e-12)
    factor = 1.0 / jnp.maximum(jnp.min(cov2_inv2, axis=-1), 1e-12)
    row_ok &= (den > 0) & (dsqr < 3.84 * factor)

    # unique per idx1: best-distance wins
    match21, _ = resolve_mutual(idx1, best, row_ok, desc1.shape[0])
    return match21


def search_for_tri_by_epi(desc1, uv1, free1, desc2, uv2, free2,
                          epipole2_uv, F12, R21, K_intr, cov2_inv2,
                          *, th_dist: float = TH_HIGH, band: float = 8.0):
    """SearchForTriByEpi (sp_matcher.cpp:24-181) — the `matching_method: 2`
    triangulation matcher (dispatch at local_mapper.cpp:623-631).

    Reference behavior: for each map-point-less KF1 feature, project its
    infinite-depth ray into image 2 (p_inf), walk the epipolar segment from
    the epipole e2 to uv = 2*p_inf - e2 with cv::LineIterator collecting
    the 4 occ-grid cells around every line pixel, and take the best-L2
    candidate < 0.7 among their keypoints that passes the epipole-proximity
    (dist^2 >= 100) and covariance-scaled epipolar-line
    (CheckDistEpipolarLine, d^2 < 3.84/min cov2_inv) gates.

    TPU reformulation: the cell walk becomes a *band mask* around the
    segment — a candidate keypoint participates iff its projection onto
    [e2, 2*p_inf - e2] lands at parameter t in [0, 1] with half-cell
    (8 px) longitudinal/lateral slack.  The lateral extent of the cell
    collection is subsumed by the epipolar-line gate (~2 px at cov2 >= 1,
    well inside the ~8 px cell band), so the band only has to bound the
    segment.  The reference's greedy i-order uniqueness becomes
    min-distance resolution (order-independent; same policy as every other
    matcher in this module).

    Returns match21: (N2,) index into KF1 features or -1.
    """
    fx, fy, cx, cy = K_intr[0], K_intr[1], K_intr[2], K_intr[3]
    # infinite-depth projection of each KF1 feature in image 2 (:56-63)
    x1n = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy,
                     jnp.ones_like(uv1[:, 0])], axis=-1)  # (N1, 3)
    ray2 = x1n @ R21.T
    z = jnp.where(jnp.abs(ray2[:, 2]) < 1e-9, 1e-9, ray2[:, 2])
    p_inf = jnp.stack([fx * ray2[:, 0] / z + cx,
                       fy * ray2[:, 1] / z + cy], axis=-1)  # (N1, 2)
    seg_end = 2.0 * p_inf - epipole2_uv[None, :]            # uv += uv - e (:62-63)

    # segment-band membership of every kp2 (the cell-walk equivalent)
    s = seg_end - epipole2_uv[None, :]                      # (N1, 2)
    w = uv2[None, :, :] - epipole2_uv[None, None, :]        # (1, N2, 2)
    ss = jnp.maximum(jnp.sum(s * s, axis=-1), 1e-12)        # (N1,)
    t = (w[..., 0] * s[:, None, 0] + w[..., 1] * s[:, None, 1]) / ss[:, None]
    lat2 = (jnp.sum(w * w, axis=-1)
            - t * t * ss[:, None])                          # (N1, N2)
    slack = band / jnp.sqrt(ss)
    in_seg = ((t >= -slack[:, None]) & (t <= 1.0 + slack[:, None])
              & (lat2 <= band * band) & (ray2[:, 2] > 0)[:, None])

    # epipole proximity of the *candidate* (:125-131; scale factor 1)
    de = uv2 - epipole2_uv[None, :]
    far_from_epipole = jnp.sum(de * de, axis=-1) >= 100.0

    # covariance-scaled epipolar-line gate (CheckDistEpipolarLine, :441-469)
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1)
    lines = p1 @ F12                                        # (N1, 3)
    num = (lines[:, None, 0] * uv2[None, :, 0]
           + lines[:, None, 1] * uv2[None, :, 1] + lines[:, None, 2])
    den = lines[:, 0] ** 2 + lines[:, 1] ** 2
    dsqr = num * num / jnp.maximum(den[:, None], 1e-12)
    factor = 1.0 / jnp.maximum(jnp.min(cov2_inv2, axis=-1), 1e-12)
    epi_ok = (den[:, None] > 0) & (dsqr < 3.84 * factor[None, :])

    mask = (free1[:, None] & (free2 & far_from_epipole)[None, :]
            & in_seg & epi_ok)
    dist = pairwise_dist(desc1, desc2)
    best, idx2, _ = masked_best2(dist, mask)
    row_ok = free1 & (best < th_dist)
    _, match21 = resolve_mutual(idx2, best, row_ok, desc2.shape[0])
    return match21


def _sim3_side(pos_c, valid, desc, dmin, dmax, sR, t, kp_uv, kp_desc,
               kp_valid, K_intr, bounds, radius, th):
    """One direction of SearchBySim3: transform map points (camera frame)
    through the Sim3, project, gate, best-L2 window search."""
    pc = pos_c @ sR.T + t[None, :]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = jnp.stack([K_intr[0] * pc[:, 0] / zs + K_intr[2],
                      K_intr[1] * pc[:, 1] / zs + K_intr[3]], axis=-1)
    dist3 = jnp.linalg.norm(pc, axis=-1)
    ok = (valid & (z > 0)
          & (proj[:, 0] >= bounds[0]) & (proj[:, 0] <= bounds[1])
          & (proj[:, 1] >= bounds[2]) & (proj[:, 1] <= bounds[3])
          & (dist3 >= dmin) & (dist3 <= dmax))
    mask = window_mask(proj, ok, kp_uv, kp_valid, radius)
    d = pairwise_dist(desc, kp_desc)
    best, idx, _ = masked_best2(d, mask)
    return jnp.where(ok & (best <= th), idx, -1)


@partial(jax.jit, static_argnames=("radius",))
def search_by_sim3(mp1_pos_c1, mp1_valid, mp1_desc, mp1_dmin, mp1_dmax,
                   kp1_uv, kp1_desc, kp1_valid,
                   mp2_pos_c2, mp2_valid, mp2_desc, mp2_dmin, mp2_dmax,
                   kp2_uv, kp2_desc, kp2_valid,
                   sR21, t21, sR12, t12, K_intr, bounds,
                   *, radius: float = 7.5):
    """SearchBySim3Override (sp_matcher_loop.cpp:7-220): mutual Sim3
    projection growth between two keyframes' map points.

    Forward: KF1 map points (camera-1 frame) through sR21/t21 into image 2,
    best keypoint within `radius` at L2 <= 0.7 (:52-130).  Backward: KF2
    map points through sR12/t12 into image 1 (:132-209).  Agreement
    (vnMatch2[vnMatch1[i1]] == i1, :211-223) happens on the host where the
    map-point graph surgery lives.  `already matched` slots are excluded by
    the caller via the validity masks.  PredictScale is level 0 with the
    single-level SP pyramid, so the radius is just `th` (7.5 at the loop
    call site, loop_closer_vlad.cpp).

    Returns (match1 (N1,) -> kp2 index or -1, match2 (N2,) -> kp1 index
    or -1).
    """
    m1 = _sim3_side(mp1_pos_c1, mp1_valid, mp1_desc, mp1_dmin, mp1_dmax,
                    sR21, t21, kp2_uv, kp2_desc, kp2_valid, K_intr, bounds,
                    radius, TH_HIGH)
    m2 = _sim3_side(mp2_pos_c2, mp2_valid, mp2_desc, mp2_dmin, mp2_dmax,
                    sR12, t12, kp1_uv, kp1_desc, kp1_valid, K_intr, bounds,
                    radius, TH_HIGH)
    return m1, m2


def fuse_candidates(mp_desc, mp_proj_uv, mp_valid, kp_desc, kp_uv, kp_valid,
                    *, radius: float):
    """TPU part of SPMatcher::Fuse (sp_matcher.cpp:965-1104): per map point,
    the best keypoint within `radius` passing the chi^2 reprojection gate
    (e2 * mvInvLevelSigma2 <= 5.99, sp_matcher.cpp:1105-1107 — the PYRAMID
    sigma, which is 1 in the single-level SP pyramid, not the learned
    cov2_inv) and TH_LOW.

    Returns (best_idx (P,) or -1, best_dist (P,)); the host applies the
    replace-vs-add-observation graph surgery.
    """
    du = kp_uv[None, :, 0] - mp_proj_uv[:, None, 0]
    dv = kp_uv[None, :, 1] - mp_proj_uv[:, None, 1]
    e2 = du * du + dv * dv
    mask = ((jnp.abs(du) < radius) & (jnp.abs(dv) < radius)
            & (e2 <= 5.99) & mp_valid[:, None] & kp_valid[None, :])
    dist = pairwise_dist(mp_desc, kp_desc)
    best, idx, _ = masked_best2(dist, mask)
    ok = mp_valid & (best <= TH_LOW)
    return jnp.where(ok, idx, -1), best
