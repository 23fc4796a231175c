"""Unit test for the windowed second-chance growth inside the
relocalization kernel (slam/kernels.py reloc_track_body) — the retained
frame<->KF SearchByProjection overload (sp_matcher.cpp:1545-1634).

Scenario: pairs of map points share identical descriptors, so brute-force
mutual NN can bind at most one of each pair; with the fitted pose, the
windowed growth pass projects the unbound twins next to their own (still
free) keypoints and recovers them, strictly increasing the inlier count.
"""

import numpy as np
import jax.numpy as jnp

from sp_orb_slam_tpu.slam.kernels import reloc_track_body


def _project(K_intr, Tcw, Xw):
    pc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
    return np.stack([K_intr[0] * pc[:, 0] / pc[:, 2] + K_intr[2],
                     K_intr[1] * pc[:, 1] / pc[:, 2] + K_intr[3]], axis=-1)


def test_windowed_growth_recovers_duplicate_descriptor_points():
    rng = np.random.default_rng(0)
    M = 64  # map point / keypoint capacity
    n = 40  # live points
    K_intr = np.array([400.0, 400.0, 376.0, 240.0], np.float32)
    bounds = np.array([0.0, 752.0, 0.0, 480.0], np.float32)
    Tcw = np.eye(4, dtype=np.float32)  # camera at origin, points ahead

    Xw = np.zeros((M, 3), np.float32)
    Xw[:n, 0] = rng.uniform(-1.5, 1.5, n)
    Xw[:n, 1] = rng.uniform(-0.9, 0.9, n)
    Xw[:n, 2] = rng.uniform(3.0, 6.0, n)

    desc = np.zeros((M, 256), np.float32)
    base = rng.normal(size=(n, 256)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    desc[:n] = base
    # 10 twin pairs: point 2i+1 duplicates point 2i's descriptor exactly
    for i in range(10):
        desc[2 * i + 1] = desc[2 * i]
    mp_valid = np.zeros(M, bool)
    mp_valid[:n] = True

    kp_uv = np.zeros((M, 2), np.float32)
    kp_uv[:n] = _project(K_intr, Tcw, Xw[:n])
    kp_uv[n:] = -100.0
    kp_valid = np.zeros(M, bool)
    kp_valid[:n] = True
    kp_desc = desc.copy()
    cov2 = np.ones((M, 2), np.float32)

    T0s = np.stack([Tcw, Tcw])  # trivial multi-start fan
    out = reloc_track_body(
        jnp.asarray(T0s), jnp.asarray(Xw), jnp.asarray(desc),
        jnp.asarray(mp_valid), jnp.asarray(kp_desc), jnp.asarray(kp_uv),
        jnp.asarray(cov2), jnp.asarray(kp_valid),
        jnp.asarray(K_intr), jnp.asarray(bounds), radius2=10.0)

    kp2mp = np.asarray(out["kp2mp"])
    n_inlier = int(out["n_inlier"])
    # brute force alone can bind at most one of each twin (30 of 40);
    # the windowed pass must recover every twin: all 40 keypoints bound
    # to their own map point and inliers well past the BF ceiling
    assert n_inlier >= 38, n_inlier
    bound = kp2mp[:n]
    assert (bound >= 0).sum() >= 38
    # geometric consistency: each bound keypoint maps to a point whose
    # projection is within the search window of the keypoint
    proj = _project(K_intr, Tcw, Xw[np.clip(bound, 0, None)])
    d = np.abs(proj - kp_uv[:n]).max(axis=-1)
    assert (d[bound >= 0] <= 10.0).all()


def test_growth_never_degrades_clean_case():
    rng = np.random.default_rng(1)
    M, n = 64, 30
    K_intr = np.array([400.0, 400.0, 376.0, 240.0], np.float32)
    bounds = np.array([0.0, 752.0, 0.0, 480.0], np.float32)
    Tcw = np.eye(4, dtype=np.float32)
    Xw = np.zeros((M, 3), np.float32)
    Xw[:n] = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-0.9, 0.9, n),
                       rng.uniform(3.0, 6.0, n)], axis=-1)
    desc = np.zeros((M, 256), np.float32)
    desc[:n] = rng.normal(size=(n, 256)).astype(np.float32)
    desc[:n] /= np.linalg.norm(desc[:n], axis=-1, keepdims=True)
    mp_valid = np.arange(M) < n
    kp_uv = np.full((M, 2), -100.0, np.float32)
    kp_uv[:n] = _project(K_intr, Tcw, Xw[:n])
    cov2 = np.ones((M, 2), np.float32)
    out = reloc_track_body(
        jnp.asarray(np.stack([Tcw, Tcw])), jnp.asarray(Xw),
        jnp.asarray(desc), jnp.asarray(mp_valid), jnp.asarray(desc),
        jnp.asarray(kp_uv), jnp.asarray(cov2), jnp.asarray(mp_valid),
        jnp.asarray(K_intr), jnp.asarray(bounds), radius2=10.0)
    assert int(out["n_inlier"]) == n
    assert (np.asarray(out["kp2mp"])[:n] == np.arange(n)).all()
