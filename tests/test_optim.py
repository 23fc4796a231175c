"""Optimizers: pose-only reprojection, dust alignment, bundle adjustment,
two-view initialization — convergence + outlier-handling semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from sp_orb_slam_tpu.geometry import se3, twoview
from sp_orb_slam_tpu.geometry.triangulation import triangulate, triangulation_gates
from sp_orb_slam_tpu.optim import ba, pose

K = jnp.array([400.0, 400.0, 320.0, 240.0])


def _random_pose(rng, rot_scale=0.1, t_scale=0.5):
    xi = np.concatenate([rng.normal(0, rot_scale, 3), rng.normal(0, t_scale, 3)])
    return np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))


def _project(Tcw, X):
    pc = X @ np.asarray(Tcw)[:3, :3].T + np.asarray(Tcw)[:3, 3]
    u = 400.0 * pc[:, 0] / pc[:, 2] + 320.0
    v = 400.0 * pc[:, 1] / pc[:, 2] + 240.0
    return np.stack([u, v], -1), pc[:, 2]


def _scene(rng, n=120):
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 8, n)], -1).astype(np.float32)
    return X


def test_pose_optimization_recovers_pose(rng):
    X = _scene(rng)
    T_true = _random_pose(rng)
    obs, _ = _project(T_true, X)
    obs += rng.normal(0, 0.3, obs.shape)
    # outliers
    obs[:8] += rng.uniform(30, 60, (8, 2))
    T0 = _random_pose(rng, 0.02, 0.1) @ T_true  # perturbed start
    w = np.full((X.shape[0], 2), 1.0, np.float32)
    valid = np.ones(X.shape[0], bool)
    res = pose.pose_optimization(
        jnp.asarray(T0, jnp.float32), jnp.asarray(X), jnp.asarray(obs, jnp.float32),
        jnp.asarray(w), jnp.asarray(valid), K)
    err = np.asarray(se3.se3_log(jnp.asarray(res.Tcw) @ se3.se3_inv(jnp.asarray(T_true, jnp.float32))))
    assert np.abs(err[:3]).max() < 2e-3, err
    assert np.abs(err[3:]).max() < 2e-2, err
    # outliers detected
    inl = np.asarray(res.inlier)
    assert inl[8:].mean() > 0.95
    assert inl[:8].sum() <= 2


def test_pose_optimization_post(rng):
    X = _scene(rng)
    T_true = _random_pose(rng)
    obs, _ = _project(T_true, X)
    obs += rng.normal(0, 0.3, obs.shape)
    T0 = _random_pose(rng, 0.01, 0.05) @ T_true
    res = pose.pose_optimization_post(
        jnp.asarray(T0, jnp.float32), jnp.asarray(X), jnp.asarray(obs, jnp.float32),
        jnp.ones((X.shape[0], 2), jnp.float32), jnp.ones(X.shape[0], bool), K)
    err = np.asarray(se3.se3_log(jnp.asarray(res.Tcw) @ se3.se3_inv(jnp.asarray(T_true, jnp.float32))))
    assert np.abs(err).max() < 3e-2
    assert int(res.n_inlier) > 100


def test_dust_alignment_converges(rng):
    """A smooth synthetic dust map with a known minimum structure: points
    projected at the true pose sit in low-dust valleys."""
    hc, wc = 60, 94
    X = _scene(rng, 200)
    T_true = np.eye(4, dtype=np.float32)
    # dust map: high everywhere, carved low around true projections
    fx, fy = 400.0 / 8.0, 400.0 / 8.0
    cx, cy = (320.0 - 3.5) / 8.0, (240.0 - 3.5) / 8.0
    pc = X
    u = fx * pc[:, 0] / pc[:, 2] + cx
    v = fy * pc[:, 1] / pc[:, 2] + cy
    dust = np.full((hc, wc), 0.9, np.float32)
    yy, xx = np.mgrid[0:hc, 0:wc].astype(np.float32)
    for ui, vi in zip(u, v):
        dust = np.minimum(dust, 0.9 * (1 - np.exp(-((xx - ui) ** 2 + (yy - vi) ** 2) / 8.0)) + 0.02)
    # start from a slightly wrong pose
    T0 = _random_pose(rng, 0.003, 0.02)
    res = pose.pose_optimization_dust(
        jnp.asarray(T0), jnp.asarray(X), jnp.ones(X.shape[0], bool),
        jnp.asarray(dust), K)

    # the downstream consumer is a 2x2-cell association window
    # (tracker_dust.cpp:105-172): success = projections pulled into the
    # dust valleys, i.e. the sampled dust cost approaches the true-pose cost
    def mean_dust(T):
        pc = X @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
        uu = fx * pc[:, 0] / pc[:, 2] + cx
        vv = fy * pc[:, 1] / pc[:, 2] + cy
        import scipy.ndimage as ndi
        return ndi.map_coordinates(dust, [vv, uu], order=1).mean()

    d0, d1, d_true = mean_dust(T0), mean_dust(res.Tcw), mean_dust(np.eye(4))
    assert d1 < d0, (d0, d1)
    assert d1 < d_true + 0.35 * (d0 - d_true), (d0, d1, d_true)
    assert int(res.n_inlier) > 150
    # inlier projections reported on the dust grid
    pu = np.asarray(res.proj_uv)[np.asarray(res.inlier)]
    assert (pu[:, 0] > 0).all() and (pu[:, 0] < wc).all()


def test_bundle_adjust_two_view(rng):
    """Init-style BA: first camera fixed, second free, noisy points."""
    P = 160
    X_true = _scene(rng, P)
    T1 = np.eye(4, dtype=np.float32)
    T2_true = _random_pose(rng, 0.05, 0.3)
    uv1, z1 = _project(T1, X_true)
    uv2, z2 = _project(T2_true, X_true)
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)

    X0 = X_true + rng.normal(0, 0.05, X_true.shape)
    T2_0 = _random_pose(rng, 0.01, 0.05) @ T2_true

    poses = jnp.asarray(np.stack([T1, T2_0]), jnp.float32)
    fixed = jnp.asarray([True, False])
    obs_cam = jnp.asarray(np.concatenate([np.zeros(P), np.ones(P)]), jnp.int32)
    obs_pt = jnp.asarray(np.concatenate([np.arange(P)] * 2), jnp.int32)
    obs_uv = jnp.asarray(np.concatenate([uv1, uv2]), jnp.float32)
    obs_w = jnp.ones((2 * P, 2), jnp.float32)
    obs_valid = jnp.ones(2 * P, bool)
    res = ba.bundle_adjust(poses, fixed, jnp.asarray(X0, jnp.float32),
                           jnp.ones(P, bool), obs_cam, obs_pt, obs_uv, obs_w,
                           obs_valid, K, iters1=10, iters2=10)
    # fixed camera untouched
    np.testing.assert_allclose(np.asarray(res.poses[0]), T1, atol=1e-6)
    # free camera recovered
    err = np.asarray(se3.se3_log(res.poses[1] @ se3.se3_inv(jnp.asarray(T2_true, jnp.float32))))
    assert np.abs(err).max() < 2e-2, err
    # reprojection residuals collapsed (3D error is gauge-ambiguous in
    # two-view BA — points slide along rays — so chi2 is the criterion)
    _, chi0, _, _ = ba._evaluate(poses, jnp.asarray(X0, jnp.float32), obs_cam,
                                 obs_pt, obs_uv, obs_w, K)
    assert float(res.chi2.mean()) < 0.01 * float(chi0.mean())
    assert int(np.asarray(res.bad_obs).sum()) < 10


def test_triangulation_and_gates(rng):
    X_true = _scene(rng, 64)
    T1 = np.eye(4, dtype=np.float32)
    T2 = _random_pose(rng, 0.05, 0.4)
    uv1, _ = _project(T1, X_true)
    uv2, _ = _project(T2, X_true)
    Km = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    P1 = Km @ np.asarray(T1)[:3]
    P2 = Km @ np.asarray(T2)[:3]
    X = triangulate(jnp.asarray(P1), jnp.asarray(P2),
                    jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32))
    np.testing.assert_allclose(np.asarray(X), X_true, atol=1e-2)
    gates = triangulation_gates(
        X, jnp.asarray(T1), jnp.asarray(T2, jnp.float32), K,
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones((64, 2)), jnp.ones((64, 2)), jnp.ones(64, bool))
    assert np.asarray(gates.good).mean() > 0.9


def test_twoview_initialize_fundamental(rng):
    """General motion -> F model path recovers (R, t) up to scale."""
    n = 200
    X = _scene(rng, n)
    T2 = _random_pose(rng, 0.08, 0.6)
    uv1, _ = _project(np.eye(4, dtype=np.float32), X)
    uv2, _ = _project(T2, X)
    uv1 += rng.normal(0, 0.4, uv1.shape)
    uv2 += rng.normal(0, 0.4, uv2.shape)
    pad = 256
    uv1p = np.zeros((pad, 2), np.float32); uv1p[:n] = uv1
    uv2p = np.zeros((pad, 2), np.float32); uv2p[:n] = uv2
    valid = np.zeros(pad, bool); valid[:n] = True
    res = twoview.initialize(jnp.asarray(uv1p), jnp.asarray(uv2p),
                             jnp.asarray(valid), K, jax.random.PRNGKey(3),
                             iters=100)
    assert bool(res.ok)
    R_err = np.asarray(res.R21) @ np.asarray(T2)[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang  # pre-BA accuracy; GBA refines (mono_tracker.cpp:170)
    t_est = np.asarray(res.t21); t_true = np.asarray(T2)[:3, 3]
    cos = abs(t_est @ t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
    assert cos > 0.99
    # f32 RANSAC winner selection is run-to-run sensitive; the reference's
    # own acceptance bar is bestGood > max(0.9 * model inliers, 50)
    assert int(np.asarray(res.triangulated).sum()) > 100
