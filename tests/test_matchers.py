"""The two matcher variants added in round 2: SearchForTriByEpi
(sp_matcher.cpp:24-181, matching_method=2) and SearchBySim3Override
(sp_matcher_loop.cpp:7-220, the loop-closing guided growth)."""

import jax
import jax.numpy as jnp
import numpy as np

from sp_orb_slam_tpu.ops import matching


def _lookat_cams():
    """Two cameras with a sideways baseline looking at z ~ 5."""
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    # sideways + forward baseline: a pure-sideways baseline puts the
    # epipole at infinity (C1 in cam2 has z = 0), which the reference's
    # invz = 1/C2.z divides by too — not a usable operating point
    T2[:3, 3] = [-0.6, 0.05, 0.4]
    return T1, T2


def _project(T, X, K):
    Xc = X @ T[:3, :3].T + T[:3, 3]
    return np.stack([K[0] * Xc[:, 0] / Xc[:, 2] + K[2],
                     K[1] * Xc[:, 1] / Xc[:, 2] + K[3]], -1), Xc[:, 2]


def _fundamental(T1, T2, Km):
    R1, t1 = T1[:3, :3], T1[:3, 3]
    R2, t2 = T2[:3, :3], T2[:3, 3]
    R12 = R1 @ R2.T
    t12 = -R12 @ t2 + t1
    tx = np.array([[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]],
                   [-t12[1], t12[0], 0]], np.float32)
    Kinv = np.linalg.inv(Km)
    return Kinv.T @ tx @ R12 @ Kinv


def test_search_for_tri_by_epi_recovers_true_pairs(rng):
    N = 64
    K = np.array([300.0, 300.0, 320.0, 240.0], np.float32)
    Km = np.array([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1]], np.float32)
    T1, T2 = _lookat_cams()
    X = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                  rng.uniform(4, 8, N)], -1).astype(np.float32)
    uv1, z1 = _project(T1, X, K)
    uv2, z2 = _project(T2, X, K)
    inb = ((uv1 > 20) & (uv1 < [620, 460])).all(-1) & \
          ((uv2 > 20) & (uv2 < [620, 460])).all(-1)

    desc = rng.normal(size=(N, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)

    F12 = _fundamental(T1, T2, Km)
    R21 = (T2[:3, :3] @ T1[:3, :3].T).astype(np.float32)
    C1_in_2 = T2[:3, :3] @ (-T1[:3, :3].T @ T1[:3, 3]) + T2[:3, 3]
    e2 = np.array([K[0] * C1_in_2[0] / C1_in_2[2] + K[2],
                   K[1] * C1_in_2[1] / C1_in_2[2] + K[3]], np.float32)

    match21 = np.asarray(matching.search_for_tri_by_epi(
        jnp.asarray(desc), jnp.asarray(uv1), jnp.asarray(inb),
        jnp.asarray(desc), jnp.asarray(uv2), jnp.asarray(inb),
        jnp.asarray(e2), jnp.asarray(F12), jnp.asarray(R21),
        jnp.asarray(K), jnp.ones((N, 2), jnp.float32)))

    got = {(int(m), j) for j, m in enumerate(match21) if m >= 0}
    expect = {(i, i) for i in range(N) if inb[i]
              and (uv2[i] - e2) @ (uv2[i] - e2) >= 100.0}
    # every returned pair must be a true correspondence
    assert got <= {(i, i) for i in range(N)}, got - {(i, i) for i in range(N)}
    # and the vast majority of eligible true pairs are found
    assert len(got & expect) >= 0.9 * max(len(expect), 1), (len(got), len(expect))


def test_search_for_tri_by_epi_rejects_off_line(rng):
    """A candidate whose descriptor matches but which sits far off the
    epipolar line must be rejected by the line gate."""
    N = 8
    K = np.array([300.0, 300.0, 320.0, 240.0], np.float32)
    Km = np.array([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1]], np.float32)
    T1, T2 = _lookat_cams()
    X = np.stack([rng.uniform(-1, 1, N), rng.uniform(-1, 1, N),
                  rng.uniform(4, 6, N)], -1).astype(np.float32)
    uv1, _ = _project(T1, X, K)
    uv2, _ = _project(T2, X, K)
    uv2_off = uv2 + np.array([0.0, 60.0], np.float32)  # push off the line

    desc = rng.normal(size=(N, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    F12 = _fundamental(T1, T2, Km)
    R21 = (T2[:3, :3] @ T1[:3, :3].T).astype(np.float32)
    C1_in_2 = T2[:3, :3] @ (-T1[:3, :3].T @ T1[:3, 3]) + T2[:3, 3]
    e2 = np.array([K[0] * C1_in_2[0] / C1_in_2[2] + K[2],
                   K[1] * C1_in_2[1] / C1_in_2[2] + K[3]], np.float32)
    ones = jnp.ones(N, bool)
    match21 = np.asarray(matching.search_for_tri_by_epi(
        jnp.asarray(desc), jnp.asarray(uv1), ones,
        jnp.asarray(desc), jnp.asarray(uv2_off), ones,
        jnp.asarray(e2), jnp.asarray(F12), jnp.asarray(R21),
        jnp.asarray(K), jnp.ones((N, 2), jnp.float32)))
    assert (match21 < 0).all(), match21


def test_search_by_sim3_mutual_growth(rng):
    """Map points transformed through a known Sim3 are mutually recovered;
    already-matched and far-off points are not."""
    N = 96
    K = jnp.asarray(np.array([300.0, 300.0, 320.0, 240.0], np.float32))
    bounds = jnp.asarray(np.array([0, 639, 0, 479], np.float32))

    # ground-truth Sim3 cam1 -> cam2
    s = 1.3
    ang = 0.1
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.2, -0.1, 0.3], np.float32)

    Xc1 = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                    rng.uniform(4, 8, N)], -1).astype(np.float32)
    Xc2 = (s * (Xc1 @ R.T) + t).astype(np.float32)

    Kn = np.asarray(K)
    uv1 = np.stack([Kn[0] * Xc1[:, 0] / Xc1[:, 2] + Kn[2],
                    Kn[1] * Xc1[:, 1] / Xc1[:, 2] + Kn[3]], -1).astype(np.float32)
    uv2 = np.stack([Kn[0] * Xc2[:, 0] / Xc2[:, 2] + Kn[2],
                    Kn[1] * Xc2[:, 1] / Xc2[:, 2] + Kn[3]], -1).astype(np.float32)
    inb = ((uv1 > 5) & (uv1 < [634, 474])).all(-1) & \
          ((uv2 > 5) & (uv2 < [634, 474])).all(-1)

    desc = rng.normal(size=(N, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    dmin = np.zeros(N, np.float32)
    dmax = np.full(N, 1e9, np.float32)

    sR21 = jnp.asarray(s * R)
    t21 = jnp.asarray(t)
    sR12 = jnp.asarray((1.0 / s) * R.T)
    t12 = jnp.asarray(-(1.0 / s) * (R.T @ t))

    valid = jnp.asarray(inb)
    m1, m2 = matching.search_by_sim3(
        jnp.asarray(Xc1), valid, jnp.asarray(desc), jnp.asarray(dmin),
        jnp.asarray(dmax), jnp.asarray(uv1), jnp.asarray(desc), valid,
        jnp.asarray(Xc2), valid, jnp.asarray(desc), jnp.asarray(dmin),
        jnp.asarray(dmax), jnp.asarray(uv2), jnp.asarray(desc), valid,
        sR21, t21, sR12, t12, K, bounds, radius=7.5)
    m1 = np.asarray(m1)
    m2 = np.asarray(m2)
    agree = [(i, int(m1[i])) for i in np.nonzero(m1 >= 0)[0]
             if m2[int(m1[i])] == i]
    # all agreements are true pairs; most eligible points are recovered
    assert all(i == j for i, j in agree)
    assert len(agree) >= 0.9 * int(inb.sum())

    # excluding a slot via the validity mask suppresses it
    valid2 = np.asarray(inb).copy()
    valid2[:10] = False
    m1b, _ = matching.search_by_sim3(
        jnp.asarray(Xc1), jnp.asarray(valid2), jnp.asarray(desc),
        jnp.asarray(dmin), jnp.asarray(dmax), jnp.asarray(uv1),
        jnp.asarray(desc), valid,
        jnp.asarray(Xc2), valid, jnp.asarray(desc), jnp.asarray(dmin),
        jnp.asarray(dmax), jnp.asarray(uv2), jnp.asarray(desc), valid,
        sR21, t21, sR12, t12, K, bounds, radius=7.5)
    assert (np.asarray(m1b)[:10] < 0).all()


def test_triangulate_pair_dispatch_method2(rng):
    """matching_method=2 dispatches the epipolar-walk matcher inside the
    triangulation kernel (local_mapper.cpp:623-631) and still produces
    gated 3D points."""
    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.slam.kernels import TrackingKernels

    cfg = _merge_dataclass(Config(), {
        "camera": {"width": 640, "height": 480, "fx": 300.0, "fy": 300.0,
                   "cx": 320.0, "cy": 240.0},
        "mapping": {"matching_method": 2},
        "runtime": {"max_keypoints": 128, "dust_points_cap": 128,
                    "local_points_cap": 256, "ba_kfs_cap": 8,
                    "ba_points_cap": 256, "ba_obs_cap": 1024},
    })
    k = TrackingKernels(cfg)
    N = 128
    K = np.array([300.0, 300.0, 320.0, 240.0], np.float32)
    T1, T2 = _lookat_cams()
    X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                  rng.uniform(4, 8, N)], -1).astype(np.float32)
    uv1, _ = _project(T1, X, K)
    uv2, _ = _project(T2, X, K)
    inb = (((uv1 > 20) & (uv1 < [620, 460])).all(-1)
           & ((uv2 > 20) & (uv2 < [620, 460])).all(-1))
    desc = rng.normal(size=(N, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    cov = np.ones((N, 2), np.float32)

    out = k.triangulate_pair(
        T1, T2, uv1.astype(np.float32), jnp.asarray(desc), cov,
        inb, uv2.astype(np.float32), jnp.asarray(desc), cov, inb)
    good = out["good"]
    match21 = out["match21"]
    assert good.sum() >= 0.8 * inb.sum(), (int(good.sum()), int(inb.sum()))
    # matched pairs are the true identity correspondence
    for j in np.nonzero(good)[0]:
        assert int(match21[j]) == j
    # triangulated points land near the ground truth
    pts = out["points"]
    err = np.linalg.norm(pts[good] - X[np.nonzero(good)[0]], axis=-1)
    assert np.median(err) < 0.05, np.median(err)
