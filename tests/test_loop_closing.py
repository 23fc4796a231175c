"""Loop closing on a manufactured drifted loop map.

Builds a keyframe circle with ground-truth observations, applies a growing
Sim3 warp (drift) along the chain — each point placed in its first
observer's warped frame, so local consistency holds while the loop ends
disagree — then drives the LoopClosing pipeline and checks the loop is
detected, the Sim3 between the loop ends is recovered, and the correction
brings the keyframe chain closer to ground truth."""

import numpy as np
import pytest

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.eval.ate import umeyama_sim3
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam.frame import FrameData
from sp_orb_slam_tpu.slam.kernels import TrackingKernels
from sp_orb_slam_tpu.slam.local_mapping import LocalMapping
from sp_orb_slam_tpu.slam.loop_closing import LoopClosing
from sp_orb_slam_tpu.slam.map import Map


@pytest.fixture(scope="module")
def cfg():
    return _merge_dataclass(Config(), {
        "dataset": "synthetic", "use_loop": True,
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "loop": {"use_loop": True},
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })


def _drift_sim3(i, n):
    """Smoothly growing world warp: by the loop's end ~3% scale and a small
    rotation/translation offset."""
    t = i / max(n - 1, 1)
    ang = 0.05 * t
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
    scale = 1.0 + 0.04 * t
    trans = np.array([0.08 * t, 0.0, -0.06 * t])
    return R, trans, scale


def _apply(S, X):
    R, t, s = S
    return s * (X @ R.T) + t


def build_drifted_loop_map(cfg, world, n_frames=34, n_revisit=6):
    """Populate `world` with a drifted keyframe circle (see module doc).

    Returns (ds, kfs).  Shared by the direct loop test and the
    reset-survival test (tests/test_reset_loop.py)."""
    import jax.numpy as jnp

    ds = SyntheticDataset(cfg, n_frames=n_frames, n_points=9000, seed=2,
                          pixel_noise=0.1, loop=True)
    # make the revisit segment an exact second lap of the first frames:
    # the detection gate is min-similarity-over-covisibles (correct
    # reference semantics, loop_closer_vlad.cpp:150-165), and temporal
    # consistency needs >= consistency_th consecutive gate-passing frames
    # whose candidate groups overlap — a single-wrap circle only grazes
    # the start for ~3 frames, which is one short of closing
    from sp_orb_slam_tpu.io.dataset import _loop_trajectory
    base = _loop_trajectory(n_frames - n_revisit)
    ds.poses = np.concatenate([base, base[:n_revisit]])
    first_seen = {}   # scene id -> mp
    revisit_seen = {}  # duplicates for the revisit segment
    kfs = []
    for i in range(n_frames):
        raw = ds.frame(i)
        inj = raw.injected
        # World warp W_i (Sim3): P' = s_s R_s P + t_s.  An SE3 pose with
        # identical projections exists because uniform camera-frame scaling
        # cancels in the pinhole model:
        #   T'_i = [R_i R_s^T | s_s t_i - R_i R_s^T t_s]
        R_s, t_s, s_s = _drift_sim3(i, n_frames)
        gtT = np.linalg.inv(ds.poses[i]).astype(np.float64)  # Tcw gt
        Rd = gtT[:3, :3] @ R_s.T
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = Rd
        Tcw[:3, 3] = s_s * gtT[:3, 3] - Rd @ t_s
        f = FrameData(
            frame_id=i, timestamp=raw.timestamp,
            uv=inj["uv"], score=inj["score"], response=inj["score"],
            valid=inj["valid"], cov2_inv=inj["cov2_inv"],
            occ_grid=inj["occ_grid"], count=inj["count"],
            desc_dev=jnp.asarray(inj["desc"]),
            dust_dev=jnp.asarray(inj["dust"]),
            occ_grid_dev=jnp.asarray(inj["occ_grid"]),
            global_desc=raw.global_desc,
        )
        f._desc_host = inj["desc"]
        f.set_pose(Tcw)
        kf = world.add_keyframe(f)
        kfs.append(kf)
        # bind observations via provenance; points placed in their first
        # observer's warped world
        for k in np.nonzero(inj["valid"])[0]:
            sid = int(inj["point_ids"][k])
            if sid < 0:
                continue
            book = revisit_seen if i >= n_frames - n_revisit else first_seen
            mp = book.get(sid)
            if mp is None:
                P = ds.points[sid].astype(np.float64)
                Pw = s_s * (R_s @ P) + t_s  # P' = W_i(P)
                mp = world.create_point(Pw.astype(np.float32), kf.kf_id)
                book[sid] = mp
            if kf.kf_id not in mp.obs and kf.mp_ids[int(k)] < 0:
                world.add_observation(mp, kf.kf_id, int(k))
        world.update_connections(kf)

    # finalize point attributes (the mapping pipeline does this per KF)
    for mp in world.points.values():
        if mp.bad or not mp.obs:
            continue
        world.compute_distinctive_descriptor(mp)
        last_kf = max(mp.obs)
        world.update_desc_track(mp, last_kf, mp.obs[last_kf])
        world.update_normal_and_depth(mp)

    return ds, kfs


def test_loop_detection_and_correction(cfg):
    world = Map()
    kernels = TrackingKernels(cfg)
    mapper = LocalMapping(cfg, world, kernels)
    looper = LoopClosing(cfg, world, kernels, mapper)
    ds, kfs = build_drifted_loop_map(cfg, world)
    n_frames = 34

    # sanity: drifted map is locally consistent
    errs = []
    for kf in kfs[:3] + kfs[-3:]:
        for k in np.nonzero(kf.mp_ids >= 0)[0][:50]:
            X = world.pool.pos[kf.mp_ids[k]]
            pc = kf.Tcw[:3, :3] @ X + kf.Tcw[:3, 3]
            u = 260 * pc[0] / pc[2] + 160
            v = 260 * pc[1] / pc[2] + 120
            errs.append(np.hypot(u - kf.data.uv[k, 0], v - kf.data.uv[k, 1]))
    assert np.median(errs) < 2.0, np.median(errs)

    def loop_gap():
        """Discrepancy of the loop-end relative pose vs ground truth — the
        quantity a loop closure must fix (a *global* Sim3-aligned ATE can
        absorb smooth drift and is not the right metric here)."""
        a, b = kfs[0], kfs[-1]
        rel_est = a.Tcw.astype(np.float64) @ np.linalg.inv(
            b.Tcw.astype(np.float64))
        gt_a = np.linalg.inv(ds.poses[a.frame_id]).astype(np.float64)
        gt_b = np.linalg.inv(ds.poses[b.frame_id]).astype(np.float64)
        rel_gt = gt_a @ np.linalg.inv(gt_b)
        # compare translation direction+magnitude and rotation angle
        dt = np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3])
        dR = rel_est[:3, :3] @ rel_gt[:3, :3].T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        return dt + ang

    gap_before = loop_gap()

    # feed the database in order; the final keyframes should close the loop
    for kf in kfs:
        looper.insert_keyframe(kf.kf_id)
        looper.spin_once()

    assert looper.n_loops_closed >= 1

    # the loop-end inconsistency collapses after correction
    gap_after = loop_gap()
    assert gap_after < 0.35 * gap_before, (gap_before, gap_after)

    # revisit duplicates were fused into the original points
    n_replaced = sum(1 for mp in world.points.values() if mp.replaced_by >= 0)
    assert n_replaced > 20, n_replaced


def test_project_match_fuse_gates(cfg):
    """The Fuse-Sim3 geometric gates (sp_matcher.cpp:1159-1171, shared by
    SearchByProjectionLoop sp_matcher_loop.cpp:274-287): an off-depth or
    off-normal duplicate must NOT be fused even with a perfect descriptor,
    while the in-range point matches."""
    import jax.numpy as jnp

    world = Map()
    kernels = TrackingKernels(cfg)
    mapper = LocalMapping(cfg, world, kernels)
    looper = LoopClosing(cfg, world, kernels, mapper)
    cam = cfg.camera

    N = cfg.runtime.max_keypoints
    rng = np.random.default_rng(3)
    desc = rng.normal(size=(N, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    uv = np.zeros((N, 2), np.float32)
    valid = np.zeros(N, bool)
    uv[0] = [cam.cx, cam.cy]  # keypoint 0 = projection of (0, 0, 5)
    valid[0] = True
    hc, wc = cfg.grid_h, cfg.grid_w
    f = FrameData(
        frame_id=0, timestamp=0.0, uv=uv,
        score=np.zeros(N, np.float32), response=np.zeros(N, np.float32),
        valid=valid, cov2_inv=np.ones((N, 2), np.float32),
        occ_grid=np.full((hc, wc), -1, np.int32), count=1,
        desc_dev=jnp.asarray(desc),
        dust_dev=jnp.zeros((hc, wc), jnp.float32),
        occ_grid_dev=jnp.full((hc, wc), -1, jnp.int32))
    f._desc_host = desc
    f.set_pose(np.eye(4, dtype=np.float32))
    kf = world.add_keyframe(f)

    def mk_point(dmin, dmax, normal):
        mp = world.create_point(np.array([0.0, 0.0, 5.0], np.float32),
                                kf.kf_id)
        world.pool.desc[mp.pid] = desc[0]
        world.pool.min_dist[mp.pid] = dmin
        world.pool.max_dist[mp.pid] = dmax
        world.pool.normal[mp.pid] = np.asarray(normal, np.float32)
        return mp

    Scw = (np.eye(3), np.zeros(3), 1.0)  # = the KF pose (camera at origin)

    # in-range: dist3 = 5 in [0.8*4, 1.2*6], normal toward the camera
    good = mk_point(4.0, 6.0, [0, 0, 1.0])
    assert looper._project_match(kf, Scw, [good.pid], radius=4.0) == \
        {0: good.pid}

    # off-depth duplicate: its scale-invariance band says it lives at ~1
    # unit; seen at 5 it must NOT fuse (dist > 1.2*dmax)
    off = mk_point(0.8, 1.0, [0, 0, 1.0])
    assert looper._project_match(kf, Scw, [off.pid], radius=4.0) == {}

    # off-normal duplicate: mean viewing ray points away (> 60 deg)
    back = mk_point(4.0, 6.0, [0, 0, -1.0])
    assert looper._project_match(kf, Scw, [back.pid], radius=4.0) == {}


def test_pose_graph_ring():
    """Sim3 pose-graph optimizer on a drifted ring with one loop edge:
    odometry edges measure the true steps, the chain initialization drifts
    in rotation/translation/scale, and the loop edge pins the ends."""
    import jax.numpy as jnp

    from sp_orb_slam_tpu.optim import sim3 as s3

    n = 24
    true_step = jnp.asarray(
        np.concatenate([[0.0, 2 * np.pi / n, 0.0], [0.5, 0.0, 0.02], [0.0]]),
        jnp.float32)
    drift = jnp.asarray(
        np.concatenate([[0.002, 0.0, 0.001], [0.01, 0.002, 0.0], [0.002]]),
        jnp.float32)
    xs = []
    S = (jnp.eye(3), jnp.zeros(3), jnp.float32(1.0))
    for i in range(n):
        xs.append(s3.sim3_log(*S))
        step = s3.sim3_mul(s3.sim3_exp(drift), s3.sim3_exp(true_step))
        S = s3.sim3_mul(step, S)
    xi = jnp.stack(xs)

    ei, ej, meas = [], [], []
    for i in range(n - 1):
        ei.append(i)
        ej.append(i + 1)
        meas.append(np.asarray(true_step))
    # loop edge: node n-1 back to node 0 with the true relative
    S_true = (jnp.eye(3), jnp.zeros(3), jnp.float32(1.0))
    rels = [S_true]
    for i in range(n - 1):
        S_true = s3.sim3_mul(s3.sim3_exp(true_step), S_true)
        rels.append(S_true)
    Sji = s3.sim3_mul(rels[0], s3.sim3_inverse(rels[-1]))
    ei.append(n - 1)
    ej.append(0)
    meas.append(np.asarray(s3.sim3_log(*Sji)))

    ei = jnp.asarray(ei, jnp.int32)
    ej = jnp.asarray(ej, jnp.int32)
    meas = jnp.asarray(np.stack(meas), jnp.float32)
    valid = jnp.ones(len(np.asarray(ei)), bool)
    fixed = jnp.asarray([True] + [False] * (n - 1))

    def cost(x):
        tot = 0.0
        for k in range(len(np.asarray(ei))):
            Si = s3.sim3_exp(jnp.asarray(x[int(ei[k])]))
            Sj = s3.sim3_exp(jnp.asarray(x[int(ej[k])]))
            err = s3.sim3_mul(s3.sim3_mul(s3.sim3_exp(meas[k]), Si),
                              s3.sim3_inverse(Sj))
            tot += float((s3.sim3_log(*err) ** 2).sum())
        return tot

    c0 = cost(np.asarray(xi))
    out = s3.optimize_pose_graph(xi, fixed, ei, ej, meas, valid, iters=25)
    c1 = cost(np.asarray(out))
    assert c0 > 1e-3, c0
    assert c1 < 1e-2 * c0, (c0, c1)
