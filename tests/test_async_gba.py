"""Transient-GBA semantics (loop_closer_vlad.cpp:681-690, 753-849):
the post-loop global BA solves on a snapshot OUTSIDE the map lock while
tracking/mapping advance, then commits with staged spanning-tree
propagation to keyframes and points created during the solve, and a new
loop kills a still-running GBA."""

import threading
import time
import types

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.slam.frame import FrameData
from sp_orb_slam_tpu.slam.local_mapping import (LocalMapping,
                                                apply_global_ba_staged,
                                                assemble_global_ba,
                                                solve_global_ba)
from sp_orb_slam_tpu.slam.map import Map

FX = FY = 260.0
CX, CY = 160.0, 120.0


def _cfg():
    return _merge_dataclass(Config(), {
        "camera": {"width": 320, "height": 240, "fx": FX, "fy": FY,
                   "cx": CX, "cy": CY, "fps": 20.0},
        "runtime": {"max_keypoints": 64},
    })


def _kernels_stub():
    import jax.numpy as jnp

    return types.SimpleNamespace(
        K_intr=jnp.asarray([FX, FY, CX, CY], jnp.float32))


def _project(Tcw, P):
    pc = Tcw[:3, :3] @ P + Tcw[:3, 3]
    return np.array([FX * pc[0] / pc[2] + CX, FY * pc[1] / pc[2] + CY],
                    np.float32)


def _frame(fid, K=64):
    return FrameData(
        frame_id=fid, timestamp=fid / 20.0,
        uv=np.zeros((K, 2), np.float32), score=np.zeros(K, np.float32),
        response=np.zeros(K, np.float32), valid=np.ones(K, bool),
        cov2_inv=np.ones((K, 2), np.float32),
        occ_grid=np.full((30, 40), -1, np.int32), count=K,
        desc_dev=None, dust_dev=None, occ_grid_dev=None,
        Tcw=np.eye(4, dtype=np.float32))


def _build_bundle(n_kfs=4, n_pts=50, seed=0, perturb=0.02):
    """Consistent mini-bundle: cameras on a line, points ahead; keyframe
    poses perturbed so GBA has real work, observations exact (from the
    unperturbed geometry)."""
    rng = np.random.default_rng(seed)
    world = Map(mp_capacity=1024)
    pts = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
                    rng.uniform(5.0, 8.0, n_pts)], axis=1).astype(np.float32)
    true_T = []
    kfs = []
    for i in range(n_kfs):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-0.25 * i, 0.0, 0.0]  # camera center at x = 0.25 i
        true_T.append(T)
        f = _frame(i)
        for k in range(n_pts):
            f.uv[k] = _project(T, pts[k])
        Tp = T.copy()
        if i > 0:  # pose noise for BA to remove
            Tp[:3, 3] += rng.normal(0, perturb, 3).astype(np.float32)
        f.set_pose(Tp)
        kfs.append(world.add_keyframe(f))
    for k in range(n_pts):
        mp = world.create_point(pts[k], kfs[0].kf_id)
        for kf in kfs:
            world.add_observation(mp, kf.kf_id, k)
    for kf in kfs:
        world.update_connections(kf)
    return world, kfs, pts, true_T


def test_staged_propagation_reaches_kfs_and_points_born_during_gba():
    world, kfs, pts, true_T = _build_bundle()
    problem = assemble_global_ba(world)

    # ... the solve "runs"; meanwhile mapping inserts a new KF (child of
    # the last) and a new point referenced to it
    T_new = np.eye(4, dtype=np.float32)
    T_new[:3, 3] = [-1.1, 0.0, 0.01]
    f = _frame(99)
    f.set_pose(T_new)
    kf_new = world.add_keyframe(f)
    kf_new.parent = kfs[-1].kf_id
    kfs[-1].children.add(kf_new.kf_id)
    p_new = world.create_point(np.array([0.3, 0.2, 6.0], np.float32),
                               kf_new.kf_id)
    world.add_observation(p_new, kf_new.kf_id, 0)

    parent_before = kfs[-1].Tcw.copy()
    child_before = kf_new.Tcw.copy()
    pnew_before = world.pool.pos[p_new.pid].copy()

    res = solve_global_ba(problem, _kernels_stub(), iters=8)
    apply_global_ba_staged(world, problem, res, loop_kf_id=777)

    # participants took the solved poses and moved toward ground truth
    for kf, T_true in zip(kfs[1:], true_T[1:]):
        assert kf.ba_global_for == 777
        assert np.linalg.norm(kf.Tcw[:3, 3] - T_true[:3, 3]) < 0.01, kf.kf_id

    # the during-GBA keyframe chained through its parent:
    # T_child_new = T_child_old @ inv(T_parent_old) @ T_parent_new
    assert kf_new.ba_global_for == 777
    expect = (child_before.astype(np.float64)
              @ np.linalg.inv(parent_before.astype(np.float64))
              @ kfs[-1].Tcw.astype(np.float64))
    assert np.allclose(kf_new.Tcw, expect, atol=1e-5)

    # the during-GBA point re-projected through its reference keyframe:
    # camera-frame coords preserved across the correction
    Xc_before = child_before[:3, :3] @ pnew_before + child_before[:3, 3]
    Xc_after = (kf_new.Tcw[:3, :3] @ world.pool.pos[p_new.pid]
                + kf_new.Tcw[:3, 3])
    assert np.allclose(Xc_before, Xc_after, atol=1e-5)


def test_gba_thread_overlaps_tracking_and_commits():
    """The headline property: while the GBA solve runs, the map lock is
    free (tracking advances); the staged commit lands afterwards."""
    from sp_orb_slam_tpu.slam import loop_closing as lc_mod
    from sp_orb_slam_tpu.slam.loop_closing import LoopClosing

    world, kfs, pts, true_T = _build_bundle()
    cfg = _merge_dataclass(_cfg(), {"use_loop": True,
                                    "loop": {"use_loop": True}})
    kernels = _kernels_stub()
    mapper = LocalMapping(cfg, world, kernels)
    looper = LoopClosing(cfg, world, kernels, mapper)
    looper._thread = object()  # force the threaded-launch path

    solving = threading.Event()
    proceed = threading.Event()
    real_solve = lc_mod.solve_global_ba

    def gated_solve(problem, k, iters=10):
        solving.set()
        assert proceed.wait(timeout=30.0)
        return real_solve(problem, k, iters=iters)

    lc_mod.solve_global_ba = gated_solve
    try:
        looper._launch_gba(kfs[-1].kf_id)
        assert solving.wait(timeout=30.0)
        # GBA is mid-solve: tracking-style work can take the map lock NOW
        advanced = False
        assert world.update_lock.acquire(timeout=5.0)
        try:
            advanced = True  # a tracked frame would mutate the map here
        finally:
            world.update_lock.release()
        assert advanced
        assert looper.gba_running
        proceed.set()
        looper._gba_thread.join(timeout=60.0)
    finally:
        lc_mod.solve_global_ba = real_solve
    assert not looper.gba_running
    assert all(kf.ba_global_for == kfs[-1].kf_id for kf in kfs)
    for kf, T_true in zip(kfs[1:], true_T[1:]):
        assert np.linalg.norm(kf.Tcw[:3, 3] - T_true[:3, 3]) < 0.01


def test_new_loop_kills_running_gba():
    """mbStopGBA semantics (loop_closer_vlad.cpp:511-529): a superseded
    GBA discards its result — poses stay untouched."""
    from sp_orb_slam_tpu.slam import loop_closing as lc_mod
    from sp_orb_slam_tpu.slam.loop_closing import LoopClosing

    world, kfs, pts, true_T = _build_bundle()
    cfg = _merge_dataclass(_cfg(), {"use_loop": True,
                                    "loop": {"use_loop": True}})
    kernels = _kernels_stub()
    mapper = LocalMapping(cfg, world, kernels)
    looper = LoopClosing(cfg, world, kernels, mapper)
    looper._thread = object()

    solving = threading.Event()
    proceed = threading.Event()
    real_solve = lc_mod.solve_global_ba

    def gated_solve(problem, k, iters=10):
        solving.set()
        assert proceed.wait(timeout=30.0)
        return real_solve(problem, k, iters=iters)

    poses_before = [kf.Tcw.copy() for kf in kfs]
    lc_mod.solve_global_ba = gated_solve
    try:
        looper._launch_gba(kfs[-1].kf_id)
        assert solving.wait(timeout=30.0)
        killer = threading.Thread(target=looper._stop_gba)
        killer.start()
        time.sleep(0.05)  # _stop_gba sets the flag, then joins the solver
        proceed.set()
        killer.join(timeout=60.0)
    finally:
        lc_mod.solve_global_ba = real_solve
    assert looper._gba_thread is None
    for kf, T0 in zip(kfs, poses_before):
        assert np.array_equal(kf.Tcw, T0)
        assert kf.ba_global_for == -1
