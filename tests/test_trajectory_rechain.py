"""Trajectory re-chaining through culled keyframes (SaveTrajectoryTUM,
system_helper.cpp:89-158).

Regression for a composition-order defect: the culled-ancestor hops must
RIGHT-multiply (Tcw_frame = Tcr · Tcp_r · Tcp_p · Tcw_ancestor); the old
code left-multiplied, which mis-places every frame whose reference KF was
culled (and reverses chains of length >= 2)."""

import types

import numpy as np


def _pose(yaw, t):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T[:3, 3] = t
    return T


def _kf(Tcw, parent=-1, bad=False, Tcp=None):
    kf = types.SimpleNamespace()
    kf.Tcw = Tcw.astype(np.float32)
    kf.parent = parent
    kf.bad = bad
    if Tcp is not None:
        kf.Tcp = Tcp.astype(np.float32)
    return kf


def test_rechain_through_two_culled_ancestors():
    from sp_orb_slam_tpu.slam.system import rechain_trajectory

    # ground-truth camera poses for grandparent G, parent P, ref R (all
    # distinct non-commuting rotations/translations)
    Tcw_G = _pose(0.3, [0.5, 0.1, 2.0])
    Tcw_P = _pose(-0.4, [-1.0, 0.2, 3.0])
    Tcw_R = _pose(0.9, [2.0, -0.3, 1.0])
    # cull R and P: Tcp = Tcw_child @ inv(Tcw_parent) (map.erase_keyframe)
    Tcp_R = Tcw_R @ np.linalg.inv(Tcw_P)
    Tcp_P = Tcw_P @ np.linalg.inv(Tcw_G)

    world = types.SimpleNamespace()
    world.keyframes = {
        0: _kf(Tcw_G),
        1: _kf(Tcw_P, parent=0, bad=True, Tcp=Tcp_P),
        2: _kf(Tcw_R, parent=1, bad=True, Tcp=Tcp_R),
    }

    Tcw_frame = _pose(0.2, [0.1, 0.0, 0.5])   # ground truth for the frame
    rel = Tcw_frame @ np.linalg.inv(Tcw_R)    # recorded Tcr vs ref KF R

    ts, poses = rechain_trajectory(world, [rel.astype(np.float32)], [2],
                                   [7.5])
    assert len(ts) == 1 and ts[0] == 7.5
    # Twc recomposed through the culled chain must equal the ground truth
    np.testing.assert_allclose(poses[0], np.linalg.inv(Tcw_frame),
                               rtol=0, atol=1e-5)


def test_rechain_skips_frames_with_fully_culled_chain():
    from sp_orb_slam_tpu.slam.system import rechain_trajectory

    Tcw_R = _pose(0.9, [2.0, -0.3, 1.0])
    world = types.SimpleNamespace()
    world.keyframes = {2: _kf(Tcw_R, parent=-1, bad=True, Tcp=np.eye(4))}
    ts, poses = rechain_trajectory(world, [np.eye(4, dtype=np.float32)],
                                   [2], [1.0])
    assert len(ts) == 0 and len(poses) == 0
