"""Unit tests of tracking's host-side graph logic (no kernels involved).

Deliberate verification of UpdateLocalKeyFrames expansion semantics against
the reference (tracker.cpp:868-984), including the ORB-SLAM2 quirk the
reference preserves: the parent branch's `break` exits the OUTER expansion
loop (tracker.cpp:974-981), while the covisible-neighbor and child branches
break only their inner loops (:945-970).
"""

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.slam.frame import FrameData
from sp_orb_slam_tpu.slam.map import Map
from sp_orb_slam_tpu.slam.tracking import Tracking


def _mini_cfg():
    return _merge_dataclass(Config(), {
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "runtime": {"max_keypoints": 16},
    })


def _dummy_frame(fid: int, K: int = 16) -> FrameData:
    return FrameData(
        frame_id=fid, timestamp=fid / 20.0,
        uv=np.zeros((K, 2), np.float32), score=np.zeros(K, np.float32),
        response=np.zeros(K, np.float32), valid=np.ones(K, bool),
        cov2_inv=np.ones((K, 2), np.float32),
        occ_grid=np.full((30, 40), -1, np.int32), count=K,
        desc_dev=None, dust_dev=None, occ_grid_dev=None,
        Tcw=np.eye(4, dtype=np.float32))


def _world_with_kfs(n: int):
    world = Map(mp_capacity=256)
    kfs = [world.add_keyframe(_dummy_frame(i)) for i in range(n)]
    return world, kfs


def _bind(world, frame, slot, kf, idx):
    mp = world.create_point(np.array([0, 0, 5.0], np.float32), kf.kf_id)
    world.add_observation(mp, kf.kf_id, idx)
    frame.mp_ids[slot] = mp.pid
    return mp


def test_parent_branch_breaks_outer_loop():
    """After a KF adds its (unmarked) parent, expansion STOPS entirely —
    later listed KFs are never expanded (tracker.cpp:974-981)."""
    # kf0, kf1 observers; kf0.parent = kf2 (unmarked); kf1 covisible kf3
    world, (kf0, kf1, kf2, kf3) = _world_with_kfs(4)
    kf0.parent = kf2.kf_id
    kf1.ordered_neighbors = [kf3.kf_id]
    tr = Tracking(_mini_cfg(), world, kernels=None)
    frame = _dummy_frame(10)
    _bind(world, frame, 0, kf0, 0)
    _bind(world, frame, 1, kf1, 1)
    tr._update_local_map(frame)
    assert set(tr.local_kfs) == {kf0.kf_id, kf1.kf_id, kf2.kf_id}
    assert kf3.kf_id not in tr.local_kfs  # kf1 never expanded


def test_one_neighbor_and_child_per_listed_kf():
    """The neighbor and child branches add only the FIRST unmarked entry
    (inner breaks, tracker.cpp:945-970); without a parent the outer loop
    continues to the next listed KF."""
    world, (kf0, kf1, kf2, kf3, kf4) = _world_with_kfs(5)
    kf0.ordered_neighbors = [kf2.kf_id, kf3.kf_id]  # only kf2 expected
    kf0.children = {kf4.kf_id}
    tr = Tracking(_mini_cfg(), world, kernels=None)
    frame = _dummy_frame(10)
    _bind(world, frame, 0, kf0, 0)
    _bind(world, frame, 1, kf1, 1)
    tr._update_local_map(frame)
    assert kf2.kf_id in tr.local_kfs
    assert kf3.kf_id not in tr.local_kfs  # second neighbor skipped
    assert kf4.kf_id in tr.local_kfs      # first child added
    # snapshot semantics: kf2/kf4 (appended during the pass) not expanded


def test_ref_kf_max_skips_bad_observers():
    """The max-count anchor is chosen among good KFs only
    (tracker.cpp:920-929 skips bad before the max update)."""
    world, (kf0, kf1) = _world_with_kfs(2)
    tr = Tracking(_mini_cfg(), world, kernels=None)
    frame = _dummy_frame(10)
    # kf0 observes two bound points (higher count), kf1 one — but kf0 is bad
    _bind(world, frame, 0, kf0, 0)
    mp = world.create_point(np.array([0, 0, 5.0], np.float32), kf0.kf_id)
    world.add_observation(mp, kf0.kf_id, 1)
    world.add_observation(mp, kf1.kf_id, 1)
    frame.mp_ids[1] = mp.pid
    kf0.bad = True
    tr._update_local_map(frame)
    assert tr.ref_kf == kf1.kf_id
    assert kf0.kf_id not in tr.local_kfs


def test_local_points_union_of_local_kfs():
    world, (kf0, kf1) = _world_with_kfs(2)
    tr = Tracking(_mini_cfg(), world, kernels=None)
    frame = _dummy_frame(10)
    mp0 = _bind(world, frame, 0, kf0, 0)
    mp1 = world.create_point(np.array([1, 0, 5.0], np.float32), kf0.kf_id)
    world.add_observation(mp1, kf0.kf_id, 2)  # unbound extra point on kf0
    tr._update_local_map(frame)
    assert set(tr.local_pids) == {mp0.pid, mp1.pid}


def _kf_policy_world():
    """Ref KF with 10 tracked points of which the frame binds 6: c2 fires
    (0.6 < 0.7) but c1b does not (0.6 >= 0.5), c3 does not (6 >= 5), c1a
    does not (frame close to the KF).  With mapper=None (idle) only the
    bare-idle creation path is live -> isolates the pacing gates."""
    world, (kf0,) = _world_with_kfs(1)
    frame = _dummy_frame(2)
    for i in range(6):
        _bind(world, frame, i, kf0, i)
    for i in range(6, 10):
        mp = world.create_point(np.array([0, 0, 5.0], np.float32), kf0.kf_id)
        world.add_observation(mp, kf0.kf_id, i)
    return world, kf0, frame


def _policy_tracker(world, kf0, overrides=None):
    cfg = _mini_cfg()
    if overrides:
        cfg = _merge_dataclass(cfg, {"tracking": overrides})
    tr = Tracking(cfg, world, kernels=None)
    tr.ref_kf = kf0.kf_id
    tr.last_kf_id_frame = kf0.frame_id
    tr.matches_inliers = 6
    return tr


def test_kf_pacing_gates_idle_path():
    """create_kf_min_gap / create_kf_min_baseline_ratio gate ONLY the
    bare-idle creation path (config.py; NOTES.md round 2 item 4)."""
    world, kf0, frame = _kf_policy_world()

    # gates explicitly off: idle path creates.  (The production default is
    # create_kf_min_gap=5 — the r5 measured winner, config.py — so the
    # gates-off baseline must turn it off explicitly.)
    assert _policy_tracker(world, kf0,
                           {"create_kf_min_gap": 0})._need_new_keyframe(frame)

    # min_gap: frame 2 is closer than 5 frames to KF at frame 0 -> blocked
    tr = _policy_tracker(world, kf0, {"create_kf_min_gap": 5})
    assert not tr._need_new_keyframe(frame)
    far = _dummy_frame(7)
    far.mp_ids[:] = frame.mp_ids
    assert tr._need_new_keyframe(far)

    # baseline ratio: frame at the ref KF's optical centre -> ratio 0 ->
    # blocked; translated by 0.5 against median depth 5 -> 0.1 -> passes
    tr = _policy_tracker(world, kf0,
                         {"create_kf_min_baseline_ratio": 0.05,
                          "create_kf_min_gap": 0})  # isolate the ratio gate
    assert not tr._need_new_keyframe(frame)
    moved = _dummy_frame(2)
    moved.mp_ids[:] = frame.mp_ids
    moved.Tcw = np.eye(4, dtype=np.float32)
    moved.Tcw[0, 3] = 0.5
    assert tr._need_new_keyframe(moved)


def test_kf_pacing_never_blocks_starvation():
    """The c3 (starvation) path bypasses both gates."""
    world, kf0, frame = _kf_policy_world()
    tr = _policy_tracker(world, kf0, {"create_kf_min_gap": 50,
                                      "create_kf_min_baseline_ratio": 5.0})
    tr.matches_inliers = 2  # < create_kf_nmatch=5 -> c3
    assert tr._need_new_keyframe(frame)
