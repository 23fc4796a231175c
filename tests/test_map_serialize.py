"""Map save/load + localize-against-a-loaded-map (slam/serialize.py).

The serving pattern the reference cannot do (it has no map persistence,
SURVEY.md §5): build a map in one session, save it, and in a fresh session
load it, freeze it (localization mode), and relocalize into it cold.
"""

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam import tracking as tr
from sp_orb_slam_tpu.slam.system import System


def _cfg():
    return _merge_dataclass(Config(), {"dataset": "synthetic"})


def test_save_load_roundtrip(tmp_path):
    cfg = _cfg()
    ds = list(SyntheticDataset(cfg, n_frames=60, seed=5))
    sys1 = System(cfg)
    for raw in ds:
        sys1.process(raw)
    assert sys1.tracker.state == tr.OK
    m1 = sys1.map
    assert m1.n_keyframes() >= 3, m1.n_keyframes()

    path = str(tmp_path / "map.npz")
    sys1.save_map(path)

    from sp_orb_slam_tpu.slam.serialize import load_map

    m2 = load_map(path)
    assert m2.n_keyframes() == m1.n_keyframes()
    assert m2.n_points() == len(
        [1 for mp in m1.points.values() if not mp.bad and mp.replaced_by < 0])
    # graph structure survives
    for kf_id, kf in m1.keyframes.items():
        if kf.bad:
            continue
        kf2 = m2.keyframes[kf_id]
        assert kf2.connections == kf.connections
        assert kf2.parent == kf.parent
        np.testing.assert_array_equal(kf2.Tcw, kf.Tcw)
        # binding tables map to points with identical positions
        for j in np.nonzero(kf.mp_ids >= 0)[0]:
            mp1 = m1.get_point(int(kf.mp_ids[j]))
            if mp1 is None or mp1.bad:
                continue
            pid2 = int(kf2.mp_ids[j])
            assert pid2 >= 0
            np.testing.assert_allclose(m2.pool.pos[pid2],
                                       m1.pool.pos[mp1.pid], atol=0)
            assert m2.points[pid2].obs.keys() == mp1.obs.keys()


def test_resume_mapping_on_loaded_map(tmp_path):
    """load_map without localization mode: the session relocalizes, keeps
    tracking, and the MAPPER extends the loaded map (new keyframes
    triangulated against loaded ones)."""
    cfg = _cfg()
    ds = list(SyntheticDataset(cfg, n_frames=90, seed=6))
    sys1 = System(cfg)
    for raw in ds[:55]:
        sys1.process(raw)
    path = str(tmp_path / "map.npz")
    sys1.save_map(path)
    n_kfs = sys1.map.n_keyframes()

    sys2 = System(cfg, kernels=sys1.kernels)
    sys2.load_map(path)
    for raw in ds[40:]:
        sys2.process(raw)
    rep = sys2.report()
    assert sys2.tracker.state == tr.OK, (rep, sys2.tracker.last_fail)
    assert rep["n_lost"] == 0, rep
    assert sys2.map.n_keyframes() > n_kfs, (sys2.map.n_keyframes(), n_kfs)


def test_fleet_localization_server(tmp_path):
    """Build once, serve many: a 2-stream fleet loads one saved map and
    localizes both streams (batched extraction/tracking stages + frozen
    map), each in the mapping session's world frame."""
    from sp_orb_slam_tpu.slam.fleet import StreamFleet

    cfg = _cfg()
    ds = list(SyntheticDataset(cfg, n_frames=60, seed=5))
    sys1 = System(cfg)
    for raw in ds:
        sys1.process(raw)
    path = str(tmp_path / "map.npz")
    sys1.save_map(path)

    fleet = StreamFleet(cfg, 2, params=None)
    fleet.load_map(path)
    for s in fleet.systems:
        assert s.tracker.state == tr.LOST  # armed for cold reloc

    ok_ticks = [0, 0]
    for k in range(20, 50):
        res = fleet.tick([ds[k], ds[min(k + 5, 59)]])
        for i in range(2):
            if res[i] is not None:
                ok_ticks[i] += 1
    fleet.shutdown()
    for i, s in enumerate(fleet.systems):
        assert s.tracker.state == tr.OK, (i, s.tracker.last_fail)
        assert s.tracker.only_tracking
        assert ok_ticks[i] >= 20, (i, ok_ticks)
        assert s.map.n_keyframes() == sys1.map.n_keyframes()  # frozen


def test_localize_against_loaded_map(tmp_path):
    """Fresh System + loaded map + localization mode: the first frame
    relocalizes cold, later frames track, the map stays frozen, and the
    recovered poses match the mapping session's (same world frame)."""
    cfg = _cfg()
    ds = list(SyntheticDataset(cfg, n_frames=60, seed=5))
    sys1 = System(cfg)
    poses1 = {}
    for k, raw in enumerate(ds):
        p = sys1.run(raw)
        if p is not None:
            poses1[k] = p
    path = str(tmp_path / "map.npz")
    sys1.save_map(path)
    n_pts = sys1.map.n_points()
    n_kfs = sys1.map.n_keyframes()

    sys2 = System(cfg, kernels=sys1.kernels)
    sys2.load_map(path)
    sys2.activate_localization_mode()
    assert sys2.tracker.state == tr.LOST  # armed for cold relocalization

    matched = 0
    for k in range(20, 55):
        p = sys2.run(ds[k])
        if p is None or k not in poses1:
            continue
        # same world frame as the mapping session: camera centers agree
        c1 = -poses1[k][:3, :3].T @ poses1[k][:3, 3]
        c2 = -p[:3, :3].T @ p[:3, 3]
        if np.linalg.norm(c1 - c2) < 0.05:
            matched += 1
    assert sys2.tracker.state == tr.OK, sys2.tracker.last_fail
    assert matched >= 25, matched
    # the loaded map stayed frozen
    assert sys2.map.n_points() == n_pts
    assert sys2.map.n_keyframes() == n_kfs
