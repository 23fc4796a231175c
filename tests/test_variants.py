"""Retained algorithm variants (VERDICT r2 missing #3): the reference keeps
compiled-but-off-path alternatives — simpler dust candidate gathering
(trackFrameDust / trackFrameDustKF, tracker_dust.cpp:230-404) and two other
keyframe-culling policies (local_mapper.cpp:906-977, 1034-1097).  Each is
config-selectable here; these tests pin their semantics."""

import numpy as np
import pytest

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.slam import tracking as tr
from sp_orb_slam_tpu.slam.system import System


def _cfg(**tracking_over):
    t = {"num_features": 250}
    t.update(tracking_over)
    return _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": t,
        "runtime": {"max_keypoints": 256, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })


@pytest.mark.slow
@pytest.mark.parametrize("gather", ["last", "kf"])
def test_dust_gather_variants_track(gather):
    """The simpler candidate-gathering variants must carry a full run
    (they gather strictly fewer points than kf_local, so fallbacks may
    fire more, but tracking must hold)."""
    cfg = _cfg(dust={"gather": gather})
    ds = SyntheticDataset(cfg, n_frames=40, n_points=5000, seed=3,
                          pixel_noise=0.3)
    s = System(cfg)
    s.spin(ds)
    rep = s.report()
    assert rep["n_lost"] == 0, rep
    assert s.tracker.state == tr.OK


def _redundant_world():
    """A map where every covisible of the last KF is fully redundant."""
    from tests.test_async_gba import _build_bundle

    world, kfs, pts, true_T = _build_bundle(n_kfs=6, n_pts=40)
    # every point observed by all 6 KFs -> n_obs = 6 >= / > num_obs (5)
    return world, kfs


def test_culling_override2_prefers_min_parent_distance():
    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.slam.local_mapping import LocalMapping

    world, kfs = _redundant_world()
    import types

    import jax.numpy as jnp

    cfg = _merge_dataclass(Config(), {
        "mapping": {"kf_culling_method": "override2"}})
    kernels = types.SimpleNamespace(
        K_intr=jnp.asarray([260.0, 260.0, 160.0, 120.0], jnp.float32))
    mapper = LocalMapping(cfg, world, kernels)
    # give the chain a spanning tree: parent = previous KF
    for a, b in zip(kfs[:-1], kfs[1:]):
        b.parent = a.kf_id
        a.children.add(b.kf_id)
    # squeeze two KFs together: kf3 sits almost on top of its parent kf2
    T = kfs[3].Tcw.copy()
    T[:3, 3] = kfs[2].Tcw[:3, 3] + np.array([0.001, 0, 0], np.float32)
    kfs[3].set_pose(T)
    mapper.keyframe_culling(kfs[-1])
    # kf3 (minimum parent distance) must be among the culled
    assert kfs[3].bad


def test_culling_plain_single_pass():
    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.slam.local_mapping import LocalMapping

    world, kfs = _redundant_world()
    import types

    import jax.numpy as jnp

    cfg = _merge_dataclass(Config(), {
        "mapping": {"kf_culling_method": "plain"}})
    kernels = types.SimpleNamespace(
        K_intr=jnp.asarray([260.0, 260.0, 160.0, 120.0], jnp.float32))
    mapper = LocalMapping(cfg, world, kernels)
    mapper.keyframe_culling(kfs[-1])
    # single-pass SEQUENTIAL semantics (like the reference's in-loop
    # SetBadFlag): the first candidate has every point at n_obs = 6 > 5
    # and goes; erasing it drops all its points to 5 observations, so the
    # strict > gate fails for every later candidate in this pass
    culled = [k.kf_id for k in kfs if k.bad]
    assert len(culled) == 1, culled
