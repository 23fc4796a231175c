"""In-process NetVLAD global descriptor (models/netvlad.py).

The reference ships NetVLAD as an empty stub and loads precomputed 4096-d
descriptors from disk (cv/netvlad.cpp:1-5; data_loader.cc:87-109); here the
descriptor is computed from the frame's own SP descriptors, so these tests
check (a) jax/numpy implementation agreement, (b) that the embedding
actually discriminates revisits from distinct views on the synthetic loop
rail, and (c) the keyframe-promotion hook semantics."""

import jax.numpy as jnp
import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass
from sp_orb_slam_tpu.io.dataset import SyntheticDataset
from sp_orb_slam_tpu.models import netvlad


def _cfg():
    return _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "camera": {"width": 320, "height": 240, "fx": 260.0, "fy": 260.0,
                   "cx": 160.0, "cy": 120.0, "fps": 20.0},
        "tracking": {"num_features": 250},
        "runtime": {"max_keypoints": 256},
    })


def test_jax_numpy_agree_and_unit_norm(rng):
    params = netvlad.init_params(0, out_dim=512)
    desc = rng.normal(0, 1, (128, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    valid = rng.random(128) > 0.3
    g_np = netvlad.global_descriptor_np(params, desc, valid)
    g_jax = np.asarray(netvlad.global_descriptor(
        params, jnp.asarray(desc), jnp.asarray(valid)))
    np.testing.assert_allclose(g_np, g_jax, atol=2e-5)
    assert abs(np.linalg.norm(g_np) - 1.0) < 1e-5
    # invalid keypoints must not contribute
    desc2 = desc.copy()
    desc2[~valid] = rng.normal(0, 1, (int((~valid).sum()), 256))
    g2 = netvlad.global_descriptor_np(params, desc2, valid)
    np.testing.assert_allclose(g_np, g2, atol=1e-5)


def test_discriminates_revisit_on_loop_rail():
    """Frames seeing the same 3D points share keypoint descriptors, so the
    VLAD of the loop-rail revisit frames must score high against the start
    and low against the far side of the loop."""
    cfg = _cfg()
    ds = SyntheticDataset(cfg, n_frames=32, n_points=9000, seed=2,
                          pixel_noise=0.1, loop=True)
    params = netvlad.init_params(0, out_dim=cfg.loop.global_desc_dim)

    def gd(i):
        inj = ds.frame(i).injected
        return netvlad.global_descriptor_np(params, inj["desc"],
                                            inj["valid"])

    g0, g_far, g_end = gd(0), gd(16), gd(31)
    same = float(g0 @ g_end)    # loop closes: frame 31 revisits frame 0
    diff = float(g0 @ g_far)    # far side of the loop
    assert same > diff + 0.2, (same, diff)
    assert same > 0.5, same


def test_keyframe_promotion_hook():
    """Map.add_keyframe applies global_desc_fn: "auto" fills only missing
    descriptors; the hook returning None leaves the frame untouched."""
    from sp_orb_slam_tpu.slam.map import Map
    from tests.test_tracking_units import _dummy_frame

    world = Map(mp_capacity=16)
    calls = []

    def fn(frame):
        calls.append(frame.frame_id)
        if frame.global_desc is not None:
            return None  # "auto" semantics (system.py _make_global_desc_fn)
        return np.ones(8, np.float32)

    world.global_desc_fn = fn
    f0 = _dummy_frame(0)
    kf0 = world.add_keyframe(f0)
    assert kf0.global_desc is not None and calls == [0]

    preset = np.full(8, 0.5, np.float32)
    f1 = _dummy_frame(1)
    f1.global_desc = preset
    kf1 = world.add_keyframe(f1)
    np.testing.assert_array_equal(kf1.global_desc, preset)


def test_system_wires_vlad_source():
    """System installs the hook when loop closing is on and the source is
    not dataset-only."""
    from sp_orb_slam_tpu.slam.system import System

    cfg = _merge_dataclass(_cfg(), {"use_loop": True,
                                    "loop": {"use_loop": True}})
    s = System(cfg)
    assert s.map.global_desc_fn is not None

    cfg2 = _merge_dataclass(_cfg(), {
        "use_loop": True,
        "loop": {"use_loop": True, "global_desc_source": "dataset"}})
    s2 = System(cfg2)
    assert s2.map.global_desc_fn is None


def test_trained_checkpoint_loads_and_centers():
    """The committed fitted checkpoint (weights/vlad_rendered.npz) loads
    through load_params with the seed-regenerated projection and the
    centering mean; centered embeddings stay unit-norm and differ from the
    random-init regime's."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "vlad_rendered.npz")
    if not os.path.exists(path):
        import pytest

        pytest.skip("fitted VLAD checkpoint not present")
    p = netvlad.load_params(path)
    assert p["proj"].shape == (64 * 256, 4096)
    assert p["mean"].shape == (64 * 256,)
    assert float(np.abs(p["mean"]).max()) > 0  # centering is real
    rng = np.random.default_rng(0)
    desc = rng.normal(size=(100, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    valid = np.ones(100, bool)
    g = netvlad.global_descriptor_np(p, desc, valid)
    assert abs(float(np.linalg.norm(g)) - 1.0) < 1e-5
    g_jax = np.asarray(netvlad.global_descriptor(p, desc, valid))
    np.testing.assert_allclose(g, g_jax, atol=1e-5)
    # init_params (mean = 0) is unchanged by the centering field
    base = netvlad.init_params(0)
    assert float(np.abs(base["mean"]).max()) == 0.0
