"""Image-path end-to-end: procedural rendered images -> extractor (random
weights) -> full SLAM, including the on-device rectification preprocessing.

This exercises the plumbing the injected-feature rail bypasses
(System._frame_from_image, extractor batching, rectify_map/bilinear_remap;
reference hot path system.cpp:138-200) without any external data: a
textured plane at z=5 rendered by exact inverse warp, with the raw frames
rendered *through* the distortion model so rectification must undo it.
"""

import numpy as np
import pytest

from sp_orb_slam_tpu.config import Config, _merge_dataclass

H, W = 240, 320
K = np.array([260.0, 260.0, 160.0, 120.0], np.float32)
DIST = np.array([-0.12, 0.02, 0.0, 0.0, 0.0], np.float32)


def _texture(x, y):
    v = np.zeros_like(x)
    rng = np.random.default_rng(7)
    for _ in range(24):
        fx_, fy_ = rng.uniform(0.5, 6.0, 2)
        ph = rng.uniform(0, 2 * np.pi)
        a = rng.uniform(0.3, 1.0)
        v += a * np.sin(fx_ * x + ph) * np.cos(fy_ * y + ph * 0.7)
    v = (v - v.min()) / (v.max() - v.min())
    return (v * 255).astype(np.uint8)


def _render(Twc, rays_cam):
    """Intersect per-pixel camera rays with the z=5 world plane."""
    Rwc, twc = Twc[:3, :3], Twc[:3, 3]
    d = rays_cam @ Rwc.T
    tpar = (5.0 - twc[2]) / d[..., 2]
    X = twc[None, None, :] + tpar[..., None] * d
    return _texture(X[..., 0], X[..., 1])


def _pinhole_rays():
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    return np.stack([(uu - K[2]) / K[0], (vv - K[3]) / K[1],
                     np.ones_like(uu)], -1)


def _distorted_rays():
    """Rays of the *raw* (distorted) camera: undistort each pixel, then
    back-project — so that rectification recovers the pinhole image."""
    import jax.numpy as jnp

    from sp_orb_slam_tpu.geometry import camera as cam_ops

    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    uv = jnp.asarray(np.stack([uu, vv], -1))
    und = np.asarray(cam_ops.undistort_points(uv, jnp.asarray(K),
                                              jnp.asarray(DIST), iters=8))
    return np.stack([(und[..., 0] - K[2]) / K[0],
                     (und[..., 1] - K[3]) / K[1],
                     np.ones((H, W))], -1).astype(np.float64)


def test_rectification_roundtrip():
    """rectify(raw rendered through the distortion model) == pinhole render
    away from the border (initUndistortRectifyMap + remap semantics)."""
    import jax.numpy as jnp

    from sp_orb_slam_tpu.geometry import camera as cam_ops

    Twc = np.eye(4)
    ideal = _render(Twc, _pinhole_rays()).astype(np.float32)
    raw = _render(Twc, _distorted_rays()).astype(np.float32)
    grid = cam_ops.rectify_map(jnp.asarray(K), jnp.asarray(K),
                               jnp.asarray(DIST), H, W)
    rect = np.asarray(cam_ops.bilinear_remap(jnp.asarray(raw), grid))
    # distortion shifts pixels by ~5-15 px toward the edges; rectification
    # must cancel it down to bilinear-interpolation noise
    pre = np.abs(raw[10:-10, 10:-10] - ideal[10:-10, 10:-10]).mean()
    post = np.abs(rect[10:-10, 10:-10] - ideal[10:-10, 10:-10]).mean()
    assert pre > 3.0, pre
    assert post < 0.15 * pre, (pre, post)


@pytest.mark.slow
def test_image_pipeline_end_to_end():
    """Rendered (distorted) images through the real extractor with random
    weights: initialization succeeds, tracking survives, the map grows."""
    import jax

    from sp_orb_slam_tpu.io.dataset import RawFrame
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.slam import tracking as tr
    from sp_orb_slam_tpu.slam.system import System

    cfg = _merge_dataclass(Config(), {
        "dataset": "synthetic_images",
        "camera": {"width": W, "height": H, "fx": float(K[0]),
                   "fy": float(K[1]), "cx": float(K[2]), "cy": float(K[3]),
                   "fps": 20.0, "k1": float(DIST[0]), "k2": float(DIST[1])},
        "tracking": {"num_features": 300},
        "runtime": {"max_keypoints": 320, "dust_points_cap": 128,
                    "local_points_cap": 1024, "ba_kfs_cap": 32,
                    "ba_points_cap": 1024, "ba_obs_cap": 4096,
                    "init_ransac_iters": 60},
    })
    params = superpoint.init_params(jax.random.PRNGKey(3))
    sys_ = System(cfg, params=params)
    assert sys_._preprocess is not None  # the rectification path is active

    rays = _distorted_rays()
    n = 20
    for i in range(n):
        t = i / (n - 1)
        Twc = np.eye(4, dtype=np.float64)
        Twc[:3, 3] = [1.2 * t, 0.1 * np.sin(4 * t), 0.25 * t]
        sys_.process(RawFrame(timestamp=i / 20.0, image=_render(Twc, rays)))

    rep = sys_.report()
    assert sys_.tracker.state == tr.OK, rep
    assert rep["n_lost"] == 0, rep
    # >= 3 (was 4): the r5 create_kf_min_gap=5 pacing default legitimately
    # spaces KFs wider on this 20-frame run
    assert rep["n_keyframes"] >= 3, rep
    assert rep["n_points"] > 80, rep
    assert rep["n_frames"] >= n // 2, rep  # tracked at least half post-init


@pytest.mark.slow
def test_extraction_prefetch_bit_identical():
    """spin with the extraction prefetch (dispatch frame t+1's extractor
    program before frame t's mapping host work) equals the unprefetched
    spin bit-for-bit: extraction is a pure jit function of the image, so
    overlap must change WHEN it runs, never WHAT it returns."""
    import jax

    from sp_orb_slam_tpu.io.dataset import RawFrame
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.slam.system import System

    rays = _distorted_rays()
    n = 14
    frames = []
    for i in range(n):
        t = i / (n - 1)
        Twc = np.eye(4, dtype=np.float64)
        Twc[:3, 3] = [1.2 * t, 0.1 * np.sin(4 * t), 0.25 * t]
        frames.append(RawFrame(timestamp=i / 20.0, image=_render(Twc, rays)))

    def run(prefetch: bool):
        cfg = _merge_dataclass(Config(), {
            "dataset": "synthetic_images",
            "camera": {"width": W, "height": H, "fx": float(K[0]),
                       "fy": float(K[1]), "cx": float(K[2]),
                       "cy": float(K[3]), "fps": 20.0,
                       "k1": float(DIST[0]), "k2": float(DIST[1])},
            "tracking": {"num_features": 300},
            "runtime": {"max_keypoints": 320, "dust_points_cap": 128,
                        "local_points_cap": 1024, "ba_kfs_cap": 32,
                        "ba_points_cap": 1024, "ba_obs_cap": 4096,
                        "init_ransac_iters": 60,
                        "prefetch_extract": prefetch},
        })
        params = superpoint.init_params(jax.random.PRNGKey(3))
        sys_ = System(cfg, params=params)
        sys_.spin(dataset=frames)
        stamps, poses = sys_.trajectory()
        return sys_.report(), np.asarray(stamps), np.asarray(poses)

    rep_a, st_a, po_a = run(prefetch=True)
    rep_b, st_b, po_b = run(prefetch=False)
    assert rep_a == rep_b, (rep_a, rep_b)
    np.testing.assert_array_equal(st_a, st_b)
    np.testing.assert_array_equal(po_a, po_b)
