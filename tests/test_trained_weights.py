"""Trained-checkpoint regime gate (VERDICT r3 missing #1 follow-through).

The committed checkpoint (weights/sp_rendered.npz, trained by
train/superpoint_train.py on the ray-cast rendered rooms) must keep the
descriptor statistics every reference threshold assumes
(sp_matcher.cpp:18-19 TH_LOW/TH_HIGH are absolute L2 gates): matched pairs
well under TH_HIGH with random pairs far above it.  Random weights collapse
descriptors into a ~0.2-diameter cluster (measured round 4: random pairs
p50 0.29, 99.9% under TH_HIGH, init-match precision 0.36), so a regressed
or corrupted checkpoint fails these gates loudly.

Runs at a reduced 376x240 operating point to keep CPU cost down — the
descriptor *regime* (calibrated vs collapsed) is resolution-independent.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sp_orb_slam_tpu.config import Config, _merge_dataclass

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "weights", "sp_rendered.npz")

H, W = 240, 376


def _project(Twc, K, X):
    R, t = Twc[:3, :3], Twc[:3, 3]
    Xc = (X - t[None, :]) @ R
    z = Xc[:, 2]
    return (np.stack([K[0] * Xc[:, 0] / z + K[2],
                      K[1] * Xc[:, 1] / z + K[3]], -1), z > 0.1)


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="trained checkpoint not present")
def test_trained_descriptor_regime():
    from sp_orb_slam_tpu.extractor import extract
    from sp_orb_slam_tpu.io.render import RenderedDataset
    from sp_orb_slam_tpu.models.weights import load_checkpoint
    from sp_orb_slam_tpu.ops import matching

    cfg = _merge_dataclass(Config(), {"camera": {
        "width": W, "height": H, "fx": 178.0, "fy": 209.0,
        "cx": 181.4, "cy": 125.1}})
    ds = RenderedDataset(cfg, seed=0, noise_seed=0)
    fa, fb = ds.frame(0), ds.frame(2)
    params = load_checkpoint(WEIGHTS)

    images = jnp.asarray(
        np.stack([fa.image, fb.image]).astype(np.float32) / 255.0)
    feats = extract(params, images,
                    num_features=cfg.tracking.num_features,
                    max_keypoints=cfg.runtime.max_keypoints,
                    conf_thresh=cfg.extractor.conf_thresh,
                    nms_dist=cfg.extractor.nms_dist,
                    border=cfg.extractor.border,
                    nms_iters=cfg.extractor.nms_iters,
                    cov_radius=cfg.extractor.cov_window,
                    cov_iters=cfg.extractor.cov_iters)
    uv = np.asarray(feats.uv)
    desc = np.asarray(feats.desc)
    valid = np.asarray(feats.valid)
    na, nb = int(valid[0].sum()), int(valid[1].sum())
    assert na > 150 and nb > 150  # the detector head finds real corners

    # exact GT correspondences: raycast A's keypoints, project into B
    X, hit = ds.raycast(fa.gt_pose, uv[0][valid[0]])
    uvb_gt, infront = _project(fb.gt_pose, ds.K, X)
    d2 = np.linalg.norm(uvb_gt[:, None, :] - uv[1][valid[1]][None, :, :],
                        axis=-1)
    gt_ok = hit & infront & (d2.min(1) < 2.0)
    assert gt_ok.sum() > 40
    matched = np.linalg.norm(desc[0][valid[0]][gt_ok]
                             - desc[1][valid[1]][d2.argmin(1)[gt_ok]],
                             axis=-1)

    rng = np.random.default_rng(0)
    random_d = np.linalg.norm(desc[0][valid[0]][rng.integers(0, na, 2000)]
                              - desc[1][valid[1]][rng.integers(0, nb, 2000)],
                              axis=-1)

    # the calibrated regime: matched pairs pass TH_HIGH, random pairs
    # sit near sqrt(2) and essentially never pass it
    assert np.median(matched) < 0.6
    assert np.quantile(matched, 0.9) < float(matching.TH_HIGH) + 0.1
    assert np.median(random_d) > 1.2
    assert (random_d <= matching.TH_HIGH).mean() < 0.05

    # and the production init matcher is geometrically precise on it
    m = matching.search_for_initialization(
        feats.desc[0], feats.valid[0], feats.uv[0],
        feats.desc[1], feats.uv[1], feats.valid[1], window=100, ratio=0.9)
    midx = np.asarray(m.match12)
    sel = midx >= 0
    assert sel.sum() > 60
    Xall, hitall = ds.raycast(fa.gt_pose, uv[0])
    uvb_all, infront_all = _project(fb.gt_pose, ds.K, Xall)
    err = np.linalg.norm(uvb_all - uv[1][np.maximum(midx, 0)], axis=-1)
    correct = sel & hitall & infront_all & (err < 3.0)
    assert correct.sum() / sel.sum() > 0.9
