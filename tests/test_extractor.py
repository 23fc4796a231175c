"""Extractor stack: frontend parity vs torch, NMS vs sequential greedy,
covariance vs BFS golden model, descriptor sampling vs torch grid_sample."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_orb_slam_tpu.extractor import extract
from sp_orb_slam_tpu.models import superpoint, weights
from sp_orb_slam_tpu.ops import covariance as cov_ops
from sp_orb_slam_tpu.ops import nms as nms_ops

H, W = 120, 160  # small image keeps CPU tests quick; multiples of 8


@pytest.fixture(scope="module")
def params():
    # real-weights gate (docs/WEIGHTS.md): point SP_WEIGHTS at a genuine
    # checkpoint to run every golden test against it instead of random init
    import os

    path = os.environ.get("SP_WEIGHTS")
    if path:
        return jax.tree.map(jnp.asarray, weights.load_checkpoint(path))
    return superpoint.init_params(jax.random.PRNGKey(42))


@pytest.fixture(scope="module")
def images():
    return np.random.default_rng(1).random((2, H, W), dtype=np.float32)


def test_forward_shapes(params, images):
    out = superpoint.forward(params, jnp.asarray(images))
    hc, wc = H // 8, W // 8
    assert out.semi_dust.shape == (2, hc, wc)
    assert out.dense_dust.shape == (2, hc, wc)
    assert out.score.shape == (2, hc, wc)
    assert out.coarse_desc.shape == (2, hc, wc, 256)
    assert out.heat.shape == (2, H, W)
    # probabilities
    assert float(jnp.min(out.dense_dust)) >= 0.0
    assert float(jnp.max(out.dense_dust)) <= 1.0
    # unit coarse descriptors
    norms = jnp.linalg.norm(out.coarse_desc, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    # heat normalized to [0, 1] per image
    assert np.allclose(np.asarray(jnp.min(out.heat, axis=(1, 2))), 0.0, atol=1e-6)
    assert np.allclose(np.asarray(jnp.max(out.heat, axis=(1, 2))), 1.0, atol=1e-6)


def test_forward_matches_torch(params, images):
    """Golden parity of the conv stack + post-proc vs a torch reimplementation
    of the reference SPFrontend::forward (sp_extractor.cpp:79-158)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = torch.from_numpy(images[:1, None])  # (1, 1, H, W)

    def conv(x, name, relu=True, pad=None):
        w = torch.from_numpy(np.transpose(np.asarray(params[name]["w"]), (3, 2, 0, 1)))
        b = torch.from_numpy(np.asarray(params[name]["b"]))
        y = F.conv2d(x, w, b, padding=(w.shape[-1] - 1) // 2)
        return F.relu(y) if relu else y

    with torch.no_grad():
        t = conv(x, "conv1a"); t = conv(t, "conv1b"); t = F.max_pool2d(t, 2, 2)
        t = conv(t, "conv2a"); t = conv(t, "conv2b"); t = F.max_pool2d(t, 2, 2)
        t = conv(t, "conv3a"); t = conv(t, "conv3b"); t = F.max_pool2d(t, 2, 2)
        t = conv(t, "conv4a"); t = conv(t, "conv4b")
        semi = conv(conv(t, "convPa"), "convPb", relu=False)[0]  # (65, hc, wc)
        coarse = conv(conv(t, "convDa"), "convDb", relu=False)
        coarse = coarse / coarse.norm(dim=1, keepdim=True)
        dense = torch.softmax(semi, dim=0)
        nodust = dense[:64]
        score_t, idx_t = nodust.max(0)
        heat_t = F.pixel_shuffle(torch.log(torch.clamp(nodust, min=1e-3))[None], 8)[0, 0]

    out = superpoint.forward(params, jnp.asarray(images[:1]))
    np.testing.assert_allclose(np.asarray(out.semi_dust[0]), semi[64].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.score[0]), score_t.numpy(),
                               atol=1e-5, rtol=1e-4)
    # in-cell argmax -> pixel coords
    hc, wc = H // 8, W // 8
    dy, dx = np.divmod(idx_t.numpy(), 8)
    u_ref = np.arange(wc)[None, :] * 8 + dx
    v_ref = np.arange(hc)[:, None] * 8 + dy
    np.testing.assert_array_equal(np.asarray(out.cand_uv[0, ..., 0]), u_ref)
    np.testing.assert_array_equal(np.asarray(out.cand_uv[0, ..., 1]), v_ref)
    # heat (pre-normalization parity): ours is normalized, so compare shapes
    # via the normalization inverse on the torch side
    img = -heat_t.numpy()
    heat_ref = (img - img.min()) / (img.max() - img.min())
    np.testing.assert_allclose(np.asarray(out.heat[0]), heat_ref, atol=1e-4)

    # descriptor sampling parity vs torch grid_sampler (align_corners=True)
    uv = np.array([[10.0, 12.0], [55.0, 40.0], [99.0, 77.0], [151.0, 111.0]],
                  np.float32)
    ours = superpoint.sample_descriptors(out.coarse_desc[0], jnp.asarray(uv), (H, W))
    with torch.no_grad():
        gx = torch.from_numpy(uv[:, 0]) / (W / 2.0) - 1.0
        gy = torch.from_numpy(uv[:, 1]) / (H / 2.0) - 1.0
        grid = torch.stack([gx, gy], -1)[None, None]  # (1, 1, K, 2)
        samp = torch.nn.functional.grid_sample(
            coarse, grid, mode="bilinear", padding_mode="zeros",
            align_corners=True)[0, :, 0].T  # (K, 256)
        samp = samp / samp.norm(dim=1, keepdim=True)
    np.testing.assert_allclose(np.asarray(ours), samp.numpy(), atol=1e-4)


def test_weights_roundtrip(params, tmp_path):
    p = str(tmp_path / "sp.npz")
    weights.save_npz(params, p)
    loaded = weights.load_checkpoint(p)
    for name in params:
        np.testing.assert_allclose(np.asarray(params[name]["w"]),
                                   loaded[name]["w"], atol=1e-7)


def test_nms_matches_greedy():
    rng = np.random.default_rng(7)
    hc, wc = 15, 20
    for trial in range(3):
        score = rng.random((hc, wc), dtype=np.float32)
        du = rng.integers(0, 8, (hc, wc))
        dv = rng.integers(0, 8, (hc, wc))
        uv = np.stack([np.arange(wc)[None, :] * 8 + du,
                       np.arange(hc)[:, None] * 8 + dv], -1).astype(np.int32)
        valid = score > 0.3
        ours = np.asarray(nms_ops.greedy_grid_nms(
            jnp.asarray(score), jnp.asarray(uv), jnp.asarray(valid), iters=32))
        ref = nms_ops.greedy_grid_nms_reference(score, uv, valid)
        np.testing.assert_array_equal(ours, ref)


def test_select_keypoints_semantics():
    rng = np.random.default_rng(8)
    hc, wc = 15, 20
    h, w = hc * 8, wc * 8
    score = rng.random((hc, wc), dtype=np.float32)
    du = rng.integers(0, 8, (hc, wc))
    dv = rng.integers(0, 8, (hc, wc))
    uv = np.stack([np.arange(wc)[None, :] * 8 + du,
                   np.arange(hc)[:, None] * 8 + dv], -1).astype(np.int32)
    valid = score > 0.2
    kps = nms_ops.select_keypoints(
        jnp.asarray(score), jnp.asarray(uv), jnp.asarray(valid),
        num_features=50, max_keypoints=64, image_hw=(h, w), nms_iters=32)
    n = int(kps.count)
    assert 0 < n <= 51
    sel_uv = np.asarray(kps.uv[:n])
    # border: all emitted keypoints >= 8 px from the edge
    assert (sel_uv >= 8).all()
    assert (sel_uv[:, 0] < w - 8).all() and (sel_uv[:, 1] < h - 8).all()
    # raster order: cell indices strictly increasing
    cells = np.asarray(kps.cell[:n])
    assert (np.diff(cells) > 0).all()
    # occ_grid consistency: cell -> index -> cell round trip
    occ = np.asarray(kps.occ_grid)
    for i, c in enumerate(cells):
        assert occ[c // wc, c % wc] == i
    assert (occ >= 0).sum() == n
    # validity mask
    assert np.asarray(kps.valid).sum() == n


def test_emission_lowerings_agree():
    """The sort-based raster emission == the scatter emission exactly, on
    every output field, across random inputs (both lowerings selectable
    via select_keypoints(emission=...))."""
    rng = np.random.default_rng(11)
    hc, wc = 15, 20
    h, w = hc * 8, wc * 8
    for trial in range(3):
        score = rng.random((hc, wc), dtype=np.float32)
        du = rng.integers(0, 8, (hc, wc))
        dv = rng.integers(0, 8, (hc, wc))
        uv = np.stack([np.arange(wc)[None, :] * 8 + du,
                       np.arange(hc)[:, None] * 8 + dv], -1).astype(np.int32)
        valid = score > 0.15
        kw = dict(num_features=50, max_keypoints=64, image_hw=(h, w),
                  nms_iters=32)
        a = nms_ops.select_keypoints(jnp.asarray(score), jnp.asarray(uv),
                                     jnp.asarray(valid),
                                     emission="scatter", **kw)
        b = nms_ops.select_keypoints(jnp.asarray(score), jnp.asarray(uv),
                                     jnp.asarray(valid),
                                     emission="sort", **kw)
        assert int(a.count) == int(b.count)
        n = int(a.count)
        np.testing.assert_array_equal(np.asarray(a.uv[:n]),
                                      np.asarray(b.uv[:n]))
        np.testing.assert_array_equal(np.asarray(a.score[:n]),
                                      np.asarray(b.score[:n]))
        np.testing.assert_array_equal(np.asarray(a.cell), np.asarray(b.cell))
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        np.testing.assert_array_equal(np.asarray(a.occ_grid),
                                      np.asarray(b.occ_grid))


def test_covariance_matches_bfs():
    rng = np.random.default_rng(9)
    h, w = 64, 64
    heat_inv = rng.random((h, w), dtype=np.float32)
    # carve an actual peak structure so flood fills are non-trivial
    yy, xx = np.mgrid[0:h, 0:w]
    for cx, cy in [(20, 20), (40, 35)]:
        heat_inv += 2.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 18.0).astype(np.float32)
    heat_inv /= heat_inv.max()
    uv = np.array([[20, 20], [40, 35], [10, 50]], np.float32)
    valid = np.array([True, True, True])
    cov2, cov2_inv, resp = cov_ops.keypoint_covariance(
        jnp.asarray(heat_inv), jnp.asarray(uv), jnp.asarray(valid),
        radius=8, iters=24)
    # exact match against the window-bounded golden BFS
    ref_cov2, ref_inv, ref_resp = cov_ops.covariance_reference(
        heat_inv, uv, valid, radius=8)
    np.testing.assert_allclose(np.asarray(resp), ref_resp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov2), ref_cov2, rtol=1e-5)
    # loose agreement with the reference's *unbounded* BFS on peaked points
    unb_cov2, _, _ = cov_ops.covariance_reference(heat_inv, uv, valid)
    np.testing.assert_allclose(np.asarray(cov2[:2]), unb_cov2[:2], rtol=0.1)
    assert (np.asarray(cov2) >= 1.0).all()


def test_extract_end_to_end(params, images):
    feats = jax.jit(
        lambda im: extract(params, im, num_features=100, max_keypoints=128)
    )(jnp.asarray(images))
    assert feats.uv.shape == (2, 128, 2)
    assert feats.desc.shape == (2, 128, 256)
    for b in range(2):
        n = int(feats.count[b])
        assert n > 0
        d = np.asarray(feats.desc[b, :n])
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
        assert (np.asarray(feats.cov2[b]) >= 1.0).all()


def test_dense_covariance_matches_windowed():
    """The dense label-propagation covariance agrees with the per-keypoint
    windowed fill on peaked maps (exact responses; covariances differ only
    through exclusive basin ownership at boundaries)."""
    rng = np.random.default_rng(11)
    h, w, cell = 96, 128, 8
    hc, wc = h // cell, w // cell
    inner = [r * wc + c for r in range(2, hc - 2) for c in range(2, wc - 2)]
    n_kp = 30
    cells = rng.choice(inner, n_kp, replace=False)
    uv = np.stack([(cells % wc) * 8 + rng.integers(2, 6, n_kp),
                   (cells // wc) * 8 + rng.integers(2, 6, n_kp)],
                  -1).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    heat = rng.random((h, w)).astype(np.float32) * 0.05
    for (u, v) in uv:
        heat += np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / 6.0).astype(np.float32)
    heat /= heat.max()
    occ = np.full((hc, wc), -1, np.int32)
    for k, (u, v) in enumerate(uv):
        occ[int(v) // 8, int(u) // 8] = k
    valid = np.ones(n_kp, bool)
    c_win, _, r_win = cov_ops.keypoint_covariance(
        jnp.asarray(heat), jnp.asarray(uv), jnp.asarray(valid),
        radius=8, iters=16)
    c_den, _, r_den = cov_ops.dense_covariance(
        jnp.asarray(heat), jnp.asarray(occ), jnp.asarray(uv),
        jnp.asarray(valid), iters=16)
    np.testing.assert_allclose(np.asarray(r_den), np.asarray(r_win), atol=1e-6)
    rel = np.abs(np.asarray(c_den) - np.asarray(c_win)) / np.asarray(c_win)
    assert np.median(rel) < 0.1, np.median(rel)
    assert (np.asarray(c_den) >= 1.0).all()


def test_pallas_covariance_matches_windowed():
    """The fused Pallas kernel (interpret mode on CPU) is numerically
    identical to the XLA windowed fill — which is itself golden-tested
    against the reference BFS above."""
    from jax.experimental.pallas import tpu as pltpu

    from sp_orb_slam_tpu.ops import pallas_cov

    B, H, W, K = 2, 96, 128, 64
    rng = np.random.default_rng(11)
    heat = jnp.asarray(rng.random((B, H, W), np.float32))
    uv = jnp.asarray(np.stack([rng.integers(8, W - 8, (B, K)),
                               rng.integers(8, H - 8, (B, K))],
                              -1).astype(np.float32))
    valid = jnp.asarray(rng.random((B, K)) > 0.2)

    with pltpu.force_tpu_interpret_mode():
        c_p, ci_p, r_p = pallas_cov.pallas_covariance(
            heat, uv, valid, radius=8, iters=16)
    c_w, ci_w, r_w = jax.vmap(
        partial(cov_ops.keypoint_covariance, radius=8, iters=16)
    )(heat, uv, valid)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_w),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_w),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ci_p), np.asarray(ci_w),
                               rtol=1e-5, atol=1e-6)


def test_pallas_nms_matches_golden():
    """The Pallas NMS kernel (interpret mode on CPU) equals both the XLA
    fixed point and the sequential golden greedy NMS, including exact-score
    tie-breaks by raster index."""
    from jax.experimental.pallas import tpu as pltpu

    from sp_orb_slam_tpu.ops import pallas_nms

    rng = np.random.default_rng(7)
    B, hc, wc = 2, 60, 94
    score = rng.random((B, hc, wc)).astype(np.float32)
    u = (np.arange(wc)[None, None, :] * 8
         + rng.integers(0, 8, (B, hc, wc))).astype(np.int32)
    v = (np.arange(hc)[None, :, None] * 8
         + rng.integers(0, 8, (B, hc, wc))).astype(np.int32)
    uv = np.stack([u, v], -1)
    valid = rng.random((B, hc, wc)) < 0.5
    score[valid] = np.round(score[valid] * 50) / 50  # force score ties

    with pltpu.force_tpu_interpret_mode():
        alive_p = np.asarray(pallas_nms.batched_grid_nms(
            jnp.asarray(score), jnp.asarray(uv), jnp.asarray(valid),
            dist=4, iters=16))
    alive_x = np.asarray(jax.vmap(
        partial(nms_ops.greedy_grid_nms, dist=4, iters=16)
    )(jnp.asarray(score), jnp.asarray(uv), jnp.asarray(valid)))
    gold = np.stack([nms_ops.greedy_grid_nms_reference(
        score[b], uv[b], valid[b], dist=4) for b in range(B)])
    assert np.array_equal(alive_p, alive_x)
    assert np.array_equal(alive_p, gold)


def test_dense_descriptor_sampling_matches_gather(params, images):
    """sample_descriptors_dense (the TPU stencil reformulation) must be
    bit-compatible with the per-keypoint gather path at every cell's
    candidate keypoint."""
    out = superpoint.forward(params, jnp.asarray(images))
    b = 0
    dense = superpoint.sample_descriptors_dense(
        out.coarse_desc[b], out.cand_uv[b], (H, W))
    hc, wc = H // 8, W // 8
    rng = np.random.default_rng(3)
    cells = rng.integers(0, hc * wc, 64)
    kuv = np.asarray(out.cand_uv[b]).reshape(-1, 2)[cells].astype(np.float32)
    ref = superpoint.sample_descriptors(out.coarse_desc[b],
                                        jnp.asarray(kuv), (H, W))
    got = np.asarray(dense).reshape(-1, dense.shape[-1])[cells]
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6)


def test_extract_desc_methods_agree(params, images):
    """extract(desc_method='dense') == extract(desc_method='gather')."""
    from sp_orb_slam_tpu.extractor import extract

    a = extract(params, jnp.asarray(images), num_features=60,
                max_keypoints=64, desc_method="gather")
    b = extract(params, jnp.asarray(images), num_features=60,
                max_keypoints=64, desc_method="dense")
    np.testing.assert_array_equal(np.asarray(a.uv), np.asarray(b.uv))
    np.testing.assert_allclose(np.asarray(a.desc), np.asarray(b.desc),
                               atol=1e-6)


@pytest.mark.parametrize("packing", ["s2d", "s2d2", "s2d3"])
def test_s2d_conv_packing_matches_standard(params, images, packing):
    """The space-to-depth pair repacking (superpoint._pack_pair) must be
    numerically equivalent to the standard conv-conv-maxpool pairs at
    every packing depth."""
    a = superpoint.forward(params, jnp.asarray(images))
    b = superpoint.forward(params, jnp.asarray(images), conv_packing=packing)
    np.testing.assert_allclose(np.asarray(a.score), np.asarray(b.score),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.semi_dust),
                               np.asarray(b.semi_dust), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.coarse_desc),
                               np.asarray(b.coarse_desc), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.cand_uv),
                                  np.asarray(b.cand_uv))


def test_heat_shuffle_slices_matches_transpose(params, images):
    """The channel-slice pixel-shuffle formulation (round-4 tail work) must
    be bit-identical to the 5D-transpose one."""
    a = superpoint.forward(params, jnp.asarray(images), with_heat=True,
                           heat_shuffle="transpose")
    b = superpoint.forward(params, jnp.asarray(images), with_heat=True,
                           heat_shuffle="slices")
    np.testing.assert_array_equal(np.asarray(a.heat_inv),
                                  np.asarray(b.heat_inv))
    np.testing.assert_array_equal(np.asarray(a.heat), np.asarray(b.heat))
