"""Golden tests for the Pallas dense descriptor-sampling kernel
(ops/pallas_desc.py) against the XLA stencil and the per-keypoint gather
(reference semantics: grid_sampler_2d align_corners=True + renormalize,
src/cv/sp_extractor.cpp:134-148).

Runs in interpret mode on the CPU backend (the conftest pins tests to CPU);
the same kernel code compiles on TPU via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_orb_slam_tpu.models import superpoint
from sp_orb_slam_tpu.ops import pallas_desc


def _random_case(key, B, H, W, D=256):
    hc, wc = H // 8, W // 8
    kc, ku = jax.random.split(key)
    coarse = jax.random.normal(kc, (B, hc, wc, D), jnp.float32)
    coarse = coarse / jnp.linalg.norm(coarse, axis=-1, keepdims=True)
    # candidate uv: each cell's candidate lies inside the cell (the in-cell
    # argmax), like forward() produces
    dy = jax.random.randint(ku, (B, hc, wc), 0, 8)
    dx = jax.random.randint(jax.random.fold_in(ku, 1), (B, hc, wc), 0, 8)
    ci = jnp.arange(hc)[None, :, None] * 8
    cj = jnp.arange(wc)[None, None, :] * 8
    cand_uv = jnp.stack([cj + dx, ci + dy], axis=-1).astype(jnp.float32)
    return coarse, cand_uv


@pytest.mark.parametrize("shape", [(2, 480, 752), (1, 64, 64), (3, 120, 160)])
def test_pallas_matches_xla_dense(shape):
    B, H, W = shape
    coarse, cand_uv = _random_case(jax.random.PRNGKey(0), B, H, W)
    want = jax.vmap(
        lambda c, u: superpoint.sample_descriptors_dense(c, u, (H, W))
    )(coarse, cand_uv)
    got = pallas_desc.pallas_sample_descriptors_dense(
        coarse, cand_uv, image_hw=(H, W), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_pallas_matches_gather_at_candidates():
    """At each cell's own candidate the dense map must equal the gather
    path (the extractor's emission picks exactly these rows)."""
    B, H, W = 1, 128, 160
    hc, wc = H // 8, W // 8
    coarse, cand_uv = _random_case(jax.random.PRNGKey(1), B, H, W)
    dense = pallas_desc.pallas_sample_descriptors_dense(
        coarse, cand_uv, image_hw=(H, W), interpret=True)
    uv = cand_uv.reshape(B, hc * wc, 2)
    want = jax.vmap(
        lambda c, u: superpoint.sample_descriptors(c, u, (H, W))
    )(coarse, uv)
    np.testing.assert_allclose(np.asarray(dense.reshape(B, hc * wc, -1)),
                               np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 480, 752), (1, 64, 64)])
def test_pallas_sparse_matches_gather(shape):
    """The sparse per-keypoint kernel == sample_descriptors on arbitrary
    in-border keypoints (any sub-cell position, not just candidates)."""
    B, H, W = shape
    K = 128
    coarse, _ = _random_case(jax.random.PRNGKey(4), B, H, W)
    ku1, ku2 = jax.random.split(jax.random.PRNGKey(5))
    uv = jnp.stack([jax.random.uniform(ku1, (B, K), minval=8.0,
                                       maxval=W - 8.0),
                    jax.random.uniform(ku2, (B, K), minval=8.0,
                                       maxval=H - 8.0)], axis=-1)
    want = jax.vmap(
        lambda c, u: superpoint.sample_descriptors(c, u, (H, W))
    )(coarse, uv)
    got = pallas_desc.pallas_sample_descriptors_sparse(
        coarse, uv, image_hw=(H, W), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_extract_pallas_sparse_matches_gather():
    """extract(desc_method='pallas_sparse') == extract(desc_method='gather')
    on every valid slot."""
    from sp_orb_slam_tpu.extractor import extract

    params = superpoint.init_params(jax.random.PRNGKey(6))
    rng = np.random.default_rng(2)
    images = rng.random((2, 120, 160), np.float32)
    a = extract(params, jnp.asarray(images), num_features=60,
                max_keypoints=64, desc_method="gather")
    b = extract(params, jnp.asarray(images), num_features=60,
                max_keypoints=64, desc_method="pallas_sparse")
    np.testing.assert_array_equal(np.asarray(a.uv), np.asarray(b.uv))
    np.testing.assert_allclose(np.asarray(a.desc), np.asarray(b.desc),
                               atol=1e-5)


def test_extract_pallas_desc_matches_gather():
    """extract(desc_method='pallas') == extract(desc_method='gather')."""
    from sp_orb_slam_tpu.extractor import extract

    params = superpoint.init_params(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    images = rng.random((2, 120, 160), np.float32)
    a = extract(params, jnp.asarray(images), num_features=60,
                max_keypoints=64, desc_method="gather")
    b = extract(params, jnp.asarray(images), num_features=60,
                max_keypoints=64, desc_method="pallas")
    np.testing.assert_array_equal(np.asarray(a.uv), np.asarray(b.uv))
    np.testing.assert_allclose(np.asarray(a.desc), np.asarray(b.desc),
                               atol=1e-5)
