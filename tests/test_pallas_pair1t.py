"""Golden tests for the transposed-layout fused first-conv-pair kernel
(ops/pallas_pair1t.py) against the stock XLA pair (reference semantics:
conv1a/relu/conv1b/relu/maxpool2, src/cv/sp_extractor.cpp:81-86).

Runs in interpret mode on the CPU backend (conftest pins tests to CPU);
the same kernel compiles on TPU via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_orb_slam_tpu.models import superpoint
from sp_orb_slam_tpu.models.superpoint import _conv, _maxpool2
from sp_orb_slam_tpu.ops import pallas_pair1t


def _stock_pair_bf16(params, images):
    x = images[..., None].astype(jnp.bfloat16)
    x = _conv(x, params["conv1a"])
    x = _conv(x, params["conv1b"])
    return _maxpool2(x)


@pytest.mark.parametrize("tp", [4, 8])
@pytest.mark.parametrize("shape", [(2, 64, 96), (1, 480, 752), (1, 48, 640)])
def test_fused_pair1t_matches_stock_bf16(shape, tp):
    B, H, W = shape
    if H % (2 * tp):
        pytest.skip("H not divisible by tile height")
    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((B, H, W), np.float32))

    want = np.asarray(_stock_pair_bf16(params, images), np.float32)
    got = np.asarray(
        pallas_pair1t.fused_pair1t(images, params, interpret=True, tp=tp),
        np.float32)
    assert got.shape == want.shape == (B, H // 2, W // 2, 64)
    # both paths: bf16 operands, f32 accumulate, f32 bias+relu, bf16 store;
    # only f32 accumulation order differs -> at most 1-2 bf16 ulp apart
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.02)
    # and the overwhelming majority must be bit-identical
    assert (got == want).mean() > 0.95


def test_forward_pair1t_matches_forward():
    params = superpoint.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.random((1, 120, 160), np.float32))
    a = superpoint.forward(params, images, compute_dtype=jnp.bfloat16)
    b = superpoint.forward(params, images, compute_dtype=jnp.bfloat16,
                           conv_packing="pair1t")
    np.testing.assert_allclose(np.asarray(a.score), np.asarray(b.score),
                               atol=0.02)
    # candidate grids from the two paths agree almost everywhere (bf16
    # rounding can flip an in-cell argmax tie)
    same = (np.asarray(a.cand_uv) == np.asarray(b.cand_uv)).mean()
    assert same > 0.98
