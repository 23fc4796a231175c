"""Multi-chip stream-data-parallel path (sp_orb_slam_tpu/parallel/mesh.py).

The reference is single-GPU (SURVEY.md §2.7); our scale-out axis is
data-parallel streams over a jax.sharding Mesh.  These tests run the sharded
step on the 8 virtual CPU devices provisioned by conftest and assert it is
numerically identical to the unsharded step — sharding must be a pure layout
decision, never a semantics change.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sp_orb_slam_tpu.models import superpoint
from sp_orb_slam_tpu.parallel import mesh as pmesh


def _toy_inputs(rng, B, H=64, W=96, K=128, P=128):
    images = jnp.asarray(rng.random((B, H, W), np.float32))
    prev_desc = jnp.asarray(rng.random((B, K, 256), np.float32))
    prev_desc = prev_desc / jnp.linalg.norm(prev_desc, axis=-1, keepdims=True)
    prev_uv = jnp.asarray(rng.random((B, K, 2), np.float32) * 64)
    prev_valid = jnp.ones((B, K), bool)
    Tcw = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    mp_pos = jnp.asarray(
        np.stack([rng.uniform(-1, 1, (B, P)), rng.uniform(-1, 1, (B, P)),
                  rng.uniform(2, 6, (B, P))], -1), jnp.float32)
    mp_valid = jnp.ones((B, P), bool)
    K_intr = jnp.array([80.0, 80.0, 48.0, 32.0], jnp.float32)
    return (images, prev_desc, prev_uv, prev_valid, Tcw, mp_pos, mp_valid,
            K_intr)


def test_make_mesh_cpu_fleet():
    mesh = pmesh.make_mesh(8, platform="cpu")
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("stream",)


def test_sharded_step_matches_unsharded(rng):
    mesh = pmesh.make_mesh(8, platform="cpu")
    params = superpoint.init_params(jax.random.PRNGKey(0))
    inputs = _toy_inputs(rng, B=8)

    step = pmesh.build_sharded_step(mesh, num_features=100, max_keypoints=128)
    with mesh:
        feats_s, match_s, nmatch_s, Tcw_s, ninl_s = step(params, *inputs)
    # outputs really live sharded over the stream axis
    assert len(Tcw_s.sharding.device_set) == 8

    feats_u, match_u, nmatch_u, Tcw_u, ninl_u = jax.jit(
        lambda p, *a: pmesh.multi_stream_step(
            p, *a, num_features=100, max_keypoints=128))(params, *inputs)

    np.testing.assert_array_equal(np.asarray(match_s), np.asarray(match_u))
    np.testing.assert_array_equal(np.asarray(nmatch_s), np.asarray(nmatch_u))
    np.testing.assert_allclose(np.asarray(Tcw_s), np.asarray(Tcw_u),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ninl_s), np.asarray(ninl_u))
    np.testing.assert_allclose(np.asarray(feats_s.uv), np.asarray(feats_u.uv),
                               rtol=0, atol=1e-4)


def test_sharded_step_streams_independent(rng):
    """Permuting streams permutes outputs: no cross-stream leakage through
    the sharded program (the DP axis must be embarrassingly parallel)."""
    mesh = pmesh.make_mesh(8, platform="cpu")
    params = superpoint.init_params(jax.random.PRNGKey(0))
    inputs = _toy_inputs(rng, B=8)
    perm = np.asarray([3, 1, 4, 0, 7, 5, 2, 6])
    permuted = tuple(a[perm] if a.ndim and a.shape[0] == 8 else a
                     for a in inputs)

    step = pmesh.build_sharded_step(mesh, num_features=100, max_keypoints=128)
    with mesh:
        _, match_a, _, Tcw_a, _ = step(params, *inputs)
        _, match_b, _, Tcw_b, _ = step(params, *permuted)
    np.testing.assert_array_equal(np.asarray(match_a)[perm],
                                  np.asarray(match_b))
    np.testing.assert_allclose(np.asarray(Tcw_a)[perm], np.asarray(Tcw_b),
                               rtol=0, atol=1e-5)


def test_mapper_batches_shard_over_mesh(rng):
    """The mapper's batched triangulate/fuse chunks (kernels.call_rows)
    shard over the stream mesh when the chunk width divides it, and the
    sharded results equal the unsharded ones row-for-row."""
    from jax.sharding import NamedSharding

    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.slam.kernels import TrackingKernels

    cfg = _merge_dataclass(Config(), {
        "camera": {"width": 96, "height": 64, "fx": 80.0, "fy": 80.0,
                   "cx": 48.0, "cy": 32.0, "fps": 20.0},
        "tracking": {"num_features": 60},
        "runtime": {"max_keypoints": 64, "dust_points_cap": 64,
                    "local_points_cap": 128},
    })
    kernels = TrackingKernels(cfg)
    K = cfg.runtime.max_keypoints

    def tri_row(i):
        T2 = np.eye(4, dtype=np.float32)
        T2[0, 3] = 0.3 + 0.05 * i
        uv1 = rng.uniform(8, 88, (K, 2)).astype(np.float32)
        uv2 = uv1 + rng.uniform(-2, 2, (K, 2)).astype(np.float32)
        d = rng.normal(size=(K, 256)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        cov = np.ones((K, 2), np.float32)
        free = np.ones(K, bool)
        return (np.eye(4, dtype=np.float32), T2, uv1, d, cov, free,
                uv2, d, cov, free)

    rows = [tri_row(i) for i in range(8)]
    plain = kernels.triangulate_pair_batch(rows)
    assert kernels._tri.last_batch_placement["sharded"] is False

    mesh = pmesh.make_mesh(8, platform="cpu")
    kernels.batch_sharding = NamedSharding(
        mesh, jax.sharding.PartitionSpec("stream"))
    sharded = kernels.triangulate_pair_batch(rows)
    pl = kernels._tri.last_batch_placement
    assert pl["sharded"] and pl["out"].spec[0] == "stream"
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(a["match21"], b["match21"])
        np.testing.assert_allclose(a["points"], b["points"], atol=1e-5)
        np.testing.assert_array_equal(a["good"], b["good"])
    # a width-2 chunk does not divide the mesh: must fall back, not crash
    kernels.triangulate_pair_batch(rows[:2])
    assert kernels._tri.last_batch_placement["sharded"] is False
