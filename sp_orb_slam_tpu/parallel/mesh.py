"""Multi-chip scale-out: data-parallel stream batching over a device mesh.

The reference is a single-process, single-GPU system (SURVEY.md section
2.7) — there is no model parallelism to reproduce.  The TPU-native scaling
axis is throughput: batch many independent camera streams (or sequence
chunks for offline mapping) through the extractor + matcher + pose solves,
sharded data-parallel across chips over ICI via `jax.sharding`.  Weights
replicate; per-stream state shards on the leading axis; no collectives are
needed in steady state (XLA inserts the broadcast for the replicated
params), so scaling is embarrassingly linear.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sp_orb_slam_tpu.extractor import extract
from sp_orb_slam_tpu.ops import matching
from sp_orb_slam_tpu.optim import pose as pose_opt


def make_mesh(n_devices: Optional[int] = None, axis: str = "stream",
              platform: Optional[str] = None) -> Mesh:
    """Build a 1-D stream mesh.  `platform` pins the device fleet (e.g.
    "cpu" for the driver's virtual-device dry run — the accelerator client
    over the axon tunnel may be a single chip or version-mismatched, so the
    caller must be able to avoid it entirely)."""
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n and platform is None:
        # the accelerator fleet is smaller than requested (e.g. one chip via
        # the axon tunnel): fall back to the virtual CPU device fleet
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def multi_stream_step(params, images, prev_desc, prev_uv, prev_valid,
                      Tcw_pred, mp_pos, mp_valid, K_intr, *,
                      num_features: int, max_keypoints: int,
                      compute_dtype=jnp.bfloat16):
    """One full per-stream VO compute step, batched over streams:
    extraction -> descriptor matching vs the previous frame -> pose-only
    Gauss-Newton refinement.  This is the unit that shards over the mesh.
    """
    feats = extract(params, images, num_features=num_features,
                    max_keypoints=max_keypoints, compute_dtype=compute_dtype)

    def match_one(desc, uv, valid, pdesc, puv, pvalid):
        m = matching.search_for_initialization(
            pdesc, pvalid, puv, desc, uv, valid, window=100, ratio=0.9)
        return m.match12, m.n_matches

    match12, n_matches = jax.vmap(match_one)(
        feats.desc, feats.uv, feats.valid, prev_desc, prev_uv, prev_valid)

    def solve_one(Tcw0, uv, cov2_inv, m12, Xw_prev, prev_ok):
        # m12: prev-kp index per prev keypoint row -> invert to per-current
        # pairing (Xw_prev holds the 3D point behind each *previous* kp)
        j = jnp.clip(m12, 0, None)
        has = (m12 >= 0) & prev_ok
        obs = uv[j]
        w = cov2_inv[j]
        res = pose_opt.pose_optimization(Tcw0, Xw_prev, obs, w, has, K_intr,
                                         rounds=2, iters=5)
        return res.Tcw, res.n_inlier

    Tcw, n_inlier = jax.vmap(solve_one)(
        Tcw_pred, feats.uv, feats.cov2_inv, match12, mp_pos, mp_valid)
    return feats, match12, n_matches, Tcw, n_inlier


def build_sharded_step(mesh: Mesh, *, num_features: int, max_keypoints: int,
                       axis: str = "stream"):
    """jit the multi-stream step with explicit shardings: batch dims shard
    over the mesh axis, params replicate."""
    batch = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    fn = partial(multi_stream_step, num_features=num_features,
                 max_keypoints=max_keypoints)
    return jax.jit(
        fn,
        in_shardings=(repl, batch, batch, batch, batch, batch, batch, batch,
                      repl),
        out_shardings=(batch, batch, batch, batch, batch),
    )
