"""The full learned feature extractor: one jitted, batched TPU program.

Equivalent capability to SPExtractor::operator() (src/cv/sp_extractor.cpp:
361-514): frontend forward + score sort + grid NMS + occ_grid + covariance +
descriptors, but fused into a single XLA program over a stream batch, with no
host round-trips (the reference does 1 upload + 6 downloads per frame,
sp_extractor.cpp:379,427-433; we return one device struct the SLAM core
consumes, and only the scalar bookkeeping ever reaches the host).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sp_orb_slam_tpu.config import Config
from sp_orb_slam_tpu.models import superpoint
from sp_orb_slam_tpu.ops import covariance as cov_ops
from sp_orb_slam_tpu.ops import nms as nms_ops


class Features(NamedTuple):
    """Per-frame learned features, fixed capacity K, batched over streams B."""

    uv: jnp.ndarray          # (B, K, 2) float32 keypoint pixel coords
    score: jnp.ndarray       # (B, K)
    response: jnp.ndarray    # (B, K) heat_inv at the keypoint
    valid: jnp.ndarray       # (B, K) bool
    desc: jnp.ndarray        # (B, K, 256) unit descriptors
    cov2: jnp.ndarray        # (B, K, 2)
    cov2_inv: jnp.ndarray    # (B, K, 2)
    occ_grid: jnp.ndarray    # (B, hc, wc) int32 kp index per cell, -1 empty
    dense_dust: jnp.ndarray  # (B, hc, wc) dustbin probability (the dust map)
    semi_dust: jnp.ndarray   # (B, hc, wc) dustbin logits
    heat: jnp.ndarray        # (B, H, W) normalized heat ("coldness")
    heat_inv: jnp.ndarray    # (B, H, W) 1 - heat
    count: jnp.ndarray       # (B,) int32


def extract(params, images: jnp.ndarray, *, num_features: int,
            max_keypoints: int, conf_thresh: float = 0.007,
            nms_dist: int = 4, border: int = 8, nms_iters: int = 16,
            cov_radius: int = 8, cov_iters: int = 16,
            cov_method: str = "auto", nms_method: str = "auto",
            desc_method: str = "auto", conv_packing: str = "auto",
            with_heat: bool = False, with_heat_inv: bool = True,
            emission: str = "sort", heat_shuffle: str = "slices",
            compute_dtype=jnp.float32) -> Features:
    """images: (B, H, W) float32 in [0, 1].

    `with_heat=False` (default) skips the full-res `heat` output — only the
    heat-alignment coarse-tracker variant reads it (a (B, H, W) f32 output
    is ~46 MB per 32-image batch; measured perf-neutral, kept off for the
    memory).  `with_heat_inv=False` additionally drops `heat_inv` from the
    RETURNED Features (it is still computed in-graph when the covariance
    stage consumes it): nothing downstream of the extractor reads it, and
    keeping a dead 46 MB/batch program output costs a measured ~1.2
    ms/batch at B=32 (round-4 profile_cov_r4c).  Production call sites
    (bench, fleet, System) pass False; the default stays True for the
    golden tests and ad-hoc inspection.
    """
    if cov_radius > border:
        # keypoint_covariance gathers a (2r+1)^2 window centered on the
        # keypoint; the border filter is what guarantees the window never
        # clips (a clipped window silently de-centers the flood-fill seed
        # and reads the wrong response pixel)
        raise ValueError(f"cov_radius ({cov_radius}) must be <= border "
                         f"({border})")
    B, H, W = images.shape
    if conv_packing == "auto":
        # fused transposed-layout Pallas pair-1 kernel on the TPU bf16
        # path: 45.1 -> 36.3 ms/batch at B=32 752x480 (round 3); interpret
        # mode would only slow the CPU path down, and the kernel needs
        # 8-row tiles / column parity
        conv_packing = ("pair1t" if (compute_dtype == jnp.bfloat16
                                     and jax.default_backend() == "tpu"
                                     and H % 8 == 0 and W % 2 == 0)
                        else "none")
    if cov_method == "auto":
        cov_method = ("pallas" if jax.default_backend() == "tpu"
                      else "windowed")
    out = superpoint.forward(params, images, conf_thresh=conf_thresh,
                             conv_packing=conv_packing,
                             with_heat=with_heat,
                             with_heat_inv=(with_heat_inv
                                            or cov_method != "none"),
                             heat_shuffle=heat_shuffle,
                             compute_dtype=compute_dtype)

    if nms_method == "auto":
        nms_method = ("pallas" if jax.default_backend() == "tpu"
                      else "xla")
    if nms_method == "pallas":
        from sp_orb_slam_tpu.ops import pallas_nms

        alive = pallas_nms.batched_grid_nms(
            out.score, out.cand_uv, out.cand_valid, dist=nms_dist,
            iters=nms_iters)
    else:
        alive = jax.vmap(partial(nms_ops.greedy_grid_nms, dist=nms_dist,
                                 iters=nms_iters)
                         )(out.score, out.cand_uv, out.cand_valid)
    kps = jax.vmap(
        lambda s, cu, cv, al: nms_ops.select_keypoints(
            s, cu, cv, num_features=num_features,
            max_keypoints=max_keypoints, image_hw=(H, W), dist=nms_dist,
            border=border, nms_iters=nms_iters, alive=al,
            emission=emission)
    )(out.score, out.cand_uv, out.cand_valid, alive)

    if desc_method == "auto":
        # measured on v5e (scripts/profile_r3.py, round 3): the 4-corner
        # gather beats the dense 9-tap stencil in-graph (45.4 vs 48.5
        # ms/batch at B=32) — the stencil pays descriptor math for all
        # 5640 cells where only ~800 emit — AND the sparse Pallas gather
        # (44.9 vs 50.0 in round 3c: Mosaic's 8-row sublane alignment
        # forces each bilinear row pair through an aligned 16-row load +
        # masked reduce, and the per-keypoint loop can't amortize it);
        # "dense"/"pallas"/"pallas_sparse" stay available
        desc_method = "gather"
    if desc_method in ("dense", "pallas"):
        # stencil-sample every cell's candidate, then pick each surviving
        # keypoint's own cell row (keypoint uv == its cell's candidate uv,
        # so the values are bit-identical to the gather path)
        if desc_method == "pallas":
            from sp_orb_slam_tpu.ops import pallas_desc

            dense = pallas_desc.pallas_sample_descriptors_dense(
                out.coarse_desc, out.cand_uv, image_hw=(H, W),
                interpret=jax.default_backend() != "tpu")
        else:
            dense = jax.vmap(partial(superpoint.sample_descriptors_dense,
                                     image_hw=(H, W)))(out.coarse_desc,
                                                       out.cand_uv)
        hc, wc = H // 8, W // 8
        cy = jnp.clip(kps.uv[..., 1].astype(jnp.int32) // 8, 0, hc - 1)
        cx = jnp.clip(kps.uv[..., 0].astype(jnp.int32) // 8, 0, wc - 1)
        rows = cy * wc + cx
        desc = jnp.take_along_axis(
            dense.reshape(B, hc * wc, -1), rows[..., None], axis=1)
    elif desc_method == "pallas_sparse":
        # per-keypoint dynamic VMEM gather (the row-pick folded into the
        # kernel); exact sample_descriptors math, no XLA row gather
        from sp_orb_slam_tpu.ops import pallas_desc

        desc = pallas_desc.pallas_sample_descriptors_sparse(
            out.coarse_desc, kps.uv, image_hw=(H, W),
            interpret=jax.default_backend() != "tpu")
    else:
        desc = jax.vmap(partial(superpoint.sample_descriptors,
                                image_hw=(H, W)))(out.coarse_desc, kps.uv)
    desc = jnp.where(kps.valid[..., None], desc, 0.0)

    if cov_method == "none":
        # ablation hook for stage profiling (scripts/profile_r3.py): unit
        # covariance, response = 0
        ones = jnp.ones(kps.uv.shape[:-1] + (2,), jnp.float32)
        cov2, cov2_inv = ones, ones
        response = jnp.zeros(kps.uv.shape[:-1], jnp.float32)
    elif cov_method == "pallas":
        from sp_orb_slam_tpu.ops import pallas_cov

        cov2, cov2_inv, response = pallas_cov.pallas_covariance(
            out.heat_inv, kps.uv, kps.valid, radius=cov_radius,
            iters=cov_iters)
    elif cov_method == "dense":
        cov2, cov2_inv, response = jax.vmap(
            partial(cov_ops.dense_covariance, iters=cov_iters)
        )(out.heat_inv, kps.occ_grid, kps.uv, kps.valid)
    else:
        cov2, cov2_inv, response = jax.vmap(
            partial(cov_ops.keypoint_covariance, radius=cov_radius,
                    iters=cov_iters)
        )(out.heat_inv, kps.uv, kps.valid)

    return Features(kps.uv, kps.score, response, kps.valid, desc, cov2,
                    cov2_inv, kps.occ_grid, out.dense_dust, out.semi_dust,
                    out.heat, out.heat_inv if with_heat_inv else None,
                    kps.count)


def make_extractor(cfg: Config, params):
    """Build the jitted extractor closure for a config's operating point."""
    ex = cfg.extractor
    dtype = jnp.bfloat16 if ex.dtype == "bfloat16" else jnp.float32

    @jax.jit
    def run(images):
        return extract(
            params, images,
            num_features=cfg.tracking.num_features,
            max_keypoints=cfg.runtime.max_keypoints,
            conf_thresh=ex.conf_thresh, nms_dist=ex.nms_dist,
            border=ex.border, nms_iters=ex.nms_iters,
            cov_radius=ex.cov_window, cov_iters=ex.cov_iters,
            cov_method=ex.cov_method, nms_method=ex.nms_method,
            desc_method=ex.desc_method, conv_packing=ex.conv_packing,
            with_heat=(cfg.tracking.coarse_method == "heat"),
            with_heat_inv=False,  # no production consumer (see extract doc)
            compute_dtype=dtype)

    return run
