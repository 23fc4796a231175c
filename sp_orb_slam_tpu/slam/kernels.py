"""Fused per-frame tracking programs (one XLA program, one packed readback).

The reference interleaves matcher loops, g2o solves, and bookkeeping on the
host (tracker.cpp, tracker_dust.cpp).  Over the TPU tunnel every
device->host readback costs ~25 ms, so each tracking stage here is a single
jitted program returning ONE flat float32 vector that the host unpacks:

- dust_track: PoseOptimizationDust -> occ-grid 2x2 patch association ->
  PoseOptimizationDustPost                (tracker_dust.cpp:22-228)
- motion_track: SearchByProjection vs last frame at radius th, retried at
  2*th when thin, + 4x10 PoseOptimization (tracker.cpp:480-559)
- ref_track: brute-force mutual-NN vs the reference KF + PoseOptimization
                                          (tracker.cpp:372-417)
- local_map_track: frustum + SearchByProjection vs the local map +
  PoseOptimization                        (tracker.cpp:561-832)
- init_match + two-view bootstrap         (mono_tracker.cpp:38-115)
- triangulate_pairs: per-neighbor-KF match + DLT + gates
                                          (local_mapper.cpp:558-791)
- fuse_into_kf: projection fuse candidates (sp_matcher.cpp:965-1104)

Conflict resolution is min-distance (order-independent) where the reference
is first-come sequential; documented in ops/matching.py.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sp_orb_slam_tpu.config import Config
from sp_orb_slam_tpu.geometry import twoview
from sp_orb_slam_tpu.geometry.triangulation import (depth_and_tau,
                                                    triangulate,
                                                    triangulation_gates)
from sp_orb_slam_tpu.ops import matching
from sp_orb_slam_tpu.optim import pose as pose_opt
from sp_orb_slam_tpu.utils.precision import jit_f32


# ---------------------------------------------------------------------------
# packed return helpers
# ---------------------------------------------------------------------------

class Layout:
    """Named flat-f32 packing: one device<->host transfer per kernel call."""

    def __init__(self, specs: List[Tuple[str, tuple, type]]):
        self.specs = specs
        self.sizes = [int(np.prod(s)) if s else 1 for _, s, _ in specs]
        self.total = sum(self.sizes)

    def pack(self, **arrays) -> jnp.ndarray:
        parts = []
        for name, shape, _ in self.specs:
            a = arrays[name]
            parts.append(jnp.ravel(a).astype(jnp.float32))
        return jnp.concatenate(parts)

    def unpack(self, flat: np.ndarray) -> dict:
        out = {}
        off = 0
        for (name, shape, dtype), size in zip(self.specs, self.sizes):
            chunk = flat[off:off + size]
            if shape:
                chunk = chunk.reshape(shape)
            else:
                chunk = chunk[0]
            if dtype is bool:
                chunk = chunk > 0.5
            elif dtype is int:
                chunk = np.rint(chunk).astype(np.int64)
            out[name] = chunk
            off += size
        return out

    # ---- input side (host -> device): the same packing, numpy-built ----

    def pack_np(self, arrays: dict) -> np.ndarray:
        """Host-side flat-f32 packing of input fields (exact: f32
        passthrough; bools as 0/1; ints by value — all in-range, every
        index here is < 2^24)."""
        out = np.empty(self.total, np.float32)
        off = 0
        for (name, shape, _), size in zip(self.specs, self.sizes):
            out[off:off + size] = np.ravel(
                np.asarray(arrays[name])).astype(np.float32, copy=False)
            off += size
        return out

    def unpack_jnp(self, flat: jnp.ndarray) -> dict:
        """In-graph unpacking (static slices — XLA folds them away)."""
        out = {}
        off = 0
        for (name, shape, dtype), size in zip(self.specs, self.sizes):
            chunk = flat[off:off + size]
            chunk = chunk.reshape(shape) if shape else chunk[0]
            if dtype is bool:
                chunk = chunk > 0.5
            elif dtype is int:
                # values are exact integers in f32 range; truncation == rint
                chunk = chunk.astype(jnp.int32)
            out[name] = chunk
            off += size
        return out


def _next_pow2_k(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class PreStacked:
    """Marks a device argument that is ALREADY stacked across a call_rows
    batch: the adapter uses `.array` (leading dim = batch rows) directly
    instead of jnp.stack-ing N per-row arrays — the per-row slices never
    exist, so a batched stage costs one dispatch for the whole fleet, not
    N slice dispatches + a stack.  Every row of the batch must carry the
    SAME PreStacked object at the same position (the fleet builds one per
    tick from the batched extraction output / the stacked descriptor
    banks)."""

    __slots__ = ("array",)

    def __init__(self, array):
        self.array = array


class BankRows:
    """Descriptor-argument placeholder for the fleet's bank-args mode:
    instead of a per-stream on-device row gather (one dispatch per stream
    per stage — the dominant per-tick dispatch count in the r5 fleet
    profile), the prep hands back the gather's INPUTS and the batched
    kernel computes `where(valid, bank[rows], 0)` in-graph.  The fleet
    converts: rows (host int32) takes the descriptor slot, the stacked
    banks ride along as one trailing PreStacked device arg."""

    __slots__ = ("rows", "valid", "bank")

    def __init__(self, rows, valid, bank):
        self.rows = rows
        self.valid = valid
        self.bank = bank


def _bank_variant(body_fn, desc_idx: int, valid_idx: int):
    """Wrap a kernel body so the descriptor argument at `desc_idx` is
    gathered in-graph: callers pass the bank-row indices (host int32) at
    `desc_idx` and append the device descriptor bank as the LAST
    argument."""

    def fn(*args):
        rows = args[desc_idx]
        bank = args[-1]
        valid = args[valid_idx]
        desc = jnp.where(valid[:, None], bank[rows], 0.0)
        inner = list(args[:-1])
        inner[desc_idx] = desc
        return body_fn(*inner)

    fn.__name__ = getattr(body_fn, "__name__", "body") + "_bank"
    return fn


class PackedInput:
    """One host->device transfer per kernel call.

    Over the axon tunnel each jit argument pays a flat per-buffer roundtrip
    (measured round 3c: local_map_track with its 8 numpy args cost
    ~300-960 ms/call while the kernel itself executes in ~29 ms and the
    same bytes move in ~8 ms as ONE buffer).  The output side already
    packs to a single f32 vector (Layout above); this is the mirror for
    inputs: every numpy argument is packed into one flat f32 buffer on the
    host and unpacked in-graph by static slices, while jax.Array arguments
    (device-resident descriptors/maps from extraction) pass straight
    through.

    The host/device split and the per-arg shapes/dtypes are keyed on the
    call pattern, so a caller that keeps e.g. the dust map on device and
    another that feeds numpy (the injected-feature rail) each get their own
    compiled program — exactly the recompile jit itself would do.
    """

    def __init__(self, body_fn):
        self._body = body_fn
        self._variants = {}  # host-index pattern -> (layout, jit, batch_jit)
        # diagnostics for the multi-chip dryrun: the shardings of the last
        # call_rows invocation's stacked inputs and packed output
        self.last_batch_placement = None

    def _variant(self, args, sharding=None):
        pattern = tuple(not isinstance(a, (jax.Array, PreStacked))
                        for a in args)
        specs = []
        for i, (a, h) in enumerate(zip(args, pattern)):
            if not h:
                continue
            a = np.asarray(a)
            if a.dtype == np.bool_:
                d = bool
            elif np.issubdtype(a.dtype, np.integer):
                d = int
            else:
                d = float
            specs.append((f"a{i}", a.shape, d))
        # host shapes/dtypes are part of the key: a same-split call with
        # different shapes needs its own layout (jit recompiles anyway).
        # The batch sharding participates too: the sharded batch program is
        # compiled with explicit in/out shardings (SPMD over the stream
        # axis), a different executable from the single-device one.
        key = (pattern, tuple((n, s, d) for n, s, d in specs), sharding)
        v = self._variants.get(key)
        if v is not None:
            return pattern, v
        layout = Layout(specs)
        body = self._body
        n_args = len(args)

        def assemble(packed, dev):
            host = layout.unpack_jnp(packed)
            it = iter(dev)
            return [host[f"a{i}"] if pattern[i] else next(it)
                    for i in range(n_args)]

        @jit_f32
        def one_fn(packed, *dev):
            return body(*assemble(packed, dev))

        def batch_body(packed, *dev):
            return jax.vmap(lambda p, *d: body(*assemble(p, d)))(
                packed, *dev)

        if sharding is None:
            batch_fn = jit_f32(batch_body)
        else:
            # every stacked arg (the packed host rows AND the stacked device
            # args) shards on its leading stream dim; the packed output
            # comes back stream-sharded so nothing gathers until the host
            # readback.  The vmapped body is row-independent, so GSPMD
            # partitions it with zero collectives.
            batch_fn = jit_f32(batch_body, in_shardings=sharding,
                               out_shardings=sharding)

        v = (layout, one_fn, batch_fn)
        self._variants[key] = v
        return pattern, v

    def _split(self, args, pattern, layout):
        hosts = {f"a{i}": a for i, a in enumerate(args) if pattern[i]}
        devs = [a for i, a in enumerate(args) if not pattern[i]]
        return layout.pack_np(hosts), devs

    def __call__(self, *args):
        assert not any(isinstance(a, PreStacked) for a in args), \
            "PreStacked args are call_rows-only"
        pattern, (layout, one_fn, _) = self._variant(args)
        packed, devs = self._split(args, pattern, layout)
        return one_fn(packed, *devs)

    def call_rows(self, rows, sharding=None):
        """Batched over a list of positional arg tuples (the fleet serving
        prepass): ONE stacked (N, L) f32 upload for every host arg of every
        row, device args jnp.stack'ed on-device, body vmapped.

        With `sharding` (a stream-axis NamedSharding), the stacked upload
        and the stacked device args are PLACED on the mesh and the batched
        program is compiled with explicit in/out shardings, so every batched
        tracking stage — not just extraction — runs SPMD across chips
        (VERDICT r4 weak #1).  Falls back to single-device when the row
        count does not divide the mesh (e.g. narrow mapper chunks)."""
        if sharding is not None and len(rows) % sharding.mesh.size != 0:
            sharding = None
        pattern, (layout, _, batch_fn) = self._variant(rows[0], sharding)
        packed = []
        devs_rows = []
        for r in rows:
            p, d = self._split(r, pattern, layout)
            packed.append(p)
            devs_rows.append(d)
        stacked = np.stack(packed)
        devs = []
        for i in range(len(devs_rows[0])):
            col = [dr[i] for dr in devs_rows]
            if isinstance(col[0], PreStacked):
                # one shared pre-stacked array for the whole batch: the
                # object must be row-identical (the fleet builds one per
                # tick) and already carries the batch's leading dim
                assert all(c is col[0] for c in col), \
                    "PreStacked arg must be the same object in every row"
                devs.append(col[0].array)
            else:
                devs.append(jnp.stack(col))
        if sharding is not None:
            stacked = jax.device_put(stacked, sharding)
            devs = [jax.device_put(d, sharding) for d in devs]
        out = batch_fn(stacked, *devs)
        self.last_batch_placement = {
            "n_rows": len(rows),
            "sharded": sharding is not None,
            "in": ([getattr(stacked, "sharding", None)]
                   + [d.sharding for d in devs]),
            "out": out.sharding,
        }
        return out


# ---------------------------------------------------------------------------
# kernel bodies (pure functions of config-static shapes)
# ---------------------------------------------------------------------------


def _dust_association(proj_uv, in_view, mp_desc_track, occ_grid, kp_desc,
                      kp_valid):
    """Patch-wise association on the 1/8 occupancy grid
    (tracker_dust.cpp:105-172): 2x2 cell window around floor(proj), best
    descriptor distance < 0.75 against getDescTrack."""
    hc, wc = occ_grid.shape
    u0 = jnp.clip(jnp.floor(proj_uv[:, 0]).astype(jnp.int32), 0, wc - 2)
    v0 = jnp.clip(jnp.floor(proj_uv[:, 1]).astype(jnp.int32), 0, hc - 2)
    best_dist = jnp.full(u0.shape, 0.75, jnp.float32)
    best_idx = jnp.full(u0.shape, -1, jnp.int32)
    for du in (0, 1):
        for dv in (0, 1):
            idx = occ_grid[v0 + dv, u0 + du]
            cand_ok = (idx >= 0) & in_view & kp_valid[jnp.clip(idx, 0, None)]
            idx_safe = jnp.clip(idx, 0, kp_desc.shape[0] - 1)
            d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.einsum(
                "pd,pd->p", mp_desc_track,
                kp_desc[idx_safe],
                precision=jax.lax.Precision.HIGHEST), 0.0))
            better = cand_ok & (d < best_dist)
            best_dist = jnp.where(better, d, best_dist)
            best_idx = jnp.where(better, idx, best_idx)
    # each keypoint claimed once: min-distance wins (ref: first-come + erase)
    mp2kp, kp2mp = matching.resolve_mutual(
        jnp.clip(best_idx, 0, None), best_dist, best_idx >= 0,
        kp_desc.shape[0])
    return mp2kp, kp2mp


def dust_track_body(Tcw_pred, mp_pos, mp_desc_track, mp_valid, dust,
                    occ_grid, kp_desc, kp_uv, kp_cov2_inv, kp_valid, K_intr,
                    *, dust_iters, huber_delta, chi2_inlier):
    res = pose_opt.pose_optimization_dust(
        Tcw_pred, mp_pos, mp_valid, dust, K_intr, iters=dust_iters,
        huber_delta=huber_delta, chi2_inlier=chi2_inlier)
    mp2kp, kp2mp = _dust_association(res.proj_uv, res.inlier, mp_desc_track,
                                     occ_grid, kp_desc, kp_valid)
    n_match = jnp.sum((mp2kp >= 0).astype(jnp.int32))

    # post reprojection optimization over the associated pairs
    kp_has = kp2mp >= 0
    mp_of_kp = jnp.clip(kp2mp, 0, None)
    Xw = mp_pos[mp_of_kp]
    post = pose_opt.pose_optimization_post(
        res.Tcw, Xw, kp_uv, kp_cov2_inv, kp_has, K_intr)
    return dict(
        Tcw=post.Tcw, Tcw_coarse=res.Tcw, kp2mp=kp2mp,
        post_inlier=post.inlier, n_coarse=res.n_inlier, n_match=n_match,
        n_opt=post.n_inlier, mp_in_view=res.inlier, mp_matched=mp2kp >= 0)


def heat_track_body(Tcw_pred, mp_pos, mp_desc_track, mp_valid, heat,
                    occ_grid, kp_desc, kp_uv, kp_cov2_inv, kp_valid, K_intr,
                    *, heat_iters, huber_delta, chi2_inlier):
    """trackFrameHeat equivalent (tracker_dust.cpp:405-446): full-resolution
    heat alignment (PoseOptimizationHeat, optimizer_dust.cpp:415-522) in
    place of the 1/8 dust alignment.  The reference's variant stops after
    the alignment (association/return commented out, never finished); we
    complete it with the same occ-grid association + post optimization as
    the dust path so it is a usable drop-in coarse tracker."""
    res = pose_opt.pose_optimization_heat(
        Tcw_pred, mp_pos, mp_valid, heat, K_intr, iters=heat_iters,
        huber_delta=huber_delta, chi2_inlier=chi2_inlier)
    # full-res pixels -> 1/8 cell coords with the dust-intrinsics offset
    # convention (fx/8, (cx-3.5)/8; optimizer_dust.cpp:223-226)
    cell_uv = (res.proj_uv - 3.5) / 8.0
    mp2kp, kp2mp = _dust_association(cell_uv, res.inlier, mp_desc_track,
                                     occ_grid, kp_desc, kp_valid)
    n_match = jnp.sum((mp2kp >= 0).astype(jnp.int32))
    kp_has = kp2mp >= 0
    Xw = mp_pos[jnp.clip(kp2mp, 0, None)]
    post = pose_opt.pose_optimization_post(
        res.Tcw, Xw, kp_uv, kp_cov2_inv, kp_has, K_intr)
    return dict(
        Tcw=post.Tcw, Tcw_coarse=res.Tcw, kp2mp=kp2mp,
        post_inlier=post.inlier, n_coarse=res.n_inlier, n_match=n_match,
        n_opt=post.n_inlier, mp_in_view=res.inlier, mp_matched=mp2kp >= 0)


def motion_track_body(Tcw_pred, mp_pos, mp_desc_track, mp_valid, kp_desc,
                      kp_uv, kp_cov2_inv, kp_valid, K_intr, bounds, *,
                      radius, n_retry_th):
    R, t = Tcw_pred[:3, :3], Tcw_pred[:3, 3]
    pc = mp_pos @ R.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = jnp.stack([K_intr[0] * pc[:, 0] / zs + K_intr[2],
                      K_intr[1] * pc[:, 1] / zs + K_intr[3]], axis=-1)
    depth_ok = 1.0 / zs > 0

    def run(rad):
        return matching.search_by_projection_frame(
            mp_desc_track, proj, depth_ok, mp_valid, kp_desc, kp_uv,
            kp_valid, jnp.ones_like(kp_valid), radius=rad, bounds=bounds)

    m1, inv1 = run(radius)
    n1 = jnp.sum((m1 >= 0).astype(jnp.int32))
    m2, inv2 = run(2.0 * radius)
    thin = n1 < n_retry_th  # widen window when thin
    kp2mp = jnp.where(thin, inv2, inv1)  # per-keypoint map-point index
    kp_has = kp2mp >= 0
    Xw = mp_pos[jnp.clip(kp2mp, 0, None)]
    res = pose_opt.pose_optimization(Tcw_pred, Xw, kp_uv, kp_cov2_inv,
                                     kp_has, K_intr)
    n_match = jnp.sum(kp_has.astype(jnp.int32))
    return dict(Tcw=res.Tcw, kp2mp=kp2mp, inlier=res.inlier,
                n_match=n_match, n_inlier=res.n_inlier)


def reloc_track_body(T0s, mp_pos, mp_desc, mp_valid, kp_desc, kp_uv,
                     kp_cov2_inv, kp_valid, K_intr, bounds, *,
                     radius2: float = 10.0):
    """Relocalization attempt against one candidate KF: brute-force mutual
    NN (pose-free) + MULTI-START pose optimization + windowed growth.

    The reference's Relocalization (tracker.cpp:986-1138, stubbed) used
    PnP RANSAC to seed the pose fit because the 4x10 PoseOptimization
    restarts every round from the initial pose (optimizer.cpp:231-443) and
    silently diverges-to-zero-inliers from a far start.  The TPU-native
    replacement for sequential RANSAC is a *batched* LM: vmap the same
    optimizer over S perturbed starts (yaw fan around two base poses) and
    keep the start with the most inliers — one XLA program, MXU-friendly.

    The growth pass is the retained frame<->KF windowed SearchByProjection
    (sp_matcher.cpp:1545-1634, stock ORB-SLAM2's second-chance reloc): with
    the fitted pose, project the candidate's not-yet-found points, search a
    th=10 window among still-free keypoints, union the matches, and
    re-optimize once from the fitted pose; the result is kept when it does
    not lose inliers (it starts from the same pose with a match superset).
    """
    kp2mp = matching.search_by_brute_force(mp_desc, mp_valid, kp_desc,
                                           kp_valid)
    kp_has = kp2mp >= 0
    Xw = mp_pos[jnp.clip(kp2mp, 0, None)]
    res = jax.vmap(lambda T: pose_opt.pose_optimization(
        T, Xw, kp_uv, kp_cov2_inv, kp_has, K_intr))(T0s)
    best = jnp.argmax(res.n_inlier)
    Tfit = res.Tcw[best]

    # --- windowed second chance with the fitted pose --------------------
    R, t = Tfit[:3, :3], Tfit[:3, 3]
    pc = mp_pos @ R.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = jnp.stack([K_intr[0] * pc[:, 0] / zs + K_intr[2],
                      K_intr[1] * pc[:, 1] / zs + K_intr[3]], axis=-1)
    depth_ok = 1.0 / zs > 0
    M = mp_pos.shape[0]
    # sAlreadyFound: points already bound by the brute-force stage
    # (dense any-compare; scatter serializes on TPU)
    mp_found = jnp.any((jnp.arange(M)[:, None] == kp2mp[None, :])
                       & kp_has[None, :], axis=1)
    _, kp2mp2 = matching.search_by_projection_frame(
        mp_desc, proj, depth_ok, mp_valid & ~mp_found, kp_desc, kp_uv,
        kp_valid, ~kp_has, radius=radius2, bounds=bounds)
    kp2mp_u = jnp.where(kp_has, kp2mp, kp2mp2)
    kp_has_u = kp2mp_u >= 0
    Xw_u = mp_pos[jnp.clip(kp2mp_u, 0, None)]
    res2 = pose_opt.pose_optimization(Tfit, Xw_u, kp_uv, kp_cov2_inv,
                                      kp_has_u, K_intr)
    keep2 = res2.n_inlier >= res.n_inlier[best]
    return dict(
        Tcw=jnp.where(keep2, res2.Tcw, Tfit),
        kp2mp=jnp.where(keep2, kp2mp_u, kp2mp),
        inlier=jnp.where(keep2, res2.inlier, res.inlier[best]),
        n_match=jnp.sum(jnp.where(keep2, kp_has_u, kp_has)
                        .astype(jnp.int32)),
        n_inlier=jnp.maximum(res2.n_inlier, res.n_inlier[best]))


def ref_track_body(Tcw0, mp_pos, mp_desc, mp_valid, kp_desc, kp_uv,
                   kp_cov2_inv, kp_valid, K_intr):
    kp2mp = matching.search_by_brute_force(mp_desc, mp_valid, kp_desc,
                                           kp_valid)
    kp_has = kp2mp >= 0
    Xw = mp_pos[jnp.clip(kp2mp, 0, None)]
    res = pose_opt.pose_optimization(Tcw0, Xw, kp_uv, kp_cov2_inv, kp_has,
                                     K_intr)
    return dict(Tcw=res.Tcw, kp2mp=kp2mp, inlier=res.inlier,
                n_match=jnp.sum(kp_has.astype(jnp.int32)),
                n_inlier=res.n_inlier)


def local_map_track_body(Tcw0, mp_pos, mp_desc_track, mp_normal,
                         mp_valid, mp_skip, kp2mp0, kp_desc, kp_uv,
                         kp_cov2_inv, kp_valid, K_intr, bounds, *,
                         view_cos_th, window_th, match_adaptive, c2_thresh):
    """SearchLocalPoints + PoseOptimization (tracker.cpp:561-832).

    mp_skip: points already bound to the current frame (mnLastFrameSeen) —
    frustum-checked points exclude them.  kp2mp0: bindings carried in from
    the coarse stage (indices into the *local-map* arrays, -1 free).
    (No per-point min/max scale distances in the signature: the reference
    comments the distance gate out of isInFrustum — see NOTE below — so
    uploading those arrays every frame was pure dead transfer.)
    """
    R, t = Tcw0[:3, :3], Tcw0[:3, 3]
    pc = mp_pos @ R.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = jnp.stack([K_intr[0] * pc[:, 0] / zs + K_intr[2],
                      K_intr[1] * pc[:, 1] / zs + K_intr[3]], axis=-1)
    Ow = -R.T @ t
    po = mp_pos - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * mp_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    # NOTE: no scale-invariance distance gate — the reference explicitly
    # comments it out of isInFrustum (frame.cpp:354-358): with the SP
    # single-level pyramid min==max distance and the gate would unanchor
    # every point after a ~20% depth change, leaving the pose fit to young
    # (error-amplified) points — a runaway drift mechanism.
    in_frustum = (
        (z > 0)
        & (proj[:, 0] >= bounds[0]) & (proj[:, 0] <= bounds[1])
        & (proj[:, 1] >= bounds[2]) & (proj[:, 1] <= bounds[3])
        & (view_cos >= view_cos_th))
    to_match = mp_valid & ~mp_skip & in_frustum

    kp_free = kp_valid & (kp2mp0 < 0)
    _, kp2mp_new = matching.search_by_projection_points(
        mp_desc_track, proj, view_cos, to_match, kp_desc, kp_uv, kp_valid,
        kp_free, th=window_th, match_adaptive=match_adaptive,
        c2_thresh=c2_thresh)
    kp2mp = jnp.where(kp2mp0 >= 0, kp2mp0, kp2mp_new)
    kp_has = kp2mp >= 0
    Xw = mp_pos[jnp.clip(kp2mp, 0, None)]
    res = pose_opt.pose_optimization(Tcw0, Xw, kp_uv, kp_cov2_inv, kp_has,
                                     K_intr)
    return dict(Tcw=res.Tcw, kp2mp=kp2mp, inlier=res.inlier,
                n_extra=jnp.sum((kp2mp_new >= 0).astype(jnp.int32)),
                n_inlier=res.n_inlier, mp_visible=to_match)


def fused_track_body(Tcw_pred, dust_pos, dust_desc_track, dust_valid, dust,
                     occ_grid, loc_pos, loc_desc_track, loc_normal, loc_valid,
                     dust2local, kp_desc, kp_uv, kp_cov2_inv, kp_valid,
                     K_intr, bounds, *, dust_iters, huber_delta, chi2_inlier,
                     view_cos_th, window_th, match_adaptive, c2_thresh):
    """The whole OK-path per-frame chain as ONE device program: dust coarse
    alignment + association + post optimization (tracker_dust.cpp:22-228)
    flowing straight into local-map tracking (tracker.cpp:561-832), with the
    coarse->fine binding handoff done in-graph.

    The two-call path pays TWO device roundtrips per frame because the fine
    stage's inputs (pose, kp2mp0 bindings, skip mask) depend on the coarse
    readback; over the axon tunnel each roundtrip has a ~25 ms floor while
    the kernels execute in ~5 ms each (round-3 NOTES).  Here the dependency
    never leaves the device: the host supplies the local-map candidate set
    SPECULATIVELY (from the previous frame's final bindings — the set
    changes slowly) plus `dust2local`, the mapping from dust-candidate index
    to local-map index (-1 when the dust point is not in the speculated
    set), and the glue computes kp2mp0/skip exactly as prepare_local_map
    would from the dust result.  When the dust gates fail (decided host-side
    from the returned stats, identical conditions) the fine half is simply
    discarded and the fallback cascade runs as before.
    """
    d = dust_track_body(Tcw_pred, dust_pos, dust_desc_track, dust_valid,
                        dust, occ_grid, kp_desc, kp_uv, kp_cov2_inv,
                        kp_valid, K_intr, dust_iters=dust_iters,
                        huber_delta=huber_delta, chi2_inlier=chi2_inlier)
    # glue == prepare_local_map's host loops (tracking.py): kp2mp0 maps the
    # dust bindings into local-map indices (outliers included — the two-call
    # path builds kp2mp0 from frame.mp_ids which carries outliers too);
    # skip = local points already bound by the coarse stage
    kp2mp_dust = d["kp2mp"]
    kp2mp0 = jnp.where(kp2mp_dust >= 0,
                       dust2local[jnp.clip(kp2mp_dust, 0, None)],
                       -1)
    L = loc_pos.shape[0]
    skip = jnp.any(kp2mp0[None, :] == jnp.arange(L)[:, None], axis=1)
    f = local_map_track_body(
        d["Tcw"], loc_pos, loc_desc_track, loc_normal, loc_valid, skip,
        kp2mp0, kp_desc, kp_uv, kp_cov2_inv, kp_valid, K_intr, bounds,
        view_cos_th=view_cos_th, window_th=window_th,
        match_adaptive=match_adaptive, c2_thresh=c2_thresh)
    out = {"d_" + k: v for k, v in d.items()}
    out.update({"l_" + k: v for k, v in f.items()})
    out["skip"] = skip
    out["kp2mp0"] = kp2mp0
    return out


def init_body(kp1_desc, kp1_uv, kp1_valid, prev_uv, kp2_desc, kp2_uv,
              kp2_valid, K_intr, key, *, window, ratio, ransac_iters):
    """SearchForInitialization (win 100, ratio 0.9; mono_tracker.cpp:79-84)
    + Initializer::Initialize, fused."""
    m = matching.search_for_initialization(
        kp1_desc, kp1_valid, prev_uv, kp2_desc, kp2_uv, kp2_valid,
        window=window, ratio=ratio)
    has = m.match12 >= 0
    uv1 = kp1_uv
    uv2 = kp2_uv[jnp.clip(m.match12, 0, None)]
    res = twoview.initialize(uv1, uv2, has, K_intr, key, iters=ransac_iters)
    return dict(ok=res.ok, used_h=res.used_h, R21=res.R21, t21=res.t21,
                points=res.points, triangulated=res.triangulated & has,
                match12=m.match12, n_matches=m.n_matches)


def triangulate_body(Tcw1, Tcw2, kp1_uv, kp1_desc, kp1_cov2_inv, kp1_free,
                     kp2_uv, kp2_desc, kp2_cov2_inv, kp2_free, K_intr,
                     *, nn_ratio, method: int = 1, seed_px_noise: float = 1.0):
    """One neighbor-KF triangulation pass (local_mapper.cpp:615-791):
    SearchForTri (method 1 = exact 2-NN + epipole + epipolar gates, the
    FLANN equivalent; method 2 = epipolar-segment walk, SearchForTriByEpi;
    dispatch at local_mapper.cpp:623-631) -> DLT -> gates.

    KF1 = current KF, KF2 = neighbor.  Returns per-KF2-keypoint matches into
    KF1 and new 3D points with their gate mask.
    """
    fx, fy, cx, cy = K_intr[0], K_intr[1], K_intr[2], K_intr[3]
    Km = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    Km = Km.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)

    R1, t1 = Tcw1[:3, :3], Tcw1[:3, 3]
    R2, t2 = Tcw2[:3, :3], Tcw2[:3, 3]
    # fundamental F12 = K^-T [t12]x R12 K^-1 (ComputeF12, local_mapper.cpp)
    R12 = R1 @ R2.T
    t12 = -R12 @ t2 + t1
    t12x = jnp.array([[0, -t12[2], t12[1]],
                      [t12[2], 0, -t12[0]],
                      [-t12[1], t12[0], 0.0]])
    Kinv = jnp.linalg.inv(Km)
    F12 = Kinv.T @ t12x @ R12 @ Kinv

    # epipole of camera 1 in image 2
    C1_in_2 = R2 @ (-R1.T @ t1) + t2
    e2 = jnp.stack([fx * C1_in_2[0] / C1_in_2[2] + cx,
                    fy * C1_in_2[1] / C1_in_2[2] + cy])

    if method == 2:
        R21 = R2 @ R1.T
        match21 = matching.search_for_tri_by_epi(
            kp1_desc, kp1_uv, kp1_free, kp2_desc, kp2_uv, kp2_free,
            e2, F12, R21, K_intr, kp2_cov2_inv)
    else:
        match21 = matching.search_for_triangulation(
            kp1_desc, kp1_free, kp1_free, kp2_desc, kp2_uv, kp2_free,
            kp2_free, e2, F12, kp1_uv, kp2_cov2_inv, ratio=nn_ratio)
    has = match21 >= 0
    idx1 = jnp.clip(match21, 0, None)
    uv1 = kp1_uv[idx1]
    # DLT in *normalized* camera coordinates like the reference
    # (local_mapper.cpp:663-695): pixel-space projection matrices square the
    # condition number and in float32 leak ~1 px of depth error into views
    # with larger baselines.
    def normalize(uv):
        return jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)

    X = triangulate(Tcw1[:3, :], Tcw2[:3, :], normalize(uv1),
                    normalize(kp2_uv))
    gates = triangulation_gates(
        X, Tcw1, Tcw2, K_intr, uv1, kp2_uv, kp1_cov2_inv[idx1], kp2_cov2_inv,
        has)
    # depth + triangulation uncertainty per view for the depth filter
    # (SVO computeTau geometry; the reference's Seed consumes (x, tau^2),
    # depth_filter.cpp:35-60)
    O1 = -R1.T @ t1
    O2 = -R2.T @ t2
    px_err_angle = 2.0 * jnp.arctan(seed_px_noise / (2.0 * fx))
    z1, tau1 = depth_and_tau(X, O1, O2, px_err_angle)
    z2, tau2 = depth_and_tau(X, O2, O1, px_err_angle)
    return dict(match21=match21, points=X, good=gates.good,
                n_good=jnp.sum(gates.good.astype(jnp.int32)),
                z1=z1, tau1=tau1, z2=z2, tau2=tau2)


def fuse_body(Tcw, mp_pos, mp_desc, mp_normal, mp_dmin, mp_dmax, mp_valid,
              kp_uv, kp_desc, kp_valid, K_intr, bounds, *, radius):
    """Device part of SPMatcher::Fuse into one KF (sp_matcher.cpp:965-1104)."""
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = mp_pos @ R.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = jnp.stack([K_intr[0] * pc[:, 0] / zs + K_intr[2],
                      K_intr[1] * pc[:, 1] / zs + K_intr[3]], axis=-1)
    Ow = -R.T @ t
    po = mp_pos - Ow
    dist3 = jnp.linalg.norm(po, axis=-1)
    view_ok = jnp.sum(po * mp_normal, axis=-1) >= 0.5 * dist3
    ok = (mp_valid & (z > 0)
          & (proj[:, 0] >= bounds[0]) & (proj[:, 0] <= bounds[1])
          & (proj[:, 1] >= bounds[2]) & (proj[:, 1] <= bounds[3])
          & (dist3 >= 0.8 * mp_dmin) & (dist3 <= 1.2 * mp_dmax) & view_ok)
    idx, best = matching.fuse_candidates(
        mp_desc, proj, ok, kp_desc, kp_uv, kp_valid, radius=radius)
    return dict(best_idx=idx, best_dist=best)


# ---------------------------------------------------------------------------
# jitted wrappers with packed returns
# ---------------------------------------------------------------------------


class TrackingKernels:
    """Config-bound jitted kernels with packed single-transfer returns."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # stream-axis NamedSharding for the batched (call_rows) stages; set
        # by StreamFleet when serving over a device mesh so the dust/local/
        # triangulate/fuse batches run SPMD instead of gathering to one chip
        self.batch_sharding = None
        K = cfg.runtime.max_keypoints
        P = cfg.runtime.dust_points_cap
        L = cfg.runtime.local_points_cap
        cam = cfg.camera
        self.K_intr = jnp.array([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)
        self.bounds = jnp.array([0.0, cam.width - 1.0, 0.0, cam.height - 1.0])

        self.dust_layout = Layout([
            ("Tcw", (4, 4), float), ("Tcw_coarse", (4, 4), float),
            ("kp2mp", (K,), int), ("post_inlier", (K,), bool),
            ("n_coarse", (), int), ("n_match", (), int), ("n_opt", (), int),
            ("mp_in_view", (P,), bool), ("mp_matched", (P,), bool)])
        self.track_layout = Layout([
            ("Tcw", (4, 4), float), ("kp2mp", (K,), int),
            ("inlier", (K,), bool), ("n_match", (), int),
            ("n_inlier", (), int)])
        self.local_layout = Layout([
            ("Tcw", (4, 4), float), ("kp2mp", (K,), int),
            ("inlier", (K,), bool), ("n_extra", (), int),
            ("n_inlier", (), int), ("mp_visible", (L,), bool)])

        d = cfg.tracking.dust

        def dust_fn(Tcw_pred, mp_pos, mp_desc_track, mp_valid, dust,
                    occ_grid, kp_desc, kp_uv, kp_cov2_inv, kp_valid):
            out = dust_track_body(
                Tcw_pred, mp_pos, mp_desc_track, mp_valid, dust, occ_grid,
                kp_desc, kp_uv, kp_cov2_inv, kp_valid, self.K_intr,
                dust_iters=d.iters, huber_delta=d.huber_delta,
                chi2_inlier=d.chi2_inlier)
            return self.dust_layout.pack(**out)

        def heat_fn(Tcw_pred, mp_pos, mp_desc_track, mp_valid, heat,
                    occ_grid, kp_desc, kp_uv, kp_cov2_inv, kp_valid):
            out = heat_track_body(
                Tcw_pred, mp_pos, mp_desc_track, mp_valid, heat, occ_grid,
                kp_desc, kp_uv, kp_cov2_inv, kp_valid, self.K_intr,
                heat_iters=d.iters, huber_delta=d.huber_delta,
                chi2_inlier=cfg.tracking.heat_chi2_inlier)
            return self.dust_layout.pack(**out)

        def motion_fn(Tcw_pred, mp_pos, mp_desc_track, mp_valid, kp_desc,
                      kp_uv, kp_cov2_inv, kp_valid):
            out = motion_track_body(
                Tcw_pred, mp_pos, mp_desc_track, mp_valid, kp_desc, kp_uv,
                kp_cov2_inv, kp_valid, self.K_intr, self.bounds,
                radius=float(cfg.tracking.motion.th_window_size),
                n_retry_th=cfg.tracking.motion.th_nmatch_proj)
            return self.track_layout.pack(**out)

        def ref_fn(Tcw0, mp_pos, mp_desc, mp_valid, kp_desc, kp_uv,
                   kp_cov2_inv, kp_valid):
            out = ref_track_body(Tcw0, mp_pos, mp_desc, mp_valid, kp_desc,
                                 kp_uv, kp_cov2_inv, kp_valid, self.K_intr)
            return self.track_layout.pack(**out)

        def reloc_fn(T0s, mp_pos, mp_desc, mp_valid, kp_desc, kp_uv,
                     kp_cov2_inv, kp_valid):
            out = reloc_track_body(
                T0s, mp_pos, mp_desc, mp_valid, kp_desc, kp_uv,
                kp_cov2_inv, kp_valid, self.K_intr, self.bounds,
                radius2=float(cfg.tracking.map.th_window_reloc))
            return self.track_layout.pack(**out)

        m = cfg.tracking.map

        def local_fn(Tcw0, mp_pos, mp_desc_track, mp_normal,
                     mp_valid, mp_skip, kp2mp0, kp_desc, kp_uv,
                     kp_cov2_inv, kp_valid):
            out = local_map_track_body(
                Tcw0, mp_pos, mp_desc_track, mp_normal,
                mp_valid, mp_skip, kp2mp0, kp_desc, kp_uv, kp_cov2_inv,
                kp_valid, self.K_intr, self.bounds,
                view_cos_th=m.th_view_cos, window_th=float(m.th_window_size),
                match_adaptive=m.match_adaptive,
                c2_thresh=cfg.tracking.dust.c2_thresh)
            return self.local_layout.pack(**out)

        def local_wide_fn(Tcw0, mp_pos, mp_desc_track, mp_normal,
                          mp_valid, mp_skip, kp2mp0, kp_desc, kp_uv,
                          kp_cov2_inv, kp_valid):
            # starvation retry: widened search window (the reference widens
            # to th=5 after relocalization, sp_matcher.cpp th parameter;
            # here also when the local map starves mid-run — local BA depth
            # slides on low-parallax points can exceed the 4 px window)
            out = local_map_track_body(
                Tcw0, mp_pos, mp_desc_track, mp_normal,
                mp_valid, mp_skip, kp2mp0, kp_desc, kp_uv, kp_cov2_inv,
                kp_valid, self.K_intr, self.bounds,
                view_cos_th=m.th_view_cos,
                window_th=float(m.th_window_retry),
                match_adaptive=m.match_adaptive,
                c2_thresh=cfg.tracking.dust.c2_thresh)
            return self.local_layout.pack(**out)

        # fused OK-path program: dust fields + local fields + the glue masks
        self.fused_layout = Layout(
            [("d_" + n, s, t) for n, s, t in self.dust_layout.specs]
            + [("l_" + n, s, t) for n, s, t in self.local_layout.specs]
            + [("skip", (L,), bool), ("kp2mp0", (K,), int)])

        def _mk_fused(window):
            def fused_fn(Tcw_pred, dust_pos, dust_desc_track, dust_valid,
                         dust, occ_grid, loc_pos, loc_desc_track, loc_normal,
                         loc_valid, dust2local, kp_desc, kp_uv, kp_cov2_inv,
                         kp_valid):
                out = fused_track_body(
                    Tcw_pred, dust_pos, dust_desc_track, dust_valid, dust,
                    occ_grid, loc_pos, loc_desc_track, loc_normal, loc_valid,
                    dust2local, kp_desc, kp_uv, kp_cov2_inv, kp_valid,
                    self.K_intr, self.bounds,
                    dust_iters=d.iters, huber_delta=d.huber_delta,
                    chi2_inlier=d.chi2_inlier, view_cos_th=m.th_view_cos,
                    window_th=window, match_adaptive=m.match_adaptive,
                    c2_thresh=cfg.tracking.dust.c2_thresh)
                return self.fused_layout.pack(**out)
            return fused_fn

        fused_fn = _mk_fused(float(m.th_window_size))
        fused_wide_fn = _mk_fused(float(m.th_window_retry))

        self.init_layout = Layout([
            ("ok", (), bool), ("used_h", (), bool), ("R21", (3, 3), float),
            ("t21", (3,), float), ("points", (K, 3), float),
            ("triangulated", (K,), bool), ("match12", (K,), int),
            ("n_matches", (), int)])

        def init_fn(kp1_desc, kp1_uv, kp1_valid, prev_uv, kp2_desc, kp2_uv,
                    kp2_valid, key):
            out = init_body(kp1_desc, kp1_uv, kp1_valid, prev_uv, kp2_desc,
                            kp2_uv, kp2_valid, self.K_intr, key,
                            window=100, ratio=0.9,
                            ransac_iters=cfg.runtime.init_ransac_iters)
            return self.init_layout.pack(**out)

        self.tri_layout = Layout([
            ("match21", (K,), int), ("points", (K, 3), float),
            ("good", (K,), bool), ("n_good", (), int),
            ("z1", (K,), float), ("tau1", (K,), float),
            ("z2", (K,), float), ("tau2", (K,), float)])

        def tri_fn(Tcw1, Tcw2, kp1_uv, kp1_desc, kp1_cov2_inv, kp1_free,
                   kp2_uv, kp2_desc, kp2_cov2_inv, kp2_free):
            out = triangulate_body(
                Tcw1, Tcw2, kp1_uv, kp1_desc, kp1_cov2_inv, kp1_free,
                kp2_uv, kp2_desc, kp2_cov2_inv, kp2_free, self.K_intr,
                nn_ratio=0.7, method=cfg.mapping.matching_method,
                seed_px_noise=cfg.mapping.depth_filter.seed_px_noise)
            return self.tri_layout.pack(**out)

        self.fuse_layout = Layout([
            ("best_idx", (L,), int), ("best_dist", (L,), float)])

        def fuse_fn(Tcw, mp_pos, mp_desc, mp_normal, mp_dmin, mp_dmax,
                    mp_valid, kp_uv, kp_desc, kp_valid):
            out = fuse_body(Tcw, mp_pos, mp_desc, mp_normal, mp_dmin,
                            mp_dmax, mp_valid, kp_uv, kp_desc, kp_valid,
                            self.K_intr, self.bounds, radius=3.0)
            return self.fuse_layout.pack(**out)

        # every kernel goes through PackedInput: ONE h2d transfer of the
        # numpy args per call (see the class docstring for the measured
        # per-buffer tunnel cost this kills); the batched fleet variants
        # are the same adapters' call_rows
        self._dust = PackedInput(dust_fn)
        self._fused = PackedInput(fused_fn)
        self._fused_wide = PackedInput(fused_wide_fn)
        self._heat = PackedInput(heat_fn)
        self._motion = PackedInput(motion_fn)
        self._ref = PackedInput(ref_fn)
        self._reloc = PackedInput(reloc_fn)
        self._local = PackedInput(local_fn)
        self._local_wide = PackedInput(local_wide_fn)
        self._init = PackedInput(init_fn)
        self._tri = PackedInput(tri_fn)
        self._fuse = PackedInput(fuse_fn)

        def gather_fn(bank, rows, valid):
            return jnp.where(valid[:, None], bank[rows], 0.0)

        self._gather = PackedInput(gather_fn)

        # fleet bank-args variants: the descriptor gather runs in-graph
        # inside the batched program (BankRows docstring) so a serving
        # tick never pays per-stream gather dispatches
        self._dust_bank = PackedInput(_bank_variant(dust_fn, 2, 3))
        self._motion_bank = PackedInput(_bank_variant(motion_fn, 2, 3))
        self._reloc_bank = PackedInput(_bank_variant(reloc_fn, 2, 3))
        self._local_bank = PackedInput(_bank_variant(local_fn, 2, 4))
        self._local_wide_bank = PackedInput(
            _bank_variant(local_wide_fn, 2, 4))

        hc, wc = cfg.grid_h, cfg.grid_w
        self.feat_layout = Layout([
            ("uv", (K, 2), float), ("score", (K,), float),
            ("response", (K,), float), ("valid", (K,), bool),
            ("cov2_inv", (K, 2), float), ("occ_grid", (hc, wc), int),
            ("count", (), int)])

        @jit_f32
        def feat_fetch_fn(uv, score, response, valid, cov2_inv, occ_grid,
                          count):
            return self.feat_layout.pack(
                uv=uv, score=score, response=response, valid=valid,
                cov2_inv=cov2_inv, occ_grid=occ_grid, count=count)

        self._feat_fetch = feat_fetch_fn

    def warmup(self, pool_capacity: int = 4096, ba: bool = True) -> None:
        """Precompile every per-frame device program on its PRODUCTION call
        pattern (the PackedInput host/device split and shapes must match
        the real call sites exactly, or the compile happens again on first
        real use).  Online-mode latency spikes of 650-7900 ms measured in
        the round-3 sweeps (CPU_SWEEP_r3d) were all first-hit compiles of
        kernel variants (wide/reloc/retry paths) landing mid-run; serving
        deployments call this once before the first tick.

        Dummy inputs are degenerate (zero descriptors, few valid entries)
        — only shapes/dtypes/split matter for compilation."""
        import jax

        cfg = self.cfg
        K = cfg.runtime.max_keypoints
        P = cfg.runtime.dust_points_cap
        L = cfg.runtime.local_points_cap
        hc, wc = cfg.grid_h, cfg.grid_w
        eye = np.eye(4, dtype=np.float32)

        def val(n):
            v = np.zeros(n, bool)
            v[:4] = True
            return v

        val_k, val_d, val_l = val(K), val(P), val(L)
        uv = np.zeros((K, 2), np.float32)
        cov = np.ones((K, 2), np.float32)
        pos_d = np.zeros((P, 3), np.float32)
        pos_l = np.zeros((L, 3), np.float32)
        pos_k = np.zeros((K, 3), np.float32)
        normal_l = np.zeros((L, 3), np.float32)
        dust = jnp.zeros((hc, wc), jnp.float32)
        occ = jnp.full((hc, wc), -1, jnp.int32)
        desc_k = jnp.zeros((K, 256), jnp.float32)

        # descriptor gathers on their three production (bank, rows) shapes:
        # pool bank -> dust/local point rows; a KF's (K, 256) descriptor
        # block -> observation rows (the ref-KF/reloc path)
        bank = jnp.zeros((pool_capacity, 256), jnp.float32)
        desc_p = self.gather_rows(bank, np.zeros(P, np.int32), val_d)
        desc_l = self.gather_rows(bank, np.zeros(L, np.int32), val_l)
        desc_kf = self.gather_rows(desc_k, np.zeros(K, np.int32), val_k)

        if cfg.tracking.coarse_method == "heat":
            heat = jnp.zeros((cfg.camera.height, cfg.camera.width),
                             jnp.float32)
            self.heat_track(eye, pos_d, desc_p, val_d, heat, occ, desc_k,
                            uv, cov, val_k)
        else:
            self.dust_track(eye, pos_d, desc_p, val_d, dust, occ, desc_k,
                            uv, cov, val_k)
        self.motion_track(eye, pos_l, desc_l, val_l, desc_k, uv, cov, val_k)
        self.ref_track(eye, pos_k, desc_kf, val_k, desc_k, uv, cov, val_k)
        T0s = np.tile(eye, (16, 1, 1))
        self.reloc_track(T0s, pos_k, desc_kf, val_k, desc_k, uv, cov, val_k)
        # the multi-start starvation rescue reuses the reloc kernel at the
        # LOCAL-map cap (tracking._track_local_map), a distinct variant
        self.reloc_track(T0s, pos_l, desc_l, val_l, desc_k, uv, cov, val_k)
        kp2mp0 = np.full(K, -1, np.int64)
        largs = (eye, pos_l, desc_l, normal_l, val_l, np.zeros(L, bool),
                 kp2mp0, desc_k, uv, cov, val_k)
        self.local_map_track(*largs)
        self.local_map_track_wide(*largs)
        if (cfg.tracking.fused_ok_path
                and cfg.tracking.coarse_method == "dust"):
            d2l = np.full(P, -1, np.int32)
            fargs = (eye, pos_d, desc_p, val_d, dust, occ, pos_l, desc_l,
                     normal_l, val_l, d2l, desc_k, uv, cov, val_k)
            self.fused_track(*fargs, wide=False)
            self.fused_track(*fargs, wide=True)
        self.init_two_view(desc_k, uv, val_k, uv, desc_k, uv, val_k,
                           jax.random.PRNGKey(0))
        tri_row = (eye, eye, uv, desc_k, cov, val_k, uv, desc_k, cov, val_k)
        self.triangulate_pair(*tri_row)
        fuse_row = (eye, pos_l, desc_l, normal_l, np.zeros(L, np.float32),
                    np.zeros(L, np.float32), val_l, uv, desc_k, val_k)
        self.fuse(*fuse_row)
        # the mapper's batched drives at EVERY pow2 chunk width: the r5
        # warm TPU sweep showed the width-2/4 variants compiling mid-run
        # as multi-second frame tails (early-map spins have 2-4 neighbor
        # KFs; a mature map hits width 8 every KF)
        for w in (2, 4, 8):
            self.triangulate_pair_batch([tri_row] * w)
            self.fuse_batch([fuse_row] * w)
        # the device-bank dirty-row scatter (MapPointPool.device_bank) is
        # an EAGER .at[].set whose pow2-bucketed widths each compile on
        # first flush (jit(scatter) on the (capacity, 256) bank — the last
        # first-run straggler in the r5 warm sweep); the compile cache is
        # process-wide on shapes, so throwaway eager calls warm it
        m = 1
        while m <= pool_capacity:
            idx = jnp.zeros(m, jnp.int32)
            jax.block_until_ready(
                bank.at[idx].set(jnp.zeros((m, 256), jnp.float32)))
            m *= 2
        # eager PRNG split + unpack (per init attempt, two-view bootstrap)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        jax.block_until_ready((k1, k2))
        if ba:
            from sp_orb_slam_tpu.optim import ba as ba_mod

            C = cfg.runtime.ba_kfs_cap
            Pb = cfg.runtime.ba_points_cap
            O = cfg.runtime.ba_obs_cap
            res = ba_mod.bundle_adjust(
                np.tile(eye, (C, 1, 1)), np.ones(C, bool),
                np.zeros((Pb, 3), np.float32), np.zeros(Pb, bool),
                np.zeros(O, np.int32), np.zeros(O, np.int32),
                np.zeros((O, 2), np.float32), np.ones((O, 2), np.float32),
                np.zeros(O, bool), self.K_intr,
                iters1=5, iters2=10, two_phase=True, robust=True)
            jax.block_until_ready(res)
            # likely init-time global-BA buckets (2 KFs, pow2 point/obs
            # caps, solve_global_ba iters=20) — otherwise the init GBA
            # compiles mid-initialization and lands in the frame tail
            for Pb2, O2 in ((128, 256), (256, 512), (512, 1024),
                            (1024, 2048)):
                res = ba_mod.bundle_adjust(
                    np.tile(eye, (2, 1, 1)), np.asarray([True, False]),
                    np.zeros((Pb2, 3), np.float32), np.zeros(Pb2, bool),
                    np.zeros(O2, np.int32), np.zeros(O2, np.int32),
                    np.zeros((O2, 2), np.float32),
                    np.ones((O2, 2), np.float32),
                    np.zeros(O2, bool), self.K_intr,
                    iters1=20, two_phase=False, robust=True)
            jax.block_until_ready(res)

    def fetch_features_host(self, feats, b: int = 0) -> dict:
        """One packed transfer of the per-frame host mirrors (the reference
        copies six tensors to the CPU per frame, sp_extractor.cpp:427-433;
        we copy one)."""
        out = self.feat_layout.unpack(np.asarray(self._feat_fetch(
            feats.uv[b], feats.score[b], feats.response[b], feats.valid[b],
            feats.cov2_inv[b], feats.occ_grid[b], feats.count[b])))
        out["uv"] = out["uv"].astype(np.float32)
        out["score"] = out["score"].astype(np.float32)
        out["response"] = out["response"].astype(np.float32)
        out["cov2_inv"] = out["cov2_inv"].astype(np.float32)
        out["occ_grid"] = out["occ_grid"].astype(np.int32)
        return out

    # host-facing: run + unpack (one transfer each)
    def heat_track(self, *args):
        return self.dust_layout.unpack(np.asarray(self._heat(*args)))

    def dust_track(self, *args):
        return self.dust_layout.unpack(np.asarray(self._dust(*args)))

    def fused_track(self, *args, wide: bool = False):
        """One-roundtrip OK-path step; returns (dust_out, local_out) dicts
        in the same field layout as dust_track / local_map_track, plus the
        in-graph glue masks under local_out["skip"]/["kp2mp0"]."""
        fn = self._fused_wide if wide else self._fused
        flat = self.fused_layout.unpack(np.asarray(fn(*args)))
        dust_out = {n: flat["d_" + n] for n, _, _ in self.dust_layout.specs}
        local_out = {n: flat["l_" + n] for n, _, _ in self.local_layout.specs}
        local_out["skip"] = flat["skip"]
        local_out["kp2mp0"] = flat["kp2mp0"]
        return dust_out, local_out

    def dust_track_batch(self, rows, bank: bool = False):
        """Batched dust stage: `rows` is a list of per-stream arg tuples;
        ONE packed upload + ONE packed readback for the whole fleet.  With
        `bank`, rows carry (rows, stacked-bank) in place of gathered
        descriptors (BankRows docstring)."""
        ad = self._dust_bank if bank else self._dust
        flat = np.asarray(ad.call_rows(rows, sharding=self.batch_sharding))
        return [self.dust_layout.unpack(row) for row in flat]

    def motion_track(self, *args):
        return self.track_layout.unpack(np.asarray(self._motion(*args)))

    def motion_track_batch(self, rows, bank: bool = False):
        """Batched motion-model fallback over per-stream arg tuples (the
        fleet's coarse_phase2): ONE packed upload + ONE packed readback for
        every stream whose dust stage failed this tick."""
        ad = self._motion_bank if bank else self._motion
        flat = np.asarray(ad.call_rows(rows, sharding=self.batch_sharding))
        return [self.track_layout.unpack(row) for row in flat]

    def ref_track(self, *args):
        return self.track_layout.unpack(np.asarray(self._ref(*args)))

    def reloc_track(self, *args):
        return self.track_layout.unpack(np.asarray(self._reloc(*args)))

    def reloc_track_batch(self, rows, bank: bool = False):
        """Batched multi-start rescue (the fleet's fine retry rounds)."""
        ad = self._reloc_bank if bank else self._reloc
        flat = np.asarray(ad.call_rows(rows, sharding=self.batch_sharding))
        return [self.track_layout.unpack(row) for row in flat]

    def local_map_track(self, *args):
        return self.local_layout.unpack(np.asarray(self._local(*args)))

    def local_map_track_wide(self, *args):
        return self.local_layout.unpack(np.asarray(self._local_wide(*args)))

    def local_map_track_batch(self, rows, wide: bool = False,
                              bank: bool = False):
        """Batched fine stage over per-stream arg tuples: a list of unpacked
        per-stream dicts from ONE upload + ONE readback."""
        if bank:
            fn = self._local_wide_bank if wide else self._local_bank
        else:
            fn = self._local_wide if wide else self._local
        flat = np.asarray(fn.call_rows(rows, sharding=self.batch_sharding))
        return [self.local_layout.unpack(row) for row in flat]

    def init_two_view(self, *args):
        return self.init_layout.unpack(np.asarray(self._init(*args)))

    def triangulate_pair(self, *args):
        return self.tri_layout.unpack(np.asarray(self._tri(*args)))

    def _call_rows_chunked(self, adapter, layout, rows, max_width: int = 8):
        """Drive a PackedInput adapter over `rows` in pow2-padded chunks of
        at most `max_width`: one packed upload + one packed readback per
        chunk (vs one full tunnel roundtrip per row), with the vmapped
        program's batch widths bounded to {2, 4, max_width} so compiles
        stay few and lane memory stays flat."""
        outs = []
        for i in range(0, len(rows), max_width):
            chunk = rows[i:i + max_width]
            if len(chunk) == 1:
                outs.append(layout.unpack(np.asarray(adapter(*chunk[0]))))
                continue
            n = len(chunk)
            padded = chunk + [chunk[0]] * (_next_pow2_k(n) - n)
            flat = np.asarray(
                adapter.call_rows(padded, sharding=self.batch_sharding))
            outs.extend(layout.unpack(r) for r in flat[:n])
        return outs

    def triangulate_pair_batch(self, rows):
        """Batched triangulation over neighbor-KF rows (the mapper's
        per-neighbor loop pays a full ~25 ms tunnel roundtrip per call
        otherwise)."""
        return self._call_rows_chunked(self._tri, self.tri_layout, rows)

    def fuse(self, *args):
        return self.fuse_layout.unpack(np.asarray(self._fuse(*args)))

    def fuse_batch(self, rows):
        """Batched fuse over target-KF rows (SearchInNeighbors phase 1):
        one roundtrip per 8 targets instead of one per target."""
        return self._call_rows_chunked(self._fuse, self.fuse_layout, rows)

    def gather_rows(self, bank, rows, valid):
        """On-device descriptor row gather: (cap, 256) device bank +
        (P,) int rows/valid mask (one tiny packed upload) -> (P, 256)
        device array (invalid slots exact zeros, matching the padded host
        arrays this replaces).  The result stays on device — it feeds the
        tracking kernels as a pass-through argument."""
        return self._gather(bank, rows, valid)
