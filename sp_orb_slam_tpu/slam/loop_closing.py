"""Loop closing with global-descriptor place recognition.

Rebuild of `LoopClosingVLAD` (src/loopclosing/loop_closer_vlad.cpp): the
reference replaces DBoW2 with NetVLAD global descriptors loaded from disk
(the in-process NetVLAD is an empty stub, cv/netvlad.cpp); detection is a
linear scan of the keyframe database by dot product.  Here the descriptor
source is equally pluggable (RawFrame.global_desc), and the scan is one
device matvec.

Pipeline (citations into loop_closer_vlad.cpp):
- detect (:120-255): skip if <10 KFs since last loop; minScore = min dot
  against covisibles floored at 0.2; candidates above minScore, accumulated
  over their 10 best covisibles, retained at 0.75 x best; temporal
  consistency groups with threshold 3;
- compute_sim3 (:345-502): brute-force match >= 20 -> Sim3 RANSAC
  (0.99, 20, 300) -> guided Sim3 projection matching -> OptimizeSim3 >= 20
  -> project the loop neighborhood's points, accept >= 40 total matches;
- correct_loop (:504-699): propagate Scw to current covisibles, remap
  their points, fuse matched duplicates, SearchAndFuse over the corrected
  neighborhood, essential-graph optimization, global BA.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import jax
import numpy as np

from sp_orb_slam_tpu.config import Config
from sp_orb_slam_tpu.optim import sim3 as s3
from sp_orb_slam_tpu.slam.kernels import TrackingKernels
from sp_orb_slam_tpu.slam.local_mapping import (LocalMapping, _next_pow2,
                                                apply_global_ba_staged,
                                                assemble_global_ba,
                                                solve_global_ba)
from sp_orb_slam_tpu.slam.map import Map, KeyFrame
from sp_orb_slam_tpu.ops import matching as _matching

# jitted adapters for the loop path's matcher calls: called eagerly these
# run primitive-by-primitive (each a tunnel dispatch) and recompile
# primitives per shape; jitted + static-shape-padded they compile once
_bf_match_jit = jax.jit(_matching.search_by_brute_force)
_pairwise_dist_jit = jax.jit(_matching.pairwise_dist)


def _np_sim3(R, t, s):
    return np.asarray(R, np.float64), np.asarray(t, np.float64), float(s)


def _sim3_mul_np(A, B):
    Ra, ta, sa = A
    Rb, tb, sb = B
    return Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb


def _sim3_inv_np(S):
    R, t, s = S
    return R.T, -(1.0 / s) * (R.T @ t), 1.0 / s


def _sim3_apply_np(S, X):
    R, t, s = S
    return s * (X @ R.T) + t


def _sim3_log_rows(Ss: list) -> np.ndarray:
    """Batch-log a list of (R, t, s) Sim3 tuples in one device call,
    pow2-padded with identities to bound compile variants."""
    import jax.numpy as jnp

    n = len(Ss)
    P = _next_pow2(max(n, 8))
    Rs = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    ts = np.zeros((P, 3), np.float32)
    ss = np.ones(P, np.float32)
    for i, (R, t, s) in enumerate(Ss):
        Rs[i] = R
        ts[i] = t
        ss[i] = s
    out = s3.sim3_log_batch(jnp.asarray(Rs), jnp.asarray(ts),
                            jnp.asarray(ss))
    return np.asarray(out)[:n]


class LoopClosing:
    def __init__(self, cfg: Config, world: Map, kernels: TrackingKernels,
                 mapper: LocalMapping):
        import collections

        self.cfg = cfg
        self.map = world
        self.k = kernels
        self.mapper = mapper
        self.queue = collections.deque()
        self.db: List[int] = []           # keyframe ids with global descs
        self.consistent_groups: List[tuple] = []  # (set(kf_ids), count)
        self.last_loop_kf = -10 ** 9
        self.n_loops_closed = 0
        self._key = jax.random.PRNGKey(271828)
        self._thread = None
        self._shutdown = False
        # transient GBA thread state (mpThreadGBA / mbRunningGBA / mbStopGBA,
        # loop_closer_vlad.h; kill-running-GBA at loop_closer_vlad.cpp:511-529)
        self._gba_thread = None
        self._gba_stop = False
        self.gba_running = False

    def insert_keyframe(self, kf_id: int) -> None:
        self.queue.append(kf_id)

    def warmup(self) -> None:
        """Precompile the loop path's device programs on their production
        (static, padded) shapes — the same first-hit-compile discipline as
        TrackingKernels.warmup.  All loop kernels are now fixed-shape
        (pads + pow2 buckets), so one pass covers them; without it the
        first Sim3 attempt / essential graph of a serving session lands
        20-40 s of compiles mid-loop-closure."""
        import jax.numpy as jnp

        N = self.cfg.runtime.max_keypoints
        K_intr = self.k.K_intr
        zeros_desc = jnp.zeros((N, 256), jnp.float32)
        v = np.zeros(N, bool)
        v[:32] = True
        vj = jnp.asarray(v)
        _bf_match_jit(zeros_desc, vj, zeros_desc, vj)
        _pairwise_dist_jit(jnp.zeros((256, 256), jnp.float32), zeros_desc)
        self._key, sub = jax.random.split(self._key)
        s3.sim3_ransac(jnp.zeros((N, 3)), jnp.zeros((N, 3)),
                       jnp.zeros((N, 2)), jnp.zeros((N, 2)), vj, K_intr, sub)
        s3.optimize_sim3(jnp.eye(3), jnp.zeros(3), jnp.float32(1.0),
                         jnp.zeros((32, 3)), jnp.zeros((32, 3)),
                         jnp.zeros((32, 2)), jnp.zeros((32, 2)),
                         jnp.ones((32, 2)), jnp.ones((32, 2)),
                         jnp.asarray(v[:32]), K_intr)
        cam = self.cfg.camera
        bounds = jnp.asarray(np.array(
            [0.0, cam.width - 1.0, 0.0, cam.height - 1.0], np.float32))
        uv = jnp.zeros((N, 2), jnp.float32)
        from sp_orb_slam_tpu.ops import matching
        matching.search_by_sim3(
            jnp.zeros((N, 3)), vj, zeros_desc, jnp.zeros(N), jnp.ones(N),
            uv, zeros_desc, vj,
            jnp.zeros((N, 3)), vj, zeros_desc, jnp.zeros(N), jnp.ones(N),
            uv, zeros_desc, vj,
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            K_intr, bounds, radius=7.5)
        # essential-graph path at its smallest pow2 buckets
        _sim3_log_rows([(np.eye(3), np.zeros(3), 1.0)] * 2)
        s3.sim3_exp_batch(jnp.zeros((8, 7), jnp.float32))
        fixed = np.ones(8, bool)
        fixed[0] = False
        s3.optimize_pose_graph(
            jnp.zeros((8, 7)), jnp.asarray(fixed),
            jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32),
            jnp.zeros((8, 7)), jnp.zeros(8, bool), iters=20)

    # ------------------------------------------------------------------ spin

    def spin_once(self) -> None:
        while True:
            try:
                kf_id = self.queue.popleft()
            except IndexError:
                return
            kf = self.map.keyframes.get(kf_id)
            if kf is None or kf.bad or kf.global_desc is None:
                continue
            # detection + Sim3 read the covisibility graph and the point
            # pool — hold the map lock vs concurrent mapper surgery (the
            # reference relies on per-object mutexes here; we have one big
            # lock, and loop closure is rare enough that the latency spike
            # does not matter)
            with self.map.update_lock:
                # pin the current KF (SetNotErase, loop_closer_vlad.cpp's
                # DetectLoop entry) so the mapper cannot cull it in the
                # detect -> Sim3 -> correct window where the lock is
                # dropped; the matched KF is pinned the moment it is known
                kf.not_erase = True
                candidates = self._detect(kf)
                hit = self._compute_sim3(kf, candidates) if candidates else None
                if hit is not None:
                    matched = self.map.keyframes.get(hit[0])
                    if matched is not None:
                        matched.not_erase = True
            if hit is None:
                kf.not_erase = False
                continue
            matched_kf, Scw, matches = hit
            try:
                self._correct_loop(kf, matched_kf, Scw, matches)
            finally:
                kf.not_erase = False
                m = self.map.keyframes.get(matched_kf)
                if m is not None:
                    m.not_erase = False

    # ------------------------------------------------------------ thread drive

    def start(self) -> None:
        """Own-thread drive (LoopClosingVLAD::Run, loop_closer_vlad.cpp:
        289-325; spawned at system.cpp:100-106)."""
        import threading

        if self._thread is not None:
            return
        self._shutdown = False
        self._thread = threading.Thread(target=self.run, name="loop_closing",
                                        daemon=True)
        self._thread.start()

    def run(self) -> None:
        import time

        while not self._shutdown:
            self.spin_once()
            time.sleep(1e-3)

    def shutdown(self) -> None:
        # let a running GBA finish and commit (a clean shutdown wants the
        # correction in the exported trajectory), then stop the loop thread
        t = self._gba_thread
        if t is not None and t.is_alive():
            t.join(timeout=60.0)
        self._gba_thread = None
        if self._thread is None:
            return
        self._shutdown = True
        self._thread.join(timeout=30.0)
        self._thread = None

    # ---------------------------------------------------------------- detect

    def _detect(self, kf: KeyFrame) -> List[int]:
        lp = self.cfg.loop
        if kf.kf_id < self.last_loop_kf + lp.kf_gap:
            # too close to the last loop: no detection, but the KF still
            # enters the place-recognition database (the reference's early
            # exit still runs mpKeyFrameDB->add; loop_closer_vlad.cpp:132)
            # so a later revisit of this stretch can be recognized
            self.db.append(kf.kf_id)
            self.consistent_groups.clear()
            return []
        connected = set(kf.connections)
        # minScore = min similarity among covisibles, floored (:150-165)
        min_score = 1.0
        for kid in connected:
            other = self.map.keyframes.get(kid)
            if other is None or other.bad or other.global_desc is None:
                continue
            min_score = min(min_score, float(kf.global_desc @ other.global_desc))
        min_score = max(min_score, lp.min_score_floor)

        scores: Dict[int, float] = {}
        for kid in self.db:
            other = self.map.keyframes.get(kid)
            if other is None or other.bad or kid in connected:
                continue
            sc = float(kf.global_desc @ other.global_desc)
            if sc > min_score:
                scores[kid] = sc
        if not scores:
            self.db.append(kf.kf_id)
            self.consistent_groups.clear()
            return []

        # covisibility-accumulated scores + 0.75-best retention (:68-118)
        acc: List[tuple] = []
        best_acc = min_score
        for kid, sc in scores.items():
            other = self.map.keyframes[kid]
            acc_score = sc
            best_kf, best_sc = kid, sc
            for nb in other.best_covisible(10):
                if nb in scores:
                    acc_score += scores[nb]
                    if scores[nb] > best_sc:
                        best_kf, best_sc = nb, scores[nb]
            acc.append((acc_score, best_kf))
            best_acc = max(best_acc, acc_score)
        retained = []
        seen: Set[int] = set()
        for acc_score, kid in acc:
            if acc_score > 0.75 * best_acc and kid not in seen:
                retained.append(kid)
                seen.add(kid)

        # temporal consistency groups (:182-241)
        enough: List[int] = []
        new_groups: List[tuple] = []
        group_used = [False] * len(self.consistent_groups)
        for kid in retained:
            cand_kf = self.map.keyframes[kid]
            group = set(cand_kf.connections) | {kid}
            consistent_any = False
            enough_this = False
            for gi, (prev_group, count) in enumerate(self.consistent_groups):
                if group & prev_group:
                    consistent_any = True
                    if not group_used[gi]:
                        new_groups.append((group, count + 1))
                        group_used[gi] = True
                    if count + 1 >= lp.covisibility_consistency_th and not enough_this:
                        enough.append(kid)
                        enough_this = True
            if not consistent_any:
                new_groups.append((group, 0))
        self.consistent_groups = new_groups
        self.db.append(kf.kf_id)
        return enough

    # ----------------------------------------------------------- compute sim3

    def _kf_matched_arrays(self, kf: KeyFrame):
        """Rows (kp idx, pid) of the KF's observed keypoints."""
        rows, pids = [], []
        for i, pid in enumerate(kf.mp_ids):
            if pid < 0:
                continue
            mp = self.map.get_point(int(pid))
            if mp is not None and not mp.bad:
                rows.append(i)
                pids.append(mp.pid)
        return rows, pids

    def _compute_sim3(self, kf: KeyFrame, candidates: List[int]):
        import jax.numpy as jnp

        K_intr = self.k.K_intr
        rows1, pids1 = self._kf_matched_arrays(kf)
        if len(rows1) < 20:
            return None
        # Static-shape discipline: each DISTINCT (len(rows1), len(rows2))
        # pair is a fresh XLA compile of the BF matcher, and each distinct
        # pair count a fresh sim3_ransac compile — over the axon tunnel a
        # compile is 20-40 s, and the rendered TPU run measured the loop
        # span dominated by exactly these (nearly every Sim3 attempt has a
        # unique shape).  Pad everything to the fixed keypoint capacity
        # with valid masks; the kernels' mask semantics make the padded
        # results identical, and the programs compile ONCE.
        N = self.cfg.runtime.max_keypoints
        d1 = np.zeros((N, 256), np.float32)
        d1[:len(rows1)] = kf.data.desc_host[rows1]
        v1 = np.zeros(N, bool)
        v1[:len(rows1)] = True
        for kid in candidates:
            cand = self.map.keyframes.get(kid)
            if cand is None or cand.bad:
                continue
            rows2, pids2 = self._kf_matched_arrays(cand)
            if len(rows2) < 20:
                continue
            d2 = np.zeros((N, 256), np.float32)
            d2[:len(rows2)] = cand.data.desc_host[rows2]
            v2 = np.zeros(N, bool)
            v2[:len(rows2)] = True
            # mutual-NN brute force (loop variant, sp_matcher_loop.cpp:334)
            m = np.asarray(_bf_match_jit(
                jnp.asarray(d2), jnp.asarray(v2),
                jnp.asarray(d1), jnp.asarray(v1)))
            pairs = [(i1, int(m[i1])) for i1 in range(len(rows1)) if m[i1] >= 0]
            if len(pairs) < 20:
                continue
            # camera-frame 3D points of the matched map points in each KF
            X1 = np.stack([self.map.pool.pos[pids1[i1]] for i1, _ in pairs])
            X2 = np.stack([self.map.pool.pos[pids2[i2]] for _, i2 in pairs])
            n_p = len(pairs)
            X1c = np.zeros((N, 3), np.float32)
            X2c = np.zeros((N, 3), np.float32)
            uv1 = np.zeros((N, 2), np.float32)
            uv2 = np.zeros((N, 2), np.float32)
            vp = np.zeros(N, bool)
            X1c[:n_p] = X1 @ kf.Tcw[:3, :3].T + kf.Tcw[:3, 3]
            X2c[:n_p] = X2 @ cand.Tcw[:3, :3].T + cand.Tcw[:3, 3]
            uv1[:n_p] = kf.data.uv[[rows1[i1] for i1, _ in pairs]]
            uv2[:n_p] = cand.data.uv[[rows2[i2] for _, i2 in pairs]]
            vp[:n_p] = True
            self._key, sub = jax.random.split(self._key)
            res = s3.sim3_ransac(
                jnp.asarray(X1c), jnp.asarray(X2c), jnp.asarray(uv1),
                jnp.asarray(uv2), jnp.asarray(vp), K_intr, sub)
            if not bool(res.ok):
                continue
            # guided growth between RANSAC and refinement: SearchBySim3Override
            # projects each KF's unmatched map points through the candidate
            # Sim3 into the other image and keeps mutually-agreeing best
            # matches (loop_closer_vlad.cpp ComputeSim3 middle step)
            slot_pairs = [(rows1[i1], rows2[i2]) for i1, i2 in pairs]
            grown = self._search_by_sim3(kf, cand, res, slot_pairs)
            union = slot_pairs + grown
            # refine S21 = Sim3 cand <- current... convention: ransac aligns
            # X1c (current cam) -> X2c (cand cam), i.e. S_cand,cur.  The
            # reference's Scm maps candidate(m) -> current(c); invert.
            # OptimizeSim3 runs on the full grown set (all BF matches + the
            # Sim3-grown ones) and prunes by chi2 itself.
            resolved = []
            for a, b in union:
                mp_a = self.map.get_point(int(kf.mp_ids[a]))
                mp_b = self.map.get_point(int(cand.mp_ids[b]))
                if (mp_a is not None and not mp_a.bad
                        and mp_b is not None and not mp_b.bad):
                    resolved.append((a, b, mp_a.pid, mp_b.pid))
            n_u = len(resolved)
            P = _next_pow2(max(n_u, 32))
            s1 = np.asarray([r[0] for r in resolved], np.int64)
            s2 = np.asarray([r[1] for r in resolved], np.int64)
            p1 = np.asarray([r[2] for r in resolved], np.int64)
            p2 = np.asarray([r[3] for r in resolved], np.int64)
            Xu1 = np.zeros((P, 3), np.float32)
            Xu2 = np.zeros((P, 3), np.float32)
            uvu1 = np.zeros((P, 2), np.float32)
            uvu2 = np.zeros((P, 2), np.float32)
            cvu1 = np.ones((P, 2), np.float32)
            cvu2 = np.ones((P, 2), np.float32)
            uvalid = np.zeros(P, bool)
            Xu1[:n_u] = (self.map.pool.pos[p1]
                         @ kf.Tcw[:3, :3].T + kf.Tcw[:3, 3])
            Xu2[:n_u] = (self.map.pool.pos[p2]
                         @ cand.Tcw[:3, :3].T + cand.Tcw[:3, 3])
            uvu1[:n_u] = kf.data.uv[s1]
            uvu2[:n_u] = cand.data.uv[s2]
            cvu1[:n_u] = kf.data.cov2_inv[s1]
            cvu2[:n_u] = cand.data.cov2_inv[s2]
            uvalid[:n_u] = True
            R, t, s_, inlier, n_inl = s3.optimize_sim3(
                res.R, res.t, res.s, jnp.asarray(Xu1), jnp.asarray(Xu2),
                jnp.asarray(uvu1), jnp.asarray(uvu2), jnp.asarray(cvu1),
                jnp.asarray(cvu2), jnp.asarray(uvalid), K_intr)
            if int(n_inl) < 20:
                continue
            S_cand_cur = _np_sim3(R, t, s_)
            S_cur_cand = _sim3_inv_np(S_cand_cur)
            # Scw = Scm * Smw (:437-441), m = matched/candidate KF
            Smw = (cand.Tcw[:3, :3].astype(np.float64),
                   cand.Tcw[:3, 3].astype(np.float64), 1.0)
            Scw = _sim3_mul_np(S_cur_cand, Smw)

            # project the loop neighborhood's map points into the current KF
            loop_pids = []
            seen = set()
            for nk in cand.best_covisible(200) + [cand.kf_id]:
                nkf = self.map.keyframes.get(nk)
                if nkf is None or nkf.bad:
                    continue
                for pid in nkf.mp_ids:
                    if pid >= 0 and pid not in seen:
                        mp = self.map.get_point(int(pid))
                        if mp is not None and not mp.bad:
                            seen.add(int(pid))
                            loop_pids.append(mp.pid)
            matches = self._project_match(kf, Scw, loop_pids, radius=10.0)
            n_total = sum(1 for v in matches.values())
            if n_total >= 40:
                return cand.kf_id, Scw, (matches, loop_pids)
        return None

    def _search_by_sim3(self, kf: KeyFrame, cand: KeyFrame, res,
                        slot_pairs) -> List[tuple]:
        """Host side of SearchBySim3Override (sp_matcher_loop.cpp:7-220):
        assemble per-keypoint-slot arrays for both keyframes, run the mutual
        Sim3 projection kernel, and return agreeing new (slot1, slot2) pairs
        (:211-223).  `res` is the RANSAC Sim3 S_cand<-cur."""
        import jax.numpy as jnp

        from sp_orb_slam_tpu.ops import matching

        matched1 = {a for a, _ in slot_pairs}
        matched2 = {b for _, b in slot_pairs}

        def slot_arrays(kf_, exclude):
            N = self.cfg.runtime.max_keypoints
            pool = self.map.pool
            pos_c = np.zeros((N, 3), np.float32)
            desc = np.zeros((N, 256), np.float32)
            dmin = np.zeros(N, np.float32)
            dmax = np.full(N, 1e9, np.float32)
            ok = np.zeros(N, bool)
            R, t = kf_.Tcw[:3, :3], kf_.Tcw[:3, 3]
            for i, pid in enumerate(kf_.mp_ids):
                if pid < 0 or i in exclude:
                    continue
                mp = self.map.get_point(int(pid))
                if mp is None or mp.bad:
                    continue
                pos_c[i] = pool.pos[mp.pid] @ R.T + t
                desc[i] = pool.desc[mp.pid]
                # scale-invariance bounds incl. the 0.8/1.2 margins
                dmin[i] = 0.8 * pool.min_dist[mp.pid]
                dmax[i] = 1.2 * pool.max_dist[mp.pid]
                ok[i] = True
            return pos_c, ok, desc, dmin, dmax

        pos1, ok1, desc1, dmin1, dmax1 = slot_arrays(kf, matched1)
        pos2, ok2, desc2, dmin2, dmax2 = slot_arrays(cand, matched2)

        # res = S_cand<-cur; forward (cur map points into image 2) uses it
        # directly, backward uses the inverse
        Rr = np.asarray(res.R, np.float64)
        tr = np.asarray(res.t, np.float64)
        sr = float(res.s)
        sR21 = (sr * Rr).astype(np.float32)
        t21 = tr.astype(np.float32)
        sR12 = ((1.0 / sr) * Rr.T).astype(np.float32)
        t12 = (-(1.0 / sr) * (Rr.T @ tr)).astype(np.float32)

        cam = self.cfg.camera
        bounds = jnp.asarray(
            np.array([0.0, cam.width - 1.0, 0.0, cam.height - 1.0],
                     np.float32))
        m1, m2 = matching.search_by_sim3(
            jnp.asarray(pos1), jnp.asarray(ok1), jnp.asarray(desc1),
            jnp.asarray(dmin1), jnp.asarray(dmax1),
            kf.data.uv, kf.data.desc_dev, jnp.asarray(kf.data.valid),
            jnp.asarray(pos2), jnp.asarray(ok2), jnp.asarray(desc2),
            jnp.asarray(dmin2), jnp.asarray(dmax2),
            cand.data.uv, cand.data.desc_dev, jnp.asarray(cand.data.valid),
            jnp.asarray(sR21), jnp.asarray(t21), jnp.asarray(sR12),
            jnp.asarray(t12), self.k.K_intr, bounds, radius=7.5)
        m1 = np.asarray(m1)
        m2 = np.asarray(m2)
        grown = []
        for s1_ in np.nonzero(m1 >= 0)[0]:
            s2_ = int(m1[s1_])
            if m2[s2_] == s1_:
                grown.append((int(s1_), s2_))
        return grown

    def _project_match(self, kf: KeyFrame, Scw, pids: List[int],
                       radius: float) -> Dict[int, int]:
        """SearchByProjectionLoop (sp_matcher_loop.cpp:222-332) / the Fuse
        Sim3 overload (sp_matcher.cpp:1106-1219): project map points through
        Scw into the current KF with the reference's geometric gates —
        positive depth, in-image, scale-invariance depth range
        (0.8*dmin / 1.2*dmax via GetMin/MaxDistanceInvariance,
        sp_matcher.cpp:1159-1165) and viewing angle < 60 deg
        (PO . normal >= 0.5 * |PO|, :1168-1171; the normal is the reference's
        non-unit mean-of-rays mNormalVector) — then best descriptor within
        the window at TH_HIGH (:1204).  Returns {kp_idx: pid}."""
        import jax.numpy as jnp

        from sp_orb_slam_tpu.ops import matching

        if not pids:
            return {}
        pool = self.map.pool
        idx = np.asarray(pids, np.int64)
        Xw = pool.pos[idx].astype(np.float64)
        Xc = _sim3_apply_np(Scw, Xw)
        z = Xc[:, 2]
        ok = z > 0
        K = np.asarray(self.k.K_intr)
        u = K[0] * Xc[:, 0] / np.where(ok, z, 1.0) + K[2]
        v = K[1] * Xc[:, 1] / np.where(ok, z, 1.0) + K[3]
        cam = self.cfg.camera
        ok &= (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        # depth-range + viewing-angle gates against the Sim3 camera center
        # Ow = -Rcw^T tcw with Rcw = sR/s, tcw = t/s (sp_matcher.cpp:1119-1121)
        Rs, ts, ss = Scw
        Ow = -(np.asarray(Rs, np.float64).T @ (np.asarray(ts, np.float64) / ss))
        PO = Xw - Ow[None, :]
        dist3 = np.linalg.norm(PO, axis=1)
        ok &= ((dist3 >= 0.8 * pool.min_dist[idx])
               & (dist3 <= 1.2 * pool.max_dist[idx]))
        cosang = np.einsum('ij,ij->i', PO, pool.normal[idx].astype(np.float64))
        ok &= cosang >= 0.5 * dist3
        proj = np.stack([u, v], -1).astype(np.float32)
        # pow2-pad the query side: loop_pids counts are nearly unique per
        # call, and each distinct count recompiles the distance matmul
        n_q = len(idx)
        P = _next_pow2(max(n_q, 256))
        descp = np.zeros((P, 256), np.float32)
        descp[:n_q] = pool.desc[idx]
        dist = np.asarray(_pairwise_dist_jit(
            jnp.asarray(descp), kf.data.desc_dev))[:n_q]
        du = np.abs(kf.data.uv[None, :, 0] - proj[:, None, 0])
        dv = np.abs(kf.data.uv[None, :, 1] - proj[:, None, 1])
        mask = ((du < radius) & (dv < radius) & ok[:, None]
                & kf.data.valid[None, :])
        d = np.where(mask, dist, 1e9)
        best_kp = d.argmin(axis=1)
        best_d = d.min(axis=1)
        matches: Dict[int, int] = {}
        order = np.argsort(best_d)
        used = set()
        for pi in order:
            if best_d[pi] > matching.TH_HIGH:
                break
            kp = int(best_kp[pi])
            if kp in used:
                continue
            used.add(kp)
            matches[kp] = pids[pi]
        return matches

    # ------------------------------------------------------------- correction

    def _correct_loop(self, kf: KeyFrame, matched_kf_id: int, Scw,
                      hit) -> None:
        # CorrectLoop (loop_closer_vlad.cpp:504-699): freeze the mapper
        # (RequestStop, :511-518), kill any still-running GBA from a
        # previous loop (:520-529), do the map surgery under the map-update
        # lock (:543-639), release the mapper, then launch global BA on its
        # own transient thread (:681-690) so tracking/mapping advance while
        # it solves.
        # join any running GBA FIRST: its commit path drives its own
        # stop/release cycle on the mapper, and releasing after our own
        # request_stop would un-freeze the mapper under the surgery
        self._stop_gba()
        self.mapper.request_stop()
        self.mapper.wait_until_stopped()
        try:
            with self.map.update_lock:
                self._correct_loop_locked(kf, matched_kf_id, Scw, hit)
        finally:
            self.mapper.release()
        self._launch_gba(kf.kf_id)

    # ------------------------------------------------------- transient GBA

    def _stop_gba(self) -> None:
        """Kill a running GBA (mbStopGBA + join; loop_closer_vlad.cpp:
        520-529).  The device solve itself is not interruptible, but its
        result is discarded at the commit check."""
        t = self._gba_thread
        if t is not None and t.is_alive():
            self._gba_stop = True
            t.join()
        self._gba_thread = None
        self._gba_stop = False

    def _launch_gba(self, loop_kf_id: int) -> None:
        """Spawn RunGlobalBundleAdjustment (loop_closer_vlad.cpp:687) when
        the pipeline is threaded; the offline deterministic drive runs the
        same staged code path inline (like the mapper's two drive modes)."""
        import threading

        self.gba_running = True
        self._gba_stop = False
        if self._thread is not None:
            self._gba_thread = threading.Thread(
                target=self._run_gba, args=(loop_kf_id,), name="global_ba",
                daemon=True)
            self._gba_thread.start()
        else:
            self._run_gba(loop_kf_id)

    def _run_gba(self, loop_kf_id: int) -> None:
        """RunGlobalBundleAdjustment (loop_closer_vlad.cpp:753-849):
        snapshot under the lock, solve OUTSIDE it (tracking advances
        meanwhile), then stop the mapper and commit with spanning-tree
        propagation to keyframes/points created during the solve."""
        try:
            with self.map.update_lock:
                problem = assemble_global_ba(self.map)
            res = solve_global_ba(problem, self.k, iters=10)
            res = jax.block_until_ready(res)
            if self._gba_stop:
                return
            self.mapper.request_stop()
            self.mapper.wait_until_stopped()
            try:
                with self.map.update_lock:
                    if self._gba_stop:
                        return
                    apply_global_ba_staged(self.map, problem, res,
                                           loop_kf_id)
            finally:
                self.mapper.release()
        finally:
            self.gba_running = False

    def _correct_loop_locked(self, kf: KeyFrame, matched_kf_id: int, Scw,
                             hit) -> None:
        matches, loop_pids = hit
        world = self.map
        world.update_connections(kf)

        connected = [kf.kf_id] + [k for k in kf.connections
                                  if not world.keyframes[k].bad]
        Twc = np.linalg.inv(kf.Tcw).astype(np.float64)

        corrected: Dict[int, tuple] = {kf.kf_id: Scw}
        non_corrected: Dict[int, tuple] = {}
        for kid in connected:
            kfi = world.keyframes[kid]
            Tiw = kfi.Tcw.astype(np.float64)
            Siw = (Tiw[:3, :3], Tiw[:3, 3], 1.0)
            non_corrected[kid] = Siw
            if kid != kf.kf_id:
                Tic = Tiw @ Twc
                Sic = (Tic[:3, :3], Tic[:3, 3], 1.0)
                corrected[kid] = _sim3_mul_np(Sic, Scw)

        # remap points of the current neighborhood + set corrected poses
        remapped: Set[int] = set()
        for kid, Siw_corr in corrected.items():
            kfi = world.keyframes[kid]
            Swi_corr = _sim3_inv_np(Siw_corr)
            Siw_old = non_corrected[kid]
            for pid in kfi.mp_ids:
                if pid < 0 or pid in remapped:
                    continue
                mp = world.get_point(int(pid))
                if mp is None or mp.bad:
                    continue
                remapped.add(int(pid))
                P = world.pool.pos[mp.pid].astype(np.float64)
                world.pool.pos[mp.pid] = _sim3_apply_np(
                    Swi_corr, _sim3_apply_np(Siw_old, P)).astype(np.float32)
                world.update_normal_and_depth(mp)
            R, t, s_ = Siw_corr
            Tcorr = np.eye(4, dtype=np.float32)
            Tcorr[:3, :3] = R
            Tcorr[:3, 3] = (np.asarray(t) / s_)
            kfi.set_pose(Tcorr)
            world.update_connections(kfi)

        # fuse the matched loop points into the current KF (:625-639)
        for kp_idx, pid in matches.items():
            loop_mp = world.get_point(pid)
            if loop_mp is None or loop_mp.bad:
                continue
            cur_pid = int(kf.mp_ids[kp_idx])
            if cur_pid >= 0:
                cur_mp = world.get_point(cur_pid)
                if cur_mp is not None and not cur_mp.bad and cur_mp.pid != loop_mp.pid:
                    world.replace_point(cur_mp, loop_mp)
            else:
                world.add_observation(loop_mp, kf.kf_id, kp_idx)
                world.compute_distinctive_descriptor(loop_mp)

        # snapshot pre-fusion covisibility BEFORE any cross-loop
        # observations land: the reference takes vpPreviousNeighbors right
        # before the per-KF UpdateConnections that follows fusion
        # (loop_closer_vlad.cpp:641-668), so the diff below isolates the
        # edges the fusion created
        prev_neighbors = {kid: set(world.keyframes[kid].ordered_neighbors)
                          for kid in connected}

        # SearchAndFuse: project loop points into every corrected KF (:701-726)
        for kid in corrected:
            kfi = world.keyframes[kid]
            m2 = self._project_match(kfi, corrected[kid], loop_pids, radius=4.0)
            for kp_idx, pid in m2.items():
                loop_mp = world.get_point(pid)
                if loop_mp is None or loop_mp.bad:
                    continue
                cur_pid = int(kfi.mp_ids[kp_idx])
                if cur_pid >= 0 and cur_pid != loop_mp.pid:
                    cur_mp = world.get_point(cur_pid)
                    if cur_mp is not None and not cur_mp.bad:
                        world.replace_point(cur_mp, loop_mp)
                elif cur_pid < 0:
                    world.add_observation(loop_mp, kfi.kf_id, kp_idx)

        # new cross-loop covisibility links
        loop_connections: Dict[int, Set[int]] = {}
        for kid in connected:
            kfi = world.keyframes[kid]
            world.update_connections(kfi)
            loop_connections[kid] = (set(kfi.connections)
                                     - prev_neighbors[kid]
                                     - set(connected))

        self._essential_graph(kf, matched_kf_id, corrected, non_corrected,
                              loop_connections)

        kf.loop_edges.add(matched_kf_id)
        world.keyframes[matched_kf_id].loop_edges.add(kf.kf_id)

        # global BA is NOT run here: _correct_loop launches it on the
        # transient GBA thread after releasing the map lock (the reference
        # never holds mMutexMapUpdate across GBA either)
        self.last_loop_kf = kf.kf_id
        self.n_loops_closed += 1

    def _essential_graph(self, kf: KeyFrame, matched_kf_id: int,
                         corrected: Dict[int, tuple],
                         non_corrected: Dict[int, tuple],
                         loop_connections: Dict[int, Set[int]]) -> None:
        """OptimizeEssentialGraph (optimizer.cpp:776-1060).

        Node initialization uses the corrected Sim3 where available;
        spanning-tree/covisibility edge *measurements* use the
        non-corrected (pre-loop) poses — the odometry chain is the
        measurement, and the optimizer distributes the loop correction
        along it (optimizer.cpp: NonCorrectedSim3 edge terms).  Loop
        connections measure from the corrected poses that created them."""
        import jax.numpy as jnp

        world = self.map
        kfs = sorted(k for k, v in world.keyframes.items() if not v.bad)
        index = {k: i for i, k in enumerate(kfs)}
        N = len(kfs)

        # All sim3_log/exp go through ONE batched device program each
        # (sim3_log_batch/sim3_exp_batch): the scalar versions execute
        # eagerly primitive-by-primitive, and this method calls them per
        # node AND per edge — over the axon tunnel that measured as the
        # dominant cost of a loop event.  pow2 padding bounds compiles.
        old_sim3: Dict[int, tuple] = {}   # node init (corrected if present)
        meas_sim3: Dict[int, tuple] = {}  # edge-measurement source
        node_S = [None] * N
        for k, i in index.items():
            kfi = world.keyframes[k]
            T = kfi.Tcw.astype(np.float64)
            S_pose = (T[:3, :3], T[:3, 3], 1.0)
            S = corrected.get(k, S_pose)
            old_sim3[k] = S
            meas_sim3[k] = non_corrected.get(k, S_pose)
            node_S[i] = S
        xi = _sim3_log_rows(node_S)

        edges = []   # (i, j, meas Sim3)
        added = set()

        def add_edge(ki, kj, Sji):
            key = (min(ki, kj), max(ki, kj))
            if key in added or ki not in index or kj not in index:
                return
            added.add(key)
            edges.append((index[ki], index[kj], Sji))

        def measured(ki, kj, source):
            Si = source[ki]
            Sj = source[kj]
            return _sim3_mul_np(Sj, _sim3_inv_np(Si))

        # loop-closure connections (weight handled implicitly: the new links
        # were produced by fusion; reference gates at minFeat 100 except the
        # primary pair)
        for ki, conns in loop_connections.items():
            for kj in conns:
                w = world.keyframes[ki].connections.get(kj, 0)
                if w >= 100 or (ki == kf.kf_id and kj == matched_kf_id):
                    add_edge(ki, kj, measured(ki, kj, old_sim3))
        add_edge(kf.kf_id, matched_kf_id,
                 measured(kf.kf_id, matched_kf_id, old_sim3))
        # spanning tree + loop edges + strong covisibility: measured from the
        # pre-correction odometry
        for k in kfs:
            kfi = world.keyframes[k]
            if kfi.parent >= 0 and kfi.parent in index:
                add_edge(k, kfi.parent, measured(k, kfi.parent, meas_sim3))
            for le in kfi.loop_edges:
                add_edge(k, le, measured(k, le, meas_sim3))
            for kj, w in kfi.connections.items():
                if w >= 100:
                    add_edge(k, kj, measured(k, kj, meas_sim3))

        if not edges:
            return
        E = len(edges)
        # pow2-pad nodes and edges so the pose-graph program compiles a
        # bounded number of variants (padded nodes are fixed identities
        # with no edges; padded edges are valid=False self-loops at 0)
        NP = _next_pow2(max(N, 8))
        EP = _next_pow2(max(E, 8))
        xip = np.zeros((NP, 7), np.float32)
        xip[:N] = xi
        ei = np.zeros(EP, np.int32)
        ej = np.zeros(EP, np.int32)
        ei[:E] = [e[0] for e in edges]
        ej[:E] = [e[1] for e in edges]
        meas = np.zeros((EP, 7), np.float32)
        meas[:E] = _sim3_log_rows([e[2] for e in edges])
        valid = np.zeros(EP, bool)
        valid[:E] = True
        fixed = np.ones(NP, bool)
        fixed[:N] = False
        fixed[index[matched_kf_id]] = True  # loop KF fixed (optimizer.cpp:826)

        out = np.asarray(s3.optimize_pose_graph(
            jnp.asarray(xip), jnp.asarray(fixed), jnp.asarray(ei),
            jnp.asarray(ej), jnp.asarray(meas), jnp.asarray(valid),
            iters=20))

        # write back: poses [R t/s] and point remap through the old Sim3
        Rb, tb, sb = (np.asarray(a) for a in s3.sim3_exp_batch(
            jnp.asarray(out)))
        remapped: Set[int] = set()
        for k, i in index.items():
            kfi = world.keyframes[k]
            Rn = Rb[i].astype(np.float64)
            tn = tb[i].astype(np.float64)
            sn = float(sb[i])
            S_new = (Rn, tn, sn)
            S_old = old_sim3[k]
            # remap this KF's points: X <- S_new^-1 (S_old X)
            for pid in kfi.mp_ids:
                if pid < 0 or pid in remapped:
                    continue
                mp = world.get_point(int(pid))
                if mp is None or mp.bad:
                    continue
                remapped.add(int(pid))
                P = world.pool.pos[mp.pid].astype(np.float64)
                world.pool.pos[mp.pid] = _sim3_apply_np(
                    _sim3_inv_np(S_new), _sim3_apply_np(S_old, P)).astype(np.float32)
                world.update_normal_and_depth(mp)
            Tn = np.eye(4, dtype=np.float32)
            Tn[:3, :3] = Rn
            Tn[:3, 3] = tn / sn
            kfi.set_pose(Tn)
