"""Multi-stream serving driver: N SLAM systems, ONE batched frontend.

The reference is one camera, one System, one GPU (src/system.cpp) — its
only batching axis is time.  On TPU the economics invert: the extractor
reaches its throughput knee at a 32-stream batch (NOTES.md round-2 sweep),
so a deployment serving N cameras should run N independent tracking
pipelines against a single batched extraction program, not N copies of a
B=1 program.  StreamFleet is that driver:

- one `extract` call per tick covers every live stream (B = n_streams,
  the bench.py operating point);
- ONE packed device->host readback per tick fetches all N feature sets
  (over the axon tunnel a readback costs ~25 ms flat — per-stream fetches
  would pay it N times);
- per-stream System instances share a single TrackingKernels, so the
  per-frame tracking programs compile once, not N times;
- an optional `jax.sharding.Mesh` shards the image batch (and everything
  downstream of it inside the extraction program) across chips on the
  "stream" data-parallel axis — the parallel/mesh.py scale-out applied to
  the real serving loop.

Host-side tracking state machines run sequentially per tick; they are
O(ms) host work against the device-bound extraction, and each stream's
mapper can still run on its own thread in online mode (cfg.online).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from sp_orb_slam_tpu.config import Config
from sp_orb_slam_tpu.io.dataset import RawFrame
from sp_orb_slam_tpu.slam.frame import FrameData, frame_from_features
from sp_orb_slam_tpu.slam.kernels import TrackingKernels
from sp_orb_slam_tpu.slam.system import System, build_preprocess


class StreamFleet:
    """N concurrent monocular streams through one batched frontend."""

    def __init__(self, cfg: Config, n_streams: Optional[int] = None, *,
                 params, mesh=None, axis: str = "stream"):
        import jax

        from sp_orb_slam_tpu.extractor import make_extractor

        self.cfg = cfg
        self.n = n_streams if n_streams is not None else cfg.runtime.streams
        self.kernels = TrackingKernels(cfg)
        self.systems = [System(cfg, kernels=self.kernels)
                        for _ in range(self.n)]
        self._extract = make_extractor(cfg, params)
        self._has_params = params is not None
        self._preprocess = build_preprocess(cfg)
        self.n_batched_dust = 0   # stream-frames served by the batched stages
        self.n_batched_local = 0
        self.n_batched_motion = 0  # dust-fail fallbacks served batched
        self.n_batched_retry = 0   # fine retry requests served batched
        # bank-args mode (kernels.BankRows): preps hand back gather inputs,
        # the batched kernels gather in-graph — no per-stream dispatches
        for s in self.systems:
            s.tracker.fleet_bank_mode = True
        self._bank_stack_cache = None   # (ids, banks, PreStacked)
        self._tick_feats = None         # this tick's batched extraction
        self._tick_slot = {}            # stream index -> extraction row
        self._sharding = None
        self.last_extract_placement = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P(axis))
        # the batched tracking stages (dust/local prepass, and the mappers'
        # triangulate/fuse batches) shard their stacked rows over the same
        # stream axis — the whole tick runs SPMD, not just the frontend
        self.kernels.batch_sharding = self._sharding

        kern = self.kernels

        @jax.jit
        def fetch_batch(uv, score, response, valid, cov2_inv, occ_grid,
                        count):
            return jax.vmap(lambda *a: kern.feat_layout.pack(
                uv=a[0], score=a[1], response=a[2], valid=a[3],
                cov2_inv=a[4], occ_grid=a[5], count=a[6]))(
                    uv, score, response, valid, cov2_inv, occ_grid, count)

        self._fetch_batch = fetch_batch

    # ------------------------------------------------------------------ tick

    def tick(self, raws: Sequence[Optional[RawFrame]]
             ) -> List[Optional[np.ndarray]]:
        """Advance every live stream by one frame.

        `raws[i] is None` marks stream i idle this tick (ended, or no new
        camera frame yet).  Returns the per-stream tracked pose (Twc^-1 =
        Tcw, as System.run) or None for idle / uninitialized / LOST
        streams.  Image frames across streams are extracted in ONE batched
        device program; injected-feature frames (the synthetic rail) skip
        extraction and are fed directly.
        """
        import jax.numpy as jnp

        if len(raws) != self.n:
            raise ValueError(f"expected {self.n} streams, got {len(raws)}")
        self._tick_feats = None
        self._tick_slot = {}
        out: List[Optional[np.ndarray]] = [None] * self.n
        img_streams = [i for i, r in enumerate(raws)
                       if r is not None and r.injected is None]
        inj_streams = [i for i, r in enumerate(raws)
                       if r is not None and r.injected is not None]

        frames: dict = {}
        if img_streams:
            Hc, Wc = self.cfg.camera.height, self.cfg.camera.width
            imgs = np.stack([
                raws[i].image.astype(np.float32)[:Hc, :Wc] / 255.0
                for i in img_streams])
            if len(img_streams) < self.n:
                # pad to the fixed fleet width (repeat row 0, like
                # _run_batched): ONE extractor compile regardless of how
                # many streams are idle this tick, and the stream-mesh
                # sharding keeps applying
                pad = np.broadcast_to(imgs[0],
                                      (self.n - len(imgs),) + imgs[0].shape)
                imgs = np.concatenate([imgs, pad])
            dev = jnp.asarray(imgs)
            if self._sharding is not None:
                import jax

                dev = jax.device_put(dev, self._sharding)
            if self._preprocess is not None:
                import jax

                dev = jax.vmap(self._preprocess)(dev)
            feats = self._extract(dev)
            self.last_extract_placement = {
                "in": dev.sharding, "out": feats.uv.sharding}
            self._tick_feats = feats
            self._tick_slot = {i: b for b, i in enumerate(img_streams)}
            packed = np.asarray(self._fetch_batch(
                feats.uv, feats.score, feats.response, feats.valid,
                feats.cov2_inv, feats.occ_grid, feats.count))
            for b, i in enumerate(img_streams):
                host = self.kernels.feat_layout.unpack(packed[b])
                host["uv"] = host["uv"].astype(np.float32)
                host["score"] = host["score"].astype(np.float32)
                host["response"] = host["response"].astype(np.float32)
                host["cov2_inv"] = host["cov2_inv"].astype(np.float32)
                host["occ_grid"] = host["occ_grid"].astype(np.int32)
                sysi = self.systems[i]
                sysi._apply_pending_toggles()
                frame = frame_from_features(feats, b, sysi.frame_id,
                                            raws[i].timestamp, host)
                frame.global_desc = raws[i].global_desc
                frames[i] = frame
        for i in inj_streams:
            sysi = self.systems[i]
            sysi._apply_pending_toggles()
            frames[i] = sysi._frame_from_injected(raws[i])
            frames[i].global_desc = raws[i].global_desc

        # phased drive: coarse for every stream -> batched motion fallback
        # for the streams whose dust stage failed -> batched fine kernel ->
        # per-stream fine consumption + post-track.  The whole per-tick
        # device work is then a BOUNDED number of batched programs
        # (extract, dust, motion-fallback, local-map) + rare per-stream
        # paths (init, reloc, ref-KF), instead of 1 + O(N).
        self._dust_prepass(frames)
        deferred = []
        for i, frame in frames.items():
            sysi = self.systems[i]
            if sysi.cfg.online:
                sysi.start_threads()
            with sysi.timer.span("tracking/total"):
                margs = sysi.tracker.coarse_phase1(frame)
            if margs is not None:
                deferred.append((i, frame, margs))
        if deferred:
            self.n_batched_motion += len(deferred)
            rows = self._prestack([d[2] for d in deferred],
                                  [d[0] for d in deferred], ((4, "desc"),))
            outs = self._run_batched(self.kernels.motion_track_batch, rows)
            for (i, frame, _), o in zip(deferred, outs):
                sysi = self.systems[i]
                with sysi.timer.span("tracking/total"):
                    sysi.tracker.coarse_phase2(frame, o)
        self._local_prepass(frames)
        self._fine_retry_rounds(frames)
        for i, frame in frames.items():
            sysi = self.systems[i]
            with sysi.timer.span("tracking/total"):
                sysi.tracker.track_frame_fine(frame)
            sysi._post_track(frame, raws[i])
            out[i] = sysi._last_valid_pose()
        return out

    def _fine_retry_rounds(self, frames: dict) -> None:
        """Drive every stream's fine retry machine (tracking._fine_begin /
        _fine_step) in lock-step rounds: per round, ONE batched wide-search
        program covers the "wide"/"vel"/"polish" requests (identical kernel
        + arg shapes) and ONE batched multi-start program covers the
        "reloc" requests — so a tick where every stream needs the full
        rescue cascade still dispatches O(rounds) programs, not O(N)."""
        reqs = {}
        for i, frame in frames.items():
            t = self.systems[i].tracker
            r = t.fine_begin_fleet(frame)
            if r is not None:
                reqs[i] = (t, frame, r)
        while reqs:
            nxt = {}
            wide_grp = [(i, t, f, r[1]) for i, (t, f, r) in reqs.items()
                        if r[0] != "reloc"]
            reloc_grp = [(i, t, f, r[1]) for i, (t, f, r) in reqs.items()
                         if r[0] == "reloc"]
            for grp, batch_fn, desc_pos in (
                    (wide_grp, lambda rows, bank=False: self.kernels
                     .local_map_track_batch(rows, wide=True, bank=bank),
                     ((7, "desc"),)),
                    (reloc_grp, self.kernels.reloc_track_batch,
                     ((4, "desc"),))):
                if not grp:
                    continue
                self.n_batched_retry += len(grp)
                rows = self._prestack([g[3] for g in grp],
                                      [g[0] for g in grp], desc_pos)
                outs = self._run_batched(batch_fn, rows)
                for (i, t, f, _), o in zip(grp, outs):
                    r2 = t.fine_step_fleet(f, o)
                    if r2 is not None:
                        nxt[i] = (t, f, r2)
            reqs = nxt

    def _dust_prepass(self, frames: dict) -> None:
        """Batch the dust coarse stage across every OK stream: one vmapped
        kernel + ONE packed readback instead of N sequential per-stream
        calls (each ~25 ms of tunnel latency in this environment, and N
        kernel dispatches anywhere).  Streams where the prep finds nothing
        stage a no-points marker; streams not in the OK dust regime
        (initializing, LOST, heat variant, localization-vo arbitration)
        simply keep the per-stream path."""
        import jax.numpy as jnp

        from sp_orb_slam_tpu.slam import tracking as tr

        if self.cfg.tracking.coarse_method == "heat":
            return
        preps = []
        for i, frame in frames.items():
            t = self.systems[i].tracker
            if t.state != tr.OK or (t.only_tracking and t.vo_mode):
                continue
            # same locking as _local_prepass: in online mode the stream's
            # mapper thread runs concurrently, and prepare_dust walks the
            # point pool / keyframes
            with t.map.update_lock:
                p = t.prepare_dust(frame, bank_desc=True)
            if p is None:
                t.staged_dust = (frame, None)
            else:
                preps.append((i, t, frame, p))
        if not preps:
            return
        self.n_batched_dust += len(preps)
        rows = self._prestack([p[3][2] for p in preps],
                              [p[0] for p in preps],
                              ((4, "dense_dust"), (5, "occ_grid"),
                               (6, "desc")))
        outs = self._run_batched(self.kernels.dust_track_batch, rows)
        for (i, t, frame, (pids, Tcw_pred, _)), o in zip(preps, outs):
            t.staged_dust = (frame, (pids, Tcw_pred, o))

    def _local_prepass(self, frames: dict) -> None:
        """Batch the fine (local-map) stage's primary kernel call across
        every stream whose coarse phase succeeded; narrow- and wide-window
        variants batch separately (fixed width each = one compile apiece).
        The starvation/aliasing retries stay per-stream — they fire
        rarely and depend on the primary result."""
        groups = {False: [], True: []}
        for i, frame in frames.items():
            t = self.systems[i].tracker
            if t._phase is None or not t._phase[0]:
                continue        # init frame, or every coarse stage failed
            with t.map.update_lock:
                prep = t.prepare_local_map(frame, bank_desc=True)
            groups[prep["wide"]].append((i, t, frame, prep))
        for wide, grp in groups.items():
            if not grp:
                continue
            self.n_batched_local += len(grp)
            rows = self._prestack([p["args"] for _, _, _, p in grp],
                                  [g[0] for g in grp], ((7, "desc"),))
            outs = self._run_batched(
                lambda rows, w=wide, bank=False: self.kernels
                .local_map_track_batch(rows, wide=w, bank=bank),
                rows)
            for (i, t, frame, prep), o in zip(grp, outs):
                t.staged_local = (frame, prep, o)

    def _run_batched(self, batch_fn, rows: list, desc_idx: int = 2) -> list:
        """Pad per-stream arg tuples to the fixed fleet width (repeat row 0
        — one compile) and run the batched kernel; the kernels' PackedInput
        adapters turn the host args of ALL rows into one stacked upload.
        Rows whose descriptor slot is a BankRows placeholder are converted
        to the bank-gather kernel layout (gather runs in-graph)."""
        n_live = len(rows)
        rows = list(rows)
        while len(rows) < self.n:
            rows.append(rows[0])
        rows, bank = self._bankify(rows, desc_idx)
        return batch_fn(rows, bank=bank)[:n_live]

    def _bankify(self, rows: list, desc_idx: int):
        """BankRows rows -> bank-kernel layout: the host row indices take
        the descriptor slot and ONE trailing PreStacked carries the stacked
        per-stream descriptor banks.  The stack is cached across ticks
        keyed on the bank arrays' identities (refs held so ids can't be
        recycled) — banks change only at mapper events, so a localization
        fleet uploads the stack once per session."""
        from sp_orb_slam_tpu.slam.kernels import BankRows, PreStacked

        if not isinstance(rows[0][desc_idx], BankRows):
            return rows, False
        import jax
        import jax.numpy as jnp

        banks = [r[desc_idx].bank for r in rows]
        key = tuple(id(b) for b in banks)
        if self._bank_stack_cache is None or self._bank_stack_cache[0] != key:
            stacked = jnp.stack(banks)
            if self._sharding is not None:
                stacked = jax.device_put(stacked, self._sharding)
            self._bank_stack_cache = (key, banks, PreStacked(stacked))
        ps = self._bank_stack_cache[2]
        out = []
        for r in rows:
            rr = list(r)
            rr[desc_idx] = r[desc_idx].rows
            rr.append(ps)
            out.append(tuple(rr))
        return out, True

    def _prestack(self, rows: list, stream_ids: list, pos_fields) -> list:
        """Replace per-stream sliced frame args (each a row of this tick's
        batched extraction output) with ONE gathered PreStacked per arg
        position: one take-dispatch per arg for the whole fleet instead of
        N slice dispatches + a stack inside call_rows."""
        from sp_orb_slam_tpu.slam.kernels import PreStacked

        feats = self._tick_feats
        if feats is None or any(i not in self._tick_slot
                                for i in stream_ids):
            return rows
        import jax
        import jax.numpy as jnp

        idx = [self._tick_slot[i] for i in stream_ids]
        while len(idx) < self.n:
            idx.append(idx[0])
        idxa = jnp.asarray(np.asarray(idx, np.int32))
        rows = [list(r) for r in rows]
        for pos_, field in pos_fields:
            arr = getattr(feats, field)
            if arr is None:
                continue
            g = jnp.take(arr, idxa, axis=0)
            if self._sharding is not None:
                g = jax.device_put(g, self._sharding)
            ps = PreStacked(g)
            for r in rows:
                r[pos_] = ps
        return [tuple(r) for r in rows]

    def warmup(self) -> None:
        """Precompile every device program a serving tick can hit — the
        batched extraction + packed feature fetch at fleet width, the
        batched dust/local stages (narrow AND wide), and every per-stream
        kernel variant (fallback cascade, retries, reloc, init, mapper) —
        so the post-warmup tick tail is kernel-bound instead of
        compile-bound (VERDICT r3 weak #7: online frame_ms_max 650-7900 ms
        were all first-hit compiles)."""
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        if self._has_params:  # injected-feature fleets never extract
            H, W = cfg.camera.height, cfg.camera.width
            dev = jnp.zeros((self.n, H, W), jnp.float32)
            if self._sharding is not None:
                dev = jax.device_put(dev, self._sharding)
            if self._preprocess is not None:
                dev = jax.vmap(self._preprocess)(dev)
            feats = self._extract(dev)
            np.asarray(self._fetch_batch(
                feats.uv, feats.score, feats.response, feats.valid,
                feats.cov2_inv, feats.occ_grid, feats.count))

        cap = self.systems[0].map.pool.capacity
        self.kernels.warmup(pool_capacity=cap)

        # batched fleet variants (call_rows patterns)
        K = cfg.runtime.max_keypoints
        P = cfg.runtime.dust_points_cap
        L = cfg.runtime.local_points_cap
        hc, wc = cfg.grid_h, cfg.grid_w
        eye = np.eye(4, dtype=np.float32)

        def val(n):
            v = np.zeros(n, bool)
            v[:4] = True
            return v

        from sp_orb_slam_tpu.slam.kernels import BankRows

        bank = jnp.zeros((cap, 256), jnp.float32)
        # per-stream gathers still serve the per-stream fallback paths
        self.kernels.gather_rows(bank, np.zeros(P, np.int32), val(P))
        self.kernels.gather_rows(bank, np.zeros(L, np.int32), val(L))
        # the batched fleet stages run in bank-args mode: the descriptor
        # slot is a BankRows placeholder and _run_batched converts to the
        # bank-gather kernels (exactly the production tick's layout)
        br_p = BankRows(np.zeros(P, np.int32), val(P), bank)
        br_l = BankRows(np.zeros(L, np.int32), val(L), bank)
        desc_k = jnp.zeros((K, 256), jnp.float32)
        uv = np.zeros((K, 2), np.float32)
        cov = np.ones((K, 2), np.float32)
        dust = jnp.zeros((hc, wc), jnp.float32)
        occ = jnp.full((hc, wc), -1, jnp.int32)
        if cfg.tracking.coarse_method != "heat":
            drow = (eye, np.zeros((P, 3), np.float32), br_p, val(P), dust,
                    occ, desc_k, uv, cov, val(K))
            self._run_batched(self.kernels.dust_track_batch,
                              [drow] * self.n)
        lrow = (eye, np.zeros((L, 3), np.float32), br_l,
                np.zeros((L, 3), np.float32), val(L), np.zeros(L, bool),
                np.full(K, -1, np.int64), desc_k, uv, cov, val(K))
        for wide in (False, True):
            self._run_batched(
                lambda rows, w=wide, bank=False: self.kernels
                .local_map_track_batch(rows, wide=w, bank=bank),
                [lrow] * self.n)
        mrow = (eye, np.zeros((L, 3), np.float32), br_l, val(L),
                desc_k, uv, cov, val(K))
        self._run_batched(self.kernels.motion_track_batch, [mrow] * self.n)
        T0s = np.stack([np.eye(4, dtype=np.float32)] * 16)
        rrow = (T0s, np.zeros((L, 3), np.float32), br_l, val(L),
                desc_k, uv, cov, val(K))
        self._run_batched(self.kernels.reloc_track_batch, [rrow] * self.n)

    # ------------------------------------------------------------- lifecycle

    def spin(self, datasets: Sequence, max_frames: Optional[int] = None
             ) -> None:
        """Drive N datasets to exhaustion (streams may end at different
        lengths; finished streams go idle)."""
        iters = [iter(d) for d in datasets]
        done = [False] * self.n
        n_ticks = 0
        while not all(done):
            raws: List[Optional[RawFrame]] = []
            for i, it in enumerate(iters):
                if done[i]:
                    raws.append(None)
                    continue
                try:
                    raws.append(next(it))
                except StopIteration:
                    done[i] = True
                    raws.append(None)
            if all(r is None for r in raws):
                break
            self.tick(raws)
            n_ticks += 1
            if max_frames is not None and n_ticks >= max_frames:
                break
        self.shutdown()

    def load_map(self, path: str, localization: bool = True) -> None:
        """Multi-camera localization server: every stream loads the same
        saved map (slam/serialize.py) and, by default, freezes it
        (localization mode).  Each stream keeps its own Map instance so
        per-stream bookkeeping (found/visible counters, reloc state) stays
        independent — correct, since a frozen map is never written back."""
        for s in self.systems:
            s.load_map(path)
            if localization:
                s.activate_localization_mode()

    def shutdown(self) -> None:
        for s in self.systems:
            if s.cfg.online:
                s.shutdown()

    def report(self) -> List[dict]:
        return [s.report() for s in self.systems]
