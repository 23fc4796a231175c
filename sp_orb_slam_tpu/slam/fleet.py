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

        # phased drive: coarse for every stream -> batched fine kernel ->
        # per-stream fine consumption + post-track.  The whole OK-path
        # device work per tick is then 3 batched programs (extract, dust,
        # local-map) + rare per-stream fallbacks, instead of 1 + 2N.
        self._dust_prepass(frames)
        for i, frame in frames.items():
            sysi = self.systems[i]
            if sysi.cfg.online:
                sysi.start_threads()
            with sysi.timer.span("tracking/total"):
                sysi.tracker.track_frame_coarse(frame)
        self._local_prepass(frames)
        for i, frame in frames.items():
            sysi = self.systems[i]
            with sysi.timer.span("tracking/total"):
                sysi.tracker.track_frame_fine(frame)
            sysi._post_track(frame, raws[i])
            out[i] = sysi._last_valid_pose()
        return out

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
                p = t.prepare_dust(frame)
            if p is None:
                t.staged_dust = (frame, None)
            else:
                preps.append((t, frame, p))
        if not preps:
            return
        self.n_batched_dust += len(preps)
        outs = self._run_batched(self.kernels.dust_track_batch,
                                 [p[2][2] for p in preps])
        for (t, frame, (pids, Tcw_pred, _)), o in zip(preps, outs):
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
                prep = t.prepare_local_map(frame)
            groups[prep["wide"]].append((t, frame, prep))
        for wide, grp in groups.items():
            if not grp:
                continue
            self.n_batched_local += len(grp)
            outs = self._run_batched(
                lambda rows, w=wide: self.kernels.local_map_track_batch(
                    rows, wide=w),
                [p["args"] for _, _, p in grp])
            for (t, frame, prep), o in zip(grp, outs):
                t.staged_local = (frame, prep, o)

    def _run_batched(self, batch_fn, rows: list) -> list:
        """Pad per-stream arg tuples to the fixed fleet width (repeat row 0
        — one compile) and run the batched kernel; the kernels' PackedInput
        adapters turn the host args of ALL rows into one stacked upload."""
        n_live = len(rows)
        rows = list(rows)
        while len(rows) < self.n:
            rows.append(rows[0])
        return batch_fn(rows)[:n_live]

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

        bank = jnp.zeros((cap, 256), jnp.float32)
        desc_p = self.kernels.gather_rows(bank, np.zeros(P, np.int32),
                                          val(P))
        desc_l = self.kernels.gather_rows(bank, np.zeros(L, np.int32),
                                          val(L))
        desc_k = jnp.zeros((K, 256), jnp.float32)
        uv = np.zeros((K, 2), np.float32)
        cov = np.ones((K, 2), np.float32)
        dust = jnp.zeros((hc, wc), jnp.float32)
        occ = jnp.full((hc, wc), -1, jnp.int32)
        if cfg.tracking.coarse_method != "heat":
            drow = (eye, np.zeros((P, 3), np.float32), desc_p, val(P), dust,
                    occ, desc_k, uv, cov, val(K))
            self.kernels.dust_track_batch([drow] * self.n)
        lrow = (eye, np.zeros((L, 3), np.float32), desc_l,
                np.zeros((L, 3), np.float32), val(L), np.zeros(L, bool),
                np.full(K, -1, np.int64), desc_k, uv, cov, val(K))
        self.kernels.local_map_track_batch([lrow] * self.n, wide=False)
        self.kernels.local_map_track_batch([lrow] * self.n, wide=True)

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
