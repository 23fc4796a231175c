"""System orchestrator: wiring, the spin loop, trajectory export.

Rebuild of `System` (include/orb_slam/system.h, src/system.cpp,
src/system_helper.cpp): constructs the map + tracking + mapping (+ loop
closing when enabled), drives frames through the pipeline — deterministic
offline mode runs mapping synchronously after each frame (spinOnce,
system.cpp:176-178) — and exports TUM/KITTI/EuRoC trajectories by
re-chaining relative poses through (possibly culled) reference keyframes
(system_helper.cpp:89-318).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from sp_orb_slam_tpu.config import Config
from sp_orb_slam_tpu.io.dataset import RawFrame, make_dataset
from sp_orb_slam_tpu.slam.frame import FrameData
from sp_orb_slam_tpu.slam.kernels import TrackingKernels
from sp_orb_slam_tpu.slam.local_mapping import LocalMapping
from sp_orb_slam_tpu.slam.map import Map
from sp_orb_slam_tpu.slam.tracking import Tracking
from sp_orb_slam_tpu.utils.timing import Timer


def _rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """(x, y, z, w) quaternion from a rotation matrix."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


def rechain_trajectory(world, rel_poses, refs, times):
    """Absolute Twc per tracked frame from (Tcr, ref KF) records, re-chained
    through surviving spanning-tree ancestors (SaveTrajectoryTUM,
    system_helper.cpp:89-158).  Tcw_frame = Tcr · Tcp_r · Tcp_p · ... ·
    Tcw_ancestor — each culled hop RIGHT-multiplies (Trw = Trw*mTcp, then
    Trw*Tcw, :138-147), since Tcp = Tcw_child · Tcw_parent^-1."""
    ts, poses = [], []
    for rel, ref_id, t in zip(rel_poses, refs, times):
        kf = world.keyframes.get(ref_id)
        if kf is None:
            continue
        Trw = np.eye(4, dtype=np.float32)
        while kf.bad:
            Trw = Trw @ kf.Tcp
            kf = world.keyframes.get(kf.parent)
            if kf is None:
                break
        if kf is None:
            continue
        Trw = Trw @ kf.Tcw
        Tcw = rel @ Trw
        ts.append(t)
        poses.append(np.linalg.inv(Tcw))
    return np.asarray(ts), np.asarray(poses)


def build_preprocess(cfg: Config):
    """On-device rectification when the raw stream is distorted (the
    reference pre-rectifies EuRoC with initUndistortRectifyMap + remap,
    data_loader.cc:470-489,517-527).  Returns None for undistorted
    streams.  The closure is vmappable: fleet.StreamFleet maps it over a
    stream batch."""
    import jax
    import jax.numpy as jnp

    from sp_orb_slam_tpu.geometry import camera as cam_ops
    from sp_orb_slam_tpu.io.dataset import EurocDataset

    cam = cfg.camera
    dist = np.array([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], np.float32)
    if not np.any(dist):
        return None
    K_new = jnp.array([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)
    if cfg.dataset.startswith("euroc"):
        K_raw = jnp.asarray(EurocDataset.RAW_K)
    else:
        K_raw = K_new
    grid = cam_ops.rectify_map(K_new, K_raw, jnp.asarray(dist),
                               cam.height, cam.width)

    @jax.jit
    def run(img):
        return cam_ops.bilinear_remap(img, grid)

    return run


class System:
    def __init__(self, cfg: Config, params=None, kernels=None):
        """`kernels` optionally injects a shared TrackingKernels instance:
        the kernels are pure config-bound functions with no per-run state,
        so N systems (slam/fleet.py) can reuse one set of compiled
        programs instead of paying N identical compiles."""
        self.cfg = cfg
        self.map = Map()
        self.kernels = kernels if kernels is not None else TrackingKernels(cfg)
        self.mapper = LocalMapping(cfg, self.map, self.kernels)
        self.tracker = Tracking(cfg, self.map, self.kernels, self.mapper)
        self.looper = None
        if cfg.use_loop:
            from sp_orb_slam_tpu.slam.loop_closing import LoopClosing

            self.looper = LoopClosing(cfg, self.map, self.kernels, self.mapper)
            self.mapper.looper = self.looper
            if cfg.loop.global_desc_source != "dataset":
                self.map.global_desc_fn = self._make_global_desc_fn()
        self.frame_id = 0
        # interactive gating + mode toggles (the reference's global::b_*
        # atomics written by the viewer menu, viz/viewer.cpp:56-126, and
        # consumed by System::spin/run, system.cpp:141-233)
        self.paused = False
        self.step_once = False           # process exactly one frame while paused
        self._local_on = False           # pending ActivateLocalizationMode
        self._local_off = False          # pending DeactivateLocalizationMode
        self._system_reset = False       # pending resetSystem
        self.debug_dir: Optional[str] = None
        self.viewer = None               # live HTTP viewer (viz/live.py)
        self._extract = None
        self._preprocess = None
        self._prefetched = None          # (raw, feats device handles) in flight
        self._next_raw = None            # spin's lookahead frame, if any
        if params is not None:
            from sp_orb_slam_tpu.extractor import make_extractor

            self._extract = make_extractor(cfg, params)
            self._preprocess = self._build_preprocess()
        self.timer = Timer()

    def _build_preprocess(self):
        return build_preprocess(self.cfg)

    def warmup(self) -> None:
        """Precompile every device program this system can hit before the
        first frame (kernels.TrackingKernels.warmup + the extractor at
        B=1): online-mode latency spikes are first-hit compiles landing
        mid-run (round-3 sweeps measured 650-7900 ms tails), so serving
        paths warm up front and the per-frame tail stays kernel-bound."""
        import jax
        import jax.numpy as jnp

        self.kernels.warmup(pool_capacity=self.map.pool.capacity)
        if self.looper is not None:
            self.looper.warmup()
        if self._extract is not None:
            H, W = self.cfg.camera.height, self.cfg.camera.width
            img = jnp.zeros((H, W), jnp.float32)
            if self._preprocess is not None:
                img = self._preprocess(img)
            feats = self._extract(img[None])
            self.kernels.fetch_features_host(feats)
            jax.block_until_ready(feats.desc)

    def _make_global_desc_fn(self):
        """In-process NetVLAD place-recognition hook (models/netvlad.py):
        runs at keyframe promotion in Map.add_keyframe.  "auto" fills only
        frames the dataset left without a descriptor; "vlad" always
        recomputes (config.py LoopConfig.global_desc_source)."""
        from sp_orb_slam_tpu.models import netvlad

        lc = self.cfg.loop
        params = (netvlad.load_params(lc.netvlad_weights)
                  if lc.netvlad_weights else
                  netvlad.init_params(n_clusters=lc.netvlad_clusters,
                                      out_dim=lc.global_desc_dim))

        def fn(frame):
            if frame.global_desc is not None and lc.global_desc_source != "vlad":
                return None
            return netvlad.global_descriptor_np(
                params, frame.desc_host, frame.valid)

        return fn

    # ------------------------------------------------------------ frame feed

    def _frame_from_injected(self, raw: RawFrame) -> FrameData:
        import jax.numpy as jnp

        inj = raw.injected
        f = FrameData(
            frame_id=self.frame_id,
            timestamp=raw.timestamp,
            uv=inj["uv"], score=inj["score"],
            response=inj.get("response", inj["score"]), valid=inj["valid"],
            cov2_inv=inj["cov2_inv"], occ_grid=inj["occ_grid"],
            count=inj["count"],
            global_desc=raw.global_desc,
            desc_dev=jnp.asarray(inj["desc"]),
            dust_dev=jnp.asarray(inj["dust"]),
            occ_grid_dev=jnp.asarray(inj["occ_grid"]),
            heat_dev=(jnp.asarray(inj["heat"])
                      if inj.get("heat") is not None else None),
        )
        f._desc_host = inj["desc"]
        return f

    def _dispatch_extract(self, raw: RawFrame):
        """Enqueue the extractor program for ``raw`` and return the device
        handles WITHOUT reading anything back.  jit dispatch is async, so
        the caller can overlap the device execution (and, over the axon
        tunnel, the d2h roundtrip) with host work.  Pure function of the
        image: prefetched results are bit-identical to inline extraction."""
        import jax.numpy as jnp

        img = raw.image.astype(np.float32) / 255.0
        # crop to the configured size (system.cpp:160-161)
        H, W = self.cfg.camera.height, self.cfg.camera.width
        img = img[:H, :W]
        dev = jnp.asarray(img)
        if self._preprocess is not None:
            dev = self._preprocess(dev)
        return self._extract(dev[None])

    def _frame_from_image(self, raw: RawFrame) -> FrameData:
        from sp_orb_slam_tpu.slam.frame import frame_from_features

        if self._prefetched is not None and self._prefetched[0] is raw:
            feats = self._prefetched[1]
        else:
            feats = self._dispatch_extract(raw)
        self._prefetched = None
        host = self.kernels.fetch_features_host(feats)
        f = frame_from_features(feats, 0, self.frame_id, raw.timestamp, host)
        f.global_desc = raw.global_desc
        return f

    def process(self, raw: RawFrame) -> None:
        if self.cfg.online:
            self.start_threads()
        with self.timer.span("tracking/frame"):
            if raw.injected is not None:
                frame = self._frame_from_injected(raw)
            else:
                frame = self._frame_from_image(raw)
        self.process_frame(frame, raw)

    def process_frame(self, frame: FrameData, raw: Optional[RawFrame] = None
                      ) -> None:
        """Track one pre-built frame (features already extracted).  The
        batched entry point: slam/fleet.py extracts N streams' features in
        one device program and feeds each system here."""
        if self.cfg.online:
            self.start_threads()
        with self.timer.span("tracking/total"):
            self.tracker.track_frame(frame)
        self._post_track(frame, raw)

    def _post_track(self, frame: FrameData, raw: Optional[RawFrame] = None
                    ) -> None:
        """Everything after tracking: observability, reset handling, the
        offline mapping/loop spins, frame counting.  Split out so the
        fleet's phased drive (slam/fleet.py) can run it after
        track_frame_fine."""
        # prefetch: enqueue the NEXT frame's extraction before this frame's
        # host-side work (debug PNG encode, mapping/loop spins) so the
        # device executes it — and its d2h roundtrip flies — while the host
        # is busy.  Safe across reset/pause/toggles: extraction is a pure
        # jit function of the image, consumed (or dropped) by id match.
        nxt = self._next_raw
        if (nxt is not None and self.cfg.runtime.prefetch_extract
                and nxt.injected is None and self._extract is not None
                and self._prefetched is None):
            self._prefetched = (nxt, self._dispatch_extract(nxt))
        if self.debug_dir is not None and raw is not None:
            self._write_debug(raw, frame)
        if self.viewer is not None:
            from sp_orb_slam_tpu.slam import tracking as tr

            state = {tr.OK: "OK", tr.LOST: "LOST"}.get(
                self.tracker.state, "INIT")
            self.viewer.publish(raw, frame, state,
                                dust_pids=self.tracker.last_dust_pids)
        if self.tracker.request_reset:
            self.reset()
            return
        if not self.cfg.online:
            with self.timer.span("mapping"):
                self.mapper.spin_once()
            if self.looper is not None:
                with self.timer.span("loop"):
                    self.looper.spin_once()
        self.frame_id += 1

    # -------------------------------------------------------- observability

    def set_debug_dir(self, path: Optional[str]) -> None:
        """Enable per-frame overlay + periodic map-snapshot dumps (the
        offline equivalent of the reference's Pangolin viewer, viz/*)."""
        self.debug_dir = path
        if path:
            os.makedirs(os.path.join(path, "frames"), exist_ok=True)
            os.makedirs(os.path.join(path, "map"), exist_ok=True)

    def _write_debug(self, raw: RawFrame, frame) -> None:
        from sp_orb_slam_tpu.slam import tracking as tr
        from sp_orb_slam_tpu.viz import draw_frame, draw_map, save_png

        state = {tr.OK: "OK", tr.LOST: "LOST"}.get(self.tracker.state, "INIT")
        img = draw_frame(frame, self.map,
                         dust_pids=self.tracker.last_dust_pids,
                         image=raw.image,
                         K_intr=np.asarray(self.kernels.K_intr),
                         state=state)
        save_png(os.path.join(self.debug_dir, "frames",
                              f"{self.frame_id:06d}.png"), img)
        if self.frame_id % 20 == 0 or self.tracker.state == tr.LOST:
            _, poses = self.trajectory()
            traj = poses[:, :3, 3] if len(poses) else None
            with self.map.update_lock:
                draw_map(self.map,
                         os.path.join(self.debug_dir, "map",
                                      f"{self.frame_id:06d}.png"),
                         current_kf=self.tracker.ref_kf, trajectory=traj)

    # ------------------------------------------------------- mode toggles

    def activate_localization_mode(self) -> None:
        """Queue the switch to tracking-only (ActivateLocalizationMode):
        applied at the next `run`/`process`, like the reference's
        `global::b_local_on` flag (system.cpp:203-215)."""
        self._local_on = True
        self._local_off = False

    def deactivate_localization_mode(self) -> None:
        self._local_off = True
        self._local_on = False

    def request_system_reset(self) -> None:
        """The viewer-menu Reset equivalent (`global::b_system_reset`,
        system.cpp:222-226)."""
        self._system_reset = True

    def _apply_pending_toggles(self) -> None:
        if self._local_on:
            # stop the mapper (and wait, in online mode) so the map is
            # frozen, then inform the tracker (system.cpp:204-215)
            self.mapper.request_stop()
            self.mapper.wait_until_stopped()
            self.tracker.only_tracking = True
            self._local_on = False
        if self._local_off:
            self.tracker.only_tracking = False
            self.mapper.release()
            self._local_off = False
        if self._system_reset:
            self.reset()
            self._system_reset = False

    def run(self, raw: RawFrame) -> Optional[np.ndarray]:
        """Single-shot API (System::run, system.cpp:202-233): apply pending
        localization/reset toggles, track one frame, return its Tcw.  None
        signals an invalid pose: uninitialized, or LOST (after a LOST frame
        ``last_frame.Tcw`` holds the failed stage's predicted/fan pose, which
        must not be handed to callers as if it were tracked)."""
        self._apply_pending_toggles()
        self.process(raw)
        return self._last_valid_pose()

    def run_frame(self, frame: FrameData) -> Optional[np.ndarray]:
        """`run` for a pre-built frame (the fleet path)."""
        self._apply_pending_toggles()
        self.process_frame(frame)
        return self._last_valid_pose()

    def _last_valid_pose(self) -> Optional[np.ndarray]:
        from sp_orb_slam_tpu.slam.tracking import LOST

        lf = self.tracker.last_frame
        if lf is None or self.tracker.state == LOST:
            return None
        return lf.Tcw

    def start_threads(self) -> None:
        """Online mode: mapping (and loop closing) run on their own threads
        (system.cpp:92-115); tracking stays on the caller's thread."""
        self.mapper.start()
        if self.looper is not None:
            self.looper.start()

    def shutdown(self) -> None:
        """Drain the pipeline and join backend threads
        (System::Shutdown, system_helper.cpp:59-87)."""
        self.mapper.drain()
        if self.looper is not None:
            while self.looper.queue:
                if self.looper._thread is None:
                    self.looper.spin_once()
                    break
                import time

                time.sleep(1e-3)
            self.looper.shutdown()
        self.mapper.shutdown()

    def spin(self, dataset=None, max_frames: Optional[int] = None) -> None:
        if dataset is None:
            dataset = make_dataset(self.cfg)
        it = iter(dataset)
        raw = next(it, None)
        i = 0
        while raw is not None:
            if max_frames is not None and i >= max_frames:
                break
            # one-frame lookahead feeds the extraction prefetch dispatched
            # inside _post_track (overlaps device work with the host spins)
            nxt = next(it, None)
            if max_frames is not None and i + 1 >= max_frames:
                nxt = None
            self._next_raw = nxt
            # pause/step gate (the reference spin's b_pause/b_step check,
            # system.cpp:146-158) + pending mode toggles
            if self.paused and not self.step_once:
                import time

                while self.paused and not self.step_once:
                    time.sleep(1e-2)
            self.step_once = False
            self._apply_pending_toggles()
            self.process(raw)
            raw = nxt
            i += 1
        self._next_raw = None
        self._prefetched = None
        if self.cfg.online:
            self.shutdown()

    def reset(self) -> None:
        """System::resetSystem (system_helper.cpp:12-52)."""
        online = self.mapper._thread is not None
        if self.looper is not None:
            # LoopClosing::RequestReset equivalent: drop queued KFs, the
            # place-recognition database, consistency state, and any
            # in-flight transient GBA before its result could land on the
            # cleared map.  Join the GBA FIRST: its commit path drives its
            # own mapper stop/release cycle, which would unfreeze a mapper
            # we stopped below.
            self.looper._stop_gba()
            self.looper.queue.clear()
            self.looper.db.clear()
            self.looper.consistent_groups.clear()
            self.looper.last_loop_kf = -10 ** 9
        if online:  # freeze the mapping thread before clearing under it
            self.mapper.request_stop()
            self.mapper.wait_until_stopped()
        with self.map.update_lock:
            self.map.clear()
            self.mapper.queue.clear()
            self.mapper.recent_pids.clear()
            tr = self.tracker
            only_tracking = tr.only_tracking
            self.tracker = Tracking(self.cfg, self.map, self.kernels,
                                    self.mapper)
            self.tracker.only_tracking = only_tracking
            self.tracker.fleet_bank_mode = tr.fleet_bank_mode
            self.tracker.rel_poses = tr.rel_poses
            self.tracker.refs = tr.refs
            self.tracker.times = tr.times
            self.tracker.lost_flags = tr.lost_flags
        if online:
            self.mapper.release()

    # ------------------------------------------------------- map persistence

    def save_map(self, path: str) -> None:
        """Persist the live map (slam/serialize.py).  The reference has no
        map persistence at all (SURVEY.md §5) — this enables the build-once
        / localize-many serving pattern."""
        from sp_orb_slam_tpu.slam.serialize import save_map

        with self.map.update_lock:
            save_map(self.map, path)

    def load_map(self, path: str) -> None:
        """Replace the current map with a saved one and arm the tracker for
        cold-start relocalization (the first frames enter through the
        multi-start relocalization path instead of two-view init).  Call
        before spinning; typically paired with
        `activate_localization_mode()` to freeze the loaded map."""
        from sp_orb_slam_tpu.slam.serialize import load_map
        from sp_orb_slam_tpu.slam.tracking import LOST

        was_online = self.mapper._thread is not None
        if was_online:
            self.mapper.request_stop()
            self.mapper.wait_until_stopped()
        hook = self.map.global_desc_fn
        self.map = load_map(path, mp_capacity=self.map.pool.capacity)
        self.map.global_desc_fn = hook
        self.mapper = LocalMapping(self.cfg, self.map, self.kernels)
        if self.looper is not None:
            from sp_orb_slam_tpu.slam.loop_closing import LoopClosing

            self.looper.shutdown()
            self.looper = LoopClosing(self.cfg, self.map, self.kernels,
                                      self.mapper)
            self.mapper.looper = self.looper
        only_tracking = self.tracker.only_tracking
        fleet_bank = self.tracker.fleet_bank_mode
        self.tracker = Tracking(self.cfg, self.map, self.kernels,
                                self.mapper)
        self.tracker.only_tracking = only_tracking
        self.tracker.fleet_bank_mode = fleet_bank
        live = [k for k, kf in self.map.keyframes.items() if not kf.bad]
        if live:
            self.tracker.state = LOST
            self.tracker.ref_kf = max(live)
        if was_online:
            self.start_threads()

    # ------------------------------------------------------------ trajectory

    def trajectory(self):
        """Absolute Twc per tracked frame, re-chained through surviving
        spanning-tree ancestors (system_helper.cpp:89-158)."""
        tr = self.tracker
        return rechain_trajectory(self.map, tr.rel_poses, tr.refs, tr.times)

    def save_trajectory_tum(self, path: str) -> None:
        """SaveTrajectoryTUM (system_helper.cpp:89-158)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        ts, poses = self.trajectory()
        with open(path, "w") as f:
            for t, Twc in zip(ts, poses):
                q = _rotmat_to_quat(Twc[:3, :3])
                p = Twc[:3, 3]
                f.write(f"{t:.6f} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f} "
                        f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        """SaveKeyFrameTrajectoryTUM (system_helper.cpp:159-200)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        kfs = sorted((k for k in self.map.keyframes.values() if not k.bad),
                     key=lambda k: k.kf_id)
        with open(path, "w") as f:
            for kf in kfs:
                Twc = np.linalg.inv(kf.Tcw)
                q = _rotmat_to_quat(Twc[:3, :3])
                p = Twc[:3, 3]
                f.write(f"{kf.timestamp:.6f} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f} "
                        f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")

    def save_trajectory_kitti(self, path: str) -> None:
        """SaveTrajectoryKITTI (system_helper.cpp): 3x4 row-major Twc."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        _, poses = self.trajectory()
        with open(path, "w") as f:
            for Twc in poses:
                f.write(" ".join(f"{x:.9e}" for x in Twc[:3].ravel()) + "\n")

    def save_trajectory_euroc(self, path: str) -> None:
        """SaveTrajectoryEuroc (system_helper.cpp): nanosecond timestamps +
        position + (w, x, y, z) quaternion, comma-separated."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        ts, poses = self.trajectory()
        with open(path, "w") as f:
            for t, Twc in zip(ts, poses):
                q = _rotmat_to_quat(Twc[:3, :3])
                p = Twc[:3, 3]
                f.write(f"{int(t * 1e9)},{p[0]:.7f},{p[1]:.7f},{p[2]:.7f},"
                        f"{q[3]:.7f},{q[0]:.7f},{q[1]:.7f},{q[2]:.7f}\n")

    def report(self) -> dict:
        rep = self.tracker.report()
        rep.update(n_keyframes=self.map.n_keyframes(),
                   n_points=self.map.n_points())
        return rep
