#!/usr/bin/env python
"""Fleet serving benchmark: N full SLAM pipelines on one chip.

The headline bench (bench.py) measures the batched frontend + matching;
this one measures the WHOLE serving loop the StreamFleet driver exists
for — batched extraction, batched dust + local-map tracking kernels,
per-stream host state machines, and synchronous per-stream mapping
(triangulation + local BA on keyframe creation) — against the reference's
one-camera 20 Hz / <=50 ms-per-frame operating point
(src/system.cpp:141,190-192).

Per stream it renders a textured plane at z=5 (the test_image_e2e scene at
the full EuRoC 752x480 operating point) along a smooth sideways
trajectory, pre-rendering every frame so host rendering never pollutes the
timing.  Extraction runs with random SuperPoint weights — the conv/NMS/
covariance/descriptor cost is weight-independent, and random filter banks
still detect stable texture extrema, so the trackers genuinely initialize,
triangulate, and hold the OK path (asserted at exit).

Prints per-configuration JSON lines:
    {"metric": "fleet_slam_fps", "streams": N, "ms_per_tick": ...,
     "stream_fps": ..., "streams_at_20hz": ...}

Notes for reading the numbers in THIS environment: every device->host
readback over the axon tunnel costs ~25 ms flat (NOTES.md round 1), which
a local chip does not pay; the per-tick floor here is therefore tunnel-
dominated at small N and the stream_fps scaling with N is the signal.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _texture(x, y, seed):
    v = np.zeros_like(x)
    rng = np.random.default_rng(seed)
    for _ in range(24):
        fx_, fy_ = rng.uniform(0.5, 6.0, 2)
        ph = rng.uniform(0, 2 * np.pi)
        a = rng.uniform(0.3, 1.0)
        v += a * np.sin(fx_ * x + ph) * np.cos(fy_ * y + ph * 0.7)
    v = (v - v.min()) / (v.max() - v.min())
    return (v * 255).astype(np.uint8)


def _render_stream(cfg, n_frames, seed):
    """Pre-render one stream: camera translating sideways above a textured
    z=5 plane, looking down +z.  Returns (n_frames, H, W) uint8 and the
    per-frame timestamps."""
    H, W = cfg.camera.height, cfg.camera.width
    fx, fy, cx, cy = (cfg.camera.fx, cfg.camera.fy,
                      cfg.camera.cx, cfg.camera.cy)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    rays = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1)

    frames = np.empty((n_frames, H, W), np.uint8)
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        twc = np.array([1.2 * t, 0.25 * np.sin(2 * np.pi * t), 0.0])
        X = twc[None, None, :] + (5.0 - twc[2]) / rays[..., 2:3] * rays
        frames[i] = _texture(X[..., 0] + 10 * seed, X[..., 1] + 7 * seed,
                             seed)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="8,32",
                    help="comma list of fleet widths")
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--warmup", type=int, default=30,
                    help="ticks before timing starts (init + compiles)")
    ap.add_argument("--online", action="store_true",
                    help="threaded mappers (overlap BA with tracking)")
    ap.add_argument("--localization", action="store_true",
                    help="multi-camera localization serving: build + save "
                         "a map from stream 0 once, then every stream "
                         "localizes against the frozen map (no mapper work "
                         "in the tick at all — the pure 3-batched-programs "
                         "regime)")
    args = ap.parse_args()

    import jax

    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.io.dataset import RawFrame
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.slam import tracking
    from sp_orb_slam_tpu.slam.fleet import StreamFleet

    widths = [int(s) for s in args.streams.split(",")]
    params = superpoint.init_params(jax.random.PRNGKey(0))

    map_path = None
    if args.localization:
        # build the shared map once from stream 0's rail, offline
        import os
        import tempfile

        from sp_orb_slam_tpu.slam.system import System

        cfg0 = _merge_dataclass(Config(), {
            "camera": {"k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0}})
        sys0 = System(cfg0, params=params)
        frames0 = _render_stream(cfg0, args.frames, 0)
        for i in range(args.frames):
            sys0.run(RawFrame(image=frames0[i], timestamp=i / 20.0))
        assert sys0.tracker.state == tracking.OK
        map_path = os.path.join(tempfile.mkdtemp(), "fleet_map.npz")
        sys0.save_map(map_path)
        print(json.dumps({"localization_map": map_path,
                          "n_keyframes": sys0.map.n_keyframes()}),
              flush=True)

    for n in widths:
        cfg = _merge_dataclass(Config(), {
            "camera": {"k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0},
            "online": bool(args.online),
            "runtime": {"streams": n},
        })
        streams = [_render_stream(cfg, args.frames, 0 if args.localization
                                  else s) for s in range(n)]

        fleet = StreamFleet(cfg, n, params=params)
        if map_path is not None:
            fleet.load_map(map_path, localization=True)
        fleet.warmup()  # serving discipline: no first-hit compiles in-run
        ticks = []
        for i in range(args.frames):
            raws = [RawFrame(image=streams[s][i], timestamp=i / 20.0)
                    for s in range(n)]
            t0 = time.perf_counter()
            fleet.tick(raws)
            dt = time.perf_counter() - t0
            if i >= args.warmup:
                ticks.append(dt)
        n_ok = sum(1 for s in fleet.systems
                   if s.tracker.state == tracking.OK
                   and s.map.n_keyframes() >= 2)
        fleet.shutdown()

        tk = np.sort(np.asarray(ticks)) * 1e3
        ms = float(np.mean(tk)) if tk.size else 0.0
        fps = n / (ms / 1e3) if ms else 0.0
        print(json.dumps({
            "metric": "fleet_slam_fps",
            "streams": n,
            "online": bool(args.online),
            "localization": bool(args.localization),
            "ms_per_tick": round(ms, 2),
            "ms_per_tick_p50": round(float(tk[len(tk) // 2]), 2) if tk.size else None,
            "ms_per_tick_p90": round(float(tk[int(len(tk) * 0.9)]), 2) if tk.size else None,
            "stream_fps": round(fps, 1),
            "streams_at_20hz": int(fps / 20.0),
            "ok_streams": n_ok,
            "batched_dust_frames": fleet.n_batched_dust,
            "batched_local_frames": fleet.n_batched_local,
            "batched_motion_frames": fleet.n_batched_motion,
            "batched_retry_frames": fleet.n_batched_retry,
        }), flush=True)


if __name__ == "__main__":
    main()
