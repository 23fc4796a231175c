#!/usr/bin/env python
"""Fleet mesh-scaling benchmark on virtual CPU devices (VERDICT r4 #1).

Real multi-chip hardware is not available in this environment (one TPU
v5e behind the axon tunnel), so the mesh-SCALING evidence for the SPMD
serving tick runs where the sharding actually executes: the forced-CPU
backend with `xla_force_host_platform_device_count=N` virtual devices —
each a real host thread, so the batched stage compute genuinely
parallelizes and a sharded tick should get FASTER as the mesh widens
while the per-stream work stays fixed.

Protocol: a fixed fleet of `--streams` synthetic-rail streams (default 8,
the dryrun config sized above the reference's 100-tracked init gate so
the batched dust/local stages really fire) is driven for `--frames`
ticks under mesh sizes {1, 2, 4, 8} of the SAME 8-device backend (mesh
size 1 = single-device placement, the unsharded baseline).  Reports
median tick wall time per mesh size plus the report-equality check
(sharded == unsharded, bitwise on frames/KFs/lost).

Prints one JSON line per mesh size:
    {"metric": "fleet_tick_ms_cpu_mesh", "mesh": M, "ms_per_tick": ...,
     "speedup_vs_mesh1": ...}

Run AFTER any TPU job finishes (tunnel discipline: one python process).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = 8

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()

import jax  # noqa: E402

for _k, _v in (("jax_platform_name", "cpu"), ("jax_platforms", "cpu")):
    try:
        jax.config.update(_k, _v)
    except Exception:
        pass
try:
    from jax.extend.backend import clear_backends
except Exception:
    clear_backends = getattr(jax, "clear_backends", lambda: None)
try:
    clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=12)
    ap.add_argument("--meshes", default="1,2,4,8")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.io.dataset import SyntheticDataset
    from sp_orb_slam_tpu.slam import tracking as tr
    from sp_orb_slam_tpu.slam.fleet import StreamFleet

    # the dryrun operating point: big enough that every stream passes the
    # reference's 100-tracked init gate (mono_tracker.cpp:196) and the
    # batched dust/local stages carry the tick
    cfg = _merge_dataclass(Config(), {
        "dataset": "synthetic",
        "camera": {"width": 160, "height": 120, "fx": 120.0, "fy": 120.0,
                   "cx": 80.0, "cy": 60.0, "fps": 20.0},
        "tracking": {"num_features": 160},
        "runtime": {"max_keypoints": 192, "dust_points_cap": 128,
                    "local_points_cap": 512, "ba_kfs_cap": 8,
                    "ba_points_cap": 512, "ba_obs_cap": 2048,
                    "init_ransac_iters": 30},
    })
    n = args.streams
    streams = [list(SyntheticDataset(cfg, n_frames=args.frames, seed=s))
               for s in range(n)]

    devices = jax.devices()
    rows = []
    base_ms = None
    base_report = None
    for m in [int(s) for s in args.meshes.split(",") if s]:
        assert n % m == 0, (n, m)
        mesh = (Mesh(np.array(devices[:m]), ("stream",)) if m > 1 else None)
        fleet = StreamFleet(cfg, n, params=None, mesh=mesh)
        ticks = []
        for i in range(args.frames):
            raws = [st[i] for st in streams]
            t0 = time.perf_counter()
            fleet.tick(raws)
            dt = time.perf_counter() - t0
            if i >= args.warmup:
                ticks.append(dt * 1e3)
        rep = [dict(r) for r in fleet.report()]
        n_ok = sum(1 for s in fleet.systems if s.tracker.state == tr.OK)
        fleet.shutdown()
        if mesh is not None:
            # placement sanity on the last tick's batched stages
            pl = fleet.kernels._dust_bank.last_batch_placement
            assert pl and pl["sharded"], pl
            s = pl["out"]
            assert isinstance(s, NamedSharding) and s.spec[0] == "stream", s
            assert len(s.device_set) == m, (m, s)
        key = [(r["n_frames"], r["n_keyframes"], r["n_lost"]) for r in rep]
        if base_report is None:
            base_report = key
        else:
            assert key == base_report, (m, key, base_report)

        tk = sorted(ticks)
        ms = tk[len(tk) // 2]
        if base_ms is None:
            base_ms = ms
        row = {"metric": "fleet_tick_ms_cpu_mesh", "mesh": m,
               "streams": n, "ms_per_tick": round(ms, 2),
               "ms_p90": round(tk[int(len(tk) * 0.9)], 2),
               "speedup_vs_mesh1": round(base_ms / ms, 2),
               "ok_streams": n_ok}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"backend": "cpu_virtual", "n_devices": N_DEV,
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
