#!/usr/bin/env python
"""Forensics for the fleet serving tick: WHERE does the ~100 ms/stream go?

TPU_FLEET_r5.json shows ms_per_tick growing ~linearly with N (167 ms at
N=1 -> 3372 ms at N=32 in localization mode) — the opposite of the
"3 batched programs per tick" story.  This script counts the device
dispatches per tick (every PackedInput call, tagged by kernel body) and
cProfiles the host work, on the CPU backend where device calls are cheap
so host costs and call COUNTS dominate the signal.

Usage: python scripts/profile_fleet_tick.py --streams 8        (CPU-forced)
       python scripts/profile_fleet_tick.py --streams 8 --tpu  (real chip)
"""

import argparse
import cProfile
import collections
import json
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

if "--tpu" not in sys.argv:
    # JAX_PLATFORMS alone is ignored when the axon TPU plugin is present
    # (tests/conftest.py): force the platform name and clear any backend a
    # plugin import already initialized.
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platform_name", "cpu")
    try:
        from jax.extend.backend import clear_backends
    except Exception:
        clear_backends = getattr(jax, "clear_backends", lambda: None)
    try:
        clear_backends()
    except Exception:
        pass
    assert jax.default_backend() == "cpu", jax.default_backend()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=30)
    ap.add_argument("--mapping", action="store_true",
                    help="profile mapping mode instead of localization")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real chip instead of forcing CPU")
    args = ap.parse_args()

    import jax

    from bench_fleet import _render_stream
    from sp_orb_slam_tpu.config import Config, _merge_dataclass
    from sp_orb_slam_tpu.io.dataset import RawFrame
    from sp_orb_slam_tpu.models import superpoint
    from sp_orb_slam_tpu.slam import kernels as kmod
    from sp_orb_slam_tpu.slam import tracking
    from sp_orb_slam_tpu.slam.fleet import StreamFleet
    from sp_orb_slam_tpu.slam.system import System

    params = superpoint.init_params(jax.random.PRNGKey(0))
    n = args.streams

    cfg0 = _merge_dataclass(Config(), {
        "camera": {"k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0}})
    map_path = None
    if not args.mapping:
        import os
        import tempfile

        sys0 = System(cfg0, params=params)
        frames0 = _render_stream(cfg0, args.frames, 0)
        for i in range(args.frames):
            sys0.run(RawFrame(image=frames0[i], timestamp=i / 20.0))
        assert sys0.tracker.state == tracking.OK
        map_path = os.path.join(tempfile.mkdtemp(), "fleet_map.npz")
        sys0.save_map(map_path)
        print(f"map built: {sys0.map.n_keyframes()} KFs", flush=True)

    cfg = _merge_dataclass(Config(), {
        "camera": {"k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0},
        "runtime": {"streams": n},
    })
    streams = [_render_stream(cfg, args.frames, 0 if map_path else s)
               for s in range(n)]
    fleet = StreamFleet(cfg, n, params=params)
    if map_path:
        fleet.load_map(map_path, localization=True)
    fleet.warmup()

    # ---- instrument: count every PackedInput dispatch by body name
    counts = collections.Counter()
    times = collections.Counter()
    orig_call = kmod.PackedInput.__call__
    orig_rows = kmod.PackedInput.call_rows

    def name_of(self):
        return getattr(self._body, "__name__", repr(self._body))

    def counted_call(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_call(self, *a, **kw)
        key = "one:" + name_of(self)
        counts[key] += 1
        times[key] += time.perf_counter() - t0
        return out

    def counted_rows(self, rows, sharding=None):
        t0 = time.perf_counter()
        out = orig_rows(self, rows, sharding=sharding)
        key = f"rows[{len(rows)}]:" + name_of(self)
        counts[key] += 1
        times[key] += time.perf_counter() - t0
        return out

    kmod.PackedInput.__call__ = counted_call
    kmod.PackedInput.call_rows = counted_rows

    def run_ticks(lo, hi, record):
        for i in range(lo, hi):
            raws = [RawFrame(image=streams[s][i], timestamp=i / 20.0)
                    for s in range(n)]
            t0 = time.perf_counter()
            fleet.tick(raws)
            if record is not None:
                record.append(time.perf_counter() - t0)

    run_ticks(0, args.warmup, None)
    counts.clear()
    times.clear()
    ticks = []
    prof = cProfile.Profile()
    prof.enable()
    run_ticks(args.warmup, args.frames, ticks)
    prof.disable()
    n_ticks = len(ticks)

    print(json.dumps({
        "streams": n, "ticks": n_ticks,
        "ms_per_tick": round(float(np.mean(ticks)) * 1e3, 2)}))
    print("\n== device dispatches per tick (count, ms) ==")
    for key, c in counts.most_common(30):
        print(f"  {c / n_ticks:7.2f}/tick  {times[key] / n_ticks * 1e3:8.2f} ms/tick  {key}")
    print("\n== cProfile top cumulative ==")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
