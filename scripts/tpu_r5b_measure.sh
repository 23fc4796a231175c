#!/bin/bash
# Round-5b chip measurement batch — runs on the post-fix tree (gap5 KF
# pacing, full warmup incl. pow2 bank-scatter buckets + eager PRNG split,
# fused match kernel fixed at the production K=896).  ONE python process
# against the chip at a time (verify skill: TPU tunnel discipline).
#   1. extraction-tail A/B: fused Pallas match kernel x channel-slice
#      pixel shuffle (profile_r4g; its first r5 run died on the K=896
#      tile assert, fixed in commit 1204bd9)
#   2. bench.py: headline f/s + device-split step metric
#   3. fleet localization-serving capture (frozen shared map, no mapper
#      work in the tick — the pure 3-batched-programs regime) across
#      widths 1,4,8,16,32 (VERDICT r4 weak #7)
#   4. fleet mapping-mode capture 1,8,32
#   5. final warm 10-seed sweep -> TPU_SWEEP_r5.json (VERDICT r4 weak #4)
set -u
cd "$(dirname "$0")/.."

echo "== probe =="
ok=0
for i in 1 2 3 4 5 6; do
  if timeout 600 python -c "import jax, jax.numpy as jnp; print((jnp.ones((128,128))@jnp.ones((128,128))).block_until_ready()[0,0])"; then
    ok=1; break
  fi
  echo "probe attempt $i failed; waiting 300 s for pool recovery"
  sleep 300
done
[ "$ok" = 1 ] || { echo "pool never recovered; aborting batch"; exit 1; }

echo "== 1. match/heat A/B (profile_r4g) $(date) =="
timeout 7200 python scripts/profile_r4g.py || echo "r4g FAILED rc=$?"

echo "== 2. bench.py $(date) =="
timeout 2400 python bench.py || echo "bench FAILED rc=$?"

echo "== 3. fleet localization-serving capture $(date) =="
timeout 10800 python scripts/bench_fleet.py --streams 1,4,8,16,32 \
  --frames 70 --warmup 25 --localization || echo "fleet-loc FAILED rc=$?"

echo "== 4. fleet mapping-mode capture $(date) =="
timeout 10800 python scripts/bench_fleet.py --streams 1,8,32 \
  --frames 70 --warmup 25 || echo "fleet FAILED rc=$?"

echo "== 5. final warm sweep $(date) =="
timeout 5400 python scripts/tpu_accuracy_sweep.py --out TPU_SWEEP_r5.json \
  || echo "sweep FAILED rc=$?"

echo "== r5b batch done $(date) =="
