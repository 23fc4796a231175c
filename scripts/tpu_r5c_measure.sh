#!/bin/bash
# Round-5c chip measurement batch — the two captures the r5b batch never
# reached (the session died on gateway errors after step 2):
#   1. final warm 10-seed sweep on the POST-fix tree (gap5 pacing + the
#      last warmup stragglers: pow2 bank-scatter buckets, eager PRNG
#      split) -> TPU_SWEEP_r5.json; expectation: 0 tail violations (the
#      committed pre-fix capture carries 3)
#   2. fleet localization-serving capture across widths 1,4,8,16,32
#      (VERDICT r4 weak #7 — frozen shared map, the pure
#      3-batched-programs regime)
#   3. fleet mapping-mode capture 1,8,32
# ONE python process against the chip at a time (verify skill: TPU tunnel
# discipline).
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

echo "== 1. final warm sweep $(date) =="
timeout 5400 python scripts/tpu_accuracy_sweep.py --out TPU_SWEEP_r5.json \
  || echo "sweep FAILED rc=$?"

echo "== 2. fleet localization-serving capture $(date) =="
timeout 14400 python scripts/bench_fleet.py --streams 1,4,8,16,32 \
  --frames 70 --warmup 25 --localization || echo "fleet-loc FAILED rc=$?"

echo "== 3. fleet mapping-mode capture $(date) =="
timeout 10800 python scripts/bench_fleet.py --streams 1,8,32 \
  --frames 70 --warmup 25 || echo "fleet FAILED rc=$?"

echo "== r5c batch done $(date) =="
