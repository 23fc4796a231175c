#!/bin/bash
# Round-5 chip measurement batch (run AFTER any other TPU job finishes;
# verify skill: ONE python process against the chip at a time):
#   1. extraction-tail A/B: fused Pallas match kernel x channel-slice
#      pixel shuffle (profile_r4g — its r4 run died on a path bug)
#   2. fleet serving capture across widths (VERDICT r4 weak #7)
#   3. bench.py with the r5 interleaved device-split protocol
set -e
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

echo "== 1. match/heat A/B (profile_r4g) =="
timeout 7200 python scripts/profile_r4g.py || echo "r4g FAILED rc=$?"

echo "== 2. fleet serving capture =="
timeout 7200 python scripts/bench_fleet.py --streams 1,4,8,16,32 \
  --frames 70 --warmup 25 || echo "fleet FAILED rc=$?"

echo "== 3. bench.py =="
timeout 2400 python bench.py || echo "bench FAILED rc=$?"

echo "== batch done $(date) =="
