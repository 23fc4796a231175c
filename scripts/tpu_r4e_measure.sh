#!/bin/bash
# Round-4 rendered dress rehearsal + clean bench on the real chip
# (verify skill: ONE python process against the chip at a time; no other
# python may start while this runs).
#
#   1. clean bench capture (lse head + dropped heat output)
#   2. the reference 5-run protocol on the rendered image benchmark:
#      3 held-out rooms x 5 runs, trained weights, loop closing ON
#      (evaluate_euroc_vo.sh:3-80 protocol; rooms 4-6 are disjoint from
#      the training scenes 0-3)
set -e
cd "$(dirname "$0")/.."

# The pool wedges transiently after a killed claim (verify skill: recovery
# 5-10 min); a single fatal probe killed two launches of this batch.  Retry
# with waits, and give each probe long enough that we never kill it
# mid-claim (which re-wedges the pool).
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

echo "== 1. bench =="
timeout 7200 python bench.py

echo "== 2a. rendered single-run smoke (TPU backend, trained weights) =="
timeout 7200 python -m sp_orb_slam_tpu.run_vo --dataset rendered \
  --weights weights/sp_rendered.npz --loop 2>&1 | tail -5

echo "== 2b. rendered 5-run protocol (loop ON) =="
timeout 43200 python scripts/evaluate.py --dataset rendered \
  --model-path weights/sp_rendered.npz --loop --runs 5 \
  --out expr/rendered_r4 2>&1 | tail -30

echo "== batch done =="
