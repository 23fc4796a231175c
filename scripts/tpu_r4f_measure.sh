#!/bin/bash
# Round-4f: rendered 5-run protocol rerun on the real chip with the
# loop-path static-shape fixes (the r4e run measured 1860 s/run inside
# the loop span, traced to dynamic-shape recompiles + eager sim3_log
# dispatch chains — see NOTES.md round 4 cont. 2).
# (verify skill: ONE python process against the chip at a time.)
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

echo "== rendered 5-run protocol (loop ON, fixed loop path) =="
timeout 28800 python scripts/evaluate.py --dataset rendered \
  --model-path weights/sp_rendered.npz --loop --runs 5 \
  --out expr/rendered_r4f 2>&1 | tail -40

echo "== batch done =="
