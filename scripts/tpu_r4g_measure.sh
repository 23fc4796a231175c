#!/bin/bash
# Round-4g: extraction-tail A/B on the real chip — fused Pallas match
# kernel and channel-slice pixel shuffle (scripts/profile_r4g.py), then a
# fresh post-lse cumulative stage bisect (scripts/profile_r4.py).
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

echo "== 1. match/heat A/B (profile_r4g) =="
timeout 7200 python scripts/profile_r4g.py

echo "== 2. post-lse stage bisect (profile_r4) =="
timeout 7200 python scripts/profile_r4.py --iters 20

echo "== batch done =="
