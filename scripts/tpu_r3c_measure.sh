#!/bin/bash
# Serialized TPU measurement batch for the round-3c changes (run ONLY when
# the tunnel probe passes; see .claude/skills/verify/SKILL.md "TPU tunnel
# discipline" — never run two python processes against the chip at once).
#
# Decisions this batch drives:
#   1. emission default: scatter (890 f/s measured) vs sort  -> full-sortemit
#   2. desc_method default: gather vs the sparse Pallas kernel -> full-sparsedesc
#   3. pair1t tile height: tp=4 (default) vs 8/12             -> pair1t-tp{8,12}
#   4. heads block split (conv vs softmax/heat tail)          -> heads-*
# plus a fresh full-gather baseline and bench.py for the headline.
set -e
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python -c "import jax, jax.numpy as jnp; print((jnp.ones((128,128))@jnp.ones((128,128))).block_until_ready()[0,0])"
}

echo "== probe =="; probe

echo "== profile batch 1: baseline + decisions =="
timeout 3600 python scripts/profile_r3.py \
  --variants full-gather,full-sortemit,full-sparsedesc

echo "== profile batch 2: pair1t tiles + heads bisect =="
timeout 3600 python scripts/profile_r3.py \
  --variants pair1t-fused-only,pair1t-tp8,pair1t-tp12,heads-conv-only,heads-tail-only

echo "== bench =="
timeout 3600 python bench.py
