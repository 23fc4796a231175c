#!/bin/bash
# Serialized round-4 TPU measurement batch (verify skill: ONE python process
# against the chip at a time; generous timeouts; never SIGTERM mid-compile).
#
# What it establishes:
#   1. dust-health on the TPU backend with the fused OK path (the round-3
#      verdict blocker was n_fail_dust 104/111 on TPU vs 0 on CPU; commit
#      ae7419a root-caused it to unpreconditioned f32 LM solves)
#   2. the 10-seed TPU accuracy sweep (must stay <= 0.01 mean ATE)
#   3. bench.py with the fused full-frame step + capture hygiene
set -e
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python -c "import jax, jax.numpy as jnp; print((jnp.ones((128,128))@jnp.ones((128,128))).block_until_ready()[0,0])"
}

echo "== probe =="; probe

echo "== 1. dust health rail (run_vo synthetic, TPU backend) =="
timeout 5400 python -m sp_orb_slam_tpu.run_vo --dataset synthetic 2>&1 \
  | tee /tmp/tpu_r4_dust_health.log

echo "== 2. 10-seed TPU accuracy sweep =="
timeout 14400 python scripts/tpu_accuracy_sweep.py --out TPU_SWEEP_r4.json \
  2>&1 | tail -20

echo "== 3. bench =="
timeout 7200 python bench.py 2>/tmp/tpu_r4_bench_stderr.log
cat /tmp/tpu_r4_bench_stderr.log

echo "== batch done =="
