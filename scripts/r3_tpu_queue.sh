#!/bin/bash
# Round-3 TPU work queue: run serially the moment the tunnel returns.
# Each leg is timeout-bounded; later legs still run if one fails.
# Usage: bash scripts/r3_tpu_queue.sh [outdir]   (default /tmp/r3q)
set -u
OUT=${1:-/tmp/r3q}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== leg 0: tunnel probe =="
timeout 120 python -c "
import jax; jax.config.update('jax_platforms','axon,cpu')
import numpy as np, time; t0=time.time()
x=jax.device_put(np.ones((8,8),np.float32), jax.devices()[0])
print('tunnel OK', float((x@x).sum()), round(time.time()-t0,2),'s')" \
  || { echo 'tunnel still down'; exit 1; }

echo "== leg 1: profile f32-default (publication shape) =="
timeout 3600 python scripts/profile_step.py \
  --out "$OUT/profile_f32.json" > "$OUT/profile_f32.log" 2>&1
echo "exit=$?"

echo "== leg 2: profile bf16 MXU mode =="
SEQ2SEQ_KERNEL_MXU=bf16 timeout 3600 python scripts/profile_step.py \
  --out "$OUT/profile_bf16.json" > "$OUT/profile_bf16.log" 2>&1
echo "exit=$?"

echo "== leg 3: hardware gradient parity, bf16 mode =="
SEQ2SEQ_KERNEL_MXU=bf16 timeout 3600 python scripts/pallas_grad_parity.py \
  > "$OUT/grad_parity_bf16.log" 2>&1
echo "exit=$?"

echo "== leg 4: bench (A/B medians + encode) =="
timeout 5400 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "exit=$?"
tail -1 "$OUT/bench.json" || true

echo "== queue done =="
