#!/bin/bash
# Post-campaign TPU job queue (round 4, session 2). Waits for the
# campaign-v3 process to exit, then runs the chip-bound validation /
# measurement jobs the fused int8 transformer work needs, serially
# (ONE process may hold the TPU at a time):
#   1. on-chip Pallas-vs-module equivalence incl. the new fused
#      transformer layer kernels (tools/check_tpu_kernels.py)
#   2. fused vs module int8 pointer profile (tools/profile_pointer_int8.py)
#   3. large-N single-chip blockwise chamfer/kNN/EMD table (VERDICT weak
#      #7 — the r4s1 attempt only printed the backend line)
#   4. full bench.py (now measures both int8 DCP serving configs)
#   5. quantized eval of the released r3c_dcp checkpoint — trained-model
#      parity of the SHIPPING (fused) serving path
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

CAMPAIGN_PID=$(cat /tmp/campaign3.pid 2>/dev/null || echo "")
if [ -n "$CAMPAIGN_PID" ]; then
  echo "waiting for campaign pid $CAMPAIGN_PID"
  while kill -0 "$CAMPAIGN_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== [$(date +%H:%M:%S)] campaign done; running TPU queue"

echo "=== [$(date +%H:%M:%S)] 1/5 check_tpu_kernels"
timeout 1800 python tools/check_tpu_kernels.py > docs/runs/r4s2_check_kernels.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] 2/5 pointer int8 profile (fused vs module)"
timeout 1800 python tools/profile_pointer_int8.py > docs/runs/r4s2_pointer_int8.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] 3/5 large-N blockwise table on TPU"
timeout 2400 python tools/bench_large_n.py > docs/runs/r4s2_large_n_tpu.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] 4/5 bench.py full"
timeout 3600 python bench.py > docs/runs/r4s2_bench.json 2> docs/runs/r4s2_bench.err
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] 5/5 r3c_dcp quantized eval (fused serving path)"
timeout 2400 python examples/evaluate.py --ckpt r3c_dcp --model dcp --task dcp \
  --batch_size 32 --quantize > docs/runs/r4s2_dcp_quant_eval.log 2>&1
echo "rc=$?"
echo "=== [$(date +%H:%M:%S)] TPU queue complete"
