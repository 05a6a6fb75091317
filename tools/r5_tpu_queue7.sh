#!/bin/bash
# Round-5 TPU queue v7 — follower: waits for queue v6 (PID in
# /tmp/r5_queue6.pid), then validates + measures the quantized-key
# approx-kNN selection (dgcnn_fused approx_knn=True, the round-5
# ledger's "relaxing exactness" candidate for the encoder wall):
#   K1 — check_tpu_kernels (now includes the approx-vs-exact check)
#   K2 — profile_dcp_encoder (adds the enc-bf16-approxknn row)
#   K3 — bench.py with L3D_APPROX_KNN=1 (full-DCP effect of the knob)
#   K4 — trained-checkpoint accuracy under the knob (r5b_dgcnn_hard)
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

QPID=$(cat /tmp/r5_queue6.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi
echo "=== [$(date +%H:%M:%S)] r5 queue v7 starts (v6 released the chip)"

echo "=== [$(date +%H:%M:%S)] K1 kernel checks (incl. approx-knn)"
timeout 2400 python tools/check_tpu_kernels.py > docs/runs/r5b_check_kernels.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] K2 encoder profile (incl. approx-knn row)"
timeout 2400 python tools/profile_dcp_encoder.py > docs/runs/r5_dcp_encoder2.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] K3 bench under L3D_APPROX_KNN=1"
timeout 3600 env L3D_APPROX_KNN=1 python bench.py \
  > docs/runs/r5_bench_approx.json 2> docs/runs/r5_bench_approx.err
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] K4 trained-ckpt accuracy under the knob"
timeout 1800 env L3D_APPROX_KNN=1 python examples/evaluate.py \
  --ckpt r5b_dgcnn_hard --model dgcnn-cls --task classification --hard_cls \
  --dataset_size 6144 --param_jitter 0.08 --detail_amp 0.08 \
  > docs/runs/r5b_dgcnn_hard_eval_approx.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] r5 queue v7 complete"
