#!/bin/bash
# Round-5 TPU queue v8 — follower: waits for queue v7 (PID in
# /tmp/r5_queue7.pid), then spends the round's margin on the weakest
# ordering rows (both classifiers were still learning at their 40-epoch
# caps — DGCNN train-acc 0.485 and rising at epoch 39):
#   L1 — DGCNN-cls extension 40 -> 100 ep (resume; cosine re-stretched)
#   L2 — CurveNet extension 40 -> 80 ep (resume)
#   L3 — packaging refresh (re-embeds the regenerated eval logs)
# Items here are opportunistic: the driver's end-of-round bench.py
# reclaims the chip by killing this queue, and best-ckpt selection makes
# a mid-run kill harmless (the packaged best stays valid).
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

QPID=$(cat /tmp/r5_queue7.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi
echo "=== [$(date +%H:%M:%S)] r5 queue v8 starts (v7 released the chip)"

echo "=== [$(date +%H:%M:%S)] L1 DGCNN-cls 40 -> 100 ep extension"
timeout 3000 python examples/train.py --exp_name r5b_dgcnn_hard \
  --model dgcnn-cls --task classification --epochs 100 --cosine --augment \
  --label_smoothing 0.2 --batch_size 32 --hard_cls --dataset_size 6144 \
  --param_jitter 0.08 --detail_amp 0.08 --resume latest \
  >> docs/runs/r5b_dgcnn_hard.log 2>&1
echo "rc=$?"
timeout 1200 python examples/evaluate.py --ckpt r5b_dgcnn_hard --model dgcnn-cls \
  --task classification --hard_cls --dataset_size 6144 --param_jitter 0.08 \
  --detail_amp 0.08 > docs/runs/r5b_dgcnn_hard_eval.log 2>&1
echo "eval rc=$?"

echo "=== [$(date +%H:%M:%S)] L2 CurveNet 40 -> 80 ep extension"
timeout 2700 python examples/train.py --exp_name r5b_curvenet_hard \
  --model curvenet --task classification --epochs 80 --cosine --augment \
  --label_smoothing 0.2 --batch_size 32 --hard_cls --dataset_size 6144 \
  --param_jitter 0.08 --detail_amp 0.08 --resume latest \
  >> docs/runs/r5b_curvenet_hard.log 2>&1
echo "rc=$?"
timeout 1200 python examples/evaluate.py --ckpt r5b_curvenet_hard --model curvenet \
  --task classification --hard_cls --dataset_size 6144 --param_jitter 0.08 \
  --detail_amp 0.08 > docs/runs/r5b_curvenet_hard_eval.log 2>&1
echo "eval rc=$?"

echo "=== [$(date +%H:%M:%S)] L3 packaging refresh"
python tools/package_release.py >> docs/runs/r5_queue_packaging.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] r5 queue v8 complete"
