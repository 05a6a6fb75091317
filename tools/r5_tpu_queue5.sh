#!/bin/bash
# Round-5 TPU queue v5 — follower: waits for queue v4 (PID in
# /tmp/r5_queue4.pid) to release the chip, then runs the remaining
# round-5 items:
#   H1 — PointNet at detail_amp 0.08 (same set as v4's G3 DGCNN/CurveNet
#        runs, so the 3-way ordering compares one distribution)
#   H2 — detailed-PCN training run (--pcn_detailed: folding decoder
#        actually trained; coarse+fine chamfer eval)
#   H3 — final packaging (picks up r5b_*, r5c_*, r5_pcn_detailed)
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

QPID=$(cat /tmp/r5_queue4.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi
echo "=== [$(date +%H:%M:%S)] r5 queue v5 starts (v4 released the chip)"

echo "=== [$(date +%H:%M:%S)] H1 PointNet 30ep at detail_amp 0.08 (ordering row)"
timeout 3000 python examples/train.py --exp_name r5c_pointnet_hard \
  --model pointnet --task classification --epochs 30 --cosine --augment \
  --label_smoothing 0.2 --batch_size 32 --hard_cls --detail_amp 0.08 \
  --dataset_size 6144 --param_jitter 0.08 > docs/runs/r5c_pointnet_hard.log 2>&1
echo "rc=$?"
timeout 1200 python examples/evaluate.py --ckpt r5c_pointnet_hard --model pointnet \
  --task classification --hard_cls --detail_amp 0.08 --dataset_size 6144 \
  --param_jitter 0.08 > docs/runs/r5c_pointnet_hard_eval.log 2>&1
echo "eval rc=$?"

echo "=== [$(date +%H:%M:%S)] H2 detailed-PCN run (folding decoder trained)"
timeout 3000 python examples/train.py --exp_name r5_pcn_detailed --model pcn \
  --task pcn --pcn_detailed --epochs 120 --cosine --batch_size 32 \
  > docs/runs/r5_pcn_detailed.log 2>&1
echo "rc=$?"
timeout 900 python examples/evaluate.py --ckpt r5_pcn_detailed --model pcn \
  --task pcn --pcn_detailed > docs/runs/r5_pcn_detailed_eval.log 2>&1
echo "eval rc=$?"

echo "=== [$(date +%H:%M:%S)] H3 final packaging"
python tools/package_release.py >> docs/runs/r5_queue_packaging.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] r5 queue v5 complete"
