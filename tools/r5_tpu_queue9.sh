#!/bin/bash
# Round-5 TPU queue v9 — follower: waits for queue v8 (PID in
# /tmp/r5_queue8.pid), then retries the r5c_pointnet_hard eval that hit
# queue v5's 1200 s cap (rc=124 — the metric itself is already in the
# training log; this regenerates the eval artifact the release manifest
# embeds) and refreshes packaging. Opportunistic end-of-round items —
# the driver's bench.py reclaim may kill this queue harmlessly.
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

QPID=$(cat /tmp/r5_queue8.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi
echo "=== [$(date +%H:%M:%S)] r5 queue v9 starts (v8 released the chip)"

echo "=== [$(date +%H:%M:%S)] M1 r5c_pointnet_hard eval retry"
timeout 2700 python examples/evaluate.py --ckpt r5c_pointnet_hard --model pointnet \
  --task classification --hard_cls --dataset_size 6144 --param_jitter 0.08 \
  --detail_amp 0.08 > docs/runs/r5c_pointnet_hard_eval.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] M2 packaging refresh"
python tools/package_release.py >> docs/runs/r5_queue_packaging.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] r5 queue v9 complete"
