#!/bin/bash
# Round-5 TPU queue v6 — follower: waits for queue v5 (PID in
# /tmp/r5_queue5.pid) to release the chip, then runs the multi-start
# registration evals (serve.multistart_register, committed 81088cc) and
# retries the r5b_ipcrnet default-iters eval that timed out at 900 s in
# queue v4 (eval rc=124 — compile, not hang).
#   J1 — r5b_ipcrnet eval retry (default iters, generous timeout);
#        OVERWRITES r5b_ipcrnet_eval.log so the release manifest embeds
#        real numbers
#   J2 — r4b_ipcrnet (current family best, 22.9deg) with --multistart 8
#   J3 — r5b_ipcrnet with --multistart 8
#   J4 — packaging refresh (picks up the regenerated eval logs)
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

QPID=$(cat /tmp/r5_queue5.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi
echo "=== [$(date +%H:%M:%S)] r5 queue v6 starts (v5 released the chip)"

echo "=== [$(date +%H:%M:%S)] J1 r5b_ipcrnet eval retry (default iters)"
timeout 2400 python examples/evaluate.py --ckpt r5b_ipcrnet --model ipcrnet \
  --task ipcrnet --batch_size 20 > docs/runs/r5b_ipcrnet_eval.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] J2 r4b_ipcrnet multistart K=8"
timeout 3600 python examples/evaluate.py --ckpt r4b_ipcrnet --model ipcrnet \
  --task ipcrnet --batch_size 20 --multistart 8 \
  > docs/runs/r4b_ipcrnet_multistart_eval.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] J3 r5b_ipcrnet multistart K=8"
timeout 3600 python examples/evaluate.py --ckpt r5b_ipcrnet --model ipcrnet \
  --task ipcrnet --batch_size 20 --multistart 8 \
  > docs/runs/r5b_ipcrnet_multistart_eval.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] J4 packaging refresh"
python tools/package_release.py >> docs/runs/r5_queue_packaging.log 2>&1
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] r5 queue v6 complete"
