#!/bin/bash
# Round-3 session-3 campaign v4 (follower): waits for campaign v3
# (pid = $1) to finish, then retrains DeepGMR with the on-device RRI
# path (models/deepgmr.py computes get_rri inside the jitted step; the
# v2 attempt spent its whole 900 s budget on per-item host RRI device
# round trips and never finished epoch 0), evaluates it, re-packages.
set -u
cd /root/repo
mkdir -p docs/runs

if [ $# -ge 1 ]; then
  echo "=== [$(date +%H:%M:%S)] waiting on campaign v3 pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 5; done
fi
echo "=== [$(date +%H:%M:%S)] train r3c_deepgmr"
timeout 900 python examples/train.py --exp_name r3c_deepgmr --model deepgmr \
  --task deepgmr --epochs 25 --cosine --grad_clip 1.0 \
  >> docs/runs/r3c_deepgmr.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval r3c_deepgmr (rc=$?)"
timeout 420 python examples/evaluate.py --ckpt r3c_deepgmr --model deepgmr \
  --task deepgmr > docs/runs/r3c_deepgmr_eval.log 2>&1
echo "=== [$(date +%H:%M:%S)] packaging releases/ (rc=$?)"
python tools/package_release.py
echo "=== [$(date +%H:%M:%S)] campaign v4 complete"
