#!/bin/bash
# Round-3 session-3 campaign v3 (follower): waits for the in-flight
# r3b_deepgmr training process (pid = $1, already running on the
# symmetry-broken dataset), evaluates it, then retrains DCP on the
# symmetry-broken dataset (r3b_dcp trained before the warp landed, so
# its 15.6 deg sits on the old unidentifiable task) and packages
# releases/. RPMNet is dropped for wall-clock; see BENCH_NOTES.
set -u
cd /root/repo
mkdir -p docs/runs

if [ $# -ge 1 ]; then
  echo "=== [$(date +%H:%M:%S)] waiting on deepgmr train pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 5; done
fi
echo "=== [$(date +%H:%M:%S)] eval r3b_deepgmr"
timeout 420 python examples/evaluate.py --ckpt r3b_deepgmr \
  --model deepgmr --task deepgmr > docs/runs/r3b_deepgmr_eval.log 2>&1
echo "=== [$(date +%H:%M:%S)] train r3c_dcp (rc=$?)"
timeout 1500 python examples/train.py --exp_name r3c_dcp --model dcp \
  --task dcp --epochs 40 --cosine --grad_clip 1.0 \
  >> docs/runs/r3c_dcp.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval r3c_dcp (rc=$?)"
timeout 600 python examples/evaluate.py --ckpt r3c_dcp --model dcp \
  --task dcp --quantize > docs/runs/r3c_dcp_eval.log 2>&1
echo "=== [$(date +%H:%M:%S)] packaging releases/ (rc=$?)"
python tools/package_release.py
echo "=== [$(date +%H:%M:%S)] campaign v3 complete"
