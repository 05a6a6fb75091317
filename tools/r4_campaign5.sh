#!/bin/bash
# Round-4 campaign v5 — fires after campaign v4 releases the chip.
# Attacks the two family records still short of their targets:
#  * iPCRNet: the 220-epoch cold-start run plateaued at rot 22.9 deg with
#    train-side rot stuck at 21.8 — NOT a data floor (the gt-aligned
#    chamfer of the synthetic pairs is exactly 0; measured 2026-08-19),
#    an optimization gap. Apply the warm start that took PointNetLK from
#    ~30 deg to 0.73 deg this round: initialize the PointNet encoder from
#    the trained classifier's exported feature_model
#    (--transfer_ptnet r4_pointnet_cls, use_bn=True to match).
#  * PRNet: 10.29 deg at 60 epochs vs the <10 deg VERDICT target and the
#    reference's 5.34 — test loss was still descending; extend to 85.
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

PREV_PID=$(cat /tmp/campaign4.pid 2>/dev/null || echo "")
if [ -n "$PREV_PID" ]; then
  echo "waiting for campaign v4 pid $PREV_PID"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== [$(date +%H:%M:%S)] v4 done; campaign v5 starts"

# 1) iPCRNet with transferred classifier features
echo "=== [$(date +%H:%M:%S)] train r4c_ipcrnet (transfer r4_pointnet_cls)"
timeout 6000 python examples/train.py --exp_name r4c_ipcrnet --model ipcrnet \
  --task ipcrnet --epochs 150 --cosine --grad_clip 1.0 --batch_size 20 \
  --transfer_ptnet r4_pointnet_cls >> docs/runs/r4c_ipcrnet.log 2>&1
echo "=== [$(date +%H:%M:%S)] trained (rc=$?)"
timeout 600 python examples/evaluate.py --ckpt r4c_ipcrnet --model ipcrnet \
  --task ipcrnet --batch_size 20 --use_bn \
  > docs/runs/r4c_ipcrnet_eval.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval (rc=$?)"
timeout 600 python examples/evaluate.py --ckpt r4c_ipcrnet --model ipcrnet \
  --task ipcrnet --batch_size 20 --use_bn --num_iters 16 \
  > docs/runs/r4c_ipcrnet_eval_iters16.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval @16 iters (rc=$?)"

# 2) PRNet extension 60 -> 85 epochs
echo "=== [$(date +%H:%M:%S)] train r4_prnet (resume to 85)"
timeout 2700 python examples/train.py --exp_name r4_prnet --model prnet \
  --task prnet --epochs 85 --cosine --grad_clip 1.0 --batch_size 16 \
  --num_points 1024 --resume latest >> docs/runs/r4_prnet.log 2>&1
echo "=== [$(date +%H:%M:%S)] trained (rc=$?)"
timeout 600 python examples/evaluate.py --ckpt r4_prnet --model prnet \
  --task prnet --batch_size 16 > docs/runs/r4d_prnet_eval.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval (rc=$?)"
timeout 900 python examples/evaluate.py --ckpt r4_prnet --model prnet \
  --task prnet --batch_size 16 --num_iters 5 \
  > docs/runs/r4d_prnet_eval_iters5.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval @5 iters (rc=$?)"

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py >> docs/runs/r4_campaign5.out 2>&1
echo "=== [$(date +%H:%M:%S)] r4 campaign v5 complete (rc=$?)"
