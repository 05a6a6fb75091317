#!/bin/bash
# Round-4 campaign v4 — fires after the post-campaign TPU queue
# (tools/r4_tpu_queue.sh) releases the chip. Mops up the two remaining
# evidence gaps the v3 campaign + queue leave open:
#  * RPMNet: v3's 25-epoch run (Rot_RMSE 7.11) was still descending at
#    the cosine floor — extend to 60 epochs from the latest checkpoint.
#  * DGCNN classification: the one reference experiment family with no
#    convergence run at all (VERDICT weak #3) — train on the enlarged
#    (6144, param-jitter) synthetic set like the v3 CurveNet/PointNet
#    ordering runs so the three-way ordering is on one dataset.
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

QUEUE_PID=$(cat /tmp/tpu_queue.pid 2>/dev/null || echo "")
if [ -n "$QUEUE_PID" ]; then
  echo "waiting for tpu queue pid $QUEUE_PID"
  while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== [$(date +%H:%M:%S)] queue done; campaign v4 starts"

# 0) PRNet serving-time refinement: the trained weights are shared across
# iterations, so evaluating with 5 instead of 3 is a free-at-train-time
# knob (evaluate.py --num_iters); v3's 3-iter eval landed at 10.29 deg
echo "=== [$(date +%H:%M:%S)] eval r4_prnet @ num_iters=5"
timeout 900 python examples/evaluate.py --ckpt r4_prnet --model prnet \
  --task prnet --batch_size 16 --num_points 1024 --num_iters 5 \
  > docs/runs/r4_prnet_eval_iters5.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval (rc=$?)"

# 1) RPMNet extension 25 -> 60 epochs (~45 min at 45 s/epoch)
echo "=== [$(date +%H:%M:%S)] train r4b_rpmnet (resume to 60)"
timeout 3600 python examples/train.py --exp_name r4b_rpmnet --model rpmnet \
  --task rpmnet --epochs 60 --cosine --grad_clip 1.0 --batch_size 16 \
  --resume latest >> docs/runs/r4b_rpmnet.log 2>&1
echo "=== [$(date +%H:%M:%S)] trained (rc=$?)"
timeout 600 python examples/evaluate.py --ckpt r4b_rpmnet --model rpmnet \
  --task rpmnet --batch_size 16 > docs/runs/r4c_rpmnet_eval.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval (rc=$?)"
timeout 900 python examples/evaluate.py --ckpt r4b_rpmnet --model rpmnet \
  --task rpmnet --batch_size 16 --num_iters 5 \
  > docs/runs/r4c_rpmnet_eval_iters5.log 2>&1
echo "=== [$(date +%H:%M:%S)] eval @5 iters (rc=$?)"

# 2) DGCNN classification convergence on the enlarged set
echo "=== [$(date +%H:%M:%S)] train r4b_dgcnn_cls"
timeout 5400 python examples/train.py --exp_name r4b_dgcnn_cls --model dgcnn-cls \
  --task classification --epochs 40 --cosine --augment --label_smoothing 0.2 \
  --batch_size 32 --dataset_size 6144 --param_jitter 0.08 \
  >> docs/runs/r4b_dgcnn_cls.log 2>&1
echo "=== [$(date +%H:%M:%S)] trained (rc=$?)"

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py >> docs/runs/r4_campaign4.out 2>&1
echo "=== [$(date +%H:%M:%S)] r4 campaign v4 complete (rc=$?)"
