#!/bin/bash
# Round-5 TPU queue v4 — after killing queue v3 mid-E3.
#
# Queue v3's phase C/E discovered the round-4 hard-cls set is UNLEARNABLE
# (all of PointNet/DGCNN/CurveNet pinned at the ~0.25-0.29 group-alias
# ceiling, train AND test — docs/runs/r5_pointnet_hard.log,
# r5_dgcnn_hard.log, r5_curvenet_hard.log), and the iPCRNet warm start
# fell into the chamfer wrong-pose attractor (70deg+ while loss improved,
# docs/runs/r5_ipcrnet.log). Both root-caused and fixed on the CPU side:
# corrugation band 6-14 -> 2.0-4.5 (tools/diagnose_hard_cls.py) and a
# transform-magnitude curriculum + rot_deg best-checkpoint selection.
#
# Order = information gain per chip-minute; RPMNet extension (v3's D3)
# is cut — 7.11deg is already a converged record and the wall clock
# doesn't cover it.
#   G1 — PointNet 30ep on the FIXED hard set: validates the band redesign
#   G2 — iPCRNet curriculum run (VERDICT item 3)
#   G3 — DGCNN + CurveNet on the fixed hard set (VERDICT item 5);
#        reads /tmp/r5b_hard_args for extra difficulty flags decided
#        after G1 (e.g. --cls_noise), empty by default
#   G4 — PRNet 50->85ep extension + num_iters=5 eval (VERDICT item 4)
#   G5 — packaging + fresh bench
# NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

echo "=== [$(date +%H:%M:%S)] r5 queue v4 starts"

echo "=== [$(date +%H:%M:%S)] G1 PointNet 30ep on fixed hard set (band 2.0-4.5)"
timeout 2400 python examples/train.py --exp_name r5b_pointnet_hard \
  --model pointnet --task classification --epochs 30 --cosine --augment \
  --label_smoothing 0.2 --batch_size 32 --hard_cls --dataset_size 6144 \
  --param_jitter 0.08 > docs/runs/r5b_pointnet_hard.log 2>&1
echo "rc=$?"
timeout 1200 python examples/evaluate.py --ckpt r5b_pointnet_hard --model pointnet \
  --task classification --hard_cls --dataset_size 6144 --param_jitter 0.08 \
  > docs/runs/r5b_pointnet_hard_eval.log 2>&1
echo "eval rc=$?"

echo "=== [$(date +%H:%M:%S)] G2 iPCRNet curriculum run (ramp 50ep, best=rot_deg)"
timeout 6000 python examples/train.py --exp_name r5b_ipcrnet --model ipcrnet \
  --task ipcrnet --epochs 150 --cosine --grad_clip 1.0 --batch_size 20 \
  --curriculum 50 --best_metric rot_deg > docs/runs/r5b_ipcrnet.log 2>&1
echo "rc=$?"
timeout 900 python examples/evaluate.py --ckpt r5b_ipcrnet --model ipcrnet \
  --task ipcrnet --batch_size 20 > docs/runs/r5b_ipcrnet_eval.log 2>&1
echo "eval rc=$?"
timeout 900 python examples/evaluate.py --ckpt r5b_ipcrnet --model ipcrnet \
  --task ipcrnet --batch_size 20 --num_iters 16 \
  > docs/runs/r5b_ipcrnet_eval_iters16.log 2>&1
echo "eval@16 rc=$?"

HARD_EXTRA=$(cat /tmp/r5b_hard_args 2>/dev/null || echo "")
echo "=== [$(date +%H:%M:%S)] G3 DGCNN + CurveNet on fixed hard set (extra: '$HARD_EXTRA')"
timeout 5400 python examples/train.py --exp_name r5b_dgcnn_hard \
  --model dgcnn-cls --task classification --epochs 40 --cosine --augment \
  --label_smoothing 0.2 --batch_size 32 --hard_cls --dataset_size 6144 \
  --param_jitter 0.08 $HARD_EXTRA > docs/runs/r5b_dgcnn_hard.log 2>&1
echo "rc=$?"
timeout 1800 python examples/evaluate.py --ckpt r5b_dgcnn_hard --model dgcnn-cls \
  --task classification --hard_cls --dataset_size 6144 --param_jitter 0.08 \
  $HARD_EXTRA > docs/runs/r5b_dgcnn_hard_eval.log 2>&1
echo "eval rc=$?"
timeout 7200 python examples/train.py --exp_name r5b_curvenet_hard \
  --model curvenet --task classification --epochs 40 --cosine --augment \
  --label_smoothing 0.2 --batch_size 32 --hard_cls --dataset_size 6144 \
  --param_jitter 0.08 $HARD_EXTRA > docs/runs/r5b_curvenet_hard.log 2>&1
echo "rc=$?"
timeout 1800 python examples/evaluate.py --ckpt r5b_curvenet_hard --model curvenet \
  --task classification --hard_cls --dataset_size 6144 --param_jitter 0.08 \
  $HARD_EXTRA > docs/runs/r5b_curvenet_hard_eval.log 2>&1
echo "eval rc=$?"

echo "=== [$(date +%H:%M:%S)] G4 PRNet extension 50 -> 85 ep (resume from release best)"
timeout 4200 python examples/train.py --exp_name r4_prnet --model prnet \
  --task prnet --epochs 85 --cosine --grad_clip 1.0 --batch_size 16 \
  --num_points 1024 --resume latest >> docs/runs/r4_prnet.log 2>&1
echo "rc=$?"
timeout 1200 python examples/evaluate.py --ckpt r4_prnet --model prnet \
  --task prnet --batch_size 16 > docs/runs/r5_prnet_eval.log 2>&1
echo "eval rc=$?"
timeout 1500 python examples/evaluate.py --ckpt r4_prnet --model prnet \
  --task prnet --batch_size 16 --num_iters 5 \
  > docs/runs/r5_prnet_eval_iters5.log 2>&1
echo "eval@5 rc=$?"

echo "=== [$(date +%H:%M:%S)] G5 packaging + fresh bench"
python tools/package_release.py >> docs/runs/r5_queue_packaging.log 2>&1
echo "rc=$?"
timeout 3600 python bench.py > docs/runs/r5_bench2.json 2> docs/runs/r5_bench2.err
echo "rc=$?"

echo "=== [$(date +%H:%M:%S)] r5 queue v4 complete"
