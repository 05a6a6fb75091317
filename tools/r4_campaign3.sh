#!/bin/bash
# Round-4 campaign v3 — retrains the three families v2 exposed as broken,
# after root-cause fixes landed:
#  * RPMNet: svd3 Jacobi/normalize gradient guards (NaN at degenerate
#    covariance froze every step) + real PCA normals in the synthetic set
#  * MaskNet: BCE loss (MSE's gradient vanishes under the saturated
#    sigmoid init; loss sat at exactly 0.25)
#  * iPCRNet: nothing wrong but the schedule — v2's 40 epochs were still
#    descending; reference trains ~300
# plus the cheap continuations (PRNet 28->60, PCN ->120, FlowNet ->250)
# and the enlarged-set CurveNet-vs-PointNet ordering run (VERDICT item 7).
# Epoch counts are sized to finish BEFORE the timeout: caps are safety
# nets, not schedulers. NEVER edit this file while it is executing.
set -u
cd /root/repo
mkdir -p docs/runs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

run() { # name, train_timeout_s, eval_timeout_s, train args..., -- eval args
  local name=$1 tmo=$2 etmo=$3; shift 3
  local train_args=() eval_args=()
  local in_eval=0
  for a in "$@"; do
    if [ "$a" = "--" ]; then in_eval=1; continue; fi
    if [ $in_eval = 0 ]; then train_args+=("$a"); else eval_args+=("$a"); fi
  done
  echo "=== [$(date +%H:%M:%S)] train $name: ${train_args[*]}"
  timeout "$tmo" python examples/train.py --exp_name "$name" \
    "${train_args[@]}" >> "docs/runs/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] trained $name (rc=$?)"
  if [ ${#eval_args[@]} -gt 0 ]; then
    timeout "$etmo" python examples/evaluate.py --ckpt "$name" \
      "${eval_args[@]}" > "docs/runs/${name}_eval.log" 2>&1
    echo "=== [$(date +%H:%M:%S)] eval $name (rc=$?)"
  fi
}

# 1) RPMNet with normals + gradient-safe Kabsch (VERDICT item 4)
run r4b_rpmnet 2400 500 --model rpmnet --task rpmnet --epochs 25 --cosine \
  --grad_clip 1.0 --batch_size 16 \
  -- --model rpmnet --task rpmnet --batch_size 16

# 2) MaskNet past the saturation with BCE (VERDICT item 5)
run r4b_masknet 4000 0 --model masknet --task masknet --epochs 100 --cosine \
  --grad_clip 1.0 --masknet_loss bce

# masked-eval: chain the trained mask into the PointNetLK registration
# eval (reference test_masknet.py workflow) for P/R/F1 + masked Rot/Trans
timeout 600 python examples/evaluate.py --ckpt r4_pnlk --model pointnetlk \
  --task pointnetlk --batch_size 10 --masknet_ckpt r4b_masknet \
  > docs/runs/r4b_masknet_eval.log 2>&1
echo "=== [$(date +%H:%M:%S)] masked eval (rc=$?)"

# 3) PRNet continuation 28 -> 60 epochs (VERDICT item 2; target <10 deg)
run r4_prnet 3400 600 --model prnet --task prnet --epochs 60 --cosine \
  --grad_clip 1.0 --batch_size 16 --num_points 1024 --resume latest \
  -- --model prnet --task prnet --batch_size 16

# 4) iPCRNet long schedule (VERDICT item 3; v2's 40 epochs still descending)
run r4b_ipcrnet 6500 500 --model ipcrnet --task ipcrnet --epochs 220 --cosine \
  --grad_clip 1.0 --batch_size 20 \
  -- --model ipcrnet --task ipcrnet --batch_size 20

# 5) PCN continuation -> 120 epochs (VERDICT item 6; ref 0.03458)
run r4_pcn 1800 0 --model pcn --task pcn --epochs 120 --cosine --resume latest

# 6) FlowNet3D continuation -> 250 epochs (VERDICT item 6; ref 0.03168)
run r4_flownet 2200 0 --model flownet --task flow --epochs 250 --cosine \
  --resume latest

# 7) enlarged-set classification ordering (VERDICT item 7):
#    CurveNet vs PointNet on size=6144 + param_jitter so CurveNet can't
#    memorize (reference ordering: 0.9368 vs 0.8825)
run r4b_curvenet 5400 0 --model curvenet --task classification --epochs 60 \
  --cosine --augment --label_smoothing 0.2 --batch_size 32 \
  --dataset_size 6144 --param_jitter 0.08
run r4b_pointnet_cls 1500 0 --model pointnet --task classification \
  --epochs 40 --cosine --augment --label_smoothing 0.2 --batch_size 64 \
  --dataset_size 6144 --param_jitter 0.08

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py >> docs/runs/r4_campaign3.out 2>&1
echo "=== [$(date +%H:%M:%S)] r4 campaign v3 complete (rc=$?)"
