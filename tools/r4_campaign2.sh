#!/bin/bash
# Round-4 campaign v2 — replaces r4_campaign.sh after its first two runs
# exposed two sizing mistakes: (a) eval timeouts of 300 s die inside the
# eval-program compile (the killed train process can also wedge the
# tunnel for the next process), and (b) epoch counts sized to the cap
# mean every run ends in a SIGTERM mid-step. v2 sizes --epochs to finish
# BEFORE the timeout (caps are safety nets, not schedulers), keeps
# separate evaluate.py passes only for the registration families whose
# release evidence needs the Rot/Trans suite, and drops CurveNet (item 7
# keeps round-3's A/B evidence) to fit the remaining round clock.
# NEVER edit this file while it is executing.
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

# (FlowNet3D completed all 100 epochs under campaign v1 — not repeated.)

# 2) PRNet on the fixed pipeline (VERDICT item 2; reference 5.34 deg)
run r4_prnet 2300 550 --model prnet --task prnet --epochs 28 --cosine \
  --grad_clip 1.0 --batch_size 16 --num_points 1024 \
  -- --model prnet --task prnet --batch_size 16

# 3) iPCRNet retrain, identifiability floor removed (VERDICT item 3)
run r4_ipcrnet 1200 400 --model ipcrnet --task ipcrnet --epochs 40 --cosine \
  --grad_clip 1.0 --batch_size 20 \
  -- --model ipcrnet --task ipcrnet --batch_size 20

# 4) classifier with feature export -> PointNetLK with transferred
#    features (VERDICT item 4; reference exp_pnlk/run.log:1)
run r4_pointnet_cls 600 0 --model pointnet --task classification \
  --epochs 24 --cosine --augment --label_smoothing 0.2 --export_feature \
  --batch_size 64
run r4_pnlk 900 450 --model pointnetlk --task pointnetlk --epochs 17 \
  --cosine --grad_clip 1.0 --batch_size 10 --transfer_ptnet r4_pointnet_cls \
  -- --model pointnetlk --task pointnetlk --batch_size 10

# 5) MaskNet past the 0.5 plateau (VERDICT item 5; per-epoch aux already
#    logs the reference test_masknet.py accuracy/precision/recall/F1)
run r4_masknet 500 0 --model masknet --task masknet --epochs 60 --cosine \
  --grad_clip 1.0

# 6) first-ever RPMNet convergence run (VERDICT item 4; reference recipe
#    trains 2 iterations — train_rpmnet.py:164)
run r4_rpmnet 650 400 --model rpmnet --task rpmnet --epochs 12 --cosine \
  --grad_clip 1.0 --batch_size 16 \
  -- --model rpmnet --task rpmnet --batch_size 16

# 7) PCN continuation (VERDICT item 6): v1 banked epoch 26 at test
#    chamfer 0.044; resume toward the reference's 0.0346 with the cached
#    compile
run r4_pcn 450 0 --model pcn --task pcn --epochs 45 --cosine --resume latest

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py >> docs/runs/r4_campaign2.out 2>&1

# 8) beyond-reference scale demo on the real chip (VERDICT item 8)
echo "=== [$(date +%H:%M:%S)] large-N bench"
timeout 500 python tools/bench_large_n.py > docs/runs/bench_large_n_tpu.log 2>&1
echo "=== [$(date +%H:%M:%S)] r4 campaign v2 complete (rc=$?)"
