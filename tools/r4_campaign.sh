#!/bin/bash
# Round-4 campaign: convergence runs + releases for the families that
# lacked them (VERDICT r3 items 2-7), all on the FIXED data pipeline
# (per-epoch resampling + symmetry-broken shapes). Sequential — the
# tunneled TPU takes one process at a time. NEVER edit this file while
# it is executing (bash reads it incrementally).
#
# Budgeted for the ~2.6 h of round-4 wall clock that remained when it
# launched: cheap-but-bankable runs first (PCN / FlowNet converge in
# ~10 min each at the reference smoke shapes), then the headline PRNet
# retrain, then the rest in VERDICT priority order. Epoch counts are
# sized from round-3 per-epoch timings (prnet ~58 s, ipcrnet ~22 s,
# pnlk ~30 s, cls ~16 s, pcn/flow ~6 s); every run has a hard timeout
# so the TPU is guaranteed free for the driver's end-of-round bench.
set -u
cd /root/repo
mkdir -p docs/runs
# persistent XLA compilation cache: the campaign is ~18 sequential python
# processes over the same models — recompiling DCP-class programs costs
# minutes each time (harmless if the axon backend declines to cache)
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

run() { # name, timeout_s, train args..., then eval args after --
  local name=$1 tmo=$2; shift 2
  local train_args=() eval_args=()
  local in_eval=0
  for a in "$@"; do
    if [ "$a" = "--" ]; then in_eval=1; continue; fi
    if [ $in_eval = 0 ]; then train_args+=("$a"); else eval_args+=("$a"); fi
  done
  echo "=== [$(date +%H:%M:%S)] train $name: ${train_args[*]}"
  timeout "$tmo" python examples/train.py --exp_name "$name" \
    "${train_args[@]}" >> "docs/runs/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] eval $name (rc=$?)"
  if [ ${#eval_args[@]} -gt 0 ]; then
    timeout 300 python examples/evaluate.py --ckpt "$name" \
      "${eval_args[@]}" > "docs/runs/${name}_eval.log" 2>&1
    echo "=== [$(date +%H:%M:%S)] done $name (rc=$?)"
  fi
}

# 1+2) PCN + FlowNet3D convergence (VERDICT item 6; reference 0.03458
#      chamfer / 0.03168 EPE) — cheapest runs, banked first
run r4_pcn 700 --model pcn --task pcn --epochs 100 --cosine \
  -- --model pcn --task pcn
run r4_flownet 700 --model flownet --task flow --epochs 100 --cosine \
  -- --model flownet --task flow

# 3) PRNet on the fixed pipeline (VERDICT item 2; reference best 5.34 deg
#    at epoch 70 of 100, pretrained/exp_prnet/log)
run r4_prnet 2300 --model prnet --task prnet --epochs 36 --cosine \
  --grad_clip 1.0 --batch_size 16 --num_points 1024 \
  -- --model prnet --task prnet --batch_size 16

# 4) iPCRNet retrain now that the chamfer identifiability floor is gone
#    (VERDICT item 3; reference 0.01729 chamfer)
run r4_ipcrnet 1400 --model ipcrnet --task ipcrnet --epochs 55 --cosine \
  --grad_clip 1.0 --batch_size 20 \
  -- --model ipcrnet --task ipcrnet --batch_size 20

# 5) classifier with feature export, then PointNetLK with transferred
#    features (VERDICT item 4; reference pretrained/exp_pnlk/run.log:1)
run r4_pointnet_cls 600 --model pointnet --task classification \
  --epochs 30 --cosine --augment --label_smoothing 0.2 --export_feature \
  --batch_size 64 \
  -- --model pointnet --task classification --quantize
run r4_pnlk 1000 --model pointnetlk --task pointnetlk --epochs 28 \
  --cosine --grad_clip 1.0 --batch_size 10 --transfer_ptnet r4_pointnet_cls \
  -- --model pointnetlk --task pointnetlk --batch_size 10

# 6) MaskNet past the 0.5 plateau (VERDICT item 5; reference trains 500 ep)
run r4_masknet 700 --model masknet --task masknet --epochs 120 --cosine \
  --grad_clip 1.0 \
  -- --model masknet --task masknet

# 7) first-ever RPMNet convergence run (VERDICT item 4; reference recipe:
#    Adam, B=10, 2-iteration training — train_rpmnet.py:104,164; our task
#    trains 2 iters, evals at the reference's default 1)
run r4_rpmnet 900 --model rpmnet --task rpmnet --epochs 20 --cosine \
  --grad_clip 1.0 --batch_size 16 \
  -- --model rpmnet --task rpmnet --batch_size 16

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py >> docs/runs/r4_campaign.out 2>&1

# 8) beyond-reference scale demo on the real chip (VERDICT item 8):
#    blockwise chamfer/kNN/EMD at N up to 65536
echo "=== [$(date +%H:%M:%S)] large-N bench"
timeout 900 python tools/bench_large_n.py > docs/runs/bench_large_n_tpu.log 2>&1
echo "=== [$(date +%H:%M:%S)] large-N done (rc=$?)"

# 9) best-effort CurveNet on an enlarged shape-jittered set (VERDICT
#    item 7) — last on purpose: if the round ends first, everything
#    above is already banked
run r4_curvenet 1300 --model curvenet --task classification \
  --optimizer sgd --lr 0.1 --weight_decay 1e-4 --cosine \
  --label_smoothing 0.2 --augment --epochs 30 --batch_size 32 \
  --dataset_size 4096 --param_jitter 0.12 \
  -- --model curvenet --task classification --dataset_size 4096 --param_jitter 0.12

python tools/package_release.py >> docs/runs/r4_campaign.out 2>&1
echo "=== [$(date +%H:%M:%S)] r4 campaign complete"
