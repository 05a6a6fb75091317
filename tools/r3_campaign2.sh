#!/bin/bash
# Round-3 campaign, part 2: restart after the PRNet NaN collapse at epoch
# 22 (root cause: un-guarded non-finite gradient step; fixed by
# TrainConfig.skip_nonfinite + grad_clip_norm — commit 9e354e8). PRNet
# resumes from its best finite checkpoint with clipping on; the remaining
# family runs follow, then quantized evals and release packaging.
set -u
cd /root/repo
mkdir -p docs/runs

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
  timeout 2400 python examples/evaluate.py --ckpt "$name" \
    "${eval_args[@]}" > "docs/runs/${name}_eval.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] done $name (rc=$?)"
}

run r3_prnet    4200 --model prnet --task prnet --epochs 70 --cosine \
  --grad_clip 1.0 --resume best \
  -- --model prnet --task prnet
run r3_dcp      3600 --model dcp --task dcp --epochs 50 --cosine --grad_clip 1.0 \
  -- --model dcp --task dcp --quantize
run r3_pointnet_cls 1800 --model pointnet --task classification --epochs 40 \
  --cosine --augment --label_smoothing 0.2 \
  -- --model pointnet --task classification --quantize
run r3_masknet  1800 --model masknet --task masknet --epochs 30 --cosine --grad_clip 1.0 \
  -- --model masknet --task masknet
run r3_pcn      1800 --model pcn --task pcn --epochs 30 --cosine \
  -- --model pcn --task pcn
run r3_flownet  2700 --model flownet --task flow --epochs 20 --cosine \
  -- --model flownet --task flow

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py
echo "=== [$(date +%H:%M:%S)] campaign2 complete"
