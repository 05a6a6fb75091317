#!/bin/bash
# Round-3 session-3 campaign v2 — relaunched after fixing per-epoch
# transform resampling (RegistrationData.set_epoch): v1's r3_dcp run
# exposed the frozen-pair overfit (train 10.0 deg vs test 16.9 deg at
# epoch 17 — every epoch saw the same 2048 (cloud, transform) pairs,
# where the reference's torch DataLoader draws fresh transforms every
# __getitem__). v2 retrains the registration portfolio with fresh pairs
# per epoch: DCP (the headline), DeepGMR, RPMNet.
set -u
cd /root/repo
mkdir -p docs/runs

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
  echo "=== [$(date +%H:%M:%S)] eval $name (rc=$?)"
  timeout "$etmo" python examples/evaluate.py --ckpt "$name" \
    "${eval_args[@]}" > "docs/runs/${name}_eval.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] done $name (rc=$?)"
}

run r3b_dcp 1500 600 --model dcp --task dcp --epochs 40 --cosine --grad_clip 1.0 \
  -- --model dcp --task dcp --quantize
run r3b_deepgmr 900 300 --model deepgmr --task deepgmr --epochs 30 --cosine --grad_clip 1.0 \
  -- --model deepgmr --task deepgmr
run r3b_rpmnet 1200 300 --model rpmnet --task rpmnet --epochs 18 --cosine --grad_clip 1.0 \
  -- --model rpmnet --task rpmnet

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py
echo "=== [$(date +%H:%M:%S)] campaign v2 complete"
