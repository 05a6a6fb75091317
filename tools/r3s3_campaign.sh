#!/bin/bash
# Round-3 session-3 campaign: registration convergence runs from scratch.
# The session-2 VM died before tools/r3_campaign2.sh executed and
# checkpoints/ is gitignored, so nothing survived to resume from.
# Portfolio (VERDICT r2 item 4: single-digit Rot_RMSE on >= 2 registration
# models): DCP and DeepGMR are correspondence/transform-supervised and
# converge fast; PRNet gets the remaining wall clock with the fixed
# (skip_nonfinite + grad_clip) recipe that its session-2 NaN motivated.
# Epoch counts are sized so each cosine schedule COMPLETES inside its
# timeout (an interrupted anneal never reaches the low-LR tail).
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
  timeout 900 python examples/evaluate.py --ckpt "$name" \
    "${eval_args[@]}" > "docs/runs/${name}_eval.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] done $name (rc=$?)"
}

run r3_dcp 1380 --model dcp --task dcp --epochs 18 --cosine --grad_clip 1.0 \
  -- --model dcp --task dcp
run r3_deepgmr 840 --model deepgmr --task deepgmr --epochs 25 --cosine --grad_clip 1.0 \
  -- --model deepgmr --task deepgmr
run r3_prnet 2820 --model prnet --task prnet --epochs 40 --cosine --grad_clip 1.0 \
  -- --model prnet --task prnet

echo "=== [$(date +%H:%M:%S)] packaging releases/"
python tools/package_release.py
echo "=== [$(date +%H:%M:%S)] campaign complete"
