#!/bin/bash
# One-touch post-outage validation queue: smallest compile first, stop on
# first failure, everything unbuffered into one log. Run as:
#   nohup bash tools/recovery_run.sh > /tmp/recovery.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
echo "== tiny first-contact (small fused-DGCNN compile) =="
timeout 1200 python -u tools/check_tpu_kernels.py dgcnn_fused_small
echo "== full fused-DGCNN check =="
timeout 1800 python -u tools/check_tpu_kernels.py dgcnn_fused
echo "== DCP segment profile (incl. fused-encoder A/B) =="
timeout 1800 python -u tools/profile_dcp.py
echo "== headline bench =="
timeout 2400 python -u bench.py --train
echo "== recovery queue done =="
