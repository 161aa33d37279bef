#!/bin/bash
# Round-4 TF-side matched-convergence runs: ms2020 at 3000 steps for the
# two lambdas still only covered at 2000 steps (0.03 ran in round 3).
cd "$(dirname "$0")"
mkdir -p rd_out_ord
export TF_ENABLE_ONEDNN_OPTS=0
export RD_STEPS=3000
for spec in "ms2020 0.004" "ms2020 0.25"; do
  set -- $spec
  out="rd_out_ord/$1_tf_$2.json"
  if [ -f "$out" ]; then echo "skip $out"; continue; fi
  echo "=== tf $1 lambda=$2 $(date +%H:%M:%S) ==="
  timeout 7200 nice -n 15 python rd_parity2.py "$1" tf "$2" "$out" || echo "FAILED $1 $2"
done
echo "TF R4 QUEUE DONE $(date +%H:%M:%S)"
