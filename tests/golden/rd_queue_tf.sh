#!/bin/bash
# Sequential reference-TF RD queue (CPU).  ~4.5h on 2 cores.
cd "$(dirname "$0")"
mkdir -p rd_out
export TF_ENABLE_ONEDNN_OPTS=0
for spec in \
    "bls2017 0.0005" "bls2017 0.004" "bls2017 0.03" "bls2017 0.25" \
    "bmshj2018 0.0005" "bmshj2018 0.004" "bmshj2018 0.03" "bmshj2018 0.25" \
    "ms2020 0.004" "ms2020 0.03" "ms2020 0.25"; do
  set -- $spec
  out="rd_out/$1_tf_$2.json"
  if [ -f "$out" ]; then echo "skip $out"; continue; fi
  echo "=== tf $1 lambda=$2 $(date +%H:%M:%S) ==="
  timeout 7200 python rd_parity2.py "$1" tf "$2" "$out" || echo "FAILED $1 $2"
done
echo "TF QUEUE DONE $(date +%H:%M:%S)"
