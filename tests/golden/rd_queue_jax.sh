#!/bin/bash
# Sequential repo-JAX RD queue (TPU under axon).  ~1.5h.
cd "$(dirname "$0")"
mkdir -p rd_out
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_comp_cache"
for spec in \
    "bls2017 0.0005" "bls2017 0.004" "bls2017 0.03" "bls2017 0.25" \
    "bmshj2018 0.0005" "bmshj2018 0.004" "bmshj2018 0.03" "bmshj2018 0.25" \
    "ms2020 0.004" "ms2020 0.03" "ms2020 0.25"; do
  set -- $spec
  out="rd_out/$1_jax_$2.json"
  if [ -f "$out" ]; then echo "skip $out"; continue; fi
  echo "=== jax $1 lambda=$2 $(date +%H:%M:%S) ==="
  timeout 7200 python rd_parity2.py "$1" jax "$2" "$out" || echo "FAILED $1 $2"
done
echo "JAX QUEUE DONE $(date +%H:%M:%S)"
