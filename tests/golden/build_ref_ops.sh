#!/bin/bash
# Builds ref_ops.so: the REFERENCE TF custom ops (tensorflow/compression,
# mounted read-only at /root/reference) compiled UNMODIFIED from the mount.
# Test harness only — used to generate golden fixtures (make_golden_ops.py,
# make_golden_em.py, fuzz_parity.py) pinning byte-exact parity of this
# repo's TPU-native implementations.  No reference code enters the package.
#
# Everything except the Y4M dataset op is included (Y4M pulls tf.data
# internals not exported by the pip TF; the Y4M parser has its own
# pure-Python golden tests).
set -euo pipefail
cd "$(dirname "$0")"

TF_INC=$(python -c "import tensorflow as tf; print(tf.sysconfig.get_include())")
TF_LIB=$(python -c "import tensorflow as tf; print(tf.sysconfig.get_lib())")
REF=/root/reference

g++ -O2 -std=c++17 -shared -fPIC \
  -I"$TF_INC" -I"$REF" \
  -D_GLIBCXX_USE_CXX11_ABI=1 -DEIGEN_MAX_ALIGN_BYTES=64 \
  "$REF"/tensorflow_compression/cc/lib/range_coder.cc \
  "$REF"/tensorflow_compression/cc/lib/bit_coder.cc \
  "$REF"/tensorflow_compression/cc/kernels/range_coder_kernels.cc \
  "$REF"/tensorflow_compression/cc/kernels/range_coding_kernels.cc \
  "$REF"/tensorflow_compression/cc/kernels/range_coding_kernels_util.cc \
  "$REF"/tensorflow_compression/cc/kernels/unbounded_index_range_coding_kernels.cc \
  "$REF"/tensorflow_compression/cc/kernels/pmf_to_cdf_kernels.cc \
  "$REF"/tensorflow_compression/cc/kernels/run_length_kernels.cc \
  "$REF"/tensorflow_compression/cc/kernels/run_length_gamma_kernels.cc \
  "$REF"/tensorflow_compression/cc/kernels/quantization_kernels.cc \
  "$REF"/tensorflow_compression/cc/ops/range_coder_ops.cc \
  "$REF"/tensorflow_compression/cc/ops/range_coding_ops.cc \
  "$REF"/tensorflow_compression/cc/ops/pmf_to_cdf_ops.cc \
  "$REF"/tensorflow_compression/cc/ops/run_length_ops.cc \
  "$REF"/tensorflow_compression/cc/ops/run_length_gamma_ops.cc \
  "$REF"/tensorflow_compression/cc/ops/quantization_ops.cc \
  -L"$TF_LIB" -l:libtensorflow_framework.so.2 \
  -o ref_ops.so
echo "built ref_ops.so"
