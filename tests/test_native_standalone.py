"""Decode-anywhere packaging test (C11 parity, reference cc/tflite/).

Compiles a small C++ consumer against native/range_coder.{h,cc} with
NOTHING but the system toolchain — no Python headers, TF, JAX or abseil
— and round-trips streams through the C API, byte-comparing against the
Python-side encode.  This is the portability claim the reference makes
with its TFLite custom kernels: a receiver on any platform with a C++17
compiler can decode the streams.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from compression_tpu.codec import stream, tables

NATIVE = os.path.join(os.path.dirname(__file__), "..",
                      "compression_tpu", "native")

CONSUMER = r"""
// Stand-alone consumer: only the public C header + libc++.
#include <cstdio>
#include <cstdlib>
#include <vector>
#include "range_coder.h"

int main(int argc, char** argv) {
  // stdin: num_streams num_elements num_rows max_len, then tables,
  // then symbols; stdout: per-stream lengths + hex bytes, then the
  // decode of its own bytes.
  int64_t S, N, R, M;
  if (std::scanf("%lld %lld %lld %lld", (long long*)&S, (long long*)&N,
                 (long long*)&R, (long long*)&M) != 4) return 2;
  std::vector<int32_t> cdf(R * M), len(R), prec(R);
  std::vector<uint8_t> ovf(R);
  for (auto& v : cdf) std::scanf("%d", &v);
  for (auto& v : len) std::scanf("%d", &v);
  for (auto& v : prec) std::scanf("%d", &v);
  for (auto& v : ovf) { int t; std::scanf("%d", &t); v = (uint8_t)t; }
  std::vector<int32_t> sym(S * N);
  for (auto& v : sym) std::scanf("%d", &v);

  const int64_t stride = 4 * N + 64;
  std::vector<uint8_t> buf(S * stride);
  std::vector<int32_t> lens(S);
  int rc = ctpu_encode_streams(sym.data(), nullptr, S, N, cdf.data(),
                               len.data(), prec.data(), ovf.data(), R, M,
                               buf.data(), stride, lens.data(), 2);
  if (rc != 0) return 3;

  std::vector<int32_t> out(S * N);
  std::vector<uint8_t> sane(S);
  ctpu_decode_streams(buf.data(), lens.data(), stride, nullptr, S, N,
                      cdf.data(), len.data(), prec.data(), ovf.data(),
                      R, M, out.data(), sane.data(), 2);
  long errs = 0;
  for (int64_t i = 0; i < S * N; ++i) errs += out[i] != sym[i];
  long insane = 0;
  for (int64_t s = 0; s < S; ++s) insane += sane[s] == 0;
  std::printf("%ld %ld\n", errs, insane);
  for (int64_t s = 0; s < S; ++s) {
    std::printf("%d ", lens[s]);
    for (int32_t b = 0; b < lens[s]; ++b)
      std::printf("%02x", buf[s * stride + b]);
    std::printf("\n");
  }
  return 0;
}
"""


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("standalone")
    src = tmp / "consumer.cc"
    src.write_text(CONSUMER)
    exe = tmp / "consumer"
    subprocess.run(
        ["g++", "-O1", "-std=c++17", "-pthread", f"-I{NATIVE}",
         str(src), os.path.join(NATIVE, "range_coder.cc"), "-o", str(exe)],
        check=True, capture_output=True, timeout=300)
    return str(exe)


def test_standalone_roundtrip_and_byte_parity(binary):
    rng = np.random.RandomState(0)
    # Mixed table: a zipf row (no overflow) + a short overflow row.
    pmf1 = 1.0 / (1 + np.arange(32)) ** 1.2
    pmf1 /= pmf1.sum()
    cdf1 = tables.pmf_to_quantized_cdf(pmf1.astype(np.float32), 12)
    pmf2 = np.asarray([0.4, 0.3, 0.2], np.float32) * (1 - 2.0**-8)
    cdf2 = tables.pmf_to_quantized_cdf(pmf2, 10)
    table = tables.parse_ragged_cdf(tables.build_ragged_cdf(
        [cdf1, cdf2], [12, 10], [False, True]))

    S, N = 6, 40
    sym = np.zeros((S, N), np.int32)
    for j in range(N):
        row = j % 2
        if row == 0:
            sym[:, j] = rng.choice(32, S, p=pmf1)
        else:
            sym[:, j] = rng.randint(0, 2, S)
    sym[2, 3] = 57  # escape through the overflow row (row 1, j odd... )
    sym[3, 7] = -9
    # j=3,7 are odd -> row 1 (overflow): escapes exercise gamma.

    R, M = table.cdf.shape
    inp = [f"{S} {N} {R} {M}"]
    inp.append(" ".join(map(str, table.cdf.ravel())))
    inp.append(" ".join(map(str, table.length)))
    inp.append(" ".join(map(str, table.precision)))
    inp.append(" ".join(str(int(v)) for v in table.overflow))
    inp.append(" ".join(map(str, sym.ravel())))
    out = subprocess.run(
        [binary], input="\n".join(inp), capture_output=True, text=True,
        timeout=120, check=True)
    lines = out.stdout.strip().split("\n")
    errs, insane = map(int, lines[0].split())
    assert errs == 0, "standalone decode mismatch"
    assert insane == 0, "standalone sanity failure"

    # Byte parity vs the Python oracle (itself reference-golden-pinned).
    oracle = stream.encode_streams(sym, table)
    for s in range(S):
        ln, hexbytes = lines[1 + s].split()
        assert bytes.fromhex(hexbytes) == oracle[s], f"stream {s} bytes"
