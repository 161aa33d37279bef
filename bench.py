"""Benchmark: range-coder encode+decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "symbols/s", "vs_baseline": N}

Workload: the TPU-native multi-stream configuration (many interleaved coder
lanes — the axis the whole design scales across chips), with a skewed
256-symbol alphabet at precision 12, the regime of bls2017/bmshj2018
latents.  The baseline is the *measured* throughput of the reference C++
RangeEncoder/RangeDecoder on this machine, single thread (the reference
publishes no speed numbers; see BASELINE.md) — compiled on the fly from the
read-only reference mount when a toolchain is available, otherwise a
recorded constant from the dev machine is used.

vs_baseline = (our symbols/s per chip) / (reference symbols/s per CPU core).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persist XLA compilations across bench runs (first round pays the compile).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

# Measured on the dev machine (single-threaded reference C++ coder,
# encode+decode combined, 256-symbol zipf alphabet): see _measure_baseline.
FALLBACK_BASELINE_SYMBOLS_PER_S = 35.0e6

# Many short interleaved streams: the TPU-native regime (VPU lanes saturated)
# and a compile-bounded graph (the remote XLA compile in this environment
# scales badly with scan length).
NUM_STREAMS = 32768
NUM_ELEMENTS = 512
PRECISION = 12
ALPHABET = 256


def make_workload():
    from compression_tpu.codec import tables

    rng = np.random.RandomState(0)
    pmf = 1.0 / (1 + np.arange(ALPHABET)) ** 1.2
    pmf /= pmf.sum()
    cdf = tables.pmf_to_quantized_cdf(pmf, PRECISION)
    ragged = tables.build_ragged_cdf([cdf], [PRECISION], [False])
    table = tables.parse_ragged_cdf(ragged)
    symbols = rng.choice(
        ALPHABET, size=(NUM_STREAMS, NUM_ELEMENTS), p=pmf).astype(np.int32)
    return table, symbols, cdf


def bench_tpu(table, symbols):
    import jax
    import jax.numpy as jnp

    from compression_tpu.codec import jax_coder

    dev_table = jax_coder.DeviceCdfTable(table)
    num_steps = NUM_ELEMENTS
    out_size = 2 * num_steps + 4

    sym_d = jnp.asarray(symbols)
    idx_d = None

    def encode(sym, idx):
        # Production dispatch: fused Pallas kernel on TPU (single-row
        # no-overflow tables), micro-op XLA pipeline elsewhere.
        return jax_coder.encode_dispatch(sym, dev_table, num_steps, out_size)

    encode_j = jax.jit(encode)
    buf, lengths = jax.block_until_ready(encode_j(sym_d, idx_d))

    # Decode: lane-major Pallas kernel (single shared row, no overflow).
    # Byte->chunk packing runs on device as part of the decode cost.
    from compression_tpu.codec import pallas_coder

    cdf_row = np.asarray(table.cdf[0][: int(table.length[0])])
    precision = int(table.precision[0])

    @jax.jit
    def decode(buf, lengths):
        if buf.shape[1] % 2:
            buf = jnp.pad(buf, ((0, 0), (0, 1)))
        src16 = ((buf[:, 0::2].astype(jnp.uint32) << 8)
                 | buf[:, 1::2].astype(jnp.uint32))
        return pallas_coder.decode_scan_pallas_v2(
            src16, lengths, NUM_ELEMENTS, cdf_row, precision, sub=16)

    decode_j = decode
    # Trim the byte buffer to the longest actual stream (even width): the
    # decoder loads the chunk buffers whole into VMEM.
    max_len = int(np.asarray(lengths).max())
    width = min(buf.shape[1], max_len + (max_len % 2))
    buf = buf[:, :width]
    out = jax.block_until_ready(decode_j(buf, lengths))
    assert np.array_equal(np.asarray(out[0]), symbols), "decode mismatch!"

    n_symbols = NUM_STREAMS * NUM_ELEMENTS
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        full_buf, lengths = encode_j(sym_d, idx_d)
    jax.block_until_ready((full_buf, lengths))
    t_enc = (time.perf_counter() - t0) / reps

    buf = full_buf[:, :width]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode_j(buf, lengths)
    jax.block_until_ready(out)
    t_dec = (time.perf_counter() - t0) / reps

    # Combined encode+decode throughput (symbols pass through both).
    return n_symbols / (t_enc + t_dec), t_enc, t_dec


def _measure_baseline(cdf, symbols):
    """Measures the reference C++ coder single-thread on this machine."""
    tf_dir = None
    for p in sys.path + ["/opt/venv/lib/python3.12/site-packages"]:
        cand = os.path.join(p, "tensorflow")
        if os.path.isdir(os.path.join(cand, "include", "absl")):
            tf_dir = cand
            break
    ref = "/root/reference"
    if tf_dir is None or not os.path.isdir(ref):
        return None
    src = r"""
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>
#include "tensorflow_compression/cc/lib/range_coder.h"
using tensorflow_compression::RangeEncoder;
using tensorflow_compression::RangeDecoder;
int main(int argc, char** argv) {
  int n; int cdf_len; scanf("%d %d", &n, &cdf_len);
  std::vector<int32_t> cdf(cdf_len);
  for (auto& c : cdf) scanf("%d", &c);
  std::vector<int32_t> data(n);
  for (auto& d : data) scanf("%d", &d);
  auto t0 = std::chrono::steady_clock::now();
  RangeEncoder enc; std::string sink;
  for (int i = 0; i < n; ++i) enc.Encode(cdf[data[i]], cdf[data[i]+1], %PREC%, &sink);
  enc.Finalize(&sink);
  auto t1 = std::chrono::steady_clock::now();
  RangeDecoder dec(sink); long errs = 0;
  for (int i = 0; i < n; ++i)
    errs += dec.Decode(absl::MakeConstSpan(cdf), %PREC%) != data[i];
  auto t2 = std::chrono::steady_clock::now();
  double te = std::chrono::duration<double>(t1 - t0).count();
  double td = std::chrono::duration<double>(t2 - t1).count();
  printf("%f %f %ld\n", te, td, errs);
  return 0;
}
""".replace("%PREC%", str(PRECISION))
    try:
        with tempfile.TemporaryDirectory() as tmp:
            cc = os.path.join(tmp, "bench_ref.cc")
            exe = os.path.join(tmp, "bench_ref")
            with open(cc, "w") as f:
                f.write(src)
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-w",
                 f"-I{tf_dir}/include", f"-I{ref}", cc,
                 os.path.join(
                     ref, "tensorflow_compression/cc/lib/range_coder.cc"),
                 os.path.join(tf_dir, "libtensorflow_framework.so.2"),
                 "-Wl,-rpath," + tf_dir, "-o", exe],
                check=True, capture_output=True, timeout=120)
            n = 4_000_000
            rng = np.random.RandomState(1)
            pmf = np.diff(cdf).astype(np.float64)
            data = rng.choice(len(pmf), size=n, p=pmf / pmf.sum())
            inp = (f"{n} {len(cdf)}\n"
                   + " ".join(map(str, cdf)) + "\n"
                   + " ".join(map(str, data)))
            out = subprocess.run(
                [exe], input=inp, capture_output=True, text=True,
                timeout=300, check=True)
            te, td, errs = out.stdout.split()
            assert int(errs) == 0
            return n / (float(te) + float(td))
    except Exception:
        return None


def main():
    table, symbols, cdf = make_workload()
    value, t_enc, t_dec = bench_tpu(table, symbols)
    n = NUM_STREAMS * NUM_ELEMENTS
    print(f"encode: {t_enc * 1e3:.2f} ms ({n / t_enc / 1e6:.0f} M sym/s)  "
          f"decode: {t_dec * 1e3:.2f} ms ({n / t_dec / 1e6:.0f} M sym/s)",
          file=sys.stderr)
    baseline = _measure_baseline(cdf, symbols)
    if baseline is None:
        baseline = FALLBACK_BASELINE_SYMBOLS_PER_S
    print(json.dumps({
        "metric": "range coder encode+decode throughput, 1 chip "
                  f"({NUM_STREAMS} streams x {NUM_ELEMENTS} symbols, "
                  f"{ALPHABET}-ary zipf, precision {PRECISION}) "
                  "vs single-core reference C++ coder",
        "value": round(value, 1),
        "unit": "symbols/s",
        "vs_baseline": round(value / baseline, 4),
    }))


if __name__ == "__main__":
    main()
