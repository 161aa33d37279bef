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
    import functools

    import jax
    import jax.numpy as jnp

    from compression_tpu.codec import jax_coder, pallas_coder

    dev_table = jax_coder.DeviceCdfTable(table)
    num_steps = NUM_ELEMENTS
    out_size = 2 * num_steps + 4

    sym_d = jnp.asarray(symbols)
    cdf_row = np.asarray(table.cdf[0][: int(table.length[0])])
    precision = int(table.precision[0])

    def encode(sym):
        # Production dispatch: fused Pallas kernel on TPU (single-row
        # no-overflow tables), micro-op XLA pipeline elsewhere.
        return jax_coder.encode_dispatch(sym, dev_table, num_steps, out_size)

    def decode(buf, lengths):
        # Byte->chunk packing runs on device as part of the decode cost.
        if buf.shape[1] % 2:
            buf = jnp.pad(buf, ((0, 0), (0, 1)))
        src16 = ((buf[:, 0::2].astype(jnp.uint32) << 8)
                 | buf[:, 1::2].astype(jnp.uint32))
        return pallas_coder.decode_scan_pallas_v2(
            src16, lengths, NUM_ELEMENTS, cdf_row, precision, sub=16)

    # Correctness: full round-trip, bytes fetched to host.
    buf, lengths = jax.jit(encode)(sym_d)
    # Trim the byte buffer to the longest actual stream (even width): the
    # decoder loads the chunk buffers whole into VMEM.
    max_len = int(np.asarray(lengths).max())
    width = min(buf.shape[1], max_len + (max_len % 2))
    buf = jnp.asarray(np.asarray(buf[:, :width]))
    lengths = jnp.asarray(np.asarray(lengths))
    out = jax.jit(decode)(buf, lengths)
    assert np.array_equal(np.asarray(out[0]), symbols), "decode mismatch!"

    # Timing is DEVICE-SIDE: run the computation k times inside one jitted
    # program (iterations chained by a no-op data dependency so nothing is
    # hoisted or dead-code-eliminated) and difference two k values.  Host
    # wall-clock around individual dispatches is meaningless through the
    # remote-TPU tunnel (~tens of ms per-call latency, lazy dispatch, and
    # block_until_ready returning early have all been observed).

    @functools.partial(jax.jit, static_argnums=(1,))
    def enc_k(sym, k):
        def body(i, acc):
            s = sym + (acc[:1, :1] & 0)
            b, ln = encode(s)
            return acc + ln[:1, None] + b[:1, :1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    @functools.partial(jax.jit, static_argnums=(2,))
    def dec_k(b, lens, k):
        def body(i, acc):
            bi = b + (acc[:1, :1].astype(jnp.uint8) & 0)
            sym, san = decode(bi, lens)
            return acc + sym[:1, :1] + san[:1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    def fetch_time(fn, *args):
        np.asarray(fn(*args))  # warm the compile
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        return time.perf_counter() - t0

    k_lo, k_hi = 1, 9
    t_enc = (fetch_time(enc_k, sym_d, k_hi)
             - fetch_time(enc_k, sym_d, k_lo)) / (k_hi - k_lo)
    t_dec = (fetch_time(dec_k, buf, lengths, k_hi)
             - fetch_time(dec_k, buf, lengths, k_lo)) / (k_hi - k_lo)

    n_symbols = NUM_STREAMS * NUM_ELEMENTS
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
