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
BENCH_REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))


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


def _chain(x, acc):
    """Value-neutral data dependency on the loop carry that XLA cannot
    fold away (`acc & 0` folds to 0 and lets the compiler hoist the whole
    iteration body out of the k-loop — observed: 7x-inflated 'marginal'
    times).  acc never equals the sentinel, so x is returned unchanged,
    but the compiler cannot prove it."""
    import jax.numpy as jnp

    bump = jnp.where(acc[:1, :1] == jnp.int32(-2147483647), 1, 0)
    return x + bump.astype(x.dtype)


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
            s = _chain(sym, acc)
            b, ln = encode(s)
            return acc + ln[:1, None] + b[:1, :1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    @functools.partial(jax.jit, static_argnums=(2,))
    def dec_k(b, lens, k):
        def body(i, acc):
            bi = _chain(b, acc)
            sym, san = decode(bi, lens)
            return acc + sym[:1, :1] + san[:1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    def fetch_time(fn, *args):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        return time.perf_counter() - t0

    # Median of N repeats with spread (VERDICT r2 item 8: single runs on
    # the shared host showed 1.3-2x run-to-run variance).
    k_lo, k_hi = 1, 9
    np.asarray(enc_k(sym_d, k_hi))  # warm both k variants' compiles
    np.asarray(enc_k(sym_d, k_lo))
    np.asarray(dec_k(buf, lengths, k_hi))
    np.asarray(dec_k(buf, lengths, k_lo))
    encs, decs = [], []
    for _ in range(BENCH_REPEATS):
        encs.append((fetch_time(enc_k, sym_d, k_hi)
                     - fetch_time(enc_k, sym_d, k_lo)) / (k_hi - k_lo))
        decs.append((fetch_time(dec_k, buf, lengths, k_hi)
                     - fetch_time(dec_k, buf, lengths, k_lo))
                    / (k_hi - k_lo))
    t_enc = float(np.median(encs))
    t_dec = float(np.median(decs))

    n_symbols = NUM_STREAMS * NUM_ELEMENTS
    spread = {
        "encode_ms": {"median": round(t_enc * 1e3, 3),
                      "min": round(min(encs) * 1e3, 3),
                      "max": round(max(encs) * 1e3, 3)},
        "decode_ms": {"median": round(t_dec * 1e3, 3),
                      "min": round(min(decs) * 1e3, 3),
                      "max": round(max(decs) * 1e3, 3)},
        "repeats": BENCH_REPEATS,
    }
    # Combined encode+decode throughput (symbols pass through both).
    return n_symbols / (t_enc + t_dec), t_enc, t_dec, spread


def gaussian_table():
    """bmshj2018/ms2020 production regime: 64 NoisyNormal rows spanning
    exp(linspace(log .11, log 256)) at precision 12 WITH overflow escapes
    (reference continuous_indexed.py:431-633 table construction)."""
    from math import erf, sqrt

    from compression_tpu.codec import tables

    log_min, log_max = np.log(0.11), np.log(256.0)
    scales = np.exp(log_min + (log_max - log_min) * np.arange(64) / 63.0)
    rows = []
    for s in scales:
        half = int(min(np.ceil(4 * s) + 2, 192))
        x = np.arange(-half, half + 1)
        hi = np.asarray(
            [0.5 * (1 + erf((v + 0.5) / (s * sqrt(2)))) for v in x])
        lo = np.asarray(
            [0.5 * (1 + erf((v - 0.5) / (s * sqrt(2)))) for v in x])
        pmf = np.maximum(hi - lo, 1e-12)
        rows.append(pmf / pmf.sum() * (1 - 2 ** -8))
    cdfs = [tables.pmf_to_quantized_cdf(np.asarray(p, np.float32), 12)
            for p in rows]
    ragged = tables.build_ragged_cdf(cdfs, [12] * 64, [True] * 64)
    return tables.parse_ragged_cdf(ragged), scales


def bench_indexed():
    """Indexed-regime throughput: fused indexed encode, indexed Pallas
    decode with in-stream gamma escapes, and sidecar-mode decode."""
    import functools

    import jax
    import jax.numpy as jnp

    from compression_tpu.codec import host, jax_coder, stream

    table, scales = gaussian_table()
    dt = jax_coder.DeviceCdfTable(table)
    S, N = 8192, 512
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 64, (S, N)).astype(np.int32)
    # Escape-free symbols (the fused encoder's contract; ~centered mass).
    max_sym = table.length[idx] - 2
    sym_free = np.minimum(
        np.round(np.abs(rng.normal(0, 1, (S, N))) * scales[idx] * 0.25),
        max_sym).astype(np.int32)
    # Realistic escape rate (~tail_mass) for the in-stream decode.
    sym_esc = sym_free.copy()
    esc_mask = rng.rand(S, N) < 2.0 ** -8
    sym_esc[esc_mask] = (max_sym[esc_mask]
                         + rng.randint(1, 40, esc_mask.sum()))

    n_symbols = S * N
    out_size = 2 * N + 4

    idx_d = jnp.asarray(idx)
    symf_d = jnp.asarray(sym_free)

    @functools.partial(jax.jit, static_argnums=(2,))
    def enc_k(sym, ix, k):
        def body(i, acc):
            s = _chain(sym, acc)
            b, ln = jax_coder.encode_dispatch(s, dt, N, out_size, indexes=ix)
            return acc + ln[:1, None] + b[:1, :1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    @functools.partial(jax.jit, static_argnums=(3,))
    def dec_k(src16, lens, ix, k):
        def body(i, acc):
            b = _chain(src16, acc)
            sym, san = jax_coder.decode_dispatch(b, lens, N, dt, indexes=ix)
            return acc + sym[:1, :1] + san[:1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    def timed(fn, *args, k_lo=1, k_hi=5):
        # Warm BOTH k variants (k is a static arg: each value is its own
        # executable; timing an unwarmed k_lo would include its compile).
        np.asarray(fn(*args, k_hi))
        np.asarray(fn(*args, k_lo))
        reps = []
        for _ in range(max(BENCH_REPEATS // 2, 2)):
            t0 = time.perf_counter()
            np.asarray(fn(*args, k_hi))
            t_hi = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(fn(*args, k_lo))
            t_lo = time.perf_counter() - t0
            reps.append((t_hi - t_lo) / (k_hi - k_lo))
        return float(np.median(reps))

    out = {}

    # Fused indexed encode (escape-free contract), correctness first.
    buf, lens = jax.jit(
        lambda s, ix: jax_coder.encode_dispatch(
            s, dt, N, out_size, indexes=ix))(symf_d, idx_d)
    oracle = stream.encode_streams(sym_free[:64], table, idx[:64])
    assert jax_coder.to_bytes_list(
        np.asarray(buf)[:64], np.asarray(lens)[:64]) == oracle, \
        "indexed encode parity failure"
    t = timed(enc_k, symf_d, idx_d)
    out["indexed_encode_sym_per_s"] = round(n_symbols / t, 1)

    # In-stream gamma decode (escape rate ~2^-8), bytes from the native
    # host coder (bit-exact, threaded).
    strings = (host.encode_streams(sym_esc, table, idx)
               if host.available()
               else stream.encode_streams(sym_esc, table, idx))
    byte_buf, byte_lens = jax_coder.from_bytes_list(strings)
    src16 = jnp.asarray(jax_coder.bytes_to_chunks(byte_buf, byte_lens))
    lens_d = jnp.asarray(byte_lens)
    sym_out, sanity = jax.jit(
        lambda b, ln, ix: jax_coder.decode_dispatch(b, ln, N, dt, ix))(
            src16, lens_d, idx_d)
    assert np.array_equal(np.asarray(sym_out), sym_esc), \
        "indexed decode parity failure"
    assert np.asarray(sanity).all()
    t = timed(dec_k, src16, lens_d, idx_d)
    out["indexed_decode_instream_sym_per_s"] = round(n_symbols / t, 1)

    # Sidecar mode decode (escapes out of band).
    sbuf, slens, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
        sym_esc, table, idx)
    s_src16 = jnp.asarray(jax_coder.bytes_to_chunks(sbuf, slens))
    s_lens = jnp.asarray(np.asarray(slens, np.int32))

    from compression_tpu.codec import pallas_coder
    sub = jax_coder._indexed_kernel_sub(N, s_src16.shape[1])

    @functools.partial(jax.jit, static_argnums=(3,))
    def dec_side_k(src, lens, ix, k):
        def body(i, acc):
            b = _chain(src, acc)
            sym, san = pallas_coder.decode_indexed_pallas(
                b, lens, ix, N, dt, sub=sub, in_stream_gamma=False)
            return acc + sym[:1, :1] + san[:1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    dec_s, san_s = jax_coder.decode_streams_sidecar(
        sbuf, slens, N, table, esc_pos, esc_val, indexes=idx)
    assert np.array_equal(dec_s, sym_esc) and san_s.all(), \
        "sidecar decode parity failure"
    t = timed(dec_side_k, s_src16, s_lens, idx_d)
    out["indexed_decode_sidecar_sym_per_s"] = round(n_symbols / t, 1)
    return out


def _measure_host_socket(table, symbols):
    """Socket-level host baseline: the native threaded coder on all
    cores (the honest denominator next to the single-core reference)."""
    from compression_tpu.codec import host

    if not host.available():
        return None
    # Warm-up + measure encode and decode.
    sub = symbols[:4096]
    host.encode_streams(sub, table)
    t0 = time.perf_counter()
    strings = host.encode_streams(symbols, table)
    t_enc = time.perf_counter() - t0
    host.decode_streams(strings, symbols.shape[1], table)
    t0 = time.perf_counter()
    host.decode_streams(strings, symbols.shape[1], table)
    t_dec = time.perf_counter() - t0
    n = symbols.size
    return n / (t_enc + t_dec)


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
            # Cache the compiled baseline binary across bench runs (the
            # ~30 s g++ invocation was pure deadline pressure), keyed by
            # the source text.
            import hashlib
            tag = hashlib.sha256(src.encode()).hexdigest()[:16]
            cache_exe = os.path.join(
                tempfile.gettempdir(), f"bench_ref_{tag}")
            cc = os.path.join(tmp, "bench_ref.cc")
            exe = cache_exe if os.path.exists(cache_exe) else os.path.join(
                tmp, "bench_ref")
            if not os.path.exists(cache_exe):
                with open(cc, "w") as f:
                    f.write(src)
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-w",
                     f"-I{tf_dir}/include", f"-I{ref}", cc,
                     os.path.join(
                         ref,
                         "tensorflow_compression/cc/lib/range_coder.cc"),
                     os.path.join(tf_dir, "libtensorflow_framework.so.2"),
                     "-Wl,-rpath," + tf_dir, "-o", exe],
                    check=True, capture_output=True, timeout=120)
                try:
                    import shutil
                    shutil.copy2(exe, cache_exe)
                except OSError:
                    pass
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


def _flat_model_summary(models):
    """Flat per-family scalar summary for the headline JSON line.

    The driver records only the LAST ~2000 chars of stdout; round 4's
    artifact embedded the whole model tree in the headline line and the
    truncated line failed to parse (BENCH_r04: parsed=null).  The
    headline therefore carries only one scalar per family x path; the
    full tree goes to BENCH_MODELS.json and stderr.
    """
    out = {}
    for name, rows in (models or {}).items():
        if not isinstance(rows, dict):
            continue
        for row_key, tag in (("native_compress", "c"),
                             ("native_decompress", "d")):
            row = rows.get(row_key, {})
            if "median_ms" in row:
                out[f"{name}_{tag}_ms"] = row["median_ms"]
            if "speedup_vs_reference" in row:
                out[f"{name}_{tag}_x"] = row["speedup_vs_reference"]
        for row_key, tag in (("native_compress_batch8", "c8"),
                             ("native_decompress_batch8", "d8")):
            row = rows.get(row_key, {})
            if "images_per_s" in row:
                out[f"{name}_{tag}_img_s"] = row["images_per_s"]
            if "speedup_vs_reference" in row:
                out[f"{name}_{tag}_x"] = row["speedup_vs_reference"]
    return out


def main():
    # The driver runs bench.py under a fixed wall-clock budget and the
    # artifact is unusable unless the JSON line prints (BENCH_r03 was
    # rc=124/parsed=null); every block after the headline respects this
    # deadline so a partial table still produces a parseable artifact.
    from compression_tpu.util import compile_cache
    compile_cache.enable()  # env-var route is too late under axon
    t_start = time.time()
    # 700s: round-4 rehearsals ran rc=0 at ~720s total, so the driver
    # budget exceeds that; the deadline is checked between families AND
    # between rows, so saturation degrades to partial rows, not rc!=0.
    deadline = t_start + float(os.environ.get("BENCH_DEADLINE_S", "700"))
    table, symbols, cdf = make_workload()
    value, t_enc, t_dec, spread = bench_tpu(table, symbols)
    n = NUM_STREAMS * NUM_ELEMENTS
    print(f"encode: {t_enc * 1e3:.2f} ms ({n / t_enc / 1e6:.0f} M sym/s)  "
          f"decode: {t_dec * 1e3:.2f} ms ({n / t_dec / 1e6:.0f} M sym/s)",
          file=sys.stderr)
    try:
        indexed = bench_indexed()
    except Exception as e:  # noqa: BLE001 — secondary metric, keep going
        print(f"indexed bench failed: {e}", file=sys.stderr)
        indexed = {"indexed_bench_error": str(e)[:200]}
    print(f"indexed: {indexed}", file=sys.stderr)
    # The reference-coder baseline is the headline's denominator; measure
    # it BEFORE the model rows so a deadline hit cannot force the
    # fallback constant.
    baseline = _measure_baseline(cdf, symbols)
    if baseline is None:
        baseline = FALLBACK_BASELINE_SYMBOLS_PER_S
    host_socket = _measure_host_socket(table, symbols)
    models = {}
    if os.environ.get("BENCH_MODELS", "1") != "0":
        # Model-level rows (VERDICT r2 item 2 / r3 items 1+3): images/s
        # per path for all three families at 512x512 on this chip, plus
        # the recorded reference-stack baseline.
        try:
            from tools import model_bench
            models = model_bench.bench_all(
                size=int(os.environ.get("BENCH_MODEL_SIZE", "512")),
                repeats=int(os.environ.get("BENCH_MODEL_REPEATS", "3")),
                deadline=deadline)
        except Exception as e:  # noqa: BLE001 — secondary metric
            models = {"model_bench_error": str(e)[:200]}

    # Full (large) record: side file + stderr, NEVER the headline line.
    full = dict(indexed)
    full["stability"] = spread
    if models:
        full["models"] = models
    full["host_baseline_single_core_sym_per_s"] = round(baseline, 1)
    if host_socket is not None:
        # Socket-level honest denominator: this repo's own native
        # threaded coder on every core of this host.
        full["host_socket_all_cores_sym_per_s"] = round(host_socket, 1)
        full["vs_host_socket"] = round(value / host_socket, 4)
    side_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_MODELS.json")
    try:
        with open(side_path, "w") as f:
            json.dump(full, f, indent=1)
    except OSError as e:
        print(f"could not write {side_path}: {e}", file=sys.stderr)
    print("full record: " + json.dumps(full), file=sys.stderr)

    # Headline line: small and flat (must survive a 2000-char tail
    # capture and parse as the last stdout line).
    extra = _flat_model_summary(models)
    extra["enc_Msym_s"] = round(n / t_enc / 1e6, 1)
    extra["dec_Msym_s"] = round(n / t_dec / 1e6, 1)
    extra["host_1core_Msym_s"] = round(baseline / 1e6, 2)
    extra["detail"] = "BENCH_MODELS.json"
    line = json.dumps({
        "metric": "range coder encode+decode throughput, 1 chip, "
                  "vs single-core reference C++ coder; "
                  "model cells: native ms + speedup vs reference stack",
        "value": round(value, 1),
        "unit": "symbols/s",
        "vs_baseline": round(value / baseline, 4),
        "extra": extra,
    })
    if len(line) > 1900:  # paranoia: never exceed the tail capture
        line = json.dumps({
            "metric": "range coder encode+decode throughput, 1 chip",
            "value": round(value, 1),
            "unit": "symbols/s",
            "vs_baseline": round(value / baseline, 4),
            "extra": {"detail": "BENCH_MODELS.json"},
        })
    print(line, flush=True)


if __name__ == "__main__":
    main()
