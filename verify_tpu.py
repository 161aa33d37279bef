"""TPU kernel regression gate: every coder dispatch path, byte-compared
against the host oracle ON REAL TPU HARDWARE.

The CPU test suite exercises the Pallas kernels in interpret mode and the
XLA fallback only; a Mosaic miscompile would pass CI and silently corrupt
production streams (one such miscompile, decode_scan_pallas v1, was
caught in round 1).  This gate runs the actual device binaries:

  * fused single-row Pallas encode + lane-major Pallas decode v2
    (precisions 1, 12, 16)
  * fused indexed Pallas encode + indexed Pallas decode, 64 Gaussian
    rows + overflow (bmshj2018/ms2020 regime), escape-free data
  * escape torture: heavy-tailed data through the XLA micro-op encode
    and the indexed Pallas decode with in-stream Elias-gamma escapes
  * sidecar escape mode (TPU-native container path), both fused indexed
    encode and indexed decode without in-stream gamma
  * precision-16 indexed tables (XLA fallback on the decode side —
    asserted to be the selected path, and verified)

Each case asserts (a) which dispatch path was selected, (b) encoded
bytes are identical to the pure-Python oracle (codec/stream.py, itself
golden-pinned against the reference C++), and (c) decode of the ORACLE
bytes reproduces the symbols with the sanity flag set.

Usage:  python verify_tpu.py          (aborts unless backend == tpu)
        python verify_tpu.py --allow-cpu   (debug: run anyway)
"""

import os
import sys
import time

import numpy as np

# Persist XLA compilations across runs (same setting as bench.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax  # noqa: E402
import jax.numpy as jnp

from compression_tpu.codec import jax_coder, stream, tables

PASS = []
FAIL = []


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_table(pmfs, precisions, overflows):
    cdfs = [tables.pmf_to_quantized_cdf(np.asarray(p, np.float32), q)
            for p, q in zip(pmfs, precisions)]
    ragged = tables.build_ragged_cdf(cdfs, precisions, overflows)
    return tables.parse_ragged_cdf(ragged)


def gaussian_rows(num_scales=64):
    """bmshj2018-like scale table rows: NoisyNormal PMFs + overflow mass."""
    log_min, log_max = np.log(0.11), np.log(256.0)
    scales = np.exp(log_min + (log_max - log_min)
                    * np.arange(num_scales) / (num_scales - 1))
    rows = []
    for s in scales:
        half = int(min(np.ceil(4 * s) + 2, 192))
        x = np.arange(-half, half + 1)
        from math import erf, sqrt
        cdf = np.asarray(
            [0.5 * (1 + erf((v + 0.5) / (s * sqrt(2)))) for v in x])
        cdf_lo = np.asarray(
            [0.5 * (1 + erf((v - 0.5) / (s * sqrt(2)))) for v in x])
        pmf = np.maximum(cdf - cdf_lo, 1e-12)
        rows.append(pmf / pmf.sum() * (1 - 2 ** -8))
    return rows, scales


def check_case(name, table, symbols, indexes=None, expect_enc=None,
               expect_dec=None):
    """Byte parity + decode of oracle bytes, with path assertions."""
    t0 = time.time()
    n = symbols.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    enc_path = dec_path = "?"
    try:
        oracle = stream.encode_streams(symbols, table, indexes)

        buf, lengths = jax_coder.encode_streams(symbols, table, indexes)
        # The coder REPORTS the path it dispatched (jax_coder.encode_path
        # is the single source of truth — no duplicated predicates here).
        enc_path = jax_coder.DISPATCH_LOG.get("encode", "?")
        mine = jax_coder.to_bytes_list(buf, lengths)
        assert mine == oracle, "encoded bytes differ from oracle"

        # Decode the ORACLE bytes (not our own): asymmetric check.
        byte_buf, byte_lens = jax_coder.from_bytes_list(oracle)
        out, sanity = jax_coder.decode_streams(
            byte_buf, byte_lens, n, table, indexes)
        dec_path = jax_coder.DISPATCH_LOG.get("decode", "?")
        assert np.array_equal(out, symbols), "decoded symbols differ"
        assert np.asarray(sanity).all(), "sanity flag not set"

        # Path expectations only hold on the real backend (--allow-cpu
        # debugging exercises the XLA fallback everywhere).
        if expect_enc is not None and on_tpu:
            assert enc_path == expect_enc, \
                f"encode path {enc_path} != expected {expect_enc}"
        if expect_dec is not None and on_tpu:
            assert dec_path == expect_dec, \
                f"decode path {dec_path} != expected {expect_dec}"
        PASS.append(name)
        log(f"  ok   {name:34s} enc={enc_path:14s} dec={dec_path:14s} "
            f"({time.time() - t0:.1f}s)")
    except Exception as e:  # noqa: BLE001
        FAIL.append((name, str(e)))
        log(f"  FAIL {name}: {e}")


def check_sidecar(name, table, symbols, indexes=None, expect_dec=None):
    t0 = time.time()
    try:
        buf, lens, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
            symbols, table, indexes)
        out, sanity = jax_coder.decode_streams_sidecar(
            buf, lens, symbols.shape[1], table, esc_pos, esc_val,
            indexes=indexes)
        dec_path = jax_coder.DISPATCH_LOG.get("decode_sidecar", "?")
        assert np.array_equal(np.asarray(out), symbols), "sidecar decode"
        assert np.asarray(sanity).all(), "sidecar sanity"
        if expect_dec is not None and jax.default_backend() == "tpu":
            assert dec_path == expect_dec, \
                f"sidecar decode path {dec_path} != expected {expect_dec}"
        # Determinism: a second encode must produce identical buffers.
        buf2, lens2, esc_pos2, esc_val2 = jax_coder.encode_streams_sidecar(
            symbols, table, indexes)
        assert np.array_equal(np.asarray(buf), np.asarray(buf2))
        assert np.array_equal(np.asarray(esc_val), np.asarray(esc_val2))
        PASS.append(name)
        log(f"  ok   {name:34s} (sidecar) ({time.time() - t0:.1f}s)")
    except Exception as e:  # noqa: BLE001
        FAIL.append((name, str(e)))
        log(f"  FAIL {name}: {e}")


def main():
    backend = jax.default_backend()
    if backend != "tpu" and "--allow-cpu" not in sys.argv:
        log(f"verify_tpu: backend is '{backend}', not 'tpu' — aborting "
            "(pass --allow-cpu to run the dispatch checks anyway)")
        sys.exit(2)
    log(f"verify_tpu: backend={backend}, device={jax.devices()[0]}")

    rng = np.random.RandomState(0)
    S, N = 1024, 160

    # --- single-row tables, fused encode + decode v2 ------------------
    pmf = 1.0 / (1 + np.arange(256)) ** 1.2
    t12 = build_table([pmf / pmf.sum()], [12], [False])
    sym = rng.choice(256, size=(S, N),
                     p=(pmf / pmf.sum())).astype(np.int32)
    check_case("single-row p12 zipf256", t12, sym,
               expect_enc="pallas-single", expect_dec="pallas-single")

    t16 = build_table([pmf / pmf.sum()], [16], [False])
    check_case("single-row p16 zipf256", t16, sym,
               expect_enc="pallas-single", expect_dec="pallas-single")

    t1 = build_table([[0.5, 0.5]], [1], [False])
    symb = rng.randint(0, 2, (S, N)).astype(np.int32)
    check_case("single-row p1 binary", t1, symb,
               expect_enc="pallas-single", expect_dec="pallas-single")

    # Dirac-ish row (min mass symbols).
    p = np.full(32, 2.0 ** -12)
    p[3] = 1 - p.sum() + p[3]
    td = build_table([p], [12], [False])
    symd = rng.choice(32, size=(S, N), p=p / p.sum()).astype(np.int32)
    check_case("single-row p12 near-dirac", td, symd,
               expect_enc="pallas-single", expect_dec="pallas-single")

    # --- indexed Gaussian table (bmshj2018 regime) --------------------
    rows, scales = gaussian_rows(64)
    tg = build_table(rows, [12] * 64, [True] * 64)
    idx = rng.randint(0, 64, (S, N)).astype(np.int32)
    max_sym = tg.length[idx] - 2  # stay in range: escape-free
    symg = np.minimum(
        np.round(np.abs(rng.normal(0, 1, (S, N))) * scales[idx] * 0.3),
        max_sym).astype(np.int32)
    check_case("indexed 64-gauss p12 escape-free", tg, symg, idx,
               expect_enc="pallas-indexed", expect_dec="pallas-indexed")

    # --- escape torture: in-stream gamma through the Pallas decode ----
    symt = np.round(rng.laplace(0, 25, (S, N))).astype(np.int64)
    symt = np.clip(symt, -(2 ** 15), 2 ** 15).astype(np.int32)
    check_case("indexed 64-gauss escape torture", tg, symt, idx,
               expect_enc="xla", expect_dec="pallas-indexed")

    # --- precision-16 indexed: decode must take the XLA fallback ------
    t16i = build_table(rows[:8], [16] * 8, [True] * 8)
    idx8 = rng.randint(0, 8, (S, N)).astype(np.int32)
    sym8 = np.minimum(
        np.round(np.abs(rng.normal(0, 1, (S, N)))
                 * scales[idx8] * 0.3),
        t16i.length[idx8] - 2).astype(np.int32)
    check_case("indexed p16 (XLA fallback)", t16i, sym8, idx8,
               expect_enc="pallas-indexed", expect_dec="xla")

    # --- sidecar escape mode ------------------------------------------
    check_sidecar("sidecar 64-gauss escapes", tg, symt, idx,
                  expect_dec="pallas-indexed")
    check_sidecar("sidecar single-row", t12, sym,
                  expect_dec="pallas-indexed")

    log("")
    if FAIL:
        log(f"VERIFY_TPU: {len(FAIL)} FAILED, {len(PASS)} ok")
        for name, err in FAIL:
            log(f"  - {name}: {err}")
        sys.exit(1)
    log(f"VERIFY_TPU: ALL {len(PASS)} cases ok on {backend}")


if __name__ == "__main__":
    main()
