"""Indexed in-stream decode cost decomposition (development tool).

Measures, device-side, the indexed Pallas decode at the bmshj2018/ms2020
table regime in three configurations:

  A. in-stream gamma structure, realistic escapes (~2^-8)   [product]
  B. in-stream gamma structure, ZERO escapes in the data    [ceiling of
     any gamma-path optimization: cond+ensure structure only]
  C. sidecar (cond-free segment kernel), same escape data   [reference]

B vs C isolates the per-step cond/ensure overhead; A vs B isolates the
gamma bit-loop cost.  See docs/ARCHITECTURE.md "in-stream escapes".
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from compression_tpu.codec import host, jax_coder, stream, pallas_coder

S, N = 8192, 512


def chain(x, acc):
    bump = jnp.where(acc[:1, :1] == jnp.int32(-2147483647), 1, 0)
    return x + bump.astype(x.dtype)


def timed_k(fn, *args, k_lo=1, k_hi=5):
    np.asarray(fn(*args, k_hi))
    np.asarray(fn(*args, k_lo))
    t0 = time.perf_counter()
    np.asarray(fn(*args, k_hi))
    t_hi = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(fn(*args, k_lo))
    t_lo = time.perf_counter() - t0
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    table, scales = bench.gaussian_table()
    dt = jax_coder.DeviceCdfTable(table)
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 64, (S, N)).astype(np.int32)
    max_sym = table.length[idx] - 2
    sym_free = np.minimum(
        np.round(np.abs(rng.normal(0, 1, (S, N))) * scales[idx] * 0.25),
        max_sym).astype(np.int32)
    sym_esc = sym_free.copy()
    esc_mask = rng.rand(S, N) < 2.0 ** -8
    sym_esc[esc_mask] = (max_sym[esc_mask]
                         + rng.randint(1, 40, esc_mask.sum()))
    nsym = S * N

    enc = host.encode_streams if host.available() else stream.encode_streams

    def prep(sym):
        strings = enc(sym, table, idx)
        buf, lens = jax_coder.from_bytes_list(strings)
        src16 = jnp.asarray(jax_coder.bytes_to_chunks(buf, lens))
        return src16, jnp.asarray(lens)

    idx_d = jnp.asarray(idx)

    results = {}
    for name, sym, gamma in (
            ("A_instream_esc", sym_esc, True),
            ("B_instream_noesc", sym_free, True),
            ("C_sidecar_struct", sym_esc, False)):
        if gamma:
            src16, lens = prep(sym)
            expect = sym
        else:
            sbuf, slens, ep, ev = jax_coder.encode_streams_sidecar(
                sym, table, idx)
            src16 = jnp.asarray(jax_coder.bytes_to_chunks(sbuf, slens))
            lens = jnp.asarray(np.asarray(slens, np.int32))
            expect = None  # escape markers in-stream; struct timing only
        sub = jax_coder._indexed_kernel_sub(N, src16.shape[1])

        @partial(jax.jit, static_argnums=(3,))
        def dec_k(src, ln, ix, k, gamma=gamma, sub=sub):
            def body(i, acc):
                b = chain(src, acc)
                symd, san = pallas_coder.decode_indexed_pallas(
                    b, ln, ix, N, dt, sub=sub, in_stream_gamma=gamma)
                return acc + symd[:1, :1] + san[:1].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body,
                                     jnp.zeros((1, 1), jnp.int32))[0, 0]

        # correctness first
        symd, san = jax.jit(
            lambda b, ln, ix, gamma=gamma, sub=sub:
            pallas_coder.decode_indexed_pallas(
                b, ln, ix, N, dt, sub=sub, in_stream_gamma=gamma))(
                    src16, lens, idx_d)
        if expect is not None:
            assert np.array_equal(np.asarray(symd), expect), name
        t = timed_k(dec_k, src16, lens, idx_d)
        results[name] = round(nsym / t / 1e6, 1)
        print(f"{name}: {results[name]} M sym/s", flush=True)

    print(results)


if __name__ == "__main__":
    main()
