"""In-stream escape decode: lane-group width sweep (VERDICT r2 item 4).

The indexed Pallas decoder takes its Elias-gamma escape branch under
`lax.cond(any(esc))` over the whole (sub, 128) lane tile.  At the
reference tail_mass 2^-8:
    P(any of sub*128 lanes escapes per step) = 1 - (1 - 2^-8)^(sub*128)
    sub=8 -> 98%   sub=2 -> 63%   sub=1 -> 39%
so at sub=8 nearly every step pays the masked gamma machinery.  Smaller
sub trades that for a larger grid (programs run sequentially on the one
TensorCore, each paying fixed window/metadata costs).  This sweep
measures the real tradeoff on hardware, at several escape rates.

Note the alternative VERDICT floats — two-pass decode (structure, then
escape patch-up) — is NOT possible for the reference byte format: the
gamma bits are arithmetic-coded in the same stream, so the decoder
cannot skip them without decoding them.  Sidecar mode (the TPU-native
container) is the design answer; this sweep optimizes the
reference-format path.

Usage (TPU): python tools/instream_sweep.py [out.json]
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from compression_tpu.codec import host, jax_coder, pallas_coder, stream, \
    tables  # noqa: E402

S, N = 8192, 512


def gaussian_table():
    from math import erf, sqrt
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


def chain(x, acc):
    bump = jnp.where(acc[:1, :1] == jnp.int32(-2147483647), 1, 0)
    return x + bump.astype(x.dtype)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    assert jax.default_backend() == "tpu", "sweep needs the real chip"
    table, scales = gaussian_table()
    dt = jax_coder.DeviceCdfTable(table)
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 64, (S, N)).astype(np.int32)
    max_sym = table.length[idx] - 2
    base_sym = np.minimum(
        np.round(np.abs(rng.normal(0, 1, (S, N))) * scales[idx] * 0.25),
        max_sym).astype(np.int32)

    idx_d = jnp.asarray(idx)
    enc = host.encode_streams if host.available() else stream.encode_streams

    esc_exps = tuple(int(v) for v in os.environ.get(
        "SWEEP_ESC_EXPS", "8").split(","))
    results = {"streams": S, "symbols_per_stream": N, "rows": []}
    for esc_exp in esc_exps:  # escape rate 2^-k; 2^-8 = reference tail_mass
        sym = base_sym.copy()
        esc_mask = rng.rand(S, N) < 2.0 ** -esc_exp
        sym[esc_mask] = (max_sym[esc_mask]
                         + rng.randint(1, 40, esc_mask.sum()))
        strings = enc(sym, table, idx)
        buf, lens = jax_coder.from_bytes_list(strings)
        src16 = jnp.asarray(jax_coder.bytes_to_chunks(buf, lens))
        lens_d = jnp.asarray(lens)

        for sub in tuple(int(v) for v in os.environ.get(
                "SWEEP_SUBS", "16,8,4,2,1").split(",")):
            @functools.partial(jax.jit, static_argnums=(3,))
            def dec_k(src, ln, ix, k, sub=sub):
                pad = (-S) % (sub * 128)
                if pad:
                    src = jnp.pad(src, ((0, pad), (0, 0)))
                    ln = jnp.pad(ln, (0, pad))
                    ix = jnp.pad(ix, ((0, pad), (0, 0)))

                def body(i, acc):
                    b = chain(src, acc)
                    s, san = pallas_coder.decode_indexed_pallas(
                        b, ln, ix, N, dt, sub=sub, in_stream_gamma=True)
                    return acc + s[:1, :1] + san[:1].astype(jnp.int32)
                return jax.lax.fori_loop(0, k, body,
                                         jnp.zeros((1, 1), jnp.int32))[0, 0]

            try:
                # Correctness first.
                pad = (-S) % (sub * 128)
                src_p = jnp.pad(src16, ((0, pad), (0, 0))) if pad else src16
                ln_p = jnp.pad(lens_d, (0, pad)) if pad else lens_d
                ix_p = jnp.pad(idx_d, ((0, pad), (0, 0))) if pad else idx_d
                sym_out, sanity = jax.jit(
                    lambda a, b, c, sub=sub: pallas_coder.
                    decode_indexed_pallas(a, b, c, N, dt, sub=sub,
                                          in_stream_gamma=True))(
                        src_p, ln_p, ix_p)
                ok = (np.array_equal(np.asarray(sym_out)[:S], sym)
                      and np.asarray(sanity)[:S].all())
                # Device-side k-loop timing, median of 3.
                np.asarray(dec_k(src16, lens_d, idx_d, 5))
                np.asarray(dec_k(src16, lens_d, idx_d, 1))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(dec_k(src16, lens_d, idx_d, 5))
                    t5 = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    np.asarray(dec_k(src16, lens_d, idx_d, 1))
                    t1 = time.perf_counter() - t0
                    ts.append((t5 - t1) / 4)
                t = float(np.median(ts))
                row = {"escape_rate": f"2^-{esc_exp}", "sub": sub,
                       "ok": bool(ok),
                       "ms": round(t * 1e3, 2),
                       "msym_per_s": round(S * N / t / 1e6, 1)}
            except Exception as e:  # noqa: BLE001
                row = {"escape_rate": f"2^-{esc_exp}", "sub": sub,
                       "error": str(e)[:160]}
            results["rows"].append(row)
            print(row, flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
