"""Device-side kernel timing: runs the encode/decode k times inside ONE
jitted program with a data dependency between iterations, and differences
two k values.  Immune to host<->device tunnel artifacts (lazy dispatch,
early-returning blocks, per-call latency).  Development tool.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from compression_tpu.codec import jax_coder, pallas_coder, tables

NUM_STREAMS = 32768
NUM_ELEMENTS = 512
PRECISION = 12
ALPHABET = 256



def chain(x, acc):
    """Value-neutral iteration dependency XLA cannot fold away (acc & 0
    folds to 0 and the loop body hoists; acc never hits the sentinel)."""
    bump = jnp.where(acc[:1, :1] == jnp.int32(-2147483647), 1, 0)
    return x + bump.astype(x.dtype)

def fetch_time(fn, *args):
    """One call, result fetched: total wall including tunnel latency."""
    out = fn(*args)          # warm compile
    np.asarray(out)
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def main():
    rng = np.random.RandomState(0)
    pmf = 1.0 / (1 + np.arange(ALPHABET)) ** 1.2
    pmf /= pmf.sum()
    cdf = tables.pmf_to_quantized_cdf(pmf, PRECISION)
    table = tables.parse_ragged_cdf(
        tables.build_ragged_cdf([cdf], [PRECISION], [False]))
    symbols = rng.choice(
        ALPHABET, size=(NUM_STREAMS, NUM_ELEMENTS), p=pmf).astype(np.int32)
    sym_d = jnp.asarray(symbols)
    n = NUM_ELEMENTS
    out_size = 2 * n + 4
    cdf_row = np.asarray(table.cdf[0][: int(table.length[0])])
    nsym = NUM_STREAMS * NUM_ELEMENTS

    @partial(jax.jit, static_argnums=(1,))
    def enc_k(sym, k):
        def body(i, acc):
            s = chain(sym, acc)  # iteration dependency, value-neutral
            buf, lengths = pallas_coder.encode_single_row_device(
                s, cdf_row, PRECISION, out_size, sub=8)
            # Depend on BOTH outputs so the byte finalize isn't DCE'd.
            return acc + lengths[:1, None] + buf[:1, :1].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    t1 = fetch_time(enc_k, sym_d, 1)
    t9 = fetch_time(enc_k, sym_d, 9)
    per = (t9 - t1) / 8
    print(f"encode device-side: k1 {t1*1e3:.2f} ms, k9 {t9*1e3:.2f} ms "
          f"-> {per*1e3:.2f} ms/iter ({nsym/per/1e6:.0f} M sym/s)",
          flush=True)

    buf, lengths = pallas_coder.encode_single_row_device(
        sym_d, cdf_row, PRECISION, out_size, sub=8)
    max_len = int(np.asarray(lengths).max())
    width = min(int(buf.shape[1]), max_len + (max_len % 2))
    bufc = jnp.asarray(np.asarray(buf[:, :width]))
    len_d = jnp.asarray(np.asarray(lengths))

    @partial(jax.jit, static_argnums=(2,))
    def dec_k(b, lens, k):
        if b.shape[1] % 2:
            b = jnp.pad(b, ((0, 0), (0, 1)))
        src16 = ((b[:, 0::2].astype(jnp.uint32) << 8)
                 | b[:, 1::2].astype(jnp.uint32))

        def body(i, acc):
            s16 = chain(src16, acc)
            sym, san = pallas_coder.decode_scan_pallas_v2(
                s16, lens, NUM_ELEMENTS, cdf_row, PRECISION, sub=16)
            return acc + sym[:1, :1]
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((1, 1), jnp.int32))[0, 0]

    t1 = fetch_time(dec_k, bufc, len_d, 1)
    t9 = fetch_time(dec_k, bufc, len_d, 9)
    per = (t9 - t1) / 8
    print(f"decode device-side: k1 {t1*1e3:.2f} ms, k9 {t9*1e3:.2f} ms "
          f"-> {per*1e3:.2f} ms/iter ({nsym/per/1e6:.0f} M sym/s)",
          flush=True)


if __name__ == "__main__":
    main()
