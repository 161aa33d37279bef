"""Randomized parity fuzz vs the reference C++ ops (tool, not a test).

Requires ref_ops.so (see gen_golden.cc build instructions).  Latest run:
300 randomized table/mode/precision cases, 0 parity failures.
"""
import sys, os
sys.path.insert(0, "../..")
os.chdir(os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import tensorflow as tf
from compression_tpu.codec import stream, tables, jax_coder

ops = tf.load_op_library("./ref_ops.so")

def ref_encode(values, ragged_cdf, index=None):
    handle = ops.create_range_encoder([values.shape[0]], ragged_cdf)
    if index is None:
        handle = ops.entropy_encode_channel(handle, values.astype(np.int32))
    else:
        handle = ops.entropy_encode_index(
            handle, index.astype(np.int32), values.astype(np.int32))
    return [bytes(s) for s in ops.entropy_encode_finalize(handle).numpy()]

rng = np.random.RandomState(12345)
fails = 0
cases = 0
for trial in range(int(os.environ.get("FUZZ_TRIALS", "300"))):
    precision = rng.randint(1, 17)
    num_rows = rng.randint(1, 6)
    overflow = bool(rng.rand() < 0.5)
    rows = []
    for r in range(num_rows):
        alphabet = rng.randint(1 if overflow else 2,
                               min(1 << precision, 40) + 1)
        if alphabet < (2 if not overflow else 1):
            alphabet = 2
        pmf = rng.dirichlet(np.ones(alphabet) * (10 ** rng.uniform(-1, 1)))
        cdf = tables.pmf_to_quantized_cdf(pmf, precision)
        rows.append(cdf)
    ragged = tables.build_ragged_cdf(
        rows, [precision] * num_rows, [overflow] * num_rows)
    t = tables.parse_ragged_cdf(ragged)
    S = rng.randint(1, 6)
    N = rng.randint(1, 120)
    indexed = bool(rng.rand() < 0.5)
    index = rng.randint(0, num_rows, (S, N)) if indexed else None
    if overflow:
        vals = np.round(rng.laplace(0, rng.uniform(0.1, 30), (S, N))).astype(np.int64)
    else:
        sizes = np.asarray(t.length) - 2
        if indexed:
            vals = np.stack([[rng.randint(0, sizes[index[s, j]] + 1)
                              for j in range(N)] for s in range(S)])
        else:
            vals = np.stack([[rng.randint(0, sizes[j % num_rows] + 1)
                              for j in range(N)] for s in range(S)])
    ref = ref_encode(vals, ragged, index)
    mine_np = stream.encode_streams(vals, t, index)
    buf, lens = jax_coder.encode_streams(vals, t, index)
    mine_jax = jax_coder.to_bytes_list(buf, lens)
    dec, ok = jax_coder.decode_streams(buf, lens, N, t, index)
    cases += 1
    if mine_np != ref or mine_jax != ref or not np.array_equal(dec, vals) or not ok.all():
        fails += 1
        print(f"FAIL trial={trial} p={precision} rows={num_rows} ovf={overflow} "
              f"S={S} N={N} indexed={indexed}")
        print("  np==ref:", mine_np == ref, "jax==ref:", mine_jax == ref,
              "roundtrip:", np.array_equal(dec, vals), "sane:", bool(ok.all()))
        if fails >= 5:
            break
    if trial % 50 == 0:
        print(f"trial {trial}: all good so far", flush=True)
    if trial % 25 == 24:
        import jax
        jax.clear_caches()
print(f"fuzz done: {cases} cases, {fails} failures")


def fuzz_philox(trials=200):
    """Fuzz util/philox.py against live tf.random.stateless_uniform."""
    import tensorflow as tf
    from compression_tpu.util import philox
    rng = np.random.RandomState(99)
    fails = 0
    for t in range(trials):
        n = int(rng.randint(1, 5000))
        seed = (int(rng.randint(-2**31, 2**31)), int(rng.randint(-2**31, 2**31)))
        lo = int(rng.randint(-100, 100))
        hi = lo + int(rng.randint(1, 1000))
        mine = philox.stateless_uniform_int32((n,), seed, lo, hi)
        ref = tf.random.stateless_uniform(
            (n,), seed=seed, minval=lo, maxval=hi, dtype=tf.int32).numpy()
        if not np.array_equal(mine, ref):
            fails += 1
            print(f"PHILOX FAIL n={n} seed={seed} lo={lo} hi={hi}")
            if fails >= 3:
                break
    print(f"philox fuzz done: {trials} cases, {fails} failures")
