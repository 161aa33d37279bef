"""Native host range coder parity vs the Python oracle (stream.py)."""

import numpy as np
import pytest

from compression_tpu.codec import host, stream, tables


pytestmark = pytest.mark.skipif(
    not host.available(), reason="no C++ toolchain")


def _random_table(rng, num_rows, overflow_p=0.5, max_prec=16):
    cdfs, precs, ovfs = [], [], []
    for _ in range(num_rows):
        prec = int(rng.randint(1, max_prec + 1))
        ovf = bool(rng.rand() < overflow_p)
        alpha = int(rng.randint(1 if ovf else 2,
                                min(1 << prec, 40) + 1))
        alpha = max(alpha, 1 if ovf else 2)
        pmf = rng.dirichlet(np.ones(alpha))
        cdfs.append(tables.pmf_to_quantized_cdf(pmf, prec))
        precs.append(prec)
        ovfs.append(ovf)
    return tables.parse_ragged_cdf(
        tables.build_ragged_cdf(cdfs, precs, ovfs))


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    num_rows = int(rng.randint(1, 5))
    t = _random_table(rng, num_rows)
    S, N = int(rng.randint(1, 9)), int(rng.randint(1, 40))
    indexed = bool(rng.rand() < 0.5)
    idx = rng.randint(0, num_rows, size=(S, N)).astype(np.int32) \
        if indexed else None
    len_np = np.asarray(t.length, np.int64)
    ovf_np = np.asarray(t.overflow)
    rows = idx if idx is not None else np.broadcast_to(
        np.arange(N) % num_rows, (S, N))
    mv = len_np[rows] - 2
    sym = rng.randint(-5, 50, size=(S, N)).astype(np.int32)
    # Clamp values on bounded rows into range; overflow rows take anything.
    sym = np.where(ovf_np[rows], sym,
                   np.abs(sym) % np.maximum(mv, 1)).astype(np.int32)

    ref = stream.encode_streams(sym, t, idx)
    nat = host.encode_streams(sym, t, idx)
    assert nat == ref

    vals_ref, sane_ref = stream.decode_streams(ref, N, t, idx)
    vals_nat, sane_nat = host.decode_streams(nat, N, t, idx)
    np.testing.assert_array_equal(vals_ref, vals_nat)
    np.testing.assert_array_equal(sane_ref, sane_nat)
    np.testing.assert_array_equal(vals_nat, sym)
    assert sane_nat.all()


def test_multithreaded_determinism():
    rng = np.random.RandomState(99)
    t = _random_table(rng, 3, overflow_p=0.0)
    S, N = 64, 100
    len_np = np.asarray(t.length, np.int64)
    rows = np.broadcast_to(np.arange(N) % 3, (S, N))
    sym = (rng.randint(0, 1000, size=(S, N))
           % np.maximum(len_np[rows] - 1, 1)).astype(np.int32)
    a = host.encode_streams(sym, t, num_threads=1)
    b = host.encode_streams(sym, t, num_threads=8)
    assert a == b
    va, _ = host.decode_streams(a, N, t, num_threads=8)
    np.testing.assert_array_equal(va, sym)
