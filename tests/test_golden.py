"""Golden-bitstream regression tests.

tests/golden/golden.npz holds bitstreams produced by the *reference C++ range
coder* (compiled unmodified from the read-only reference mount by
tests/golden/gen_golden.cc). These tests pin bit-exact parity of this repo's
coders, the analog of the reference's EncodeConsistent golden tests
(cc/kernels/run_length_gamma_kernels_test.cc:240-266).
"""

import os

import numpy as np
import pytest

from compression_tpu.codec import reference

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


def golden_cases():
    data = np.load(GOLDEN)
    names = sorted({k.rsplit("__", 1)[0] for k in data.files})
    for name in names:
        if f"{name}__cdf" not in data:
            continue
        yield (
            name,
            bytes(data[f"{name}__bytes"].tobytes()),
            data[f"{name}__data"],
            data[f"{name}__cdf"],
            int(data[f"{name}__precision"]),
        )


@pytest.mark.parametrize(
    "name,expected,symbols,cdf,precision",
    list(golden_cases()),
    ids=[c[0] for c in golden_cases()],
)
def test_encoder_matches_cpp_reference(name, expected, symbols, cdf, precision):
    enc = reference.RangeEncoder()
    sink = bytearray()
    for v in symbols:
        enc.encode(int(cdf[v]), int(cdf[v + 1]), precision, sink)
    enc.finalize(sink)
    assert bytes(sink) == expected


@pytest.mark.parametrize(
    "name,expected,symbols,cdf,precision",
    list(golden_cases()),
    ids=[c[0] for c in golden_cases()],
)
def test_decoder_matches_cpp_reference(name, expected, symbols, cdf, precision):
    dec = reference.RangeDecoder(expected)
    out = [dec.decode(cdf, precision) for _ in range(len(symbols))]
    np.testing.assert_array_equal(out, symbols)
    assert dec.finalize()
