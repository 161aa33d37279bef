"""Tests for the scalar reference range coder and table machinery.

Modeled on the reference's C++ test strategy
(cc/kernels/range_coding_kernels_test.cc round-trips with histogram CDFs,
pmf_to_cdf_kernels_test.cc normalization invariants).
"""

import numpy as np
import pytest

from compression_tpu.codec import reference, stream, tables


def histogram_cdf(data, precision, alphabet):
    """Builds an integer CDF from an empirical histogram (test helper)."""
    counts = np.bincount(data.ravel(), minlength=alphabet).astype(np.float64)
    pmf = counts / counts.sum()
    return tables.pmf_to_quantized_cdf(pmf, precision)


class TestPmfToQuantizedCdf:
    @pytest.mark.parametrize("precision", [1, 2, 8, 12, 16])
    def test_normalization(self, precision):
        rng = np.random.RandomState(0)
        for size in [2, 3, 10, 100]:
            if size > (1 << precision):
                continue  # invalid input: every symbol needs mass >= 1
            pmf = rng.dirichlet(np.ones(size) * 0.5)
            cdf = tables.pmf_to_quantized_cdf(pmf, precision)
            assert cdf[0] == 0
            assert cdf[-1] == 1 << precision
            assert np.all(np.diff(cdf) >= 1), "every symbol needs mass >= 1"

    def test_under_sum(self):
        # PMF summing to much less than 1: gains are granted to largest mass.
        pmf = np.array([0.1, 0.2, 0.05], np.float32)
        cdf = tables.pmf_to_quantized_cdf(pmf, 8)
        assert cdf[-1] == 256
        assert np.all(np.diff(cdf) >= 1)
        # The largest-mass symbol should have absorbed the surplus.
        masses = np.diff(cdf)
        assert masses[1] == masses.max()

    def test_over_sum(self):
        pmf = np.array([0.9, 0.9, 0.9], np.float32)
        cdf = tables.pmf_to_quantized_cdf(pmf, 8)
        assert cdf[-1] == 256
        assert np.all(np.diff(cdf) >= 1)

    def test_zero_mass_kept_at_one(self):
        pmf = np.array([0.0, 1.0, 0.0], np.float32)
        cdf = tables.pmf_to_quantized_cdf(pmf, 8)
        masses = np.diff(cdf)
        assert masses[0] == 1 and masses[2] == 1
        assert masses[1] == 254

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError):
            tables.pmf_to_quantized_cdf(np.array([0.5, np.nan]), 8)
        with pytest.raises(ValueError):
            tables.pmf_to_quantized_cdf(np.array([0.5, -0.1]), 8)


class TestRaggedFormat:
    def test_roundtrip_vector(self):
        ragged = tables.build_ragged_cdf(
            [[0, 10, 200, 256], [0, 128, 256]], [8, 8], [False, True])
        t = tables.parse_ragged_cdf(ragged)
        assert t.num_rows == 2
        assert t.length[0] == 4 and t.length[1] == 3
        assert not t.overflow[0] and t.overflow[1]
        np.testing.assert_array_equal(t.cdf[0, :4], [0, 10, 200, 256])
        # Padding repeats terminal value.
        assert t.cdf[1, 3] == 256

    def test_matrix_rows(self):
        m = np.array([[8, 0, 100, 256, 256, 256],
                      [-8, 0, 30, 60, 256, 256]], np.int32)
        t = tables.parse_ragged_cdf(m)
        assert t.num_rows == 2
        assert t.length[0] == 3 and t.length[1] == 4
        assert t.overflow[1]

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            tables.parse_ragged_cdf(np.array([8, 1, 256], np.int32))  # no 0
        with pytest.raises(ValueError):
            tables.parse_ragged_cdf(np.array([20, 0, 256], np.int32))
        with pytest.raises(ValueError):
            tables.parse_ragged_cdf(np.array([8, 0, 255], np.int32))


class TestScalarRoundTrip:
    @pytest.mark.parametrize("precision", [1, 8, 12, 16])
    def test_uniform(self, precision):
        rng = np.random.RandomState(precision)
        alphabet = min(1 << precision, 64)
        data = rng.randint(0, alphabet, size=2000)
        cdf = histogram_cdf(data, precision, alphabet)
        enc = reference.RangeEncoder()
        sink = bytearray()
        for v in data:
            enc.encode(int(cdf[v]), int(cdf[v + 1]), precision, sink)
        enc.finalize(sink)
        dec = reference.RangeDecoder(bytes(sink))
        decoded = [dec.decode(cdf, precision) for _ in data]
        np.testing.assert_array_equal(decoded, data)
        assert dec.finalize()

    def test_zipf(self):
        # Skewed distribution: compressed size must approach entropy.
        rng = np.random.RandomState(0)
        data = np.minimum(rng.zipf(1.5, size=5000) - 1, 63)
        cdf = histogram_cdf(data, 14, 64)
        enc = reference.RangeEncoder()
        sink = bytearray()
        for v in data:
            enc.encode(int(cdf[v]), int(cdf[v + 1]), 14, sink)
        enc.finalize(sink)
        pmf = np.diff(cdf) / float(cdf[-1])
        entropy_bits = -np.log2(pmf[data]).sum()
        assert entropy_bits / 8 <= len(sink) <= entropy_bits / 8 * 1.01 + 4

    def test_dirac(self):
        # Near-deterministic symbol: almost free to encode.
        cdf = np.array([0, 1, 65535, 65536], np.int32)
        data = np.ones(10000, np.int64)
        enc = reference.RangeEncoder()
        sink = bytearray()
        for v in data:
            enc.encode(int(cdf[v]), int(cdf[v + 1]), 16, sink)
        enc.finalize(sink)
        assert len(sink) < 40
        dec = reference.RangeDecoder(bytes(sink))
        decoded = [dec.decode(cdf, 16) for _ in data]
        np.testing.assert_array_equal(decoded, data)
        assert dec.finalize()

    def test_carry_chains(self):
        # Alternating skewed symbols maximize state-1 (delayed carry) churn.
        cdf = np.array([0, 1, 65536], np.int32)
        rng = np.random.RandomState(42)
        data = (rng.rand(4000) < 0.5).astype(np.int64)
        enc = reference.RangeEncoder()
        sink = bytearray()
        for v in data:
            enc.encode(int(cdf[v]), int(cdf[v + 1]), 16, sink)
        enc.finalize(sink)
        dec = reference.RangeDecoder(bytes(sink))
        decoded = [dec.decode(cdf, 16) for _ in data]
        np.testing.assert_array_equal(decoded, data)
        assert dec.finalize()

    def test_empty(self):
        enc = reference.RangeEncoder()
        sink = bytearray()
        enc.finalize(sink)
        assert bytes(sink) == b""
        dec = reference.RangeDecoder(b"")
        assert dec.finalize()

    def test_mixed_precisions(self):
        # Interleave different precisions in a single stream.
        rng = np.random.RandomState(7)
        cdf8 = histogram_cdf(rng.randint(0, 16, 500), 8, 16)
        cdf16 = histogram_cdf(rng.randint(0, 16, 500), 16, 16)
        data = rng.randint(0, 16, size=1000)
        enc = reference.RangeEncoder()
        sink = bytearray()
        for j, v in enumerate(data):
            cdf, p = (cdf8, 8) if j % 2 == 0 else (cdf16, 16)
            enc.encode(int(cdf[v]), int(cdf[v + 1]), p, sink)
        enc.finalize(sink)
        dec = reference.RangeDecoder(bytes(sink))
        out = []
        for j in range(len(data)):
            cdf, p = (cdf8, 8) if j % 2 == 0 else (cdf16, 16)
            out.append(dec.decode(cdf, p))
        np.testing.assert_array_equal(out, data)
        assert dec.finalize()


class TestOverflowMode:
    def test_roundtrip_heavy_tail(self):
        # Unbounded signed alphabet with Laplacian-like tails
        # (BASELINE.json config #2).
        rng = np.random.RandomState(3)
        data = np.round(rng.laplace(0, 20, size=3000)).astype(np.int64)
        # Finite alphabet covers [0, 8); everything else overflows.
        max_value = 8
        pmf = np.full(max_value + 1, 1.0 / (max_value + 1))
        cdf = tables.pmf_to_quantized_cdf(pmf, 12)
        enc = reference.RangeEncoder()
        sink = bytearray()
        for v in data:
            reference.overflow_encode(enc, sink, cdf, 12, int(v))
        enc.finalize(sink)
        dec = reference.RangeDecoder(bytes(sink))
        decoded = [reference.overflow_decode(dec, cdf, 12) for _ in data]
        np.testing.assert_array_equal(decoded, data)
        assert dec.finalize()

    def test_escape_boundaries(self):
        cdf = tables.pmf_to_quantized_cdf(np.full(5, 0.2), 10)
        max_value = len(cdf) - 2  # = 4, escape symbol
        cases = [0, 1, max_value - 1, max_value, max_value + 1, 100, -1, -37,
                 2**20, -(2**20)]
        enc = reference.RangeEncoder()
        sink = bytearray()
        for v in cases:
            reference.overflow_encode(enc, sink, cdf, 10, v)
        enc.finalize(sink)
        dec = reference.RangeDecoder(bytes(sink))
        decoded = [reference.overflow_decode(dec, cdf, 10) for _ in cases]
        np.testing.assert_array_equal(decoded, cases)
        assert dec.finalize()


class TestStreams:
    def test_channel_mode(self):
        # Per-element CDF row cycles j % num_rows.
        rng = np.random.RandomState(0)
        ragged = tables.build_ragged_cdf(
            [[0, 100, 200, 256], [0, 50, 256], [0, 10, 240, 250, 256]],
            [8, 8, 8], [False, False, False])
        t = tables.parse_ragged_cdf(ragged)
        sizes = np.asarray(t.length) - 1
        num_streams, n = 4, 60
        values = np.stack([
            rng.randint(0, sizes[np.arange(n) % t.num_rows])
            for _ in range(num_streams)])
        enc = stream.encode_streams(values, t)
        decoded, sanity = stream.decode_streams(enc, n, t)
        np.testing.assert_array_equal(decoded, values)
        assert sanity.all()

    def test_indexed_mode_with_overflow(self):
        rng = np.random.RandomState(1)
        ragged = tables.build_ragged_cdf(
            [[0, 100, 200, 1024], [0, 512, 600, 900, 1024]],
            [10, 10], [True, True])
        t = tables.parse_ragged_cdf(ragged)
        num_streams, n = 3, 80
        index = rng.randint(0, 2, size=(num_streams, n))
        values = rng.randint(-30, 30, size=(num_streams, n))
        enc = stream.encode_streams(values, t, index)
        decoded, sanity = stream.decode_streams(enc, n, t, index)
        np.testing.assert_array_equal(decoded, values)
        assert sanity.all()

    def test_streams_are_independent(self):
        # Encoding stream s alone gives identical bytes as in the batch.
        rng = np.random.RandomState(2)
        cdf = tables.pmf_to_quantized_cdf(np.full(8, 1 / 8), 8)
        t = tables.parse_ragged_cdf(
            tables.build_ragged_cdf([cdf], [8], [False]))
        values = rng.randint(0, 7, size=(5, 100))
        batch = stream.encode_streams(values, t)
        for s in range(5):
            solo = stream.encode_streams(values[s : s + 1], t)
            assert solo[0] == batch[s]
