"""Legacy RangeEncode/RangeDecode and UnboundedIndexRange op tests
(reference range_coding_kernels_test.cc / unbounded_..._test.cc specs)."""

import numpy as np
import pytest

from compression_tpu.codec import legacy, tables


class TestLegacyRangeCoding:
    @pytest.mark.parametrize("precision", [8, 12, 16])
    def test_roundtrip_shared_cdf(self, precision):
        rng = np.random.RandomState(precision)
        alphabet = 16
        pmf = rng.dirichlet(np.ones(alphabet))
        cdf = tables.pmf_to_quantized_cdf(pmf, precision)
        data = rng.randint(0, alphabet, size=(5, 7))
        cdf_b = cdf.reshape(1, 1, -1)
        code = legacy.range_encode(data, cdf_b, precision)
        decoded = legacy.range_decode(code, data.shape, cdf_b, precision)
        np.testing.assert_array_equal(decoded, data)

    def test_roundtrip_broadcast_axis(self):
        # Per-column CDFs broadcast over rows.
        rng = np.random.RandomState(0)
        alphabet, cols = 8, 3
        cdfs = np.stack([
            tables.pmf_to_quantized_cdf(rng.dirichlet(np.ones(alphabet)), 10)
            for _ in range(cols)])
        data = rng.randint(0, alphabet, size=(20, cols))
        cdf_b = cdfs.reshape(1, cols, -1)
        code = legacy.range_encode(data, cdf_b, 10)
        decoded = legacy.range_decode(code, data.shape, cdf_b, 10)
        np.testing.assert_array_equal(decoded, data)

    def test_invalid_shapes(self):
        cdf = np.array([[0, 1, 4]])
        with pytest.raises(ValueError):
            legacy.range_encode(np.zeros((2, 3)), cdf.reshape(3, 3)[:2], 2)


class TestUnboundedIndexRangeCoding:
    @pytest.mark.parametrize("overflow_width", [1, 2, 4])
    def test_roundtrip_with_overflow(self, overflow_width):
        rng = np.random.RandomState(overflow_width)
        num_rows, alphabet = 4, 10
        cdf = np.zeros((num_rows, alphabet + 1), np.int64)
        cdf_size = np.full(num_rows, alphabet + 1)
        offset = rng.randint(-5, 5, size=num_rows)
        for r in range(num_rows):
            pmf = rng.dirichlet(np.ones(alphabet))
            cdf[r] = tables.pmf_to_quantized_cdf(pmf, 12)
        index = rng.randint(0, num_rows, size=200)
        # Heavy-tailed data exercising the escape path.
        data = np.round(rng.laplace(0, 12, size=200)).astype(np.int64)
        code = legacy.unbounded_index_range_encode(
            data, index, cdf, cdf_size, offset, 12, overflow_width)
        decoded = legacy.unbounded_index_range_decode(
            code, index, cdf, cdf_size, offset, 12, overflow_width)
        np.testing.assert_array_equal(decoded, data)

    def test_in_range_values(self):
        rng = np.random.RandomState(9)
        cdf = tables.pmf_to_quantized_cdf(np.ones(6) / 6, 8).reshape(1, -1)
        cdf_size = np.asarray([7])
        offset = np.asarray([-2])
        index = np.zeros(50, np.int64)
        data = rng.randint(-2, 2, size=50)  # maps into [0, max_value)
        code = legacy.unbounded_index_range_encode(
            data, index, cdf, cdf_size, offset, 8, 4)
        decoded = legacy.unbounded_index_range_decode(
            code, index, cdf, cdf_size, offset, 8, 4)
        np.testing.assert_array_equal(decoded, data)


class TestDebugLevelValidation:
    """debug_level CDF/index validation (reference
    range_coding_kernels.cc:194-196 analog)."""

    def test_bad_cdf_rejected(self):
        cdf = np.array([[0, 5, 3, 16]])  # non-monotone
        with pytest.raises(ValueError, match="nondecreasing"):
            legacy.range_encode(np.zeros((1,), np.int32), cdf, 4)
        with pytest.raises(ValueError, match="nondecreasing"):
            legacy.range_decode(b"\x00", (1,), cdf, 4)

    def test_cdf_exceeding_precision_rejected(self):
        cdf = np.array([[0, 10, 20]])
        with pytest.raises(ValueError, match="exceed"):
            legacy.range_encode(np.zeros((1,), np.int32), cdf, 4)

    def test_nonzero_start_rejected(self):
        cdf = np.array([[1, 8, 16]])
        with pytest.raises(ValueError, match="start at 0"):
            legacy.range_decode(b"\x00", (1,), cdf, 4)

    def test_index_out_of_range_rejected(self):
        cdf = np.array([[0, 8, 16, 16]])
        with pytest.raises(ValueError, match="index out of range"):
            legacy.unbounded_index_range_encode(
                np.zeros(2, np.int32), np.array([0, 5]), cdf,
                np.array([4]), np.array([0]), 4, 2)

    def test_debug_level_zero_skips_validation(self):
        # Level 0 trusts inputs (the reference's fast path).
        cdf = np.array([[0, 8, 16]])
        data = np.zeros((3,), np.int32)
        enc = legacy.range_encode(data, cdf, 4, debug_level=0)
        out = legacy.range_decode(enc, (3,), cdf, 4, debug_level=0)
        np.testing.assert_array_equal(out, data)
