"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from compression_tpu.codec import jax_coder, tables
from compression_tpu.parallel import BatchCodec, make_mesh


@pytest.fixture(scope="module")
def table():
    pmf = np.ones(16) / 16
    cdf = tables.pmf_to_quantized_cdf(pmf, 10)
    return tables.parse_ragged_cdf(
        tables.build_ragged_cdf([cdf], [10], [False]))


class TestBatchCodec:
    def test_sharded_roundtrip_matches_single_device(self, table):
        assert len(jax.devices()) == 8, "expected virtual 8-device mesh"
        rng = np.random.RandomState(0)
        symbols = rng.randint(0, 16, size=(24, 100)).astype(np.int32)

        mesh = make_mesh()
        codec = BatchCodec(table, mesh)
        buf, lengths = codec.encode(symbols)

        # Must byte-match the unsharded encoder stream-for-stream.
        buf1, len1 = jax_coder.encode_streams(symbols, table)
        got = jax_coder.to_bytes_list(buf, lengths)
        exp = jax_coder.to_bytes_list(buf1, len1)
        assert got == exp

        decoded, sanity = codec.decode(buf, lengths, 100)
        np.testing.assert_array_equal(decoded, symbols)
        assert sanity.all()

    def test_non_divisible_stream_count(self, table):
        rng = np.random.RandomState(1)
        symbols = rng.randint(0, 16, size=(13, 64)).astype(np.int32)
        codec = BatchCodec(table, make_mesh())
        buf, lengths = codec.encode(symbols)
        decoded, sanity = codec.decode(buf, lengths, 64)
        np.testing.assert_array_equal(decoded, symbols)
        assert sanity.all()

    def test_timer_records(self, table):
        codec = BatchCodec(table, make_mesh())
        symbols = np.zeros((8, 64), np.int32)
        codec.encode(symbols)
        assert "encode" in codec.timer.summary()


def test_mesh_factorization():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
