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


class TestSidecarBatchCodec:
    """The flagship sidecar stack sharded over the mesh (shard_map,
    collective-free; __graft_entry__.dryrun_multichip runs the same
    path)."""

    @pytest.fixture(scope="class")
    def em(self):
        from compression_tpu.distributions import (
            deep_factorized, uniform_noise)
        from compression_tpu.entropy_models import (
            ContinuousBatchedEntropyModel)
        prior = uniform_noise.UniformNoiseAdapter(
            deep_factorized.DeepFactorized(
                params=deep_factorized.DeepFactorized.init_params(
                    jax.random.PRNGKey(2), (8,)),
                batch_shape=(8,)))
        return ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=3, compression=True)

    def _rows(self, s, w=16, c=8, seed=0):
        rng = np.random.RandomState(seed)
        rows = rng.normal(0, 2, size=(s, 1, w, c)).astype(np.float32)
        rows[0, 0, 0, 0] = 500.0  # escapes ride the sidecar
        rows[1, 0, 1, 1] = -400.0
        return rows

    def test_roundtrip_with_escapes(self, em):
        from compression_tpu.parallel import SidecarBatchCodec
        rows = self._rows(16)
        codec = SidecarBatchCodec(em, make_mesh())
        buf, lens, ei, ev, count, ok = codec.encode(rows)
        assert ok and int(count) >= 2
        out, sanity = codec.decode(buf, lens, (1, 16), ei, ev)
        assert sanity.all()
        np.testing.assert_array_equal(out, np.asarray(em.quantize(rows)))

    def test_bytes_match_unsharded_sidecar(self, em):
        from compression_tpu.parallel import SidecarBatchCodec
        rows = self._rows(16, seed=3)
        codec = SidecarBatchCodec(em, make_mesh())
        buf, lens, *_ = codec.encode(rows)
        buf1, lens1, _, _ = em.compress_sidecar(rows)
        assert (jax_coder.to_bytes_list(buf, lens)
                == jax_coder.to_bytes_list(
                    buf1.reshape(16, -1), lens1.reshape(-1)))

    def test_non_divisible_stream_count(self, em):
        from compression_tpu.parallel import SidecarBatchCodec
        rows = self._rows(13, seed=5)
        codec = SidecarBatchCodec(em, make_mesh())
        buf, lens, ei, ev, count, ok = codec.encode(rows)
        assert ok
        out, sanity = codec.decode(buf, lens, (1, 16), ei, ev)
        assert sanity.all()
        np.testing.assert_array_equal(out, np.asarray(em.quantize(rows)))
