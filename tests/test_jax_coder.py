"""JAX vectorized coder vs. the (C++-golden-verified) numpy oracle.

Every case checks byte-exact encode parity per stream and exact decode
round-trips, across table shapes, precisions, overflow mode, and the
channel/indexed addressing modes.
"""

import numpy as np
import pytest

from compression_tpu.codec import jax_coder, stream, tables


def assert_bytes_match(buf, lengths, expected):
    got = jax_coder.to_bytes_list(buf, lengths)
    for s, (g, e) in enumerate(zip(got, expected)):
        assert g == e, (
            f"stream {s}: {g[:24].hex()}({len(g)}) != {e[:24].hex()}({len(e)})")


def make_table(pmfs, precision, overflow):
    cdfs = [tables.pmf_to_quantized_cdf(np.asarray(p) / np.sum(p), precision)
            for p in pmfs]
    ragged = tables.build_ragged_cdf(
        cdfs, [precision] * len(cdfs), [overflow] * len(cdfs))
    return tables.parse_ragged_cdf(ragged)


class TestEncodeParity:
    @pytest.mark.parametrize("precision", [1, 8, 12, 16])
    def test_single_row_channel(self, precision):
        rng = np.random.RandomState(precision)
        alphabet = min(1 << precision, 32)
        t = make_table([np.ones(alphabet)], precision, False)
        symbols = rng.randint(0, alphabet, size=(7, 200))
        expected = stream.encode_streams(symbols, t)
        buf, lengths = jax_coder.encode_streams(symbols, t)
        assert_bytes_match(buf, lengths, expected)

    def test_multi_row_channel(self):
        rng = np.random.RandomState(0)
        t = make_table(
            [np.ones(4), [8, 4, 2, 1, 1], np.ones(16)], 10, False)
        sizes = np.asarray(t.length) - 1
        n = 99
        symbols = np.stack([
            rng.randint(0, sizes[np.arange(n) % t.num_rows])
            for _ in range(5)])
        expected = stream.encode_streams(symbols, t)
        buf, lengths = jax_coder.encode_streams(symbols, t)
        assert_bytes_match(buf, lengths, expected)

    def test_indexed(self):
        rng = np.random.RandomState(1)
        t = make_table([np.ones(8), [16, 8, 4, 2, 1, 1, 1, 1]], 12, False)
        symbols = rng.randint(0, 7, size=(4, 150))
        indexes = rng.randint(0, 2, size=(4, 150))
        expected = stream.encode_streams(symbols, t, indexes)
        buf, lengths = jax_coder.encode_streams(symbols, t, indexes)
        assert_bytes_match(buf, lengths, expected)

    def test_carry_chains(self):
        # Binary skewed stream at precision 16: maximal delayed-carry churn.
        rng = np.random.RandomState(2)
        ragged = tables.build_ragged_cdf(
            [[0, 1, 1 << 16]], [16], [False])
        t = tables.parse_ragged_cdf(ragged)
        symbols = (rng.rand(3, 4000) < 0.5).astype(np.int32)
        expected = stream.encode_streams(symbols, t)
        buf, lengths = jax_coder.encode_streams(symbols, t)
        assert_bytes_match(buf, lengths, expected)

    def test_dirac(self):
        ragged = tables.build_ragged_cdf(
            [[0, 1, 65535, 65536]], [16], [False])
        t = tables.parse_ragged_cdf(ragged)
        symbols = np.ones((2, 5000), np.int32)
        expected = stream.encode_streams(symbols, t)
        buf, lengths = jax_coder.encode_streams(symbols, t)
        assert_bytes_match(buf, lengths, expected)

    def test_overflow_mode(self):
        rng = np.random.RandomState(3)
        t = make_table([np.ones(9)], 12, True)
        symbols = np.round(rng.laplace(0, 15, size=(4, 300))).astype(np.int32)
        expected = stream.encode_streams(symbols, t)
        buf, lengths = jax_coder.encode_streams(symbols, t)
        assert_bytes_match(buf, lengths, expected)

    def test_short_streams(self):
        rng = np.random.RandomState(4)
        t = make_table([np.ones(8)], 12, False)
        for n in [1, 2, 3, 5]:
            symbols = rng.randint(0, 8, size=(6, n))
            expected = stream.encode_streams(symbols, t)
            buf, lengths = jax_coder.encode_streams(symbols, t)
            assert_bytes_match(buf, lengths, expected)


class TestDecodeRoundTrip:
    @pytest.mark.parametrize("precision", [1, 8, 12, 16])
    def test_uniform(self, precision):
        rng = np.random.RandomState(precision + 10)
        alphabet = min(1 << precision, 32)
        t = make_table([np.ones(alphabet)], precision, False)
        symbols = rng.randint(0, alphabet, size=(7, 200)).astype(np.int32)
        buf, lengths = jax_coder.encode_streams(symbols, t)
        decoded, sanity = jax_coder.decode_streams(buf, lengths, 200, t)
        np.testing.assert_array_equal(decoded, symbols)
        assert sanity.all()

    def test_indexed_with_overflow(self):
        rng = np.random.RandomState(11)
        t = make_table(
            [np.ones(6), [32, 16, 8, 4, 2, 1, 1]], 10, True)
        n = 250
        symbols = np.round(rng.laplace(0, 8, size=(5, n))).astype(np.int32)
        indexes = rng.randint(0, 2, size=(5, n)).astype(np.int32)
        buf, lengths = jax_coder.encode_streams(symbols, t, indexes)
        decoded, sanity = jax_coder.decode_streams(
            buf, lengths, n, t, indexes)
        np.testing.assert_array_equal(decoded, symbols)
        assert sanity.all()

    def test_decode_matches_numpy_oracle(self):
        # Decode the oracle's bytes (not our own) — catches compensating bugs.
        rng = np.random.RandomState(12)
        t = make_table([[8, 4, 2, 1, 1, 1]], 12, True)
        n = 120
        symbols = np.round(rng.laplace(0, 6, size=(3, n))).astype(np.int32)
        expected_bytes = stream.encode_streams(symbols, t)
        buf, lengths = jax_coder.from_bytes_list(expected_bytes)
        decoded, sanity = jax_coder.decode_streams(buf, lengths, n, t)
        np.testing.assert_array_equal(decoded, symbols)
        assert sanity.all()

    def test_carry_chains_roundtrip(self):
        rng = np.random.RandomState(13)
        ragged = tables.build_ragged_cdf([[0, 1, 1 << 16]], [16], [False])
        t = tables.parse_ragged_cdf(ragged)
        symbols = (rng.rand(3, 3000) < 0.5).astype(np.int32)
        buf, lengths = jax_coder.encode_streams(symbols, t)
        decoded, sanity = jax_coder.decode_streams(buf, lengths, 3000, t)
        np.testing.assert_array_equal(decoded, symbols)
        assert sanity.all()


class TestGoldenParity:
    def test_golden_bitstreams(self):
        # The C++-generated golden fixtures, via the vectorized encoder.
        import os
        data = np.load(os.path.join(
            os.path.dirname(__file__), "golden", "golden.npz"))
        names = sorted({k.rsplit("__", 1)[0] for k in data.files})
        checked = 0
        for name in names:
            if f"{name}__cdf" not in data:
                continue
            cdf = data[f"{name}__cdf"]
            precision = int(data[f"{name}__precision"])
            symbols = data[f"{name}__data"][None, :]
            if symbols.shape[1] == 0:
                continue
            expected = bytes(data[f"{name}__bytes"].tobytes())
            ragged = tables.build_ragged_cdf([cdf], [precision], [False])
            t = tables.parse_ragged_cdf(ragged)
            buf, lengths = jax_coder.encode_streams(symbols, t)
            got = jax_coder.to_bytes_list(buf, lengths)[0]
            assert got == expected, name
            decoded, sanity = jax_coder.decode_streams(
                buf, lengths, symbols.shape[1], t)
            np.testing.assert_array_equal(decoded[0], symbols[0])
            assert sanity.all(), name
            checked += 1
        assert checked >= 15


def test_table_cache_survives_multiple_jits():
    """Regression: the per-table kernel caches must hold host arrays, not
    tracers — using one DeviceCdfTable from several distinct jitted
    functions previously raised UnexpectedTracerError (bench_indexed)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    rows = [rng.dirichlet(np.ones(12)), rng.dirichlet(np.ones(20))]
    cdfs = [tables.pmf_to_quantized_cdf(p.astype(np.float32), 10)
            for p in rows]
    t = tables.parse_ragged_cdf(
        tables.build_ragged_cdf(cdfs, [10, 10], [True, True]))
    dt = jax_coder.DeviceCdfTable(t)
    sym = rng.randint(0, 10, (8, 32)).astype(np.int32)
    idx = rng.randint(0, 2, (8, 32)).astype(np.int32)
    n, out_size = 64, 2 * 64 + 4

    f1 = jax.jit(lambda s, i: jax_coder.encode_dispatch(
        s, dt, n, out_size, indexes=i))
    f2 = jax.jit(lambda s, i: jax_coder.encode_dispatch(
        s, dt, n, out_size, indexes=i))
    buf1, len1 = f1(jnp.asarray(sym), jnp.asarray(idx))
    buf2, len2 = f2(jnp.asarray(sym), jnp.asarray(idx))  # 2nd trace, same dt
    np.testing.assert_array_equal(np.asarray(buf1), np.asarray(buf2))
    np.testing.assert_array_equal(np.asarray(len1), np.asarray(len2))


class TestHostRoute:
    """Few-stream reference-format calls route to the native host coder
    on TPU (bit-exact; the device kernels want >= 1024 lanes).  Forced
    here irrespective of backend via monkeypatch."""

    def test_routed_bytes_and_decode_match_oracle(self, monkeypatch):
        from compression_tpu.codec import jax_coder, stream, tables
        import numpy as np

        monkeypatch.setattr(jax_coder, "_host_route", lambda s: True)
        rng = np.random.RandomState(0)
        pmf = 1.0 / (1 + np.arange(16)) ** 1.1
        pmf /= pmf.sum()
        cdf = tables.pmf_to_quantized_cdf(pmf.astype(np.float32), 10)
        table = tables.parse_ragged_cdf(
            tables.build_ragged_cdf([cdf], [10], [True]))
        sym = rng.choice(16, size=(3, 50), p=pmf).astype(np.int32)
        sym[1, 7] = 200  # escape through the overflow row
        buf, lens = jax_coder.encode_streams(sym, table)
        assert jax_coder.DISPATCH_LOG["encode"] == "host"
        assert jax_coder.to_bytes_list(buf, lens) == \
            stream.encode_streams(sym, table)
        out, sanity = jax_coder.decode_streams(buf, lens, 50, table)
        assert jax_coder.DISPATCH_LOG["decode"] == "host"
        assert np.array_equal(out, sym) and sanity.all()


class TestCompactStreams:
    """Device-side stream compaction for packed fetches (round 5:
    the tunnel charges ~35-65 us/KB, so padded [S, W] buffers ship as
    tight per-stream-aligned word buffers)."""

    def _case(self, s, w, seed=0, budget_extra=3):
        import jax
        import jax.numpy as jnp
        rng = np.random.RandomState(seed)
        buf = rng.randint(0, 256, (s, w)).astype(np.uint8)
        lens = rng.randint(0, w + 1, s).astype(np.int32)
        budget = int(np.sum((lens + 3) // 4)) + budget_extra
        words, ok = jax.jit(
            lambda b, l: jax_coder.compact_streams(b, l, budget))(
                jnp.asarray(buf), jnp.asarray(lens))
        return buf, lens, np.asarray(words), bool(ok)

    def test_matches_to_bytes_list(self):
        buf, lens, words, ok = self._case(17, 40)
        assert ok
        assert (jax_coder.compact_to_bytes_list(words, lens)
                == jax_coder.to_bytes_list(buf, lens))

    def test_zero_length_streams(self):
        buf, lens, words, ok = self._case(5, 8, seed=1)
        lens[:] = 0
        import jax, jax.numpy as jnp
        words, ok = jax.jit(
            lambda b, l: jax_coder.compact_streams(b, l, 4))(
                jnp.asarray(buf), jnp.asarray(lens))
        assert bool(ok)
        assert jax_coder.compact_to_bytes_list(
            np.asarray(words), lens) == [b""] * 5

    def test_budget_overflow_flags_not_ok(self):
        import jax, jax.numpy as jnp
        rng = np.random.RandomState(2)
        buf = rng.randint(0, 256, (4, 16)).astype(np.uint8)
        lens = np.full(4, 16, np.int32)
        _, ok = jax.jit(
            lambda b, l: jax_coder.compact_streams(b, l, 3))(
                jnp.asarray(buf), jnp.asarray(lens))
        assert not bool(ok)

    def test_rejects_unaligned_width(self):
        import jax.numpy as jnp
        with np.testing.assert_raises(ValueError):
            jax_coder.compact_streams(
                jnp.zeros((2, 6), jnp.uint8), jnp.zeros(2, jnp.int32), 8)


def test_chunks_from_bytes_jit_matches_host():
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    buf = rng.randint(0, 256, (7, 24)).astype(np.uint8)
    got = jax.jit(jax_coder.chunks_from_bytes_jit)(jnp.asarray(buf))
    np.testing.assert_array_equal(
        np.asarray(got), jax_coder.bytes_to_chunks(buf, None))
