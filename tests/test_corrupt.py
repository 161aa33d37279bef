"""Adversarial decode fuzz: corrupted containers must never hang, crash
the process, or silently misbehave in an unbounded way.

The reference documents its decode check as WEAK by design
(/root/reference/tensorflow_compression/cc/lib/range_coder.h:144-169):
some corruptions decode without tripping it.  The contract fuzzed here
is therefore:

  * every decode call terminates (the decode loops are statically
    bounded by construction — symbol count is fixed, gamma loops have a
    hard bit budget);
  * it either raises (ValueError from the sanity check, or a parse
    error) or returns an output with the exact expected shape/dtype and
    all symbols within the table's coded range;
  * gross corruption (truncation) is detected by the sanity flag at a
    non-trivial rate, proving the machinery is wired end to end.

>= 200 total cases across raw coder paths (single-row, indexed with
in-stream gamma escapes, sidecar), the entropy-model layer, and all
three model families x classic/native containers, plus wrong-table
decodes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu.codec import jax_coder, tables

CASES_RUN = []  # each append is one adversarial case that met the contract


def _table_single(precision=12, alphabet=64):
    pmf = 1.0 / (1 + np.arange(alphabet)) ** 1.1
    pmf /= pmf.sum()
    cdf = tables.pmf_to_quantized_cdf(pmf.astype(np.float32), precision)
    ragged = tables.build_ragged_cdf([cdf], [precision], [False])
    return tables.parse_ragged_cdf(ragged), pmf


def _table_indexed(num_rows=8, precision=10):
    rng = np.random.RandomState(5)
    cdfs, precs, ovfs = [], [], []
    for r in range(num_rows):
        n = 4 + 3 * r
        pmf = rng.dirichlet(np.ones(n)).astype(np.float32) * (1 - 2.0**-8)
        cdfs.append(tables.pmf_to_quantized_cdf(pmf, precision))
        precs.append(precision)
        ovfs.append(True)
    ragged = tables.build_ragged_cdf(cdfs, precs, ovfs)
    return tables.parse_ragged_cdf(ragged)


def _flip_bits(buf, rng, nflips=4):
    out = buf.copy()
    for _ in range(nflips):
        s = rng.randint(out.shape[0])
        b = rng.randint(out.shape[1])
        out[s, b] ^= 1 << rng.randint(8)
    return out


class TestRawCoder:
    """decode_streams on corrupted byte buffers: bounded, well-formed."""

    def test_single_row_fuzz(self):
        table, pmf = _table_single()
        rng = np.random.RandomState(0)
        S, N = 16, 64
        sym = rng.choice(len(pmf), size=(S, N), p=pmf).astype(np.int32)
        buf, lens = jax_coder.encode_streams(sym, table)
        alphabet = int(table.length[0]) - 1

        for case in range(48):
            mode = case % 3
            if mode == 0:  # bit flips, length-preserving
                cbuf, clens = _flip_bits(buf, rng, nflips=1 + case // 3), lens
            elif mode == 1:  # random garbage bytes, same lengths
                cbuf = rng.randint(
                    0, 256, size=buf.shape).astype(np.uint8)
                clens = lens
            else:  # truncate all but stream 0 (keeps buffer width static)
                cbuf, clens = buf, lens.copy()
                keep = rng.randint(0, 3, size=S)
                clens[1:] = np.minimum(clens[1:], keep[1:])
            out, sanity = jax_coder.decode_streams(cbuf, clens, N, table)
            assert out.shape == (S, N) and out.dtype == np.int32
            assert np.all((out >= 0) & (out < alphabet))
            assert sanity.shape == (S,)
            CASES_RUN.append(("raw-single", mode))

    def test_single_row_trailing_bytes_detected(self):
        """The weak check's actual contract (reference range_coder.h:
        144-169): unconsumed trailing bytes ARE detected (pos != len at
        finalize); truncation generally is NOT (the decoder pads with
        zeros, which the final state check cannot distinguish).  Assert
        both halves of that contract."""
        table, pmf = _table_single()
        rng = np.random.RandomState(1)
        S, N = 32, 128
        sym = rng.choice(len(pmf), size=(S, N), p=pmf).astype(np.int32)
        buf, lens = jax_coder.encode_streams(sym, table)

        # Trailing garbage appended to every stream: the weak check can
        # pass by chance on a few streams (the reference warns exactly
        # this) — assert a large majority is flagged AND that the
        # vectorized kernel's verdict matches the reference-semantics
        # CPU oracle stream for stream.
        from compression_tpu.codec import stream as stream_oracle
        extra = np.concatenate(
            [buf, rng.randint(0, 256, (S, 8)).astype(np.uint8)], axis=1)
        out, sanity = jax_coder.decode_streams(extra, lens + 4, N, table)
        strings = [bytes(extra[s, : lens[s] + 4].tobytes())
                   for s in range(S)]
        osym, osan = stream_oracle.decode_streams(strings, N, table)
        assert np.array_equal(np.asarray(sanity), np.asarray(osan)), \
            "kernel sanity verdicts diverge from the CPU oracle"
        assert np.array_equal(out, np.asarray(osym))
        assert np.mean(sanity) <= 0.25, "trailing bytes mostly unflagged"
        CASES_RUN.extend([("raw-single-trailing", i) for i in range(S)])

        # Truncation: may or may not be flagged (weak check) — but the
        # decode must still return shape-correct in-range symbols.
        clens = lens.copy()
        clens[1:] = clens[1:] // 4  # keep stream 0 intact: width static
        out, sanity = jax_coder.decode_streams(buf, clens, N, table)
        assert bool(sanity[0])
        assert out.shape == (S, N)
        assert np.all((out >= 0) & (out < int(table.length[0]) - 1))
        CASES_RUN.extend([("raw-single-trunc", i) for i in range(S - 1)])

    def test_indexed_gamma_fuzz(self):
        """Escape (in-stream Elias gamma) decode under corruption: the
        gamma loops have a hard bit budget, so wild corrupted magnitudes
        stay bounded and the call returns."""
        table = _table_indexed()
        rng = np.random.RandomState(2)
        S, N = 16, 48
        idx = rng.randint(0, 8, (S, N)).astype(np.int32)
        mv = table.length[idx] - 2
        sym = (rng.randint(0, 1000, (S, N)) % np.maximum(mv, 1)).astype(
            np.int32)
        sym[rng.rand(S, N) < 0.05] = 200  # escapes
        strings = None
        from compression_tpu.codec import stream
        strings = stream.encode_streams(sym, table, idx)
        buf, lens = jax_coder.from_bytes_list(strings)

        for case in range(48):
            if case % 2 == 0:
                cbuf = _flip_bits(buf, rng, nflips=1 + case // 4)
                clens = lens
            else:
                cbuf = rng.randint(0, 256, size=buf.shape).astype(np.uint8)
                clens = lens
            out, sanity = jax_coder.decode_streams(
                cbuf, clens, N, table, indexes=idx)
            assert out.shape == (S, N) and out.dtype == np.int32
            assert np.all(np.isfinite(out))
            CASES_RUN.append(("raw-indexed", case))

    def test_sidecar_corrupt_positions(self):
        """Sidecar escape positions from a hostile container: out-of-range
        positions must raise, not scribble memory."""
        table = _table_indexed()
        rng = np.random.RandomState(3)
        S, N = 8, 32
        idx = rng.randint(0, 8, (S, N)).astype(np.int32)
        mv = table.length[idx] - 2
        sym = (rng.randint(0, 1000, (S, N)) % np.maximum(mv, 1)).astype(
            np.int32)
        sym[0, 0] = 500  # one escape
        buf, lens, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
            sym, table, idx)
        for bad_pos in ([[99, 0]], [[0, 99]], [[-9, 2]], [[7, -40]],
                        [[2 ** 30, 2 ** 30]]):
            bad = np.asarray(bad_pos, np.int32)
            try:
                out, sanity = jax_coder.decode_streams_sidecar(
                    buf, lens, N, table, bad, np.asarray([123], np.int32),
                    indexes=idx)
                # numpy wraps small negatives; result must still be
                # well-formed if it did not raise.
                assert out.shape == (S, N)
            except (IndexError, ValueError):
                pass
            CASES_RUN.append(("sidecar-pos", tuple(bad_pos[0])))


class TestEntropyModelLayer:
    def _em(self):
        from compression_tpu import distributions as d
        from compression_tpu.entropy_models import (
            ContinuousBatchedEntropyModel)
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        return ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, compression=True)

    def test_corrupt_strings(self):
        em = self._em()
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.normal(0, 1, (8, 40)), jnp.float32)
        strings = em.compress_to_strings(x)
        n_detected = 0
        for case in range(40):
            bad = list(strings)
            k = case % len(bad)
            s = bytearray(bad[k])
            if case % 3 == 0 and len(s) > 2:
                s[rng.randint(len(s))] ^= 1 << rng.randint(8)
                bad[k] = bytes(s)
            elif case % 3 == 1:
                bad[k] = bytes(s[: max(len(s) // 2, 1)])
            else:
                bad[k] = bytes(rng.randint(0, 256, max(len(s), 1))
                               .astype(np.uint8))
            try:
                out = em.decompress(bad, (40,))
                assert out.shape == (8, 40)
                assert np.all(np.isfinite(np.asarray(out)))
            except ValueError:
                n_detected += 1
            CASES_RUN.append(("em-strings", case))
        assert n_detected >= 1, "sanity machinery never fired"

    def test_empty_and_tiny_strings(self):
        em = self._em()
        for payload in ([b""] * 4, [b"\x00"] * 4, [b"\xff"] * 4,
                        [b"\xff" * 3] * 4):
            try:
                out = em.decompress(payload, (40,))
                assert out.shape == (4, 40)
            except ValueError:
                pass
            CASES_RUN.append(("em-tiny", payload[0][:1]))


def _tiny_codecs():
    from compression_tpu.models import bls2017, bmshj2018, ms2020
    out = {}
    m = bls2017.BLS2017Model(lmbda=0.01, num_filters=8)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
               training=False)
    out["bls2017"] = bls2017.BLS2017Codec(m, p)
    # Wrong-table twin: different seed => different prior/tables.
    p2 = m.init(jax.random.PRNGKey(9), jnp.zeros((1, 32, 32, 3)),
                training=False)
    out["bls2017_twin"] = bls2017.BLS2017Codec(m, p2)

    m = bmshj2018.BMSHJ2018Model(
        lmbda=0.01, num_filters=8, num_scales=16, scale_min=0.11,
        scale_max=8.0)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               training=False)
    out["bmshj2018"] = bmshj2018.BMSHJ2018Codec(m, p)

    m = ms2020.MS2020Model(
        lmbda=0.01, num_filters=8, latent_depth=8, hyperprior_depth=4,
        num_slices=4, max_support_slices=2, num_scales=8,
        scale_min=0.11, scale_max=32.0)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               training=False)
    out["ms2020"] = ms2020.MS2020Codec(m, p)
    return out


@pytest.fixture(scope="module")
def codecs():
    return _tiny_codecs()


class TestModelContainers:
    """Every model family x {classic, native} container under corruption."""

    @pytest.mark.parametrize("name", ["bls2017", "bmshj2018", "ms2020"])
    def test_classic_container_fuzz(self, codecs, name):
        codec = codecs[name]
        rng = np.random.RandomState(6)
        size = 32 if name == "bls2017" else 64
        x8 = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
        container = codec.compress(x8)
        good = codec.decompress(container)
        raw = bytearray(container)

        for case in range(16):
            bad = bytearray(raw)
            if case % 2 == 0:  # flip a byte anywhere in the container
                bad[rng.randint(len(bad))] ^= 1 << rng.randint(8)
            else:  # truncate the container itself
                bad = bad[: rng.randint(1, len(bad))]
            try:
                out = codec.decompress(bytes(bad))
                assert out.shape == good.shape and out.dtype == np.uint8
            except Exception:  # noqa: BLE001 — parse/sanity errors all fine
                pass
            CASES_RUN.append((f"{name}-classic", case))

    @pytest.mark.parametrize("name", ["bls2017", "bmshj2018", "ms2020"])
    def test_native_container_fuzz(self, codecs, name):
        codec = codecs[name]
        rng = np.random.RandomState(7)
        size = 32 if name == "bls2017" else 64
        x8 = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
        container = codec.compress_native(x8)
        good = codec.decompress(container)
        raw = bytearray(container)

        for case in range(12):
            bad = bytearray(raw)
            if case % 2 == 0:
                bad[rng.randint(len(bad))] ^= 1 << rng.randint(8)
            else:
                bad = bad[: rng.randint(1, len(bad))]
            try:
                out = codec.decompress(bytes(bad))
                assert out.shape == good.shape and out.dtype == np.uint8
            except Exception:  # noqa: BLE001
                pass
            CASES_RUN.append((f"{name}-native", case))

    def test_wrong_table_decode(self, codecs):
        """A container decoded by a codec with DIFFERENT tables (the
        tables-never-rebuilt invariant violated on purpose): raises or
        returns a well-formed wrong image — never hangs or crashes."""
        rng = np.random.RandomState(8)
        x8 = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        container = codecs["bls2017"].compress(x8)
        try:
            out = codecs["bls2017_twin"].decompress(container)
            assert out.shape == (32, 32, 3)
        except Exception:  # noqa: BLE001
            pass
        CASES_RUN.append(("wrong-table", 0))

    def test_cross_model_container(self, codecs):
        """Feeding one model's container to another must raise cleanly
        (model-id mismatch), mirroring tfci's dispatch-by-id."""
        rng = np.random.RandomState(9)
        x8 = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
        container = codecs["bmshj2018"].compress(x8)
        with pytest.raises(Exception):
            codecs["bls2017"].decompress(container)
        CASES_RUN.append(("cross-model", 0))


class TestRunawayEscapeUnary:
    """A crafted stream whose escape is followed by an endless unary-zero
    run (the value==base fixed point a zero-tailed corruption can reach)
    must terminate with sanity False on every host-side decoder — the
    advisor-r3 finding: the unary Elias-gamma loop in overflow_decode was
    unbounded, and the _host_route sends classic-container decodes with
    < 256 streams through the native coder on TPU."""

    def _crafted_stream(self):
        from compression_tpu.codec import reference

        table = _table_indexed()
        cdf = np.asarray(table.cdf[0][: int(table.length[0])])
        prec = int(table.precision[0])
        max_value = len(cdf) - 2
        enc = reference.RangeEncoder()
        sink = bytearray()
        # Escape symbol, then 70 unary continuation zeros (a legitimate
        # encoder writes at most ~32 for int32 magnitudes).
        enc.encode(int(cdf[max_value]), int(cdf[max_value + 1]), prec, sink)
        for _ in range(70):
            enc.encode(0, 1, 1, sink)
        enc.finalize(sink)
        return table, cdf, prec, bytes(sink)

    def test_oracle_terminates_and_flags(self):
        from compression_tpu.codec import reference

        _, cdf, prec, src = self._crafted_stream()
        dec = reference.RangeDecoder(src)
        reference.overflow_decode(dec, cdf, prec)
        assert dec.corrupt
        assert not dec.finalize()
        CASES_RUN.append(("runaway-escape-oracle", 0))

    def test_host_route_terminates_and_flags(self):
        """The native threaded coder (the _host_route target) on the same
        stream: must return, sanity False."""
        from compression_tpu.codec import host

        table, _, _, src = self._crafted_stream()
        idx = np.zeros((1, 1), np.int32)
        out, sanity = host.decode_streams([src], 1, table, idx)
        assert out.shape == (1, 1)
        assert not sanity[0]
        CASES_RUN.append(("runaway-escape-host", 0))

    def test_zero_tail_streams_terminate(self):
        """All-zero / zero-tailed buffers of several lengths through both
        decoders: terminate, no crash (sanity may be either; shape must
        hold)."""
        from compression_tpu.codec import host, stream

        table = _table_indexed()
        for n in (1, 2, 8, 64):
            for nelem in (1, 4):
                src = bytes(n)
                idx = np.zeros((1, nelem), np.int32)
                out, sanity = host.decode_streams([src], nelem, table, idx)
                assert out.shape == (1, nelem)
                out2, _ = stream.decode_streams([src], nelem, table, idx)
                assert out2.shape == (1, nelem)
                CASES_RUN.append(("zero-tail", (n, nelem)))


def test_total_case_count():
    """The fuzz must cover >= 200 adversarial cases (VERDICT r2 item 6)."""
    assert len(CASES_RUN) >= 200, f"only {len(CASES_RUN)} cases ran"
