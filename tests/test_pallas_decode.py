"""Pallas decode kernel correctness (interpret mode; no TPU required)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from compression_tpu.codec import jax_coder, pallas_coder, tables


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_coder.pl, "pallas_call", patched)


def test_decode_kernel_matches_xla(interpret_pallas):
    S, N = 256, 48
    pmf = 1.0 / (1 + np.arange(32)) ** 1.1
    pmf /= pmf.sum()
    cdf = tables.pmf_to_quantized_cdf(pmf, 12)
    t = tables.parse_ragged_cdf(tables.build_ragged_cdf([cdf], [12], [False]))
    rng = np.random.RandomState(0)
    sym = rng.choice(32, size=(S, N), p=pmf).astype(np.int32)
    buf, lengths = jax_coder.encode_streams(sym, t)
    src16 = jax_coder.bytes_to_chunks(buf, lengths)

    blast, win17 = jax_coder._bucketize_row(
        jnp.asarray(t.cdf[0], jnp.float32))
    blast_t = tuple(float(x) for x in np.asarray(blast))
    win_t = tuple(tuple(float(x) for x in row) for row in np.asarray(win17))

    symbols, sane = pallas_coder.decode_scan_pallas(
        jnp.asarray(src16), jnp.asarray(lengths), N, 12,
        t.cdf.shape[1] - 1, blast_t, win_t)
    np.testing.assert_array_equal(np.asarray(symbols), sym)
    assert np.asarray(sane).all()


class _FakeRef:
    """Eager stand-in for a pallas Ref: index to read, assign to write."""

    def __init__(self, arr):
        self.arr = np.asarray(arr)

    def __getitem__(self, ix):
        return jnp.asarray(self.arr[ix])

    def __setitem__(self, ix, val):
        self.arr[ix] = np.asarray(val)


@pytest.mark.parametrize("n_elements", [48, 53])
def test_decode_kernel_v2_matches_oracle(n_elements, monkeypatch):
    """Lane-major v2 kernel body: exact symbols + sanity for any N.

    Pallas interpret mode is far too slow for this kernel (the 16-step
    unrolled segments make a huge graph), so the kernel *body* runs
    eagerly on CPU through fake Refs — identical code path, same dataflow
    as the Mosaic compilation.  Real-TPU bit-exactness at bench scale is
    exercised by bench.py's built-in assert.
    """
    S, N, sub = 256, n_elements, 2
    pmf = 1.0 / (1 + np.arange(40)) ** 1.3
    pmf /= pmf.sum()
    cdf = tables.pmf_to_quantized_cdf(pmf, 13)
    t = tables.parse_ragged_cdf(tables.build_ragged_cdf([cdf], [13], [False]))
    rng = np.random.RandomState(7)
    sym = rng.choice(40, size=(S, N), p=pmf).astype(np.int32)
    buf, lengths = jax_coder.encode_streams(sym, t)
    src16 = np.asarray(jax_coder.bytes_to_chunks(buf, lengths))

    # Run the kernel's fori_loop eagerly so FakeRef writes execute.
    def eager_fori(lo, hi, body, init):
        carry = init
        for i in range(int(lo), int(hi)):
            carry = body(i, carry)
        return carry

    monkeypatch.setattr(pallas_coder.jax.lax, "fori_loop", eager_fori)

    cdf_row = np.asarray(t.cdf[0])
    blast, win = pallas_coder._decode_v2_tables(cdf_row)
    nchunks = src16.shape[1]
    nb_pull = max((nchunks + 16) // 16, 1) + 1
    c_pad = 16 * nb_pull + 32
    nsub = S // 128
    src_t = np.zeros((c_pad, nsub, 128), np.int32)
    src_t[:nchunks] = src16.astype(np.uint32).astype(
        np.int64).T.reshape(nchunks, nsub, 128)
    kernel = pallas_coder._make_decode_kernel_v2(
        N, 13, len(cdf_row) - 1, win.shape[1] // 17, nb_pull, sub)

    sym_out = np.zeros((N, nsub, 128), np.int32)
    san_out = np.zeros((nsub, 128), np.int32)
    for i in range(nsub // sub):
        rows = slice(i * sub, (i + 1) * sub)
        sym_blk = np.zeros((N, sub, 128), np.int32)
        san_blk = np.zeros((sub, 128), np.int32)
        kernel(_FakeRef(src_t[:, rows]),
               _FakeRef(np.asarray(lengths).reshape(nsub, 128)[rows]),
               _FakeRef(blast), _FakeRef(win),
               _FakeRef(sym_blk), _FakeRef(san_blk))
        sym_out[:, rows] = sym_blk
        san_out[rows] = san_blk

    got = sym_out.reshape(N, S).T
    np.testing.assert_array_equal(got, sym)
    assert (san_out != 0).all()


@pytest.mark.parametrize("n_elements,any_overflow",
                         [(37, True), (64, True), (53, False)])
def test_decode_kernel_indexed_matches_oracle(n_elements, any_overflow,
                                              monkeypatch):
    """Indexed kernel body: per-element rows, overflow escapes, mixed
    precisions — exact symbols + sanity, eagerly on CPU (like the v2
    oracle test; interpret mode is too slow for these kernels).  The
    any_overflow=False case exercises the cond-free segment variant."""
    S, N, sub = 256, n_elements, 2
    rng = np.random.RandomState(11)
    precisions = [8, 10, 12, 13, 15]
    overflows = ([True, False, True, False, True]
                 if any_overflow else [False] * 5)
    rows = []
    for p, _ in zip(precisions, overflows):
        alphabet = rng.randint(3, 40)
        pmf = rng.dirichlet(np.ones(alphabet))
        rows.append(tables.pmf_to_quantized_cdf(pmf, p))
    t = tables.parse_ragged_cdf(
        tables.build_ragged_cdf(rows, precisions, overflows))
    lens = np.asarray(t.length)

    idx = rng.randint(0, len(rows), (S, N)).astype(np.int32)
    # Overflow rows: heavy-tailed values (escapes incl. negatives);
    # plain rows: clipped in-range values.
    sym = np.round(rng.laplace(0, 9, (S, N))).astype(np.int32)
    mv = lens[idx] - 2
    ovf = np.asarray(t.overflow)[idx]
    sym = np.where(ovf, sym, np.clip(np.abs(sym), 0, mv))
    if any_overflow:
        assert (ovf & ((sym < 0) | (sym >= mv))).any(), \
            "no escapes exercised"

    buf, lengths = jax_coder.encode_streams(sym, t, idx)
    src16 = np.asarray(jax_coder.bytes_to_chunks(buf, lengths))

    def eager_fori(lo, hi, body, init):
        carry = init
        for i in range(int(lo), int(hi)):
            carry = body(i, carry)
        return carry

    def eager_while(cond, body, init):
        carry = init
        while bool(cond(carry)):
            carry = body(carry)
        return carry

    def eager_cond(pred, tfn, ffn):
        return tfn() if bool(pred) else ffn()

    monkeypatch.setattr(pallas_coder.jax.lax, "fori_loop", eager_fori)
    monkeypatch.setattr(pallas_coder.jax.lax, "while_loop", eager_while)
    monkeypatch.setattr(pallas_coder.jax.lax, "cond", eager_cond)

    w_packed, meta, max_nb = pallas_coder._decode_indexed_tables(
        np.asarray(t.cdf), lens, np.asarray(t.precision),
        np.asarray(t.overflow))
    bs_iters = max(int(np.ceil(np.log2(max_nb))), 0) if max_nb > 1 else 0

    nchunks = src16.shape[1]
    nb_pull = max((nchunks + 16) // 16, 1) + 1
    c_pad = 16 * nb_pull + 32
    nsub = S // 128
    src_t = np.zeros((c_pad, nsub, 128), np.int32)
    src_t[:nchunks] = src16.astype(np.uint32).astype(
        np.int64).T.reshape(nchunks, nsub, 128)
    idx_t = idx.T.reshape(N, nsub, 128)
    kernel = pallas_coder._make_decode_kernel_indexed(
        N, w_packed.shape[1], meta.shape[1], bs_iters, nb_pull, sub,
        any_overflow)

    sym_out = np.zeros((N, nsub, 128), np.int32)
    san_out = np.zeros((nsub, 128), np.int32)
    for i in range(nsub // sub):
        blk = slice(i * sub, (i + 1) * sub)
        sym_blk = np.zeros((N, sub, 128), np.int32)
        san_blk = np.zeros((sub, 128), np.int32)
        scratch = ([_FakeRef(np.zeros((32, sub, 128), np.int32)),
                    _FakeRef(np.zeros((1, sub, 128), np.int32)),
                    _FakeRef(np.zeros((4, sub, 128), np.int32)),
                    _FakeRef(np.zeros((1, sub, 128), np.int32))]
                   if any_overflow else [])
        kernel(_FakeRef(src_t[:, blk]),
               _FakeRef(np.asarray(lengths).reshape(nsub, 128)[blk]),
               _FakeRef(idx_t[:, blk]),
               _FakeRef(w_packed), _FakeRef(meta),
               _FakeRef(sym_blk), _FakeRef(san_blk), *scratch)
        sym_out[:, blk] = sym_blk
        san_out[blk] = san_blk

    got = sym_out.reshape(N, S).T
    np.testing.assert_array_equal(got, sym)
    assert (san_out != 0).all()


class TestPairLookupKernel:
    def test_interpret_matches_direct_indexing(self):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from compression_tpu.codec import pallas_coder

        rng = np.random.RandomState(3)
        K = 257
        flat = np.sort(rng.randint(0, 2**16, K)).astype(np.int32)
        nb = -(-K // 16)
        padded = np.concatenate(
            [flat, np.full(16 * nb + 1 - K, flat[-1], np.int32)])
        win17 = np.concatenate(
            [padded[: 16 * nb].reshape(nb, 16), padded[16::16][:, None]],
            axis=1)
        idx2 = rng.randint(0, K - 1, (256, 512)).astype(np.int32)
        kernel = pallas_coder._make_pair_lookup_kernel(nb)
        io_spec = pl.BlockSpec(
            (128, 256), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        lo, hi = pl.pallas_call(
            kernel, grid=(2, 2),
            in_specs=[
                pl.BlockSpec((nb, 17), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                io_spec,
            ],
            out_specs=[io_spec, io_spec],
            out_shape=[jax.ShapeDtypeStruct(idx2.shape, jnp.int32)] * 2,
            interpret=True,
        )(jnp.asarray(win17), jnp.asarray(idx2))
        np.testing.assert_array_equal(np.asarray(lo), flat[idx2])
        np.testing.assert_array_equal(np.asarray(hi), flat[idx2 + 1])


def test_encode_v3_kernel_matches_micro_path(interpret_pallas):
    """Fused single-row encode kernel (interpret mode) == micro-op bytes."""
    S, N = 1024, 24
    pmf = 1.0 / (1 + np.arange(40)) ** 1.3
    pmf /= pmf.sum()
    cdf = tables.pmf_to_quantized_cdf(pmf, 11)
    t = tables.parse_ragged_cdf(
        tables.build_ragged_cdf([cdf], [11], [False]))
    rng = np.random.RandomState(7)
    sym = rng.choice(40, size=(S, N), p=pmf).astype(np.int32)
    buf0, len0 = jax_coder.encode_streams(sym, t)

    out_size = buf0.shape[1]
    cdf_row = np.asarray(t.cdf[0][: int(t.length[0])])
    buf1, len1 = pallas_coder.encode_single_row_device(
        jnp.asarray(sym), cdf_row, 11, out_size, sub=8)
    np.testing.assert_array_equal(np.asarray(len0), np.asarray(len1))
    np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))


def test_encode_v3_kernel_stream_chunking(interpret_pallas):
    """The >8-grid stream chunking produces identical bytes."""
    S, N = 1024, 16
    pmf = np.full(16, 1 / 16)
    cdf = tables.pmf_to_quantized_cdf(pmf, 10)
    t = tables.parse_ragged_cdf(
        tables.build_ragged_cdf([cdf], [10], [False]))
    rng = np.random.RandomState(8)
    sym = rng.randint(0, 16, size=(S, N)).astype(np.int32)
    buf0, len0 = jax_coder.encode_streams(sym, t)
    out_size = buf0.shape[1]
    cdf_row = np.asarray(t.cdf[0][: int(t.length[0])])
    # sub=1 -> nsub_max=8 -> 8 lanes per call -> exercises the chunked path.
    buf1, len1 = pallas_coder.encode_single_row_device(
        jnp.asarray(sym), cdf_row, 10, out_size, sub=1)
    np.testing.assert_array_equal(np.asarray(len0), np.asarray(len1))
    np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))


def _mixed_table(rng, num_rows=5, overflow=False, prec_range=(8, 13)):
    cdfs, precs, ovfs = [], [], []
    for _ in range(num_rows):
        prec = int(rng.randint(*prec_range))
        alpha = int(rng.randint(2, 30))
        pmf = rng.dirichlet(np.ones(alpha))
        cdfs.append(tables.pmf_to_quantized_cdf(pmf, prec))
        precs.append(prec)
        ovfs.append(overflow)
    return tables.parse_ragged_cdf(
        tables.build_ragged_cdf(cdfs, precs, ovfs))


def test_encode_indexed_kernel_matches_micro_path(interpret_pallas):
    """Indexed encode kernel (interpret mode) == micro-op bytes."""
    rng = np.random.RandomState(11)
    t = _mixed_table(rng, num_rows=5)
    S, N = 512, 20
    len_np = np.asarray(t.length)
    idx = rng.randint(0, 5, size=(S, N)).astype(np.int32)
    sym = (rng.randint(0, 1000, size=(S, N)) % (len_np[idx] - 1)).astype(
        np.int32)
    buf0, len0 = jax_coder.encode_streams(sym, t, indexes=idx)
    out_size = buf0.shape[1]
    buf1, len1 = pallas_coder.encode_indexed_device(
        jnp.asarray(sym), jnp.asarray(idx), jax_coder.DeviceCdfTable(t),
        out_size, sub=4)
    np.testing.assert_array_equal(np.asarray(len0), np.asarray(len1))
    np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))


def test_encode_indexed_kernel_sidecar_escapes(interpret_pallas):
    """Sidecar escape mapping (out-of-range -> marker) matches the
    sidecar micro path byte-for-byte."""
    rng = np.random.RandomState(12)
    t = _mixed_table(rng, num_rows=3, overflow=True)
    S, N = 512, 16
    len_np = np.asarray(t.length)
    idx = rng.randint(0, 3, size=(S, N)).astype(np.int32)
    sym = rng.randint(-4, 40, size=(S, N)).astype(np.int32)
    buf0, len0, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
        sym, t, indexes=idx)
    out_size = buf0.shape[1]
    buf1, len1 = pallas_coder.encode_indexed_device(
        jnp.asarray(sym), jnp.asarray(idx), jax_coder.DeviceCdfTable(t),
        out_size, sub=4)
    np.testing.assert_array_equal(np.asarray(len0), np.asarray(len1))
    np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))


def test_encode_v3_kernel_precision16(interpret_pallas):
    """Precision-16 rows work in the fused encoder (cdf[v+1]-1 packing)."""
    S, N = 512, 20
    pmf = 1.0 / (1 + np.arange(24)) ** 1.2
    pmf /= pmf.sum()
    cdf = tables.pmf_to_quantized_cdf(pmf, 16)
    t = tables.parse_ragged_cdf(
        tables.build_ragged_cdf([cdf], [16], [False]))
    rng = np.random.RandomState(13)
    sym = rng.choice(24, size=(S, N), p=pmf).astype(np.int32)
    buf0, len0 = jax_coder.encode_streams(sym, t)
    out_size = buf0.shape[1]
    cdf_row = np.asarray(t.cdf[0][: int(t.length[0])])
    buf1, len1 = pallas_coder.encode_single_row_device(
        jnp.asarray(sym), cdf_row, 16, out_size, sub=4)
    np.testing.assert_array_equal(np.asarray(len0), np.asarray(len1))
    np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))


def test_encode_indexed_kernel_precision16(interpret_pallas):
    """Mixed rows incl. precision 16 through the indexed fused encoder."""
    rng = np.random.RandomState(14)
    t = _mixed_table(rng, num_rows=4, prec_range=(14, 17))
    S, N = 512, 12
    len_np = np.asarray(t.length)
    idx = rng.randint(0, 4, size=(S, N)).astype(np.int32)
    sym = (rng.randint(0, 1000, size=(S, N)) % (len_np[idx] - 1)).astype(
        np.int32)
    buf0, len0 = jax_coder.encode_streams(sym, t, indexes=idx)
    out_size = buf0.shape[1]
    buf1, len1 = pallas_coder.encode_indexed_device(
        jnp.asarray(sym), jnp.asarray(idx), jax_coder.DeviceCdfTable(t),
        out_size, sub=4)
    np.testing.assert_array_equal(np.asarray(len0), np.asarray(len1))
    np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))
