"""Op-level golden fixtures from the reference C++ kernels.

Drives the REAL reference ops (compiled unmodified from the read-only
mount into ref_ops.so) for:
  * PmfToQuantizedCdf — exact greedy-quantizer parity incl. tie-breaking,
  * the stateful coder op set (CreateRangeEncoder/EntropyEncode{Channel,
    Index}/Finalize and the decode side) — multi-stream, overflow mode.

Verifies this repo's implementations against them and saves the fixtures
to golden_ops.npz for regression testing without TF.

Usage: python make_golden_ops.py   (from tests/golden/, after building
ref_ops.so; see README note in gen_golden.cc)
"""

import sys

import numpy as np
import tensorflow as tf

sys.path.insert(0, "../..")
from compression_tpu.codec import stream, tables  # noqa: E402

ops = tf.load_op_library("./ref_ops.so")


def ref_pmf_to_cdf(pmf, precision):
    return ops.pmf_to_quantized_cdf(
        np.asarray(pmf, np.float32), precision=precision).numpy()


def ref_encode(values, ragged_cdf, index=None):
    num_streams = values.shape[0]
    handle = ops.create_range_encoder([num_streams], ragged_cdf)
    if index is None:
        handle = ops.entropy_encode_channel(handle, values.astype(np.int32))
    else:
        handle = ops.entropy_encode_index(
            handle, index.astype(np.int32), values.astype(np.int32))
    out = ops.entropy_encode_finalize(handle)
    return [bytes(s) for s in out.numpy()]


def ref_decode(strings, n, ragged_cdf, index=None):
    encoded = tf.constant(strings, dtype=tf.string)
    handle = ops.create_range_decoder(encoded, ragged_cdf)
    if index is None:
        handle, symbols = ops.entropy_decode_channel(
            handle, [n], tf.int32)
    else:
        handle, symbols = ops.entropy_decode_index(
            handle, index.astype(np.int32), [n], tf.int32)
    sanity = ops.entropy_decode_finalize(handle)
    return symbols.numpy(), sanity.numpy()


def main():
    rng = np.random.RandomState(0)
    out = {}

    # --- PmfToQuantizedCdf parity ------------------------------------
    n_cdf = 0
    mismatch = 0
    pmf_cases = []
    for precision in [1, 2, 8, 12, 16]:
        for size in [2, 3, 10, 64, 300]:
            if size > 1 << precision:
                continue
            pmf_cases.append((rng.dirichlet(np.ones(size)), precision))
            pmf_cases.append(
                (rng.dirichlet(np.ones(size) * 0.1), precision))
            # Tie-prone: uniform and tiny masses.
            pmf_cases.append((np.full(size, 1.0 / size), precision))
            p = np.full(size, 1e-9)
            p[0] = 1.0
            pmf_cases.append((p / p.sum(), precision))
            # Unnormalized (overflow path in _build_tables).
            pmf_cases.append((rng.dirichlet(np.ones(size)) * 0.7, precision))
    tie_cases = []
    for i, (pmf, precision) in enumerate(pmf_cases):
        ref = ref_pmf_to_cdf(pmf, precision)
        mine = tables.pmf_to_quantized_cdf(
            pmf.astype(np.float32), precision)
        if not np.array_equal(ref, mine):
            # Only acceptable cause: all-equal penalty ties, where the
            # reference's output depends on libstdc++'s unstable sort
            # permutation.  Verify the invariants still hold and that the
            # multiset of masses matches (same RD quality).
            assert np.array_equal(
                np.sort(np.diff(ref)), np.sort(np.diff(mine))), (
                    f"case {i}: non-tie mismatch!")
            mismatch += 1
            tie_cases.append(i)
        out[f"pmf{i}__pmf"] = pmf.astype(np.float32)
        out[f"pmf{i}__precision"] = np.int32(precision)
        out[f"pmf{i}__cdf"] = ref
        n_cdf += 1
    out["pmf_tie_cases"] = np.asarray(tie_cases, np.int32)
    out["pmf_num_cases"] = np.int32(n_cdf)
    print(f"PmfToQuantizedCdf: {n_cdf - mismatch}/{n_cdf} exact matches "
          f"(ties at {tie_cases})")

    # --- stateful coder ops ------------------------------------------
    def make_ragged(pmfs, precision, overflow):
        cdfs = [ref_pmf_to_cdf(p, precision) for p in pmfs]
        return tables.build_ragged_cdf(
            cdfs, [precision] * len(cdfs), [overflow] * len(cdfs))

    coder_cases = []
    # channel mode, no overflow
    t1 = make_ragged([rng.dirichlet(np.ones(16))], 12, False)
    v1 = rng.randint(0, 16, (4, 200))
    coder_cases.append(("chan_plain", t1, v1, None))
    # channel mode, multi-row
    t2 = make_ragged(
        [rng.dirichlet(np.ones(8)), rng.dirichlet(np.ones(12)),
         rng.dirichlet(np.ones(5))], 10, False)
    sizes = [7, 11, 4]
    v2 = np.stack([
        np.asarray([rng.randint(0, sizes[j % 3]) for j in range(99)])
        for _ in range(3)])
    coder_cases.append(("chan_multirow", t2, v2, None))
    # overflow mode (escape + gamma), heavy tails
    t3 = make_ragged([np.full(9, 1 / 9)], 12, True)
    v3 = np.round(rng.laplace(0, 10, (3, 150))).astype(np.int64)
    coder_cases.append(("chan_overflow", t3, v3, None))
    # indexed mode with overflow
    t4 = make_ragged(
        [rng.dirichlet(np.ones(6)), rng.dirichlet(np.ones(10))], 11, True)
    i4 = rng.randint(0, 2, (3, 120))
    v4 = np.round(rng.laplace(0, 6, (3, 120))).astype(np.int64)
    coder_cases.append(("indexed_overflow", t4, v4, i4))

    n_ok = 0
    for name, ragged, values, index in coder_cases:
        ref_bytes = ref_encode(values, ragged, index)
        mine = stream.encode_streams(values, ragged, index)
        assert mine == ref_bytes, f"{name}: encode mismatch vs reference op"
        n = values.shape[1]
        idx_full = (np.broadcast_to(index, values.shape)
                    if index is not None else None)
        ref_syms, ref_sane = ref_decode(ref_bytes, n, ragged, idx_full)
        assert np.array_equal(ref_syms, values), f"{name}: ref decode"
        assert ref_sane.all()
        mine_syms, mine_sane = stream.decode_streams(
            ref_bytes, n, ragged, index)
        assert np.array_equal(mine_syms, values), f"{name}: our decode"
        assert mine_sane.all()
        out[f"coder_{name}__ragged"] = np.asarray(ragged, np.int32)
        out[f"coder_{name}__values"] = np.asarray(values, np.int32)
        if index is not None:
            out[f"coder_{name}__index"] = np.asarray(index, np.int32)
        out[f"coder_{name}__nbytes"] = np.asarray(
            [len(b) for b in ref_bytes], np.int32)
        out[f"coder_{name}__bytes"] = np.frombuffer(
            b"".join(ref_bytes), np.uint8)
        n_ok += 1
    print(f"coder ops: {n_ok}/{len(coder_cases)} byte-exact")

    np.savez_compressed("golden_ops.npz", **out)
    print("saved golden_ops.npz")


if __name__ == "__main__":
    main()


def em_level_fixture():
    """EM-level cross-parity: my table build + symbol pipeline, encoded by
    the REFERENCE ops vs my coder (validates stream partitioning, offset
    conventions, and table formats end to end)."""
    import jax
    from compression_tpu import distributions as d
    from compression_tpu.entropy_models import ContinuousBatchedEntropyModel

    out = {}
    prior = d.NoisyNormal(loc=0.25, scale=np.asarray([0.5, 1.0, 2.0]))
    em = ContinuousBatchedEntropyModel(
        prior=prior, coding_rank=3, compression=True)
    rng = np.random.RandomState(7)
    x = (rng.normal(0, 1.2, size=(2, 6, 5, 3))).astype(np.float32)

    # My full compress path.
    mine = em.compress_to_strings(x)

    # Reference ops driven with MY tables and the same symbol pipeline.
    offset = np.asarray(em.quantization_offset)
    symbols = np.round(x - offset).astype(np.int32)
    symbols2 = symbols.reshape(2, -1)
    row_ids = np.arange(symbols2.shape[1]) % em.cdf_offset.shape[0]
    symbols2 = symbols2 - np.asarray(em.cdf_offset)[row_ids][None, :]
    ref = ref_encode(symbols2, em.cdf)
    assert mine == ref, "EM-level byte parity failed!"
    print("EM-level parity: ContinuousBatched compress bytes match "
          "reference ops")
    out["em__cdf"] = np.asarray(em.cdf, np.int32)
    out["em__cdf_offset"] = np.asarray(em.cdf_offset, np.int32)
    out["em__offset"] = offset.astype(np.float32)
    out["em__x"] = x
    out["em__nbytes"] = np.asarray([len(b) for b in ref], np.int32)
    out["em__bytes"] = np.frombuffer(b"".join(ref), np.uint8)
    return out


def append_em_fixture():
    data = dict(np.load("golden_ops.npz"))
    data.update(em_level_fixture())
    np.savez_compressed("golden_ops.npz", **data)
    print("updated golden_ops.npz with EM-level fixture")
