"""Op-level golden regression tests.

tests/golden/golden_ops.npz holds outputs of the REAL reference C++ op
kernels (PmfToQuantizedCdf and the stateful coder op set, compiled
unmodified from the read-only reference mount by make_golden_ops.py).
These pin:

  * exact greedy-quantizer parity (83/85 cases; the 2 exceptions are
    all-equal-penalty ties whose reference output depends on libstdc++'s
    unstable sort permutation — masses match as multisets),
  * byte parity of the full stateful coder pipeline (channel/indexed
    addressing, multi-row tables, escape+gamma overflow) for both the
    host oracle and the vectorized JAX coder.
"""

import os

import numpy as np
import pytest

from compression_tpu.codec import jax_coder, stream, tables

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_ops.npz")


@pytest.fixture(scope="module")
def data():
    return np.load(GOLDEN)


class TestPmfToQuantizedCdfGolden:
    def test_exact_parity(self, data):
        from compression_tpu import native

        # With the native quantizer (shares libstdc++'s std::sort), every
        # case is byte-exact, including all-equal-penalty ties.  The pure
        # Python fallback uses a stable seed sort, so on the tie cases only
        # the mass multiset is guaranteed.
        exact_ties = native.get_pmf_lib() is not None
        ties = set(data["pmf_tie_cases"].tolist())
        n = int(data["pmf_num_cases"])
        assert len(ties) <= 2
        for i in range(n):
            pmf = data[f"pmf{i}__pmf"]
            precision = int(data[f"pmf{i}__precision"])
            ref = data[f"pmf{i}__cdf"]
            mine = tables.pmf_to_quantized_cdf(pmf, precision)
            if i in ties and not exact_ties:
                np.testing.assert_array_equal(
                    np.sort(np.diff(ref)), np.sort(np.diff(mine)))
            else:
                np.testing.assert_array_equal(ref, mine, err_msg=f"case {i}")


def coder_cases(data):
    names = sorted({
        k[len("coder_"):].rsplit("__", 1)[0]
        for k in data.files if k.startswith("coder_")})
    for name in names:
        ragged = data[f"coder_{name}__ragged"]
        values = data[f"coder_{name}__values"]
        index = (data[f"coder_{name}__index"]
                 if f"coder_{name}__index" in data else None)
        nbytes = data[f"coder_{name}__nbytes"]
        blob = data[f"coder_{name}__bytes"].tobytes()
        strings, pos = [], 0
        for nb in nbytes:
            strings.append(blob[pos : pos + int(nb)])
            pos += int(nb)
        yield name, ragged, values, index, strings


class TestCoderOpsGolden:
    def test_host_oracle_byte_parity(self, data):
        for name, ragged, values, index, ref_strings in coder_cases(data):
            mine = stream.encode_streams(values, ragged, index)
            assert mine == ref_strings, name
            decoded, sanity = stream.decode_streams(
                ref_strings, values.shape[1], ragged, index)
            np.testing.assert_array_equal(decoded, values, err_msg=name)
            assert sanity.all(), name

    def test_jax_coder_byte_parity(self, data):
        for name, ragged, values, index, ref_strings in coder_cases(data):
            t = tables.parse_ragged_cdf(ragged)
            buf, lengths = jax_coder.encode_streams(values, t, index)
            got = jax_coder.to_bytes_list(buf, lengths)
            assert got == ref_strings, name
            decoded, sanity = jax_coder.decode_streams(
                buf, lengths, values.shape[1], t, index)
            np.testing.assert_array_equal(decoded, values, err_msg=name)
            assert sanity.all(), name


class TestEntropyModelGolden:
    def test_em_compress_bytes_match_reference_ops(self, data):
        """My ContinuousBatched compress pipeline == reference C++ ops
        driven with the same tables (EM-level cross parity)."""
        from compression_tpu import distributions as d
        from compression_tpu.entropy_models import (
            ContinuousBatchedEntropyModel,
        )

        prior = d.NoisyNormal(loc=0.25, scale=np.asarray([0.5, 1.0, 2.0]))
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=3, compression=True)
        # Table build must be reproducible.
        np.testing.assert_array_equal(em.cdf, data["em__cdf"])
        np.testing.assert_array_equal(em.cdf_offset, data["em__cdf_offset"])
        np.testing.assert_allclose(
            np.asarray(em.quantization_offset), data["em__offset"],
            atol=1e-6)

        x = data["em__x"]
        mine = em.compress_to_strings(x)
        blob = data["em__bytes"].tobytes()
        strings, pos = [], 0
        for nb in data["em__nbytes"]:
            strings.append(blob[pos : pos + int(nb)])
            pos += int(nb)
        assert mine == strings
