"""EM-level byte cross-parity against the REFERENCE Python entropy-model
stack (golden fixtures in tests/golden/golden_em.npz).

The fixtures were produced by running the reference entropy models
UNMODIFIED from /root/reference (tfp shim + reference C++ kernels; see
tests/golden/make_golden_em.py).  Each test ports the fixture's weights
into this repo's JAX stack and asserts:

  * range-coding tables are EXACTLY equal (int32 CDFs + offsets) — i.e.
    the full table-build pipeline (estimate_tails, DeepFactorized MLP,
    NoisyNormal/Logistic math, PmfToQuantizedCdf) reproduces the
    reference bit for bit on these configs,
  * compress() produces byte-identical containers,
  * decompress() of the REFERENCE bytes reproduces the reference output
    (exactly at integer-symbol level; dequantized floats to 1e-5, since
    the estimate_tails quantization offset is a float optimization whose
    last ulp may differ between TF and JAX),
  * eval-mode __call__ bit rates agree to float tolerance.

Reference behaviors pinned:
  continuous_batched.py:348-422, continuous_indexed.py:355-417,:431-633,
  universal.py:229-300, deep_factorized.py:114-255, helpers.py:29-101.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from compression_tpu import distributions as dist
from compression_tpu.entropy_models import (
    ContinuousBatchedEntropyModel,
    ContinuousIndexedEntropyModel,
    LocationScaleIndexedEntropyModel,
    UniversalBatchedEntropyModel,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "golden_em.npz")
pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="golden_em.npz not generated")


@pytest.fixture(scope="module")
def gold():
    return dict(np.load(FIXTURE))


def get_strings(gold, prefix):
    nbytes = gold[f"{prefix}__nbytes"]
    buf = gold[f"{prefix}__bytes"].tobytes()
    out, off = [], 0
    for n in nbytes:
        out.append(buf[off:off + int(n)])
        off += int(n)
    return out


def check_tables(em, gold, prefix):
    assert np.array_equal(np.asarray(em.cdf), gold[f"{prefix}__cdf"]), \
        f"{prefix}: CDF table differs from reference"
    assert np.array_equal(
        np.asarray(em.cdf_offset), gold[f"{prefix}__cdf_offset"]), \
        f"{prefix}: cdf_offset differs from reference"


def make_dfb_em(gold):
    params = {
        "matrices": [jnp.asarray(gold[f"dfb__matrix_{i}"]) for i in range(3)],
        "biases": [jnp.asarray(gold[f"dfb__bias_{i}"]) for i in range(3)],
        "factors": [jnp.asarray(gold[f"dfb__factor_{i}"]) for i in range(2)],
    }
    prior = dist.NoisyDeepFactorized(params=params, batch_shape=(4,))
    return ContinuousBatchedEntropyModel(
        prior=prior, coding_rank=3, compression=True)


class TestDeepFactorizedBatched:
    """bls2017 z-branch: NoisyDeepFactorized + ContinuousBatched."""

    def test_tables_and_offset(self, gold):
        em = make_dfb_em(gold)
        check_tables(em, gold, "dfb")
        np.testing.assert_allclose(
            np.asarray(em.quantization_offset), gold["dfb__qoffset"],
            atol=1e-5)

    def test_compress_bytes(self, gold):
        em = make_dfb_em(gold)
        mine = em.compress_to_strings(jnp.asarray(gold["dfb__x"]))
        assert mine == get_strings(gold, "dfb")

    def test_decompress_reference_bytes(self, gold):
        em = make_dfb_em(gold)
        xhat = np.asarray(
            em.decompress(get_strings(gold, "dfb"), (8, 8)))
        offset = np.asarray(em.quantization_offset)
        # Integer symbols must match exactly; the dequantized floats to
        # the offset-estimation tolerance.
        assert np.array_equal(
            np.round(xhat - offset),
            np.round(gold["dfb__xhat"] - gold["dfb__qoffset"]))
        np.testing.assert_allclose(xhat, gold["dfb__xhat"], atol=1e-5)

    def test_eval_bits(self, gold):
        em = make_dfb_em(gold)
        _, bits = em(jnp.asarray(gold["dfb__x"]), training=False)
        np.testing.assert_allclose(
            np.asarray(bits), gold["dfb__bits"], rtol=1e-4)


class TestNoisyNormalBatched:

    def make_em(self, gold):
        prior = dist.NoisyNormal(
            loc=float(gold["nnb__loc"]), scale=jnp.asarray(gold["nnb__scales"]))
        return ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=3, compression=True)

    def test_tables(self, gold):
        em = self.make_em(gold)
        check_tables(em, gold, "nnb")
        np.testing.assert_allclose(
            np.asarray(em.quantization_offset), gold["nnb__qoffset"],
            atol=1e-6)

    def test_byte_parity_both_ways(self, gold):
        em = self.make_em(gold)
        mine = em.compress_to_strings(jnp.asarray(gold["nnb__x"]))
        assert mine == get_strings(gold, "nnb")
        xhat = np.asarray(em.decompress(get_strings(gold, "nnb"), (6, 5)))
        assert np.array_equal(xhat, gold["nnb__xhat"])

    def test_eval_bits(self, gold):
        em = self.make_em(gold)
        _, bits = em(jnp.asarray(gold["nnb__x"]), training=False)
        np.testing.assert_allclose(
            np.asarray(bits), gold["nnb__bits"], rtol=1e-4)


class TestLocationScaleIndexed:
    """bmshj2018/ms2020 y-branch: NoisyNormal over a 64-scale table."""

    def make_em(self, gold):
        off = float(gold["lsi__scale_fn_offset"])
        fac = float(gold["lsi__scale_fn_factor"])
        scale_fn = lambda i: jnp.exp(off + fac * jnp.asarray(i, jnp.float32))  # noqa: E731
        return LocationScaleIndexedEntropyModel(
            dist.NoisyNormal, int(gold["lsi__num_scales"]), scale_fn,
            coding_rank=1, compression=True)

    def test_tables(self, gold):
        em = self.make_em(gold)
        check_tables(em, gold, "lsi")

    def test_byte_parity_both_ways(self, gold):
        em = self.make_em(gold)
        idx = jnp.asarray(gold["lsi__indexes"])
        loc = jnp.asarray(gold["lsi__loc"])
        mine = em.compress_to_strings(
            jnp.asarray(gold["lsi__x"]), idx, loc=loc)
        assert mine == get_strings(gold, "lsi")
        xhat = np.asarray(
            em.decompress(get_strings(gold, "lsi"), idx, loc=loc))
        assert np.array_equal(xhat, gold["lsi__xhat"])

    def test_eval_bits(self, gold):
        em = self.make_em(gold)
        _, bits = em(jnp.asarray(gold["lsi__x"]),
                     jnp.asarray(gold["lsi__indexes"]),
                     loc=jnp.asarray(gold["lsi__loc"]), training=False)
        np.testing.assert_allclose(
            np.asarray(bits), gold["lsi__bits"], rtol=1e-4)


class TestContinuousIndexed2D:
    """Generic indexed EM: 2-D index grid, channel-axis flattening."""

    def make_em(self, gold):
        parameter_fns = {
            "loc": lambda i: (i[..., 0] - 1.5) / 2.,
            "scale": lambda i: jnp.exp(i[..., 1] - 2.),
        }
        return ContinuousIndexedEntropyModel(
            dist.NoisyLogistic, tuple(gold["ci2__index_ranges"]),
            parameter_fns, coding_rank=2, compression=True)

    def test_tables(self, gold):
        em = self.make_em(gold)
        check_tables(em, gold, "ci2")

    def test_byte_parity_both_ways(self, gold):
        em = self.make_em(gold)
        idx = jnp.asarray(gold["ci2__indexes"])
        mine = em.compress_to_strings(jnp.asarray(gold["ci2__x"]), idx)
        assert mine == get_strings(gold, "ci2")
        xhat = np.asarray(em.decompress(get_strings(gold, "ci2"), idx))
        assert np.array_equal(xhat, gold["ci2__xhat"])

    def test_eval_bits(self, gold):
        em = self.make_em(gold)
        _, bits = em(jnp.asarray(gold["ci2__x"]),
                     jnp.asarray(gold["ci2__indexes"]), training=False)
        np.testing.assert_allclose(
            np.asarray(bits), gold["ci2__bits"], rtol=1e-4)


class TestUniversalBatched:
    """Universal (dithered) EM: Philox offsets + offset-index table axis."""

    def make_em(self, gold):
        prior = dist.NoisyNormal(
            loc=jnp.asarray(gold["unb__loc"]),
            scale=jnp.asarray(gold["unb__scales"]))
        return UniversalBatchedEntropyModel(
            prior, coding_rank=3, compression=True)

    def test_tables(self, gold):
        em = self.make_em(gold)
        check_tables(em, gold, "unb")

    def test_byte_parity_both_ways(self, gold):
        em = self.make_em(gold)
        mine = em.compress_to_strings(jnp.asarray(gold["unb__x"]))
        assert mine == get_strings(gold, "unb")
        xhat = np.asarray(em.decompress(get_strings(gold, "unb"), (4, 6)))
        assert np.array_equal(xhat, gold["unb__xhat"])


class TestUniversalIndexedGolden:
    """UniversalIndexed: dither-offset leading CDF dim x 2-D index grid
    (reference universal.py:302-603) — the config VERDICT r2 item 7
    asked to golden-pin."""

    def make_em(self, gold):
        from compression_tpu.entropy_models import (
            UniversalIndexedEntropyModel)
        parameter_fns = {
            "loc": lambda i: (i[..., 0] - 1.0) / 2.,
            "scale": lambda i: jnp.exp(i[..., 1] - 1.5),
        }
        return UniversalIndexedEntropyModel(
            dist.NoisyNormal, tuple(gold["uni__index_ranges"]),
            parameter_fns, coding_rank=2, compression=True)

    def test_tables(self, gold):
        if "uni__cdf" not in gold:
            pytest.skip("fixture predates the uni config")
        em = self.make_em(gold)
        check_tables(em, gold, "uni")

    def test_byte_parity_both_ways(self, gold):
        if "uni__cdf" not in gold:
            pytest.skip("fixture predates the uni config")
        em = self.make_em(gold)
        idx = jnp.asarray(gold["uni__indexes"])
        mine = em.compress_to_strings(jnp.asarray(gold["uni__x"]), idx)
        assert mine == get_strings(gold, "uni")
        xhat = np.asarray(em.decompress(get_strings(gold, "uni"), idx))
        np.testing.assert_allclose(xhat, gold["uni__xhat"], atol=1e-5)

    def test_eval_bits(self, gold):
        if "uni__cdf" not in gold:
            pytest.skip("fixture predates the uni config")
        em = self.make_em(gold)
        _, bits = em(jnp.asarray(gold["uni__x"]),
                     jnp.asarray(gold["uni__indexes"]), training=False)
        np.testing.assert_allclose(
            np.asarray(bits), gold["uni__bits"], rtol=1e-4)
