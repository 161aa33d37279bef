"""Tests for stochastic rounding and the Y4M reader."""

import os
import tempfile

import jax
import numpy as np
import pytest

from compression_tpu.datasets.y4m import Y4MDataset, y4m_frames
from compression_tpu.ops.quantization import stochastic_round


class TestStochasticRound:
    def test_distribution(self):
        key = jax.random.PRNGKey(0)
        x = np.full(20000, 1.25, np.float32)
        out = np.asarray(stochastic_round(x, 0.5, key))
        # x/step = 2.5: rounds to 2 or 3 with p=0.5 each.
        assert set(np.unique(out)) == {2, 3}
        np.testing.assert_allclose(out.mean(), 2.5, atol=0.02)

    def test_integral_inputs_deterministic(self):
        key = jax.random.PRNGKey(1)
        x = np.asarray([2.0, -4.0, 0.0], np.float32)
        out = np.asarray(stochastic_round(x, 1.0, key))
        np.testing.assert_array_equal(out, [2, -4, 0])

    def test_seed_reproducible(self):
        x = np.random.RandomState(0).randn(100).astype(np.float32)
        a = np.asarray(stochastic_round(x, 0.1, jax.random.PRNGKey(7)))
        b = np.asarray(stochastic_round(x, 0.1, jax.random.PRNGKey(7)))
        np.testing.assert_array_equal(a, b)


def write_y4m(path, frames, chroma="420jpeg"):
    h, w = frames[0][0].shape[:2]
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode())
        for y, cb, cr in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(cb.tobytes())
            f.write(cr.tobytes())


class TestY4M:
    def test_420(self):
        rng = np.random.RandomState(0)
        frames = [
            (rng.randint(0, 256, (4, 6), np.uint8).astype(np.uint8),
             rng.randint(0, 256, (2, 3), np.uint8),
             rng.randint(0, 256, (2, 3), np.uint8))
            for _ in range(3)]
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "a.y4m")
            write_y4m(path, frames)
            out = list(y4m_frames([path]))
        assert len(out) == 3
        for (y, cbcr), (ey, ecb, ecr) in zip(out, frames):
            np.testing.assert_array_equal(y[..., 0], ey)
            np.testing.assert_array_equal(cbcr[..., 0], ecb)
            np.testing.assert_array_equal(cbcr[..., 1], ecr)

    def test_444_and_multifile(self):
        rng = np.random.RandomState(1)
        def mk(n):
            return [
                (rng.randint(0, 256, (2, 2), np.uint8),
                 rng.randint(0, 256, (2, 2), np.uint8),
                 rng.randint(0, 256, (2, 2), np.uint8))
                for _ in range(n)]
        fa, fb = mk(2), mk(1)
        with tempfile.TemporaryDirectory() as tmp:
            pa = os.path.join(tmp, "a.y4m")
            pb = os.path.join(tmp, "b.y4m")
            write_y4m(pa, fa, chroma="444")
            write_y4m(pb, fb, chroma="444")
            out = list(Y4MDataset([pa, pb]))
        assert len(out) == 3
        np.testing.assert_array_equal(out[2][0][..., 0], fb[0][0])

    def test_rejects_odd_420(self):
        rng = np.random.RandomState(2)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "bad.y4m")
            with open(path, "wb") as f:
                f.write(b"YUV4MPEG2 W3 H2 C420\n")
            try:
                list(y4m_frames([path]))
                assert False, "expected ValueError"
            except ValueError:
                pass


class TestStochasticRoundReference:
    """Bit-exact xoshiro256+ parity with the reference CPU kernel
    (fixtures from tests/golden/make_golden_quant.py; reference
    cc/kernels/quantization_kernels.cc:35-95)."""

    FIXTURE = os.path.join(
        os.path.dirname(__file__), "golden", "golden_quant.npz")

    @pytest.mark.skipif(not os.path.exists(FIXTURE),
                        reason="golden_quant.npz not generated")
    def test_golden_cases(self):
        import jax.numpy as jnp
        from compression_tpu.ops.quantization import (
            stochastic_round_reference)
        gold = dict(np.load(self.FIXTURE))
        for name in [n.decode() for n in gold["cases"]]:
            x = gold[f"{name}__x"]
            dt = bytes(gold[f"{name}__dtype"]).decode()
            if dt == "bf16":
                x = jnp.asarray(x, jnp.bfloat16)
            elif dt == "f16":
                x = x.astype(np.float16)
            out = stochastic_round_reference(
                x, float(gold[f"{name}__step"]), gold[f"{name}__seed"])
            assert np.array_equal(out, gold[f"{name}__out"]), name

    def test_empty_seed_rejected(self):
        from compression_tpu.ops.quantization import (
            stochastic_round_reference)
        with pytest.raises(ValueError):
            stochastic_round_reference(np.ones(4, np.float32), 1.0, [])

    def test_distribution_matches_fraction(self):
        from compression_tpu.ops.quantization import (
            stochastic_round_reference)
        x = np.full(4096, 0.25, np.float32)
        out = stochastic_round_reference(x, 1.0, [42])
        assert abs(out.mean() - 0.25) < 0.03
