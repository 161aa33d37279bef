"""FULL-SCALE golden parity: bmshj2018 at 192 filters, ms2020 at the
paper config (10 slices / latent 320 / 192 filters), VERDICT r2 item 3.

Weights are synthesized deterministically from port names
(tests/golden/synth_weights.py) and regenerated here; the fixture's
per-variable digests prove both sides hold the identical arrays before
any parity claim.  Then, as in the small-config golden tests:

  * analysis/hyper latents reproduce the reference,
  * BOTH range-coding tables are exactly equal at paper widths,
  * compress() emits byte-identical strings (through the 10-slice
    conditional loop for ms2020),
  * the reference container decodes here to the exact uint8 image.

Reference spec: /root/reference/models/ms2020.py:137-160 (paper
constants), models/bmshj2018.py transforms.
"""

import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from compression_tpu.models.bmshj2018 import BMSHJ2018Model, BMSHJ2018Codec
from compression_tpu.models.ms2020 import MS2020Model, MS2020Codec
from compression_tpu.util.packed_tensors import PackedTensors

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
from tools.port_tf_weights import port_bmshj2018, port_ms2020  # noqa: E402
import synth_weights  # noqa: E402

GOLD_DIR = os.path.dirname(__file__)
BMSHJ_FIX = os.path.join(GOLD_DIR, "golden", "golden_bmshj_full.npz")
MS_FIX = os.path.join(GOLD_DIR, "golden", "golden_ms2020_full.npz")


def regen_weights(gold):
    """Regenerates the synthesized weights and verifies every digest."""
    manifest = json.loads(gold["manifest"].tobytes().decode())
    tf_vars = {}
    for name, (shape, dig) in manifest.items():
        val = synth_weights.synth(name, shape)
        assert synth_weights.digest(val) == dig, \
            f"synthesized weight drifted: {name}"
        tf_vars[name] = val
    return tf_vars


def get_strings(gold, prefix):
    nb = gold[f"{prefix}_nbytes"]
    buf = gold[f"{prefix}_bytes"].tobytes()
    out, off = [], 0
    for n in nb:
        out.append(buf[off:off + int(n)])
        off += int(n)
    return out


@pytest.mark.skipif(not os.path.exists(BMSHJ_FIX),
                    reason="golden_bmshj_full.npz not generated")
class TestBmshjFullScale:
    @pytest.fixture(scope="class")
    def gold(self):
        return dict(np.load(BMSHJ_FIX))

    @pytest.fixture(scope="class")
    def codec(self, gold):
        params = port_bmshj2018(regen_weights(gold))
        model = BMSHJ2018Model(num_filters=int(gold["num_filters"]),
                               num_scales=int(gold["num_scales"]))
        return BMSHJ2018Codec(model, params)

    def test_latents_match(self, gold, codec):
        x = jnp.asarray(gold["x_test"], jnp.float32)[None]
        y, z = codec._encode(codec.params, x)
        np.testing.assert_allclose(np.asarray(y), gold["y"], atol=3e-4)
        np.testing.assert_allclose(np.asarray(z), gold["z"], atol=3e-4)

    def test_tables_exact(self, gold, codec):
        assert np.array_equal(np.asarray(codec.em.cdf), gold["cdf_y"])
        assert np.array_equal(
            np.asarray(codec.em.cdf_offset), gold["cdf_offset_y"])
        assert np.array_equal(
            np.asarray(codec.side_em.cdf), gold["cdf_z"])
        assert np.array_equal(
            np.asarray(codec.side_em.cdf_offset), gold["cdf_offset_z"])

    def test_compress_strings_byte_identical(self, gold, codec):
        container = codec.compress(gold["x_test"])
        packed = PackedTensors(container)
        strings, side_strings, _, _, _ = packed.unpack(
            ["bytes", "bytes", np.int32, np.int32, np.int32])
        assert strings == get_strings(gold, "y")
        assert side_strings == get_strings(gold, "z")

    def test_decode_reference_container(self, gold, codec):
        x_hat = codec.decompress(gold["container"].tobytes())
        assert np.array_equal(x_hat, gold["x_hat_uint8"])


@pytest.mark.skipif(not os.path.exists(MS_FIX),
                    reason="golden_ms2020_full.npz not generated")
class TestMs2020PaperScale:
    @pytest.fixture(scope="class")
    def gold(self):
        return dict(np.load(MS_FIX))

    @pytest.fixture(scope="class")
    def codec(self, gold):
        params = port_ms2020(regen_weights(gold),
                             num_slices=int(gold["num_slices"]))
        model = MS2020Model(
            num_filters=int(gold["num_filters"]),
            latent_depth=int(gold["latent_depth"]),
            hyperprior_depth=int(gold["hyperprior_depth"]),
            num_slices=int(gold["num_slices"]),
            max_support_slices=int(gold["max_support_slices"]),
            num_scales=int(gold["num_scales"]),
            ha_widths=tuple(int(w) for w in gold["ha_widths"]),
            hs_widths=tuple(int(w) for w in gold["hs_widths"]),
            slice_widths=tuple(int(w) for w in gold["slice_widths"]))
        return MS2020Codec(model, params)

    def test_latents_match(self, gold, codec):
        x = jnp.asarray(gold["x_test"], jnp.float32)[None]
        y, z = codec.model.apply(
            codec.params, x, method=MS2020Model.encode)
        np.testing.assert_allclose(np.asarray(y), gold["y"], atol=3e-4)
        np.testing.assert_allclose(np.asarray(z), gold["z"], atol=3e-4)

    def test_tables_exact(self, gold, codec):
        assert np.array_equal(np.asarray(codec.em_y.cdf), gold["cdf_y"])
        assert np.array_equal(
            np.asarray(codec.em_y.cdf_offset), gold["cdf_offset_y"])
        assert np.array_equal(np.asarray(codec.em_z.cdf), gold["cdf_z"])
        assert np.array_equal(
            np.asarray(codec.em_z.cdf_offset), gold["cdf_offset_z"])

    def test_compress_strings_byte_identical(self, gold, codec):
        container = codec.compress(gold["x_test"])
        packed = PackedTensors(container)
        ns = int(gold["num_slices"])
        fields = packed.unpack([np.int32, np.int32, np.int32, "bytes"]
                               + ["bytes"] * ns)
        assert fields[3] == get_strings(gold, "z")
        y_strings = [fields[4 + i][0] for i in range(ns)]
        assert y_strings == get_strings(gold, "y")

    def test_decode_reference_container(self, gold, codec):
        x_hat = codec.decompress(gold["container"].tobytes())
        assert np.array_equal(x_hat, gold["x_hat_uint8"])
