"""Model-level cross-implementation parity vs a briefly-trained reference
ms2020 (the channel-wise autoregressive family; fixture from
tests/golden/make_golden_ms2020.py).

With weights ported via tools/port_tf_weights.port_ms2020:
  * analysis + hyper-analysis latents reproduce the reference,
  * BOTH range-coding tables (64-scale LocationScaleIndexed y-table and
    the offset_heuristic=False DeepFactorized z-table) are exactly equal,
  * compress() emits byte-identical z and per-slice y strings through the
    sequential slice-conditioning loop (mu/sigma/LRP transforms),
  * the reference container decodes here to the exact reference uint8
    reconstruction.

Reference spec: models/ms2020.py:54-161 (transforms), :332-434
(compress/decompress slice loops).
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from compression_tpu.models.ms2020 import MS2020Model, MS2020Codec
from compression_tpu.util.packed_tensors import PackedTensors

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.port_tf_weights import port_ms2020  # noqa: E402

FIXTURE = os.path.join(
    os.path.dirname(__file__), "golden", "golden_ms2020.npz")
pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="golden_ms2020.npz not generated")


@pytest.fixture(scope="module")
def gold():
    return dict(np.load(FIXTURE))


@pytest.fixture(scope="module")
def codec(gold):
    tf_vars = {k[len("var__"):].replace("__", "/"): v
               for k, v in gold.items() if k.startswith("var__")}
    params = port_ms2020(tf_vars, num_slices=int(gold["num_slices"]))
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


def get_strings(gold, prefix):
    nb = gold[f"{prefix}_nbytes"]
    buf = gold[f"{prefix}_bytes"].tobytes()
    out, off = [], 0
    for n in nb:
        out.append(buf[off:off + int(n)])
        off += int(n)
    return out


def test_latents_match(gold, codec):
    x = jnp.asarray(gold["x_test"], jnp.float32)[None]
    y, z = codec.model.apply(
        codec.params, x, method=MS2020Model.encode)
    np.testing.assert_allclose(np.asarray(y), gold["y"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(z), gold["z"], atol=5e-5)


def test_tables_exact(gold, codec):
    assert np.array_equal(np.asarray(codec.em_y.cdf), gold["cdf_y"])
    assert np.array_equal(
        np.asarray(codec.em_y.cdf_offset), gold["cdf_offset_y"])
    assert np.array_equal(np.asarray(codec.em_z.cdf), gold["cdf_z"])
    assert np.array_equal(
        np.asarray(codec.em_z.cdf_offset), gold["cdf_offset_z"])


def test_compress_strings_byte_identical(gold, codec):
    container = codec.compress(gold["x_test"])
    packed = PackedTensors(container)
    assert packed.model == "ms2020"
    ns = int(gold["num_slices"])
    fields = packed.unpack([np.int32, np.int32, np.int32, "bytes"]
                           + ["bytes"] * ns)
    z_strings = fields[3]
    y_strings = [fields[4 + i][0] for i in range(ns)]
    assert z_strings == get_strings(gold, "z")
    assert y_strings == get_strings(gold, "y")


def test_decode_reference_container(gold, codec):
    x_hat = codec.decompress(gold["container"].tobytes())
    assert np.array_equal(x_hat, gold["x_hat_uint8"])


def test_native_container_same_reconstruction(gold, codec):
    native = codec.compress_native(gold["x_test"])
    x_hat = codec.decompress(native)
    assert np.array_equal(x_hat, gold["x_hat_uint8"])
