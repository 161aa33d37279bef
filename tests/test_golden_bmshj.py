"""Model-level cross-implementation parity vs a briefly-trained reference
bmshj2018 (the scale-hyperprior / indexed-EM family; fixture from
tests/golden/make_golden_bmshj.py).

With weights ported via tools/port_tf_weights.port_bmshj2018:
  * analysis + hyper-analysis latents reproduce the reference,
  * BOTH range-coding tables (64-scale LocationScaleIndexed y-table and
    DeepFactorized z-table) are exactly equal,
  * compress() emits byte-identical y and z strings,
  * the reference container decodes here to the exact reference uint8
    reconstruction (BASELINE config #4 at model level).

Reference spec: models/bmshj2018.py:52-139 (transforms), :226-266
(compress/decompress graphs).
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from compression_tpu.models.bmshj2018 import BMSHJ2018Model, BMSHJ2018Codec
from compression_tpu.util.packed_tensors import PackedTensors

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.port_tf_weights import port_bmshj2018  # noqa: E402

FIXTURE = os.path.join(
    os.path.dirname(__file__), "golden", "golden_bmshj.npz")
pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="golden_bmshj.npz not generated")


@pytest.fixture(scope="module")
def gold():
    return dict(np.load(FIXTURE))


@pytest.fixture(scope="module")
def codec(gold):
    tf_vars = {k[len("var__"):].replace("__", "/"): v
               for k, v in gold.items() if k.startswith("var__")}
    params = port_bmshj2018(tf_vars)
    model = BMSHJ2018Model(num_filters=int(gold["num_filters"]),
                           num_scales=int(gold["num_scales"]))
    return BMSHJ2018Codec(model, params)


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
        codec.params, x, method=BMSHJ2018Model.encode)
    np.testing.assert_allclose(np.asarray(y), gold["y"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(z), gold["z"], atol=5e-5)


def test_tables_exact(gold, codec):
    assert np.array_equal(np.asarray(codec.em.cdf), gold["cdf_y"])
    assert np.array_equal(
        np.asarray(codec.em.cdf_offset), gold["cdf_offset_y"])
    assert np.array_equal(np.asarray(codec.side_em.cdf), gold["cdf_z"])
    assert np.array_equal(
        np.asarray(codec.side_em.cdf_offset), gold["cdf_offset_z"])


def test_compress_strings_byte_identical(gold, codec):
    container = codec.compress(gold["x_test"])
    packed = PackedTensors(container)
    assert packed.model == "bmshj2018"
    strings, side_strings, _, _, _ = packed.unpack(
        ["bytes", "bytes", np.int32, np.int32, np.int32])
    assert strings == get_strings(gold, "y")
    assert side_strings == get_strings(gold, "z")


def test_decode_reference_container(gold, codec):
    x_hat = codec.decompress(gold["container"].tobytes())
    assert np.array_equal(x_hat, gold["x_hat_uint8"])


def test_native_container_same_reconstruction(gold, codec):
    native = codec.compress_native(gold["x_test"])
    x_hat = codec.decompress(native)
    assert np.array_equal(x_hat, gold["x_hat_uint8"])
