"""tfci published-model (.metagraph) load path (VERDICT r4 item 8).

Builds a minimal sender/receiver metagraph with the LOCAL TensorFlow —
structurally like the reference's published models (frozen TF1-style
graph with a reference C++ coding op inside, signature_defs "sender" /
"receiver", PackedTensors rank-1 container fields) — and drives it
through models/tfci.py's exact load path (instantiate_metagraph_
signature: MetaGraphDef -> wrap_function(import_meta_graph) -> prune;
reference models/tfci.py:78-121).  With this covered locally, the
published-model interop gap reduces to the GCS download alone
(zero-egress environmental).
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from compression_tpu.models import tfci  # noqa: E402
from compression_tpu.util import datasets  # noqa: E402
from compression_tpu.util.packed_tensors import PackedTensors  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
from ref_stack import ensure_ref_ops  # noqa: E402


def _build_metagraph():
    """A toy 4-bit codec as a frozen TF graph: sender quantizes and
    run-length-gamma codes (reference C++ kernel, ref_ops.so); receiver
    decodes and dequantizes.  Output keys are name-sorted, as the
    reference's signature handling requires."""
    ops = tf.load_op_library(ensure_ref_ops())
    g = tf.Graph()
    with g.as_default():
        x = tf.compat.v1.placeholder(
            tf.uint8, (None, None, 3), name="input_image")
        sym = tf.cast(x, tf.int32) // 16 - 8
        code = ops.run_length_gamma_encode(data=tf.reshape(sym, [-1]))
        out_code = tf.expand_dims(code, 0, name="out_code")
        out_shape = tf.identity(tf.shape(x)[:2], name="out_shape")

        in_code = tf.compat.v1.placeholder(tf.string, (1,), name="in_code")
        in_shape = tf.compat.v1.placeholder(tf.int32, (2,), name="in_shape")
        n = in_shape[0] * in_shape[1] * 3
        data = ops.run_length_gamma_decode(
            code=in_code[0], shape=tf.expand_dims(n, 0))
        data = tf.reshape(
            data, tf.concat([in_shape, tf.constant([3])], axis=0))
        x_hat = tf.cast(
            tf.clip_by_value((data + 8) * 16 + 8, 0, 255), tf.uint8,
            name="output_image")

        def info(t):
            return tf.compat.v1.saved_model.utils.build_tensor_info(t)

        sender_sig = tf.compat.v1.saved_model.build_signature_def(
            inputs={"input_image": info(x)},
            outputs={"0_code": info(out_code), "1_shape": info(out_shape)})
        receiver_sig = tf.compat.v1.saved_model.build_signature_def(
            inputs={"0_code": info(in_code), "1_shape": info(in_shape)},
            outputs={"output_image": info(x_hat)})
        mg = tf.compat.v1.train.export_meta_graph(graph=g)
    mg.signature_def["sender"].CopyFrom(sender_sig)
    mg.signature_def["receiver"].CopyFrom(receiver_sig)
    return mg.SerializeToString()


@pytest.fixture(scope="module")
def registry(tmp_path_factory):
    root = tmp_path_factory.mktemp("mg_registry")
    with open(os.path.join(root, "toy4bit.metagraph"), "wb") as f:
        f.write(_build_metagraph())
    return str(root)


def _image(seed=3, h=24, w=20):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


def test_metagraph_compress_decompress_roundtrip(registry):
    x = _image()
    container = tfci.metagraph_compress(
        os.path.join(registry, "toy4bit.metagraph"), "toy4bit", x)
    packed = PackedTensors(container)
    assert packed.model == "toy4bit"
    out = tfci.metagraph_decompress(
        os.path.join(registry, "toy4bit.metagraph"), container)
    assert np.array_equal(out, (x // 16) * 16 + 8)


def test_metagraph_cli_end_to_end(registry, tmp_path):
    """The tfci CLI routes through the metagraph when one is registered
    (the published-model dispatch, reference tfci.py:188-201)."""
    x = _image(seed=9)
    inp = str(tmp_path / "img.png")
    datasets.save_image(inp, x)
    cont = str(tmp_path / "img.tfci")
    outp = str(tmp_path / "img_out.png")
    tfci.main(["--model_path", registry, "compress", "toy4bit", inp, cont])
    tfci.main(["--model_path", registry, "decompress", cont, outp])
    out = datasets.load_image(outp)
    assert np.array_equal(out, (x // 16) * 16 + 8)


def test_metagraph_listed_and_absent_falls_back(registry, capsys):
    tfci.list_models(registry)
    # No metagraph for this name: path helper returns None (registry
    # codec dispatch takes over).
    assert tfci._metagraph_path(registry, "bls2017") is None
    assert tfci._metagraph_path(registry, "toy4bit") is not None
