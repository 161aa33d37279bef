"""tfci: front-end CLI over trained codec checkpoints.

Counterpart of the reference's models/tfci.py.  The reference downloads
frozen sender/receiver metagraphs from Google Cloud Storage; this
environment is zero-egress, so models are resolved from a local registry
directory instead (``--model_path`` root, one checkpoint directory per
model name, as written by each model's `train` CLI).  `decompress`
dispatches on the model identifier stored in the .tfci container, exactly
like the reference (models/tfci.py:188-201).

Subcommands: compress, decompress, models, tensors, dump.
Also supports the reference's rd_parameter-style target-bpp search: when
``--target_bpp`` is given, compress binary-searches over the registered
model variants (sorted by lambda) to hit the target within tolerance
(reference models/tfci.py:124-185).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from compression_tpu.util import checkpoint as ckpt_lib
from compression_tpu.util import datasets
from compression_tpu.util.packed_tensors import PackedTensors

_BUILDERS = {}


def register_model(name):
    def wrap(fn):
        _BUILDERS[name] = fn
        return fn
    return wrap


@register_model("bls2017")
def _build_bls2017(config, params):
    from compression_tpu.models import bls2017
    model = bls2017.BLS2017Model(
        lmbda=config.get("lmbda", 0.01),
        num_filters=config.get("num_filters", 128))
    return bls2017.BLS2017Codec(model, params)


@register_model("bmshj2018")
def _build_bmshj2018(config, params):
    from compression_tpu.models import bmshj2018
    model = bmshj2018.BMSHJ2018Model(
        lmbda=config.get("lmbda", 0.01),
        num_filters=config.get("num_filters", 128))
    return bmshj2018.BMSHJ2018Codec(model, params)


@register_model("ms2020")
def _build_ms2020(config, params):
    from compression_tpu.models import ms2020
    model = ms2020.MS2020Model(
        lmbda=config.get("lmbda", 0.01),
        num_filters=config.get("num_filters", 192))
    return ms2020.MS2020Codec(model, params)


@register_model("hific")
def _build_hific(config, params):
    from compression_tpu.models import hific
    return hific.HiFiCCodec(hific.HiFiCModel(), params)


def _metagraph_path(root, model):
    """Local frozen-graph registry: ``<root>/<model>.metagraph``."""
    p = os.path.join(root, model + ".metagraph")
    return p if os.path.exists(p) else None


def instantiate_metagraph_signature(path, signature):
    """Imports a frozen ``.metagraph`` and returns one signature as a
    callable.

    This is the exact load path the reference uses for its published
    models (reference models/tfci.py:78-96: parse MetaGraphDef ->
    ``wrap_function(import_meta_graph)`` -> prune the signature's
    inputs/outputs), pointed at a local file — in this zero-egress
    environment only the GCS download is out of reach.  Requires
    TensorFlow; custom coding ops referenced by the graph must be
    registered first (``tf.load_op_library`` of a compiled op set).
    """
    import tensorflow as tf

    with open(path, "rb") as f:
        string = f.read()
    metagraph = tf.compat.v1.MetaGraphDef()
    metagraph.ParseFromString(string)
    wrapped_import = tf.compat.v1.wrap_function(
        lambda: tf.compat.v1.train.import_meta_graph(metagraph), [])
    graph = wrapped_import.graph
    inputs = metagraph.signature_def[signature].inputs
    inputs = [graph.as_graph_element(inputs[k].name) for k in sorted(inputs)]
    outputs = metagraph.signature_def[signature].outputs
    outputs = [graph.as_graph_element(outputs[k].name)
               for k in sorted(outputs)]
    return wrapped_import.prune(inputs, outputs)


def metagraph_compress(path, model, img, rd_parameter=None) -> bytes:
    """Compresses with a frozen sender graph (reference tfci.py:99-121)."""
    import tensorflow as tf

    sender = instantiate_metagraph_signature(path, "sender")
    x = tf.constant(np.asarray(img), dtype=sender.inputs[0].dtype)
    if len(sender.inputs) == 1:
        if rd_parameter is not None:
            raise ValueError("This model doesn't expect an RD parameter.")
        tensors = list(sender(x))
    elif len(sender.inputs) == 2:
        if rd_parameter is None:
            raise ValueError("This model expects an RD parameter.")
        rd = tf.constant(rd_parameter, dtype=sender.inputs[1].dtype)
        tensors = list(sender(x, rd))
        # Scalar RD parameter rides the container as a 1-D tensor.
        for i, t in enumerate(tensors):
            if t.dtype.is_floating and t.shape.rank == 0:
                tensors[i] = tf.expand_dims(t, 0)
    else:
        raise RuntimeError("Unexpected model signature.")
    packed = PackedTensors()
    packed.model = model
    packed.pack([np.asarray(t).reshape(-1) for t in tensors])
    return packed.string


def metagraph_decompress(path, container: bytes):
    """Decompresses with a frozen receiver graph (reference
    tfci.py:188-201)."""
    import tensorflow as tf

    packed = PackedTensors(container)
    receiver = instantiate_metagraph_signature(path, "receiver")
    dtypes = ["bytes" if t.dtype == tf.string else t.dtype.as_numpy_dtype
              for t in receiver.inputs]
    tensors = packed.unpack(dtypes)
    args = []
    for t, inp in zip(tensors, receiver.inputs):
        c = tf.constant(np.asarray(t, object) if inp.dtype == tf.string
                        else t, dtype=inp.dtype)
        # Scalar RD parameter was expanded to 1-D for the container.
        if c.dtype.is_floating and c.shape == (1,) and inp.shape.rank == 0:
            c = tf.squeeze(c, 0)
        args.append(c)
    output_image, = receiver(*args)
    return np.asarray(output_image)


def _registry_models(root):
    """Lists checkpoint dirs under the registry root."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        cfg = os.path.join(root, name, "config.json")
        if os.path.exists(cfg):
            out.append(name)
    return out


def _load_codec(root, model_name):
    path = os.path.join(root, model_name)
    payload, config = ckpt_lib.load_checkpoint(path)
    config = config or {}
    base = config.get("model_name", model_name.split("-")[0])
    if base not in _BUILDERS:
        raise ValueError(
            f"Unknown model family '{base}'; known: {sorted(_BUILDERS)}")
    return _BUILDERS[base](config, payload["params"])


def compress(root, model_name, input_file, output_file, target_bpp=None,
             bpp_strict=False):
    img = datasets.load_image(input_file)
    num_pixels = img.shape[0] * img.shape[1]
    mg = _metagraph_path(root, model_name)
    if mg is not None:
        container = metagraph_compress(mg, model_name, img)
    elif target_bpp is None:
        codec = _load_codec(root, model_name)
        container = codec.compress(img)
    else:
        # Binary search over registered variants of this model family,
        # assumed registered as <family>-<quality> sorted by rate.
        variants = [m for m in _registry_models(root)
                    if m.split("-")[0] == model_name]
        if not variants:
            raise ValueError(f"No registered variants for {model_name}")
        lo, hi = 0, len(variants) - 1
        best = None
        while lo <= hi:
            mid = (lo + hi) // 2
            codec = _load_codec(root, variants[mid])
            container = codec.compress(img)
            bpp = len(container) * 8 / num_pixels
            if bpp <= target_bpp:
                best = container
                lo = mid + 1
            else:
                hi = mid - 1
        if best is None:
            if bpp_strict:
                raise ValueError(
                    f"Could not achieve target {target_bpp} bpp.")
            best = container
        container = best
    with open(output_file, "wb") as f:
        f.write(container)
    bpp = len(container) * 8 / num_pixels
    print(f"{output_file}: {len(container)} bytes, {bpp:.4f} bpp")


def decompress(root, input_file, output_file):
    with open(input_file, "rb") as f:
        container = f.read()
    packed = PackedTensors(container)
    mg = _metagraph_path(root, packed.model)
    if mg is not None:
        img = metagraph_decompress(mg, container)
    else:
        codec = _load_codec(root, packed.model)
        img = codec.decompress(container)
    datasets.save_image(output_file, img)
    print(f"wrote {output_file}")


def list_models(root):
    print("Registered local models:")
    for m in _registry_models(root):
        print(" ", m)
    if os.path.isdir(root):
        for f in sorted(os.listdir(root)):
            if f.endswith(".metagraph"):
                print(" ", f[: -len(".metagraph")], "(frozen metagraph)")
    print("Known model families:", ", ".join(sorted(_BUILDERS)))


def list_tensors(root, model_name):
    import jax
    payload, _ = ckpt_lib.load_checkpoint(os.path.join(root, model_name))
    flat = jax.tree_util.tree_flatten_with_path(payload["params"])[0]
    for path, leaf in flat:
        name = "/".join(str(p)[2:-2] if "'" in str(p) else str(p)
                        for p in path)
        print(f"{name} {np.asarray(leaf).dtype} {tuple(np.shape(leaf))}")


def dump_tensor(root, model_name, tensors, input_file, output_file):
    """Dumps intermediate latents for an input image to an .npz file."""
    codec = _load_codec(root, model_name)
    img = datasets.load_image(input_file)
    import jax.numpy as jnp
    x = jnp.asarray(img, jnp.float32)[None]
    out = {}
    if hasattr(codec, "_encode"):
        enc = codec._encode(codec.params, x)
        if isinstance(enc, tuple):
            out["y"], out["z"] = [np.asarray(e) for e in enc]
        else:
            out["y"] = np.asarray(enc)
    elif hasattr(codec, "_analysis"):
        out["y"] = np.asarray(codec._analysis(codec.params, x))
    keep = {k: v for k, v in out.items() if not tensors or k in tensors}
    np.savez(output_file, **keep)
    print(f"wrote {output_file} with {sorted(keep)}")


def parse_args(argv):
    parser = argparse.ArgumentParser(
        prog="tfci", description="TPU codec front-end.")
    parser.add_argument("--model_path", default="models",
                        help="Local model registry directory.")
    sub = parser.add_subparsers(dest="command", required=True)

    c = sub.add_parser("compress")
    c.add_argument("model")
    c.add_argument("input_file")
    c.add_argument("output_file", nargs="?")
    c.add_argument("--rd_parameter", "--target_bpp", dest="target_bpp",
                   type=float, default=None)
    c.add_argument("--bpp_strict", action="store_true")

    d = sub.add_parser("decompress")
    d.add_argument("input_file")
    d.add_argument("output_file", nargs="?")

    sub.add_parser("models")

    t = sub.add_parser("tensors")
    t.add_argument("model")

    du = sub.add_parser("dump")
    du.add_argument("model")
    du.add_argument("--tensor", action="append", dest="tensors", default=[])
    du.add_argument("input_file")
    du.add_argument("output_file", nargs="?")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.command == "compress":
        out = args.output_file or args.input_file + ".tfci"
        compress(args.model_path, args.model, args.input_file, out,
                 args.target_bpp, args.bpp_strict)
    elif args.command == "decompress":
        out = args.output_file or args.input_file + ".png"
        decompress(args.model_path, args.input_file, out)
    elif args.command == "models":
        list_models(args.model_path)
    elif args.command == "tensors":
        list_tensors(args.model_path, args.model)
    elif args.command == "dump":
        out = args.output_file or args.input_file + ".npz"
        dump_tensor(args.model_path, args.model, args.tensors,
                    args.input_file, out)


if __name__ == "__main__":
    main()
