"""Shared argparse CLI for the neural codecs (train/compress/decompress).

Mirrors the reference model scripts' subcommand structure
(models/bls2017.py:326-451): `train` fits a model and writes a checkpoint
(with frozen range-coding tables), `compress` produces a .tfci container,
`decompress` reconstructs the image.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.util import checkpoint as ckpt_lib
from compression_tpu.util import datasets


def make_parser(model_name, defaults):
    parser = argparse.ArgumentParser(
        prog=model_name,
        description=f"{model_name} TPU codec (train/compress/decompress)")
    sub = parser.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="Train the model.")
    t.add_argument("--model_path", default=f"{model_name}_ckpt")
    # Every model hyperparameter becomes a flag (reference CLI semantics:
    # ms2020.py exposes latent_depth/num_slices/..., bmshj2018 num_scales/
    # scale_min/scale_max, ...) and is persisted in the checkpoint config
    # so compress/decompress rebuild the exact architecture.
    for key, val in defaults.items():
        flag = "--lambda" if key == "lmbda" else f"--{key}"
        if isinstance(val, bool):
            t.add_argument(flag, dest=key,
                           action="store_false" if val else "store_true")
        else:
            t.add_argument(flag, dest=key, type=type(val), default=val)
    t.add_argument("--train_glob", default=None,
                   help="Directory of training images (png/jpg/npy). "
                        "Default: synthetic noise (smoke run).")
    t.add_argument("--batchsize", type=int, default=8)
    t.add_argument("--patchsize", type=int, default=256)
    t.add_argument("--steps", type=int, default=10000)
    t.add_argument("--learning_rate", type=float, default=1e-4)
    t.add_argument("--seed", type=int, default=0)

    c = sub.add_parser("compress", help="Compress an image to a .tfci file.")
    c.add_argument("--model_path", default=f"{model_name}_ckpt")
    c.add_argument("input_file")
    c.add_argument("output_file", nargs="?")

    d = sub.add_parser("decompress", help="Decompress a .tfci file.")
    d.add_argument("--model_path", default=f"{model_name}_ckpt")
    d.add_argument("input_file")
    d.add_argument("output_file", nargs="?")
    return parser


def run(model_name, defaults, build_model, build_codec, argv=None):
    """Generic CLI driver.

    Args:
      model_name: e.g. "bls2017".
      defaults: dict of default hyperparameters.
      build_model: (args_namespace_or_config) -> flax module.
      build_codec: (model, params) -> codec object with
        compress(img)->bytes / decompress(bytes)->img.
    """
    args = make_parser(model_name, defaults).parse_args(argv)

    if args.command == "train":
        model = build_model(vars(args))
        key = jax.random.PRNGKey(args.seed)
        key, init_key = jax.random.split(key)
        dummy = jnp.zeros((1, args.patchsize, args.patchsize, 3))
        params = model.init(init_key, dummy, training=False)
        optimizer = optax.adam(args.learning_rate)
        opt_state = optimizer.init(params)

        import importlib
        mod = importlib.import_module(type(model).__module__)
        step_fn = mod.make_train_step(model, optimizer)

        data = datasets.image_patch_iterator(
            args.train_glob, args.batchsize, args.patchsize, args.seed)
        for step, batch in zip(range(args.steps), data):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step_fn(
                params, opt_state, jnp.asarray(batch), sub)
            if step % 100 == 0:
                print(f"step {step}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()),
                    flush=True)
        config = {k: getattr(args, k) for k in defaults}
        config["model_name"] = model_name
        ckpt_lib.save_checkpoint(args.model_path, params, config=config)
        print(f"saved checkpoint to {args.model_path}")
        return

    payload, config = ckpt_lib.load_checkpoint(args.model_path)
    model = build_model(config or defaults)
    codec = build_codec(model, payload["params"])

    if args.command == "compress":
        img = datasets.load_image(args.input_file)
        container = codec.compress(img)
        out = args.output_file or args.input_file + ".tfci"
        with open(out, "wb") as f:
            f.write(container)
        bpp = len(container) * 8 / (img.shape[0] * img.shape[1])
        print(f"{out}: {len(container)} bytes, {bpp:.4f} bpp")
    elif args.command == "decompress":
        with open(args.input_file, "rb") as f:
            container = f.read()
        img = codec.decompress(container)
        out = args.output_file or args.input_file + ".png"
        datasets.save_image(out, img)
        print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")
