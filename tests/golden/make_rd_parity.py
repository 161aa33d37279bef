"""RD-parity run: reference-TF bls2017 vs this repo's bls2017, trained on
the IDENTICAL synthetic corpus at matched lambdas, evaluated on the same
held-out images with real compression (bpp from actual string bytes).

The Kodak anchors in BASELINE.md are unreachable without the dataset;
this is the apples-to-apples substitute VERDICT r1 item 5 asks for: both
implementations share architecture, loss, lambda, optimizer, batch size,
steps and corpus — remaining differences are framework numerics and RNG
draws.  Writes RD_PARITY.json; the committed table lives in PARITY.md.

Usage (CPU, ~1h):
  env PYTHONPATH= JAX_PLATFORMS=cpu TF_ENABLE_ONEDNN_OPTS=0 \
      python make_rd_parity.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "../..")

import ref_stack  # noqa: E402
from make_golden_model import build_transforms, synthetic_textures, \
    apply_stack  # noqa: E402
import make_golden_model  # noqa: E402

ns = make_golden_model.ns
tf = ns.tf

NUM_FILTERS = 32
PATCH = 64
BATCH = 8
STEPS = int(os.environ.get("RD_STEPS", "1500"))
LAMBDAS = [0.003, 0.01, 0.05]
N_TRAIN = 64
N_EVAL = 16


def corpus():
    rng = np.random.RandomState(1234)
    train = synthetic_textures(rng, N_TRAIN, PATCH)
    eval_rng = np.random.RandomState(999)
    evals = np.round(synthetic_textures(eval_rng, N_EVAL, PATCH)).astype(
        np.uint8)
    return train, evals


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


def train_eval_reference(lmbda, train_data, eval_data):
    tf.random.set_seed(0)
    rng = np.random.RandomState(0)
    analysis, synthesis = build_transforms()
    prior = ns.deep_factorized.NoisyDeepFactorized(
        batch_shape=(NUM_FILTERS,))

    def analysis_fn(x):
        return apply_stack(analysis, x / 255.0)

    def synthesis_fn(y):
        return apply_stack(synthesis, y) * 255.0

    _ = synthesis_fn(analysis_fn(tf.zeros((1, PATCH, PATCH, 3))))
    variables = []
    for conv in analysis + synthesis:
        kp = conv.kernel_parameter
        variables += [kp.real, kp.imag]
        if hasattr(conv.bias_parameter, "numpy"):
            variables.append(conv.bias_parameter)
        if isinstance(conv.activation, ns.gdn.GDN):
            variables += [conv.activation.beta_parameter.variable,
                          conv.activation.gamma_parameter.variable]
    df = prior.base
    variables += list(df._matrices) + list(df._biases) + list(df._factors)

    opt = tf.keras.optimizers.Adam(learning_rate=1e-4)
    t0 = time.time()
    for step in range(STEPS):
        x = tf.constant(train_data[rng.choice(len(train_data), BATCH)])
        with tf.GradientTape() as tape:
            em = ns.continuous_batched.ContinuousBatchedEntropyModel(
                prior, coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            y = analysis_fn(x)
            y_hat, bits = em(y, training=True)
            x_hat = synthesis_fn(y_hat)
            num_pixels = tf.cast(
                tf.reduce_prod(tf.shape(x)[:-1]), bits.dtype)
            bpp = tf.reduce_sum(bits) / num_pixels
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            loss = bpp + lmbda * mse
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        if step % 250 == 0:
            print(f"  [tf l={lmbda}] step {step}: loss {float(loss):.4f} "
                  f"bpp {float(bpp):.4f} mse {float(mse):.1f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        prior, coding_rank=3, compression=True, bottleneck_dtype=tf.float32)
    total_bytes, total_px, psnrs = 0, 0, []
    for img in eval_data:
        x = tf.cast(tf.constant(img)[None], tf.float32)
        y = analysis_fn(x)
        strings = em.compress(y)
        nb = sum(len(bytes(s)) for s in tf.reshape(strings, [-1]).numpy())
        y_hat = em.decompress(strings, tf.shape(y)[1:-1])
        x_hat = synthesis_fn(y_hat)
        x_hat8 = tf.saturate_cast(tf.round(x_hat[0]), tf.uint8).numpy()
        total_bytes += nb
        total_px += img.shape[0] * img.shape[1]
        psnrs.append(psnr(img, x_hat8))
    return 8 * total_bytes / total_px, float(np.mean(psnrs))


def train_eval_jax(lmbda, train_data, eval_data):
    import jax  # noqa: F401
    from compression_tpu.models import bls2017

    rng = np.random.RandomState(0)

    def data_iter():
        while True:
            yield train_data[rng.choice(len(train_data), BATCH)]

    model, params = bls2017.train(
        lmbda=lmbda, num_filters=NUM_FILTERS, batch_size=BATCH,
        patchsize=PATCH, steps=STEPS, learning_rate=1e-4,
        data_iter=data_iter(), seed=0, log_every=250)
    codec = bls2017.BLS2017Codec(model, params)
    from compression_tpu.util.packed_tensors import PackedTensors
    total_bytes, total_px, psnrs = 0, 0, []
    for img in eval_data:
        container = codec.compress(img)
        packed = PackedTensors(container)
        strings, _, _ = packed.unpack(["bytes", np.int32, np.int32])
        x_hat8 = codec.decompress(container)
        total_bytes += sum(len(s) for s in strings)
        total_px += img.shape[0] * img.shape[1]
        psnrs.append(psnr(img, x_hat8))
    return 8 * total_bytes / total_px, float(np.mean(psnrs))


def main():
    train_data, eval_data = corpus()
    out = {"num_filters": NUM_FILTERS, "patch": PATCH, "batch": BATCH,
           "steps": STEPS, "corpus": "synthetic 1/f textures "
           f"({N_TRAIN} train / {N_EVAL} eval, {PATCH}x{PATCH})",
           "points": []}
    for lmbda in LAMBDAS:
        print(f"lambda={lmbda}: training JAX ...", flush=True)
        jb, jp = train_eval_jax(lmbda, train_data, eval_data)
        print(f"  jax: {jb:.4f} bpp, {jp:.2f} dB", flush=True)
        print(f"lambda={lmbda}: training reference TF ...", flush=True)
        tb, tp = train_eval_reference(lmbda, train_data, eval_data)
        print(f"  tf : {tb:.4f} bpp, {tp:.2f} dB", flush=True)
        out["points"].append({
            "lambda": lmbda,
            "ref_bpp": round(tb, 4), "ref_psnr_db": round(tp, 3),
            "tpu_bpp": round(jb, 4), "tpu_psnr_db": round(jp, 3),
            "delta_psnr_db": round(jp - tp, 3),
            "delta_bpp_pct": round(100 * (jb - tb) / tb, 2),
        })
        with open("../../RD_PARITY.json", "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out["points"][-1]), flush=True)
    print("saved RD_PARITY.json", flush=True)


if __name__ == "__main__":
    main()
