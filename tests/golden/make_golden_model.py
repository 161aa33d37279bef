"""Model-level golden fixture: a briefly-TRAINED reference bls2017,
exported for cross-implementation decode + weight-porting tests.

Builds the reference bls2017 transforms exactly as models/bls2017.py:55-92
does (reference SignalConv2D/GDN/NoisyDeepFactorized classes imported
unmodified from the mount), trains them for a few hundred Adam steps on
synthetic 1/f textures with the reference loss (bpp + lambda*mse,
models/bls2017.py:107-121), then compresses a test image through the
reference entropy model + PackedTensors container (models/bls2017.py:
280-284 conventions).

Saved fixture lets tests assert, with weights ported via
tools/port_tf_weights.py:
  * this repo's analysis transform reproduces the reference latents,
  * this repo decodes the REFERENCE .tfci container to the same image,
  * this repo's compress produces the same strings from the same image.

Usage: TF_ENABLE_ONEDNN_OPTS=0 python make_golden_model.py
"""

import sys

import numpy as np

import ref_stack

ns = ref_stack.load_layers()
tf = ns.tf

sys.path.insert(0, "../..")
from tools import port_tf_weights  # noqa: E402

NUM_FILTERS = 32
LMBDA = 0.01
STEPS = int(__import__("os").environ.get("GOLDEN_STEPS", "300"))
PATCH = 64


def synthetic_textures(rng, n, size):
    """1/f random-phase textures in [0, 255], shape (n, size, size, 3)."""
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    radius = np.sqrt(fy * fy + fx * fx)
    radius[0, 0] = 1.0
    out = []
    for _ in range(n):
        spec = (rng.normal(size=(3, size, size // 2 + 1))
                + 1j * rng.normal(size=(3, size, size // 2 + 1)))
        img = np.fft.irfft2(spec / radius, s=(size, size), axes=(1, 2))
        img = img.transpose(1, 2, 0)
        img = (img - img.min()) / (np.ptp(img) + 1e-9)
        out.append(255.0 * img)
    return np.asarray(out, np.float32)


def build_transforms():
    """The bls2017 transforms (models/bls2017.py:55-92), built from the
    reference layer classes; the /255 and *255 Lambdas are applied
    manually in analysis()/synthesis()."""
    analysis = [
        ns.signal_conv.SignalConv2D(
            NUM_FILTERS, (9, 9), name="layer_0", corr=True, strides_down=4,
            padding="same_zeros", use_bias=True,
            activation=ns.gdn.GDN(name="gdn_0")),
        ns.signal_conv.SignalConv2D(
            NUM_FILTERS, (5, 5), name="layer_1", corr=True, strides_down=2,
            padding="same_zeros", use_bias=True,
            activation=ns.gdn.GDN(name="gdn_1")),
        ns.signal_conv.SignalConv2D(
            NUM_FILTERS, (5, 5), name="layer_2", corr=True, strides_down=2,
            padding="same_zeros", use_bias=False, activation=None),
    ]
    synthesis = [
        ns.signal_conv.SignalConv2D(
            NUM_FILTERS, (5, 5), name="layer_0", corr=False, strides_up=2,
            padding="same_zeros", use_bias=True,
            activation=ns.gdn.GDN(name="igdn_0", inverse=True)),
        ns.signal_conv.SignalConv2D(
            NUM_FILTERS, (5, 5), name="layer_1", corr=False, strides_up=2,
            padding="same_zeros", use_bias=True,
            activation=ns.gdn.GDN(name="igdn_1", inverse=True)),
        ns.signal_conv.SignalConv2D(
            3, (9, 9), name="layer_2", corr=False, strides_up=4,
            padding="same_zeros", use_bias=True, activation=None),
    ]
    return analysis, synthesis


def apply_stack(layers, x):
    for layer in layers:
        x = layer(x)
    return x


def main():
    tf.random.set_seed(0)
    rng = np.random.RandomState(0)

    analysis, synthesis = build_transforms()
    prior = ns.deep_factorized.NoisyDeepFactorized(
        batch_shape=(NUM_FILTERS,))

    def analysis_fn(x):
        return apply_stack(analysis, x / 255.0)

    def synthesis_fn(y):
        return apply_stack(synthesis, y) * 255.0

    # Build layers.
    x0 = tf.zeros((1, PATCH, PATCH, 3))
    _ = synthesis_fn(analysis_fn(x0))

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

    data = synthetic_textures(rng, 32, PATCH)
    opt = tf.keras.optimizers.Adam(learning_rate=1e-3)

    # Eager (no tf.function): reference GDN.call branches on Python bools
    # over parameter tensors, which Keras 3 no longer autographs.
    def train_step(x):
        with tf.GradientTape() as tape:
            em = ns.continuous_batched.ContinuousBatchedEntropyModel(
                prior, coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            y = analysis_fn(x)
            y_hat, bits = em(y, training=True)
            x_hat = synthesis_fn(y_hat)
            num_pixels = tf.cast(tf.reduce_prod(tf.shape(x)[:-1]),
                                 bits.dtype)
            bpp = tf.reduce_sum(bits) / num_pixels
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            loss = bpp + LMBDA * mse
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss, bpp, mse

    for step in range(STEPS):
        batch = tf.constant(data[rng.choice(len(data), 8)])
        loss, bpp, mse = train_step(batch)
        if step % 50 == 0 or step == STEPS - 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"bpp {float(bpp):.4f} mse {float(mse):.2f}")

    # Freeze tables (reference fit() epilogue, models/bls2017.py:160-162).
    em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        prior, coding_rank=3, compression=True, bottleneck_dtype=tf.float32)

    out = {}
    tf_vars = port_tf_weights.extract_bls2017(analysis, synthesis, df)
    for k, v in tf_vars.items():
        out["var__" + k.replace("/", "__")] = v
    out["num_filters"] = np.int32(NUM_FILTERS)

    x_test = np.round(synthetic_textures(
        np.random.RandomState(99), 1, PATCH)[0]).astype(np.uint8)
    out["x_test"] = x_test

    # Reference compress path (models/bls2017.py:226-246).
    x = tf.cast(tf.constant(x_test)[None], tf.float32)
    y = analysis_fn(x)
    out["y"] = y.numpy()
    strings = em.compress(y)
    flat = [bytes(s) for s in tf.reshape(strings, [-1]).numpy()]
    out["strings_nbytes"] = np.asarray([len(b) for b in flat], np.int32)
    out["strings_bytes"] = np.frombuffer(b"".join(flat), np.uint8)
    y_hat = em.decompress(strings, tf.shape(y)[1:-1])
    out["y_hat"] = y_hat.numpy()
    x_hat = synthesis_fn(y_hat)
    out["x_hat_float"] = x_hat[0].numpy()
    out["x_hat_uint8"] = tf.saturate_cast(
        tf.round(x_hat[0]), tf.uint8).numpy()

    out["cdf"] = em.cdf.numpy()
    out["cdf_offset"] = em.cdf_offset.numpy()
    qo = em.quantization_offset
    out["qoffset"] = (qo.numpy() if qo is not None
                      else np.zeros(NUM_FILTERS, np.float32))

    # Full .tfci container (reference models/bls2017.py:280-284).
    packed = ns.packed_tensors.PackedTensors()
    packed.model = "bls2017"
    packed.pack([strings, tf.shape(x)[1:-1], tf.shape(y)[1:-1]])
    out["container"] = np.frombuffer(packed.string, np.uint8)

    psnr = 10 * np.log10(255**2 / np.mean(
        (x_test.astype(np.float64) - out["x_hat_uint8"].astype(np.float64))
        ** 2))
    bpp = 8 * sum(len(b) for b in flat) / (PATCH * PATCH)
    print(f"test image: {bpp:.3f} bpp, {psnr:.2f} dB PSNR, "
          f"{len(flat)} string(s)")

    np.savez_compressed("golden_model.npz", **out)
    print("saved golden_model.npz")


if __name__ == "__main__":
    main()
