"""Model-level golden fixture for the HYPERPRIOR family: a briefly-trained
reference bmshj2018, exported for cross-implementation decode +
weight-porting tests.

Builds the reference bmshj2018 transforms exactly as models/bmshj2018.py:
52-139 does (reference SignalConv2D/GDN classes from the mount;
hyper-synthesis kernels stored as plain variables per the reference),
trains briefly with the reference loss, then compresses a test image
through the reference LocationScaleIndexed + batched entropy models and
the reference container layout (string, side_string, x/y/z shapes;
models/bmshj2018.py:226-266).

Usage: TF_ENABLE_ONEDNN_OPTS=0 python make_golden_bmshj.py
"""

import sys

import numpy as np

import ref_stack

ns = ref_stack.load_layers()
tf = ns.tf

sys.path.insert(0, "../..")
from tools import port_tf_weights  # noqa: E402
from make_golden_model import synthetic_textures  # noqa: E402

NUM_FILTERS = 24
NUM_SCALES = 64
SCALE_MIN, SCALE_MAX = 0.11, 256.0
LMBDA = 0.01
STEPS = int(__import__("os").environ.get("GOLDEN_STEPS", "200"))
PATCH = 64


def conv(nf, k, name, down=0, up=0, act=None, bias=True, kernel_param="rdft"):
    kw = dict(name=name, padding="same_zeros", use_bias=bias,
              activation=act, kernel_parameter=kernel_param)
    if down:
        return ns.signal_conv.SignalConv2D(
            nf, (k, k), corr=True, strides_down=down, **kw)
    return ns.signal_conv.SignalConv2D(
        nf, (k, k), corr=False, strides_up=up, **kw)


def build_transforms():
    """models/bmshj2018.py:52-139 layer stacks."""
    analysis = [
        conv(NUM_FILTERS, 5, "layer_0", down=2,
             act=ns.gdn.GDN(name="gdn_0")),
        conv(NUM_FILTERS, 5, "layer_1", down=2,
             act=ns.gdn.GDN(name="gdn_1")),
        conv(NUM_FILTERS, 5, "layer_2", down=2,
             act=ns.gdn.GDN(name="gdn_2")),
        conv(NUM_FILTERS, 5, "layer_3", down=2),
    ]
    synthesis = [
        conv(NUM_FILTERS, 5, "layer_0", up=2,
             act=ns.gdn.GDN(name="igdn_0", inverse=True)),
        conv(NUM_FILTERS, 5, "layer_1", up=2,
             act=ns.gdn.GDN(name="igdn_1", inverse=True)),
        conv(NUM_FILTERS, 5, "layer_2", up=2,
             act=ns.gdn.GDN(name="igdn_2", inverse=True)),
        conv(3, 5, "layer_3", up=2),
    ]
    hyper_analysis = [
        conv(NUM_FILTERS, 3, "layer_0", down=1, act=tf.nn.relu),
        conv(NUM_FILTERS, 5, "layer_1", down=2, act=tf.nn.relu),
        conv(NUM_FILTERS, 5, "layer_2", down=2, bias=False),
    ]
    hyper_synthesis = [
        conv(NUM_FILTERS, 5, "layer_0", up=2, act=tf.nn.relu,
             kernel_param="variable"),
        conv(NUM_FILTERS, 5, "layer_1", up=2, act=tf.nn.relu,
             kernel_param="variable"),
        conv(NUM_FILTERS, 3, "layer_2", up=1, kernel_param="variable"),
    ]
    return analysis, synthesis, hyper_analysis, hyper_synthesis


def apply_stack(layers, x):
    for layer in layers:
        x = layer(x)
    return x


def main():
    tf.random.set_seed(0)
    rng = np.random.RandomState(0)

    analysis, synthesis, hyper_analysis, hyper_synthesis = build_transforms()
    hyperprior = ns.deep_factorized.NoisyDeepFactorized(
        batch_shape=(NUM_FILTERS,))

    offset = tf.math.log(tf.constant(SCALE_MIN))
    factor = (tf.math.log(tf.constant(SCALE_MAX))
              - tf.math.log(tf.constant(SCALE_MIN))) / (NUM_SCALES - 1.0)
    scale_fn = lambda i: tf.math.exp(offset + factor * i)  # noqa: E731

    def a_fn(x):
        return apply_stack(analysis, x / 255.0)

    def s_fn(y):
        return apply_stack(synthesis, y) * 255.0

    ha_fn = lambda y: apply_stack(hyper_analysis, y)  # noqa: E731
    hs_fn = lambda z: apply_stack(hyper_synthesis, z)  # noqa: E731

    x0 = tf.zeros((1, PATCH, PATCH, 3))
    _ = s_fn(a_fn(x0))
    _ = hs_fn(ha_fn(tf.abs(a_fn(x0))))

    variables = []
    for conv_layer in analysis + synthesis + hyper_analysis + hyper_synthesis:
        kp = conv_layer.kernel_parameter
        variables += ([kp.real, kp.imag] if hasattr(kp, "real") else [kp])
        if hasattr(conv_layer.bias_parameter, "numpy"):
            variables.append(conv_layer.bias_parameter)
        if isinstance(conv_layer.activation, ns.gdn.GDN):
            variables += [conv_layer.activation.beta_parameter.variable,
                          conv_layer.activation.gamma_parameter.variable]
    df = hyperprior.base
    variables += list(df._matrices) + list(df._biases) + list(df._factors)

    data = synthetic_textures(rng, 24, PATCH)
    opt = tf.keras.optimizers.Adam(learning_rate=1e-3)

    for step in range(STEPS):
        x = tf.constant(data[rng.choice(len(data), 4)])
        with tf.GradientTape() as tape:
            em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
                ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn,
                coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            side_em = ns.continuous_batched.ContinuousBatchedEntropyModel(
                hyperprior, coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            y = a_fn(x)
            z = ha_fn(tf.abs(y))
            z_hat, side_bits = side_em(z, training=True)
            indexes = hs_fn(z_hat)
            y_hat, bits = em(y, indexes, training=True)
            x_hat = s_fn(y_hat)
            num_pixels = tf.cast(tf.reduce_prod(tf.shape(x)[:-1]),
                                 bits.dtype)
            bpp = (tf.reduce_sum(bits) + tf.reduce_sum(side_bits)) \
                / num_pixels
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            loss = bpp + LMBDA * mse
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        if step % 50 == 0 or step == STEPS - 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"bpp {float(bpp):.4f} mse {float(mse):.1f}", flush=True)

    em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn, coding_rank=3,
        compression=True, bottleneck_dtype=tf.float32)
    side_em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        hyperprior, coding_rank=3, compression=True,
        bottleneck_dtype=tf.float32)

    out = {}
    tf_vars = port_tf_weights.extract_bmshj2018(
        analysis, synthesis, hyper_analysis, hyper_synthesis, df)
    for k, v in tf_vars.items():
        out["var__" + k.replace("/", "__")] = v
    out["num_filters"] = np.int32(NUM_FILTERS)
    out["num_scales"] = np.int32(NUM_SCALES)

    x_test = np.round(synthetic_textures(
        np.random.RandomState(77), 1, PATCH)[0]).astype(np.uint8)
    out["x_test"] = x_test

    # Reference compress graph (models/bmshj2018.py:226-246).
    x = tf.cast(tf.constant(x_test)[None], tf.float32)
    y = a_fn(x)
    z = ha_fn(tf.abs(y))
    y_shape = tf.shape(y)[1:-1]
    z_hat = side_em.quantize(z)
    indexes = hs_fn(z_hat)
    indexes = indexes[:, :y_shape[0], :y_shape[1], :]
    side_string = side_em.compress(z)
    string = em.compress(y, indexes)
    out["y"] = y.numpy()
    out["z"] = z.numpy()

    for prefix, s in (("y", string), ("z", side_string)):
        flat = [bytes(v) for v in tf.reshape(s, [-1]).numpy()]
        out[f"{prefix}_nbytes"] = np.asarray(
            [len(b) for b in flat], np.int32)
        out[f"{prefix}_bytes"] = np.frombuffer(b"".join(flat), np.uint8)

    out["cdf_y"] = em.cdf.numpy()
    out["cdf_offset_y"] = em.cdf_offset.numpy()
    out["cdf_z"] = side_em.cdf.numpy()
    out["cdf_offset_z"] = side_em.cdf_offset.numpy()
    qo = side_em.quantization_offset
    out["qoffset_z"] = (qo.numpy() if qo is not None
                        else np.zeros(NUM_FILTERS, np.float32))

    # Reference decompress graph (models/bmshj2018.py:254-266).
    z_hat_d = side_em.decompress(side_string, tf.shape(z)[1:-1])
    indexes_d = hs_fn(z_hat_d)[:, :y_shape[0], :y_shape[1], :]
    y_hat = em.decompress(string, indexes_d)
    x_hat = s_fn(y_hat)
    out["x_hat_uint8"] = tf.saturate_cast(
        tf.round(x_hat[0]), tf.uint8).numpy()

    # Full container (my codec's layout == reference CLI tensor order).
    packed = ns.packed_tensors.PackedTensors()
    packed.model = "bmshj2018"
    packed.pack([string, side_string, tf.shape(x)[1:-1],
                 y_shape, tf.shape(z)[1:-1]])
    out["container"] = np.frombuffer(packed.string, np.uint8)

    nb = int(out["y_nbytes"].sum() + out["z_nbytes"].sum())
    psnr = 10 * np.log10(255 ** 2 / np.mean(
        (x_test.astype(np.float64)
         - out["x_hat_uint8"].astype(np.float64)) ** 2))
    print(f"test image: {8 * nb / PATCH**2:.3f} bpp, {psnr:.2f} dB")
    np.savez_compressed("golden_bmshj.npz", **out)
    print("saved golden_bmshj.npz")


if __name__ == "__main__":
    main()
