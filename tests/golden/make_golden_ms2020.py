"""Model-level golden fixture for the CHANNEL-AUTOREGRESSIVE family: a
briefly-trained reference ms2020, exported for cross-implementation
decode + weight-porting tests (the third model family after bls2017 and
bmshj2018).

Builds the reference ms2020 transforms exactly as models/ms2020.py:54-161
does (reference SignalConv2D/GDN classes from the mount; hyper-synthesis
and slice-transform kernels stored as plain variables per the reference),
trains briefly with the reference loss (the 10-slice channel-conditional
loop with LRP, models/ms2020.py:201-285), then compresses a test image
through the reference entropy models and container layout
((x_shape, y_shape, z_shape, z_string) + y_strings;
models/ms2020.py:332-388).

A compact width configuration keeps the fixture small; the layer
structure (stacks, strides, supports, activations, kernel
parameterizations) is exactly the reference's.

Usage: TF_ENABLE_ONEDNN_OPTS=0 python make_golden_ms2020.py
"""

import sys

import numpy as np

import ref_stack

ns = ref_stack.load_layers()
tf = ns.tf

sys.path.insert(0, "../..")
from tools import port_tf_weights  # noqa: E402
from make_golden_model import synthetic_textures  # noqa: E402

NUM_FILTERS = 16
LATENT_DEPTH = 20
HYPER_DEPTH = 8
NUM_SLICES = 5
MAX_SUPPORT = 3
NUM_SCALES = 64
SCALE_MIN, SCALE_MAX = 0.11, 256.0
HA_WIDTHS = (32, 24)
HS_WIDTHS = (16, 24, 32)
SLICE_WIDTHS = (24, 16)
LMBDA = 0.01
STEPS = int(__import__("os").environ.get("GOLDEN_STEPS", "120"))
PATCH = 64


def conv(nf, k, name, down=0, up=0, act=None, bias=True,
         kernel_param="rdft"):
    kw = dict(name=name, padding="same_zeros", use_bias=bias,
              activation=act, kernel_parameter=kernel_param)
    if down:
        return ns.signal_conv.SignalConv2D(
            nf, (k, k), corr=True, strides_down=down, **kw)
    return ns.signal_conv.SignalConv2D(
        nf, (k, k), corr=False, strides_up=up, **kw)


def build_transforms():
    """models/ms2020.py:54-161 layer stacks (compact widths)."""
    analysis = [
        conv(NUM_FILTERS, 5, "layer_0", down=2,
             act=ns.gdn.GDN(name="gdn_0")),
        conv(NUM_FILTERS, 5, "layer_1", down=2,
             act=ns.gdn.GDN(name="gdn_1")),
        conv(NUM_FILTERS, 5, "layer_2", down=2,
             act=ns.gdn.GDN(name="gdn_2")),
        conv(LATENT_DEPTH, 5, "layer_3", down=2),
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
        conv(HA_WIDTHS[0], 3, "layer_0", down=1, act=tf.nn.relu),
        conv(HA_WIDTHS[1], 5, "layer_1", down=2, act=tf.nn.relu),
        conv(HYPER_DEPTH, 5, "layer_2", down=2, bias=False),
    ]

    def hyper_synthesis():
        return [
            conv(HS_WIDTHS[0], 5, "layer_0", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(HS_WIDTHS[1], 5, "layer_1", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(HS_WIDTHS[2], 3, "layer_2", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
        ]

    def slice_transform():
        return [
            conv(SLICE_WIDTHS[0], 5, "layer_0", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(SLICE_WIDTHS[1], 5, "layer_1", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(LATENT_DEPTH // NUM_SLICES, 3, "layer_2", up=1,
                 kernel_param="variable"),
        ]

    return (analysis, synthesis, hyper_analysis,
            hyper_synthesis(), hyper_synthesis(),
            [slice_transform() for _ in range(NUM_SLICES)],
            [slice_transform() for _ in range(NUM_SLICES)],
            [slice_transform() for _ in range(NUM_SLICES)])


def apply_stack(layers, x):
    for layer in layers:
        x = layer(x)
    return x


def main():
    tf.random.set_seed(0)
    rng = np.random.RandomState(0)

    (analysis, synthesis, hyper_analysis, hs_mean, hs_scale,
     cc_mean, cc_scale, lrp) = build_transforms()
    hyperprior = ns.deep_factorized.NoisyDeepFactorized(
        batch_shape=(HYPER_DEPTH,))

    offset = tf.math.log(tf.constant(SCALE_MIN))
    factor = (tf.math.log(tf.constant(SCALE_MAX))
              - tf.math.log(tf.constant(SCALE_MIN))) / (NUM_SCALES - 1.0)
    scale_fn = lambda i: tf.math.exp(offset + factor * i)  # noqa: E731

    def a_fn(x):
        return apply_stack(analysis, x / 255.0)

    def s_fn(y):
        return apply_stack(synthesis, y) * 255.0

    ha_fn = lambda y: apply_stack(hyper_analysis, y)  # noqa: E731
    hsm_fn = lambda z: apply_stack(hs_mean, z)  # noqa: E731
    hss_fn = lambda z: apply_stack(hs_scale, z)  # noqa: E731

    def slice_graph(em_y, y, latent_means, latent_scales, training,
                    strings=None):
        """The reference slice loop (models/ms2020.py:238-270 /
        :358-388): returns (y_hat_slices, bits_list or strings_list)."""
        y_shape = tf.shape(y)[1:-1]
        y_slices = tf.split(y, NUM_SLICES, axis=-1)
        y_hat_slices = []
        out = []
        for i, y_slice in enumerate(y_slices):
            support = (y_hat_slices if MAX_SUPPORT < 0
                       else y_hat_slices[:MAX_SUPPORT])
            mean_support = tf.concat([latent_means] + support, axis=-1)
            mu = apply_stack(cc_mean[i], mean_support)
            mu = mu[:, :y_shape[0], :y_shape[1], :]
            scale_support = tf.concat([latent_scales] + support, axis=-1)
            sigma = apply_stack(cc_scale[i], scale_support)
            sigma = sigma[:, :y_shape[0], :y_shape[1], :]

            if training:
                _, bits = em_y(y_slice, sigma, loc=mu, training=True)
                out.append(bits)
                y_hat_slice = em_y.quantize(y_slice, loc=mu)
            elif strings is None:
                s = em_y.compress(y_slice, sigma, mu)
                out.append(s)
                y_hat_slice = em_y.decompress(s, sigma, loc=mu)
            else:
                y_hat_slice = em_y.decompress(strings[i], sigma, loc=mu)

            lrp_support = tf.concat([mean_support, y_hat_slice], axis=-1)
            lrp_t = 0.5 * tf.math.tanh(apply_stack(lrp[i], lrp_support))
            y_hat_slices.append(y_hat_slice + lrp_t)
        return y_hat_slices, out

    # Build all layers once.
    x0 = tf.zeros((1, PATCH, PATCH, 3))
    y0 = a_fn(x0)
    z0 = ha_fn(y0)
    lm0, ls0 = hsm_fn(z0), hss_fn(z0)
    em0 = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn,
        coding_rank=3, compression=False, bottleneck_dtype=tf.float32)
    slice_graph(em0, y0, lm0, ls0, training=True)
    _ = s_fn(y0)

    variables = []
    all_convs = (analysis + synthesis + hyper_analysis + hs_mean + hs_scale
                 + [c for st in cc_mean + cc_scale + lrp for c in st])
    for conv_layer in all_convs:
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
        x = tf.constant(data[rng.choice(len(data), 2)])
        with tf.GradientTape() as tape:
            em_y = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
                ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn,
                coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            em_z = ns.continuous_batched.ContinuousBatchedEntropyModel(
                hyperprior, coding_rank=3, compression=False,
                offset_heuristic=False, bottleneck_dtype=tf.float32)
            y = a_fn(x)
            z = ha_fn(y)
            _, z_bits = em_z(z, training=True)
            z_hat = em_z.quantize(z)
            latent_means = hsm_fn(z_hat)
            latent_scales = hss_fn(z_hat)
            y_hat_slices, y_bits = slice_graph(
                em_y, y, latent_means, latent_scales, training=True)
            x_hat = s_fn(tf.concat(y_hat_slices, axis=-1))
            num_pixels = tf.cast(tf.reduce_prod(tf.shape(x)[1:-1]),
                                 tf.float32)
            bpp = (tf.add_n([tf.reduce_sum(b) for b in y_bits])
                   + tf.reduce_sum(z_bits)) / (
                       num_pixels * tf.cast(tf.shape(x)[0], tf.float32))
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            loss = bpp + LMBDA * mse
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        if step % 40 == 0 or step == STEPS - 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"bpp {float(bpp):.4f} mse {float(mse):.1f}", flush=True)

    em_y = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn, coding_rank=3,
        compression=True, bottleneck_dtype=tf.float32)
    em_z = ns.continuous_batched.ContinuousBatchedEntropyModel(
        hyperprior, coding_rank=3, compression=True,
        offset_heuristic=False, bottleneck_dtype=tf.float32)

    out = {}
    tf_vars = port_tf_weights.extract_ms2020(
        analysis, synthesis, hyper_analysis, hs_mean, hs_scale,
        cc_mean, cc_scale, lrp, df)
    for k, v in tf_vars.items():
        out["var__" + k.replace("/", "__")] = v
    out["num_filters"] = np.int32(NUM_FILTERS)
    out["latent_depth"] = np.int32(LATENT_DEPTH)
    out["hyperprior_depth"] = np.int32(HYPER_DEPTH)
    out["num_slices"] = np.int32(NUM_SLICES)
    out["max_support_slices"] = np.int32(MAX_SUPPORT)
    out["num_scales"] = np.int32(NUM_SCALES)
    out["ha_widths"] = np.asarray(HA_WIDTHS, np.int32)
    out["hs_widths"] = np.asarray(HS_WIDTHS, np.int32)
    out["slice_widths"] = np.asarray(SLICE_WIDTHS, np.int32)

    x_test = np.round(synthetic_textures(
        np.random.RandomState(77), 1, PATCH)[0]).astype(np.uint8)
    out["x_test"] = x_test

    # Reference compress graph (models/ms2020.py:332-388).
    x = tf.cast(tf.constant(x_test)[None], tf.float32)
    y = a_fn(x)
    z = ha_fn(y)
    z_shape = tf.shape(z)[1:-1]
    z_string = em_z.compress(z)
    z_hat = em_z.decompress(z_string, z_shape)
    latent_means = hsm_fn(z_hat)
    latent_scales = hss_fn(z_hat)
    _, y_strings = slice_graph(em_y, y, latent_means, latent_scales,
                               training=False)
    out["y"] = y.numpy()
    out["z"] = z.numpy()

    flat_z = [bytes(v) for v in tf.reshape(z_string, [-1]).numpy()]
    out["z_nbytes"] = np.asarray([len(b) for b in flat_z], np.int32)
    out["z_bytes"] = np.frombuffer(b"".join(flat_z), np.uint8)
    flat_y = [bytes(tf.reshape(s, [-1]).numpy()[0]) for s in y_strings]
    out["y_nbytes"] = np.asarray([len(b) for b in flat_y], np.int32)
    out["y_bytes"] = np.frombuffer(b"".join(flat_y), np.uint8)

    out["cdf_y"] = em_y.cdf.numpy()
    out["cdf_offset_y"] = em_y.cdf_offset.numpy()
    out["cdf_z"] = em_z.cdf.numpy()
    out["cdf_offset_z"] = em_z.cdf_offset.numpy()

    # Reference decompress graph (models/ms2020.py:391-434).
    z_hat_d = em_z.decompress(z_string, z_shape)
    latent_means_d = hsm_fn(z_hat_d)
    latent_scales_d = hss_fn(z_hat_d)
    y_hat_slices, _ = slice_graph(em_y, y, latent_means_d, latent_scales_d,
                                  training=False, strings=y_strings)
    x_hat = s_fn(tf.concat(y_hat_slices, axis=-1))
    out["x_hat_uint8"] = tf.saturate_cast(
        tf.round(x_hat[0]), tf.uint8).numpy()

    # Full container (reference CLI tensor order, models/ms2020.py:492).
    packed = ns.packed_tensors.PackedTensors()
    packed.model = "ms2020"
    packed.pack([tf.shape(x)[1:-1], tf.shape(y)[1:-1], z_shape, z_string]
                + list(y_strings))
    out["container"] = np.frombuffer(packed.string, np.uint8)

    nb = int(out["y_nbytes"].sum() + out["z_nbytes"].sum())
    psnr = 10 * np.log10(255 ** 2 / np.mean(
        (x_test.astype(np.float64)
         - out["x_hat_uint8"].astype(np.float64)) ** 2))
    print(f"test image: {8 * nb / PATCH**2:.3f} bpp, {psnr:.2f} dB")
    np.savez_compressed("golden_ms2020.npz", **out)
    print("saved golden_ms2020.npz")


if __name__ == "__main__":
    main()
