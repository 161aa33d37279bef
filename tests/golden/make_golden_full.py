"""FULL-SCALE model golden fixtures: bmshj2018 at 192 filters and
ms2020 at the paper config (10 slices / latent 320 / 192 filters /
hyper 192), VERDICT r2 item 3.

The small-config fixtures (make_golden_bmshj.py / make_golden_ms2020.py)
prove the mechanics; these prove the SHAPES — slice width schedule,
hyper widths, support concatenation orders — at the reference's real
scale (/root/reference/models/ms2020.py:137-160, models/bmshj2018.py
transforms).  Weights are NOT trained: at paper scale the slice
transforms alone are ~420 MB, too large to commit, and the test target
is shape/width correctness, not rate-distortion.  Instead every
variable is assigned a value that is a pure function of its port name
and shape (tests/golden/synth_weights.py); the JAX side regenerates the
identical weights and the npz stores only tables, strings, latents, the
test image and per-variable digests (a few hundred KB).

Usage: TF_ENABLE_ONEDNN_OPTS=0 python make_golden_full.py
"""

import json
import sys

import numpy as np

import ref_stack
import synth_weights
from rd_corpus import rd_images

ns = ref_stack.load_layers()
tf = ns.tf

sys.path.insert(0, "../..")

PATCH = 128


def conv(nf, k, name, down=0, up=0, act=None, bias=True,
         kernel_param="rdft"):
    kw = dict(name=name, padding="same_zeros", use_bias=bias,
              activation=act, kernel_parameter=kernel_param)
    if down:
        return ns.signal_conv.SignalConv2D(
            nf, (k, k), corr=True, strides_down=down, **kw)
    return ns.signal_conv.SignalConv2D(
        nf, (k, k), corr=False, strides_up=up, **kw)


def apply_stack(layers, x):
    for layer in layers:
        x = layer(x)
    return x


MANIFEST = {}


def assign_conv_stack(side, convs, gdn_name=None):
    """Mirror of port_tf_weights.extract_conv_stack's naming, assigning
    synthesized values instead of reading."""
    def put(name, var):
        val = synth_weights.synth(name, var.shape)
        var.assign(val)
        MANIFEST[name] = (tuple(int(s) for s in var.shape),
                          synth_weights.digest(val))

    for i, c in enumerate(convs):
        kp = c.kernel_parameter
        if hasattr(kp, "real"):
            put(f"{side}/layer_{i}/rdft_real", kp.real)
            put(f"{side}/layer_{i}/rdft_imag", kp.imag)
        else:
            put(f"{side}/layer_{i}/kernel", kp)
        bp = getattr(c, "bias_parameter", None)
        if bp is not None and hasattr(bp, "numpy"):
            put(f"{side}/layer_{i}/bias", bp)
    if gdn_name is not None:
        gdns = [c.activation for c in convs
                if hasattr(c.activation, "beta_parameter")]
        for i, g in enumerate(gdns):
            put(f"{side}/{gdn_name}_{i}/beta", g.beta_parameter.variable)
            put(f"{side}/{gdn_name}_{i}/gamma", g.gamma_parameter.variable)


def assign_prior(df):
    def put(name, var):
        val = synth_weights.synth(name, var.shape)
        var.assign(val)
        MANIFEST[name] = (tuple(int(s) for s in var.shape),
                          synth_weights.digest(val))
    for i, m in enumerate(df._matrices):
        put(f"prior/matrix_{i}", m)
    for i, b in enumerate(df._biases):
        put(f"prior/bias_{i}", b)
    for i, f in enumerate(df._factors):
        put(f"prior/factor_{i}", f)


def save_strings(out, prefix, strings_list):
    flat = [bytes(s) for s in strings_list]
    out[f"{prefix}_nbytes"] = np.asarray([len(b) for b in flat], np.int32)
    out[f"{prefix}_bytes"] = np.frombuffer(b"".join(flat), np.uint8)


def scale_fn_for(num_scales, lo=0.11, hi=256.0):
    offset = tf.math.log(tf.constant(lo))
    factor = (tf.math.log(tf.constant(hi))
              - tf.math.log(tf.constant(lo))) / (num_scales - 1.0)
    return lambda i: tf.math.exp(offset + factor * i)


def x_test_image():
    return np.round(rd_images(
        np.random.RandomState(77), 1, PATCH)[0]).astype(np.uint8)


def build_bmshj_full():
    """bmshj2018 at the reference CLI default width (192 filters)."""
    MANIFEST.clear()
    NF, NUM_SCALES = 192, 64
    analysis = [
        conv(NF, 5, "layer_0", down=2, act=ns.gdn.GDN(name="gdn_0")),
        conv(NF, 5, "layer_1", down=2, act=ns.gdn.GDN(name="gdn_1")),
        conv(NF, 5, "layer_2", down=2, act=ns.gdn.GDN(name="gdn_2")),
        conv(NF, 5, "layer_3", down=2),
    ]
    synthesis = [
        conv(NF, 5, "layer_0", up=2,
             act=ns.gdn.GDN(name="igdn_0", inverse=True)),
        conv(NF, 5, "layer_1", up=2,
             act=ns.gdn.GDN(name="igdn_1", inverse=True)),
        conv(NF, 5, "layer_2", up=2,
             act=ns.gdn.GDN(name="igdn_2", inverse=True)),
        conv(3, 5, "layer_3", up=2),
    ]
    hyper_analysis = [
        conv(NF, 3, "layer_0", down=1, act=tf.nn.relu),
        conv(NF, 5, "layer_1", down=2, act=tf.nn.relu),
        conv(NF, 5, "layer_2", down=2, bias=False),
    ]
    hyper_synthesis = [
        conv(NF, 5, "layer_0", up=2, act=tf.nn.relu,
             kernel_param="variable"),
        conv(NF, 5, "layer_1", up=2, act=tf.nn.relu,
             kernel_param="variable"),
        conv(NF, 3, "layer_2", up=1, kernel_param="variable"),
    ]
    hyperprior = ns.deep_factorized.NoisyDeepFactorized(batch_shape=(NF,))

    a_fn = lambda x: apply_stack(analysis, x / 255.0)  # noqa: E731
    s_fn = lambda y: apply_stack(synthesis, y) * 255.0  # noqa: E731
    ha_fn = lambda y: apply_stack(hyper_analysis, y)  # noqa: E731
    hs_fn = lambda z: apply_stack(hyper_synthesis, z)  # noqa: E731

    x0 = tf.zeros((1, PATCH, PATCH, 3))
    _ = s_fn(a_fn(x0))
    _ = hs_fn(ha_fn(tf.abs(a_fn(x0))))

    assign_conv_stack("analysis", analysis, "gdn")
    assign_conv_stack("synthesis", synthesis, "igdn")
    assign_conv_stack("hyper_analysis", hyper_analysis)
    assign_conv_stack("hyper_synthesis", hyper_synthesis)
    assign_prior(hyperprior.base)

    scale_fn = scale_fn_for(NUM_SCALES)
    em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn, coding_rank=3,
        compression=True, bottleneck_dtype=tf.float32)
    side_em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        hyperprior, coding_rank=3, compression=True,
        bottleneck_dtype=tf.float32)

    out = {"num_filters": np.int32(NF), "num_scales": np.int32(NUM_SCALES),
           "manifest": np.frombuffer(
               json.dumps(MANIFEST).encode(), np.uint8)}
    x_test = x_test_image()
    out["x_test"] = x_test

    x = tf.cast(tf.constant(x_test)[None], tf.float32)
    y = a_fn(x)
    z = ha_fn(tf.abs(y))
    y_shape = tf.shape(y)[1:-1]
    z_hat = side_em.quantize(z)
    indexes = hs_fn(z_hat)[:, :y_shape[0], :y_shape[1], :]
    side_string = side_em.compress(z)
    string = em.compress(y, indexes)
    out["y"] = y.numpy()
    out["z"] = z.numpy()
    save_strings(out, "y",
                 [bytes(v) for v in tf.reshape(string, [-1]).numpy()])
    save_strings(out, "z",
                 [bytes(v) for v in tf.reshape(side_string, [-1]).numpy()])
    out["cdf_y"] = em.cdf.numpy()
    out["cdf_offset_y"] = em.cdf_offset.numpy()
    out["cdf_z"] = side_em.cdf.numpy()
    out["cdf_offset_z"] = side_em.cdf_offset.numpy()

    z_hat_d = side_em.decompress(side_string, tf.shape(z)[1:-1])
    indexes_d = hs_fn(z_hat_d)[:, :y_shape[0], :y_shape[1], :]
    y_hat = em.decompress(string, indexes_d)
    x_hat = s_fn(y_hat)
    out["x_hat_uint8"] = tf.saturate_cast(
        tf.round(x_hat[0]), tf.uint8).numpy()

    packed = ns.packed_tensors.PackedTensors()
    packed.model = "bmshj2018"
    packed.pack([string, side_string, tf.shape(x)[1:-1], y_shape,
                 tf.shape(z)[1:-1]])
    out["container"] = np.frombuffer(packed.string, np.uint8)
    nb = int(out["y_nbytes"].sum() + out["z_nbytes"].sum())
    print(f"bmshj-full: y {y.shape} z {z.shape} "
          f"{8*nb/PATCH**2:.3f} bpp, cdf_y {em.cdf.shape}")
    np.savez_compressed("golden_bmshj_full.npz", **out)
    print("saved golden_bmshj_full.npz")


def build_ms2020_full():
    """ms2020 at the paper config (models/ms2020.py:137-160 constants)."""
    MANIFEST.clear()
    NF, LATENT, HYPER = 192, 320, 192
    NSL, MSUP, NUM_SCALES = 10, 5, 64
    HAW, HSW, SLW = (320, 256), (192, 256, 320), (224, 128)

    analysis = [
        conv(NF, 5, "layer_0", down=2, act=ns.gdn.GDN(name="gdn_0")),
        conv(NF, 5, "layer_1", down=2, act=ns.gdn.GDN(name="gdn_1")),
        conv(NF, 5, "layer_2", down=2, act=ns.gdn.GDN(name="gdn_2")),
        conv(LATENT, 5, "layer_3", down=2),
    ]
    synthesis = [
        conv(NF, 5, "layer_0", up=2,
             act=ns.gdn.GDN(name="igdn_0", inverse=True)),
        conv(NF, 5, "layer_1", up=2,
             act=ns.gdn.GDN(name="igdn_1", inverse=True)),
        conv(NF, 5, "layer_2", up=2,
             act=ns.gdn.GDN(name="igdn_2", inverse=True)),
        conv(3, 5, "layer_3", up=2),
    ]
    hyper_analysis = [
        conv(HAW[0], 3, "layer_0", down=1, act=tf.nn.relu),
        conv(HAW[1], 5, "layer_1", down=2, act=tf.nn.relu),
        conv(HYPER, 5, "layer_2", down=2, bias=False),
    ]

    def hyper_synthesis():
        return [
            conv(HSW[0], 5, "layer_0", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(HSW[1], 5, "layer_1", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(HSW[2], 3, "layer_2", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
        ]

    def slice_transform():
        return [
            conv(SLW[0], 5, "layer_0", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(SLW[1], 5, "layer_1", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(LATENT // NSL, 3, "layer_2", up=1,
                 kernel_param="variable"),
        ]

    hs_mean, hs_scale = hyper_synthesis(), hyper_synthesis()
    cc_mean = [slice_transform() for _ in range(NSL)]
    cc_scale = [slice_transform() for _ in range(NSL)]
    lrp = [slice_transform() for _ in range(NSL)]
    hyperprior = ns.deep_factorized.NoisyDeepFactorized(
        batch_shape=(HYPER,))

    a_fn = lambda x: apply_stack(analysis, x / 255.0)  # noqa: E731
    s_fn = lambda y: apply_stack(synthesis, y) * 255.0  # noqa: E731
    ha_fn = lambda y: apply_stack(hyper_analysis, y)  # noqa: E731
    hsm_fn = lambda z: apply_stack(hs_mean, z)  # noqa: E731
    hss_fn = lambda z: apply_stack(hs_scale, z)  # noqa: E731

    scale_fn = scale_fn_for(NUM_SCALES)

    def slice_graph(em_y, y, latent_means, latent_scales, strings=None):
        """Reference compress/decompress slice loop
        (models/ms2020.py:358-430)."""
        y_shape = tf.shape(y)[1:-1]
        y_slices = tf.split(y, NSL, axis=-1)
        y_hat_slices, out_strings = [], []
        for i, y_slice in enumerate(y_slices):
            support = y_hat_slices[:MSUP]
            mean_support = tf.concat([latent_means] + support, axis=-1)
            mu = apply_stack(cc_mean[i], mean_support)
            mu = mu[:, :y_shape[0], :y_shape[1], :]
            scale_support = tf.concat([latent_scales] + support, axis=-1)
            sigma = apply_stack(cc_scale[i], scale_support)
            sigma = sigma[:, :y_shape[0], :y_shape[1], :]
            if strings is None:
                s = em_y.compress(y_slice, sigma, mu)
                out_strings.append(s)
                y_hat_slice = em_y.decompress(s, sigma, loc=mu)
            else:
                y_hat_slice = em_y.decompress(strings[i], sigma, loc=mu)
            lrp_support = tf.concat([mean_support, y_hat_slice], axis=-1)
            lrp_t = 0.5 * tf.math.tanh(apply_stack(lrp[i], lrp_support))
            y_hat_slices.append(y_hat_slice + lrp_t)
        return y_hat_slices, out_strings

    x0 = tf.zeros((1, PATCH, PATCH, 3))
    y0 = a_fn(x0)
    z0 = ha_fn(y0)
    em0 = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn, coding_rank=3,
        compression=False, bottleneck_dtype=tf.float32)
    lm0, ls0 = hsm_fn(z0), hss_fn(z0)
    # Build all slice/lrp layers (quantize path, no coder).
    y_shape0 = tf.shape(y0)[1:-1]
    y_slices0 = tf.split(y0, NSL, axis=-1)
    acc = []
    for i, ysl in enumerate(y_slices0):
        sup = acc[:MSUP]
        ms = tf.concat([lm0] + sup, axis=-1)
        mu = apply_stack(cc_mean[i], ms)[:, :y_shape0[0], :y_shape0[1], :]
        ss = tf.concat([ls0] + sup, axis=-1)
        _ = apply_stack(cc_scale[i], ss)
        yh = em0.quantize(ysl, loc=mu)
        lsup = tf.concat([ms, yh], axis=-1)
        acc.append(yh + 0.5 * tf.math.tanh(apply_stack(lrp[i], lsup)))
    _ = s_fn(y0)

    assign_conv_stack("analysis", analysis, "gdn")
    assign_conv_stack("synthesis", synthesis, "igdn")
    assign_conv_stack("hyper_analysis", hyper_analysis)
    assign_conv_stack("hyper_synthesis_mean", hs_mean)
    assign_conv_stack("hyper_synthesis_scale", hs_scale)
    for grp, stacks in (("cc_mean", cc_mean), ("cc_scale", cc_scale),
                        ("lrp", lrp)):
        for s, convs in enumerate(stacks):
            assign_conv_stack(f"{grp}_{s}", convs)
    assign_prior(hyperprior.base)

    em_y = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, NUM_SCALES, scale_fn, coding_rank=3,
        compression=True, bottleneck_dtype=tf.float32)
    em_z = ns.continuous_batched.ContinuousBatchedEntropyModel(
        hyperprior, coding_rank=3, compression=True,
        offset_heuristic=False, bottleneck_dtype=tf.float32)

    out = {
        "num_filters": np.int32(NF), "latent_depth": np.int32(LATENT),
        "hyperprior_depth": np.int32(HYPER), "num_slices": np.int32(NSL),
        "max_support_slices": np.int32(MSUP),
        "num_scales": np.int32(NUM_SCALES),
        "ha_widths": np.asarray(HAW, np.int32),
        "hs_widths": np.asarray(HSW, np.int32),
        "slice_widths": np.asarray(SLW, np.int32),
        "manifest": np.frombuffer(json.dumps(MANIFEST).encode(), np.uint8),
    }
    x_test = x_test_image()
    out["x_test"] = x_test

    x = tf.cast(tf.constant(x_test)[None], tf.float32)
    y = a_fn(x)
    z = ha_fn(y)
    z_shape = tf.shape(z)[1:-1]
    z_string = em_z.compress(z)
    z_hat = em_z.decompress(z_string, z_shape)
    latent_means, latent_scales = hsm_fn(z_hat), hss_fn(z_hat)
    _, y_strings = slice_graph(em_y, y, latent_means, latent_scales)
    out["y"] = y.numpy()
    out["z"] = z.numpy()
    save_strings(out, "z",
                 [bytes(v) for v in tf.reshape(z_string, [-1]).numpy()])
    save_strings(out, "y",
                 [bytes(tf.reshape(s, [-1]).numpy()[0]) for s in y_strings])
    out["cdf_y"] = em_y.cdf.numpy()
    out["cdf_offset_y"] = em_y.cdf_offset.numpy()
    out["cdf_z"] = em_z.cdf.numpy()
    out["cdf_offset_z"] = em_z.cdf_offset.numpy()

    y_hat_slices, _ = slice_graph(em_y, y, latent_means, latent_scales,
                                  strings=y_strings)
    x_hat = s_fn(tf.concat(y_hat_slices, axis=-1))
    out["x_hat_uint8"] = tf.saturate_cast(
        tf.round(x_hat[0]), tf.uint8).numpy()

    packed = ns.packed_tensors.PackedTensors()
    packed.model = "ms2020"
    packed.pack([tf.shape(x)[1:-1], tf.shape(y)[1:-1], z_shape, z_string]
                + list(y_strings))
    out["container"] = np.frombuffer(packed.string, np.uint8)
    nb = int(out["y_nbytes"].sum() + out["z_nbytes"].sum())
    print(f"ms2020-full: y {y.shape} z {z.shape} "
          f"{8*nb/PATCH**2:.3f} bpp, cdf_y {em_y.cdf.shape}")
    np.savez_compressed("golden_ms2020_full.npz", **out)
    print("saved golden_ms2020_full.npz")


if __name__ == "__main__":
    tf.random.set_seed(0)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "bmshj"):
        build_bmshj_full()
    if which in ("both", "ms2020"):
        build_ms2020_full()
