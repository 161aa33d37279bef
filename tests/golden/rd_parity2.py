"""Three-family RD parity: reference-TF vs this repo, matched everything.

One invocation trains ONE (family, impl, lambda) combination on the
shared rd_corpus and writes a small JSON result; rd_merge.py combines
the partials into RD_PARITY.json with the cross-implementation deltas
and the model-ordering analysis (VERDICT r2 item 1).

Both implementations share: architecture + widths, loss (bpp +
lambda*mse on the 0-255 scale), Adam with the same two-phase lr
schedule, batch size, step count, batch ORDER (same numpy RNG), train
corpus, eval images, and real-compression evaluation (bpp from actual
string bytes; PSNR on uint8 reconstructions).  Remaining differences
are framework numerics and parameter-init draws.

Usage:
  python rd_parity2.py FAMILY IMPL LMBDA OUT.json
    FAMILY in {bls2017, bmshj2018, ms2020}; IMPL in {tf, jax}
  env: RD_STEPS (default per family), RD_BATCH (8)

The reference stack (IMPL=tf) runs the reference's own Python classes
unmodified from the read-only mount (ref_stack), on CPU.  The repo side
(IMPL=jax) runs on whatever backend JAX selects (TPU under axon).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from rd_corpus import rd_corpus  # noqa: E402

PATCH = 64

# Matched compact configs (small enough that the TF side is trainable on
# 2 CPU cores, structured exactly like the reference models).
CFG = {
    "bls2017": dict(num_filters=32),
    "bmshj2018": dict(num_filters=32, num_scales=64,
                      scale_min=0.11, scale_max=256.0),
    "ms2020": dict(num_filters=32, latent_depth=40, hyperprior_depth=16,
                   num_slices=5, max_support_slices=3, num_scales=64,
                   scale_min=0.11, scale_max=256.0,
                   ha_widths=(40, 32), hs_widths=(24, 32, 40),
                   slice_widths=(28, 16)),
}
DEFAULT_STEPS = {"bls2017": 3000, "bmshj2018": 3000, "ms2020": 2000}

# The study grid (rd_queue_*.sh / rd_merge.py): chosen after probing the
# curve ends so the corpus spans a non-degenerate PSNR range (~22-31 dB)
# instead of round 2's saturated 19.4 dB plateau.
LAMBDAS = {"bls2017": (0.0005, 0.004, 0.03, 0.25),
           "bmshj2018": (0.0005, 0.004, 0.03, 0.25),
           "ms2020": (0.004, 0.03, 0.25)}


def lr_at(step, steps):
    return 1e-3 if step < int(0.8 * steps) else 1e-4


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


# ---------------------------------------------------------------------------
# JAX (repo) side
# ---------------------------------------------------------------------------

def run_jax(family, lmbda, steps, batch):
    import jax
    import jax.numpy as jnp
    import optax

    train_data, eval_data = rd_corpus()
    cfg = CFG[family]
    if family == "bls2017":
        from compression_tpu.models import bls2017 as M
        model = M.BLS2017Model(lmbda=lmbda, **cfg)
        codec_cls = M.BLS2017Codec
        make_step = M.make_train_step
    elif family == "bmshj2018":
        from compression_tpu.models import bmshj2018 as M
        model = M.BMSHJ2018Model(lmbda=lmbda, **cfg)
        codec_cls = M.BMSHJ2018Codec
        make_step = M.make_train_step
    else:
        from compression_tpu.models import ms2020 as M
        model = M.MS2020Model(lmbda=lmbda, **cfg)
        codec_cls = M.MS2020Codec
        make_step = M.make_train_step

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, PATCH, PATCH, 3)), training=False)
    schedule = optax.join_schedules(
        [optax.constant_schedule(1e-3), optax.constant_schedule(1e-4)],
        [int(0.8 * steps)])
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)
    step_fn = make_step(model, optimizer)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(steps):
        x = jnp.asarray(train_data[rng.choice(len(train_data), batch)])
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, x, sub)
        if step % 500 == 0 or step == steps - 1:
            print(f"  [jax {family} l={lmbda}] step {step}: "
                  f"loss {float(metrics['loss']):.4f} "
                  f"bpp {float(metrics['bpp']):.4f} "
                  f"mse {float(metrics['mse']):.1f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    codec = codec_cls(model, params)
    from compression_tpu.util.packed_tensors import PackedTensors
    total_bytes, total_px, psnrs = 0, 0, []
    for img in eval_data:
        container = codec.compress(img)
        packed = PackedTensors(container)
        nb = 0
        for t in packed.unpack_raw():
            if isinstance(t, list):  # bytes features = coded strings
                nb += sum(len(s) for s in t)
        x_hat = codec.decompress(container)
        total_bytes += nb
        total_px += img.shape[0] * img.shape[1]
        psnrs.append(psnr(img, x_hat))
    return 8 * total_bytes / total_px, float(np.mean(psnrs))


# ---------------------------------------------------------------------------
# Reference (TF) side — reference classes unmodified from the mount
# ---------------------------------------------------------------------------

def _collect_vars(ns, convs, dfs):
    variables = []
    for conv_layer in convs:
        kp = conv_layer.kernel_parameter
        variables += ([kp.real, kp.imag] if hasattr(kp, "real") else [kp])
        if hasattr(conv_layer.bias_parameter, "numpy"):
            variables.append(conv_layer.bias_parameter)
        if isinstance(conv_layer.activation, ns.gdn.GDN):
            variables += [conv_layer.activation.beta_parameter.variable,
                          conv_layer.activation.gamma_parameter.variable]
    for df in dfs:
        variables += list(df._matrices) + list(df._biases) + list(df._factors)
    return variables


def _apply(layers, x):
    for layer in layers:
        x = layer(x)
    return x


def run_tf(family, lmbda, steps, batch):
    import ref_stack
    ns = ref_stack.load_layers()
    tf = ns.tf
    tf.random.set_seed(0)

    train_data, eval_data = rd_corpus()
    cfg = CFG[family]

    def conv(nf, k, name, down=0, up=0, act=None, bias=True,
             kernel_param="rdft"):
        kw = dict(name=name, padding="same_zeros", use_bias=bias,
                  activation=act, kernel_parameter=kernel_param)
        if down:
            return ns.signal_conv.SignalConv2D(
                nf, (k, k), corr=True, strides_down=down, **kw)
        return ns.signal_conv.SignalConv2D(
            nf, (k, k), corr=False, strides_up=up, **kw)

    opt = tf.keras.optimizers.Adam(learning_rate=lr_at(0, steps))
    rng = np.random.RandomState(0)
    t0 = time.time()

    def train_loop(loss_fn, variables):
        for step in range(steps):
            opt.learning_rate.assign(lr_at(step, steps))
            x = tf.constant(train_data[rng.choice(len(train_data), batch)])
            with tf.GradientTape() as tape:
                loss, bpp, mse = loss_fn(x)
            grads = tape.gradient(loss, variables)
            opt.apply_gradients(zip(grads, variables))
            if step % 500 == 0 or step == steps - 1:
                print(f"  [tf {family} l={lmbda}] step {step}: "
                      f"loss {float(loss):.4f} bpp {float(bpp):.4f} "
                      f"mse {float(mse):.1f} ({time.time()-t0:.0f}s)",
                      flush=True)

    if family == "bls2017":
        nf = cfg["num_filters"]
        analysis = [
            conv(nf, 9, "layer_0", down=4, act=ns.gdn.GDN(name="gdn_0")),
            conv(nf, 5, "layer_1", down=2, act=ns.gdn.GDN(name="gdn_1")),
            conv(nf, 5, "layer_2", down=2, bias=False),
        ]
        synthesis = [
            conv(nf, 5, "layer_0", up=2,
                 act=ns.gdn.GDN(name="igdn_0", inverse=True)),
            conv(nf, 5, "layer_1", up=2,
                 act=ns.gdn.GDN(name="igdn_1", inverse=True)),
            conv(3, 9, "layer_2", up=4),
        ]
        prior = ns.deep_factorized.NoisyDeepFactorized(batch_shape=(nf,))
        a_fn = lambda x: _apply(analysis, x / 255.0)  # noqa: E731
        s_fn = lambda y: _apply(synthesis, y) * 255.0  # noqa: E731
        _ = s_fn(a_fn(tf.zeros((1, PATCH, PATCH, 3))))
        variables = _collect_vars(ns, analysis + synthesis, [prior.base])

        def loss_fn(x):
            em = ns.continuous_batched.ContinuousBatchedEntropyModel(
                prior, coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            y = a_fn(x)
            y_hat, bits = em(y, training=True)
            x_hat = s_fn(y_hat)
            num_pixels = tf.cast(tf.reduce_prod(tf.shape(x)[:-1]),
                                 bits.dtype)
            bpp = tf.reduce_sum(bits) / num_pixels
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            return bpp + lmbda * mse, bpp, mse

        train_loop(loss_fn, variables)

        em = ns.continuous_batched.ContinuousBatchedEntropyModel(
            prior, coding_rank=3, compression=True,
            bottleneck_dtype=tf.float32)
        total_bytes, total_px, psnrs = 0, 0, []
        for img in eval_data:
            x = tf.cast(tf.constant(img)[None], tf.float32)
            y = a_fn(x)
            strings = em.compress(y)
            nb = sum(len(bytes(s))
                     for s in tf.reshape(strings, [-1]).numpy())
            y_hat = em.decompress(strings, tf.shape(y)[1:-1])
            x_hat8 = tf.saturate_cast(
                tf.round(s_fn(y_hat)[0]), tf.uint8).numpy()
            total_bytes += nb
            total_px += img.shape[0] * img.shape[1]
            psnrs.append(psnr(img, x_hat8))
        return 8 * total_bytes / total_px, float(np.mean(psnrs))

    offset = tf.math.log(tf.constant(cfg["scale_min"]))
    factor = ((tf.math.log(tf.constant(cfg["scale_max"]))
               - tf.math.log(tf.constant(cfg["scale_min"])))
              / (cfg["num_scales"] - 1.0))
    scale_fn = lambda i: tf.math.exp(offset + factor * i)  # noqa: E731

    if family == "bmshj2018":
        nf = cfg["num_filters"]
        analysis = [
            conv(nf, 5, "layer_0", down=2, act=ns.gdn.GDN(name="gdn_0")),
            conv(nf, 5, "layer_1", down=2, act=ns.gdn.GDN(name="gdn_1")),
            conv(nf, 5, "layer_2", down=2, act=ns.gdn.GDN(name="gdn_2")),
            conv(nf, 5, "layer_3", down=2),
        ]
        synthesis = [
            conv(nf, 5, "layer_0", up=2,
                 act=ns.gdn.GDN(name="igdn_0", inverse=True)),
            conv(nf, 5, "layer_1", up=2,
                 act=ns.gdn.GDN(name="igdn_1", inverse=True)),
            conv(nf, 5, "layer_2", up=2,
                 act=ns.gdn.GDN(name="igdn_2", inverse=True)),
            conv(3, 5, "layer_3", up=2),
        ]
        hyper_analysis = [
            conv(nf, 3, "layer_0", down=1, act=tf.nn.relu),
            conv(nf, 5, "layer_1", down=2, act=tf.nn.relu),
            conv(nf, 5, "layer_2", down=2, bias=False),
        ]
        hyper_synthesis = [
            conv(nf, 5, "layer_0", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(nf, 5, "layer_1", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(nf, 3, "layer_2", up=1, kernel_param="variable"),
        ]
        hyperprior = ns.deep_factorized.NoisyDeepFactorized(
            batch_shape=(nf,))
        a_fn = lambda x: _apply(analysis, x / 255.0)  # noqa: E731
        s_fn = lambda y: _apply(synthesis, y) * 255.0  # noqa: E731
        ha_fn = lambda y: _apply(hyper_analysis, y)  # noqa: E731
        hs_fn = lambda z: _apply(hyper_synthesis, z)  # noqa: E731
        x0 = tf.zeros((1, PATCH, PATCH, 3))
        _ = s_fn(a_fn(x0))
        _ = hs_fn(ha_fn(tf.abs(a_fn(x0))))
        variables = _collect_vars(
            ns, analysis + synthesis + hyper_analysis + hyper_synthesis,
            [hyperprior.base])

        def loss_fn(x):
            em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
                ns.uniform_noise.NoisyNormal, cfg["num_scales"], scale_fn,
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
            return bpp + lmbda * mse, bpp, mse

        train_loop(loss_fn, variables)

        em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
            ns.uniform_noise.NoisyNormal, cfg["num_scales"], scale_fn,
            coding_rank=3, compression=True, bottleneck_dtype=tf.float32)
        side_em = ns.continuous_batched.ContinuousBatchedEntropyModel(
            hyperprior, coding_rank=3, compression=True,
            bottleneck_dtype=tf.float32)
        total_bytes, total_px, psnrs = 0, 0, []
        for img in eval_data:
            x = tf.cast(tf.constant(img)[None], tf.float32)
            y = a_fn(x)
            z = ha_fn(tf.abs(y))
            y_shape = tf.shape(y)[1:-1]
            z_hat = side_em.quantize(z)
            indexes = hs_fn(z_hat)[:, :y_shape[0], :y_shape[1], :]
            side_string = side_em.compress(z)
            string = em.compress(y, indexes)
            nb = sum(len(bytes(s)) for s in
                     list(tf.reshape(string, [-1]).numpy())
                     + list(tf.reshape(side_string, [-1]).numpy()))
            z_hat_d = side_em.decompress(side_string, tf.shape(z)[1:-1])
            indexes_d = hs_fn(z_hat_d)[:, :y_shape[0], :y_shape[1], :]
            y_hat = em.decompress(string, indexes_d)
            x_hat8 = tf.saturate_cast(
                tf.round(s_fn(y_hat)[0]), tf.uint8).numpy()
            total_bytes += nb
            total_px += img.shape[0] * img.shape[1]
            psnrs.append(psnr(img, x_hat8))
        return 8 * total_bytes / total_px, float(np.mean(psnrs))

    # ms2020
    nf = cfg["num_filters"]
    latent, hyper = cfg["latent_depth"], cfg["hyperprior_depth"]
    nsl, msup = cfg["num_slices"], cfg["max_support_slices"]
    haw, hsw, slw = cfg["ha_widths"], cfg["hs_widths"], cfg["slice_widths"]
    analysis = [
        conv(nf, 5, "layer_0", down=2, act=ns.gdn.GDN(name="gdn_0")),
        conv(nf, 5, "layer_1", down=2, act=ns.gdn.GDN(name="gdn_1")),
        conv(nf, 5, "layer_2", down=2, act=ns.gdn.GDN(name="gdn_2")),
        conv(latent, 5, "layer_3", down=2),
    ]
    synthesis = [
        conv(nf, 5, "layer_0", up=2,
             act=ns.gdn.GDN(name="igdn_0", inverse=True)),
        conv(nf, 5, "layer_1", up=2,
             act=ns.gdn.GDN(name="igdn_1", inverse=True)),
        conv(nf, 5, "layer_2", up=2,
             act=ns.gdn.GDN(name="igdn_2", inverse=True)),
        conv(3, 5, "layer_3", up=2),
    ]
    hyper_analysis = [
        conv(haw[0], 3, "layer_0", down=1, act=tf.nn.relu),
        conv(haw[1], 5, "layer_1", down=2, act=tf.nn.relu),
        conv(hyper, 5, "layer_2", down=2, bias=False),
    ]

    def hyper_synthesis():
        return [
            conv(hsw[0], 5, "layer_0", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(hsw[1], 5, "layer_1", up=2, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(hsw[2], 3, "layer_2", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
        ]

    def slice_transform():
        return [
            conv(slw[0], 5, "layer_0", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(slw[1], 5, "layer_1", up=1, act=tf.nn.relu,
                 kernel_param="variable"),
            conv(latent // nsl, 3, "layer_2", up=1,
                 kernel_param="variable"),
        ]

    hs_mean, hs_scale = hyper_synthesis(), hyper_synthesis()
    cc_mean = [slice_transform() for _ in range(nsl)]
    cc_scale = [slice_transform() for _ in range(nsl)]
    lrp = [slice_transform() for _ in range(nsl)]
    hyperprior = ns.deep_factorized.NoisyDeepFactorized(
        batch_shape=(hyper,))
    a_fn = lambda x: _apply(analysis, x / 255.0)  # noqa: E731
    s_fn = lambda y: _apply(synthesis, y) * 255.0  # noqa: E731
    ha_fn = lambda y: _apply(hyper_analysis, y)  # noqa: E731
    hsm_fn = lambda z: _apply(hs_mean, z)  # noqa: E731
    hss_fn = lambda z: _apply(hs_scale, z)  # noqa: E731

    def slice_graph(em_y, y, latent_means, latent_scales, training,
                    strings=None):
        y_shape = tf.shape(y)[1:-1]
        y_slices = tf.split(y, nsl, axis=-1)
        y_hat_slices, out = [], []
        for i, y_slice in enumerate(y_slices):
            support = (y_hat_slices if msup < 0 else y_hat_slices[:msup])
            mean_support = tf.concat([latent_means] + support, axis=-1)
            mu = _apply(cc_mean[i], mean_support)
            mu = mu[:, :y_shape[0], :y_shape[1], :]
            scale_support = tf.concat([latent_scales] + support, axis=-1)
            sigma = _apply(cc_scale[i], scale_support)
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
            lrp_t = 0.5 * tf.math.tanh(_apply(lrp[i], lrp_support))
            y_hat_slices.append(y_hat_slice + lrp_t)
        return y_hat_slices, out

    x0 = tf.zeros((1, PATCH, PATCH, 3))
    y0 = a_fn(x0)
    z0 = ha_fn(y0)
    em0 = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, cfg["num_scales"], scale_fn,
        coding_rank=3, compression=False, bottleneck_dtype=tf.float32)
    slice_graph(em0, y0, hsm_fn(z0), hss_fn(z0), training=True)
    _ = s_fn(y0)
    variables = _collect_vars(
        ns, (analysis + synthesis + hyper_analysis + hs_mean + hs_scale
             + [c for st in cc_mean + cc_scale + lrp for c in st]),
        [hyperprior.base])

    def loss_fn(x):
        em_y = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
            ns.uniform_noise.NoisyNormal, cfg["num_scales"], scale_fn,
            coding_rank=3, compression=False, bottleneck_dtype=tf.float32)
        em_z = ns.continuous_batched.ContinuousBatchedEntropyModel(
            hyperprior, coding_rank=3, compression=False,
            offset_heuristic=False, bottleneck_dtype=tf.float32)
        y = a_fn(x)
        z = ha_fn(y)
        _, z_bits = em_z(z, training=True)
        z_hat = em_z.quantize(z)
        y_hat_slices, y_bits = slice_graph(
            em_y, y, hsm_fn(z_hat), hss_fn(z_hat), training=True)
        x_hat = s_fn(tf.concat(y_hat_slices, axis=-1))
        num_pixels = tf.cast(
            tf.reduce_prod(tf.shape(x)[1:-1]), tf.float32)
        bpp = (tf.add_n([tf.reduce_sum(b) for b in y_bits])
               + tf.reduce_sum(z_bits)) / (
                   num_pixels * tf.cast(tf.shape(x)[0], tf.float32))
        mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
        return bpp + lmbda * mse, bpp, mse

    train_loop(loss_fn, variables)

    em_y = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, cfg["num_scales"], scale_fn,
        coding_rank=3, compression=True, bottleneck_dtype=tf.float32)
    em_z = ns.continuous_batched.ContinuousBatchedEntropyModel(
        hyperprior, coding_rank=3, compression=True,
        offset_heuristic=False, bottleneck_dtype=tf.float32)
    total_bytes, total_px, psnrs = 0, 0, []
    for img in eval_data:
        x = tf.cast(tf.constant(img)[None], tf.float32)
        y = a_fn(x)
        z = ha_fn(y)
        z_shape = tf.shape(z)[1:-1]
        z_string = em_z.compress(z)
        z_hat = em_z.decompress(z_string, z_shape)
        _, y_strings = slice_graph(
            em_y, y, hsm_fn(z_hat), hss_fn(z_hat), training=False)
        nb = sum(len(bytes(v)) for v in
                 tf.reshape(z_string, [-1]).numpy())
        for s in y_strings:
            nb += sum(len(bytes(v)) for v in tf.reshape(s, [-1]).numpy())
        y_hat_slices, _ = slice_graph(
            em_y, y, hsm_fn(z_hat), hss_fn(z_hat), training=False,
            strings=y_strings)
        x_hat8 = tf.saturate_cast(
            tf.round(s_fn(tf.concat(y_hat_slices, axis=-1))[0]),
            tf.uint8).numpy()
        total_bytes += nb
        total_px += img.shape[0] * img.shape[1]
        psnrs.append(psnr(img, x_hat8))
    return 8 * total_bytes / total_px, float(np.mean(psnrs))


def main():
    family, impl, lmbda, out_path = (
        sys.argv[1], sys.argv[2], float(sys.argv[3]), sys.argv[4])
    steps = int(os.environ.get("RD_STEPS", DEFAULT_STEPS[family]))
    batch = int(os.environ.get("RD_BATCH", "8"))
    t0 = time.time()
    if impl == "jax":
        bpp, db = run_jax(family, lmbda, steps, batch)
    else:
        bpp, db = run_tf(family, lmbda, steps, batch)
    result = {"family": family, "impl": impl, "lmbda": lmbda,
              "steps": steps, "batch": batch, "patch": PATCH,
              "bpp": round(bpp, 4), "psnr_db": round(db, 3),
              "wall_s": round(time.time() - t0, 1)}
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
