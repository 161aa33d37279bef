"""Reference-stack model-level baseline: wall-clock compress/decompress
of the three families on THIS host (VERDICT r3 item 3).

Runs the reference's own Python classes (SignalConv/GDN/entropy models,
tests/golden/ref_stack.py loads them unmodified from the read-only
mount) with the reference C++ coder ops, at the same configs and image
protocol as tools/model_bench.py (random-init weights seed-equivalent,
512x512 uint8 image, median of N wall-clock runs after warm-up).  TF
executes EAGERLY (the reference layers do not trace under tf.function
on this image's Keras 3 — the same mode the RD parity study ran them
in) on CPU — the only backend the reference supports here (its
coding ops are CPU-only by design, REGISTER_KERNEL_BUILDER DEVICE_CPU;
SURVEY.md §2.13) — so this is the honest "what a reference user gets on
this machine" denominator next to the repo's TPU paths.

Writes docs/ref_model_baseline.json; bench.py merges it into the
model rows as `ref_model_ms`.

Model structure mirrored from /root/reference/models/bls2017.py:55-190,
bmshj2018.py:50-265, ms2020.py:96-430.
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, os.path.join(_REPO, "tests", "golden"))
sys.path.insert(0, _REPO)

SIZE = int(os.environ.get("REF_BENCH_SIZE", "512"))
REPEATS = int(os.environ.get("REF_BENCH_REPEATS", "3"))


def _apply(layers, x):
    for lyr in layers:
        x = lyr(x)
    return x


def _median_spread(fn, repeats=REPEATS):
    fn()  # warm-up (builds graphs/caches)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return {"median_ms": round(float(np.median(ts)) * 1e3, 2),
            "min_ms": round(float(ts.min()) * 1e3, 2),
            "max_ms": round(float(ts.max()) * 1e3, 2)}


def bench_bls2017(ns, tf, x):
    nf = 128

    def conv(args, **kw):
        return ns.signal_conv.SignalConv2D(*args, **kw)

    analysis = [
        conv((nf, (9, 9)), corr=True, strides_down=4, padding="same_zeros",
             use_bias=True, activation=ns.gdn.GDN(name="gdn_0")),
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=True, activation=ns.gdn.GDN(name="gdn_1")),
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=False),
    ]
    synthesis = [
        conv((nf, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True,
             activation=ns.gdn.GDN(name="igdn_0", inverse=True)),
        conv((nf, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True,
             activation=ns.gdn.GDN(name="igdn_1", inverse=True)),
        conv((3, (9, 9)), corr=False, strides_up=4, padding="same_zeros",
             use_bias=True),
    ]
    prior = ns.deep_factorized.NoisyDeepFactorized(batch_shape=(nf,))
    a_fn = lambda x: _apply(analysis, x / 255.0)
    s_fn = lambda y: _apply(synthesis, y) * 255.0
    _ = s_fn(a_fn(tf.zeros((1, SIZE, SIZE, 3))))
    em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        prior, coding_rank=3, compression=True,
        bottleneck_dtype=tf.float32)

    def compress():
        y = a_fn(tf.cast(x, tf.float32))
        return em.compress(y), tf.shape(y)[1:-1]

    strings, y_shape = compress()

    def decompress():
        y_hat = em.decompress(strings, y_shape)
        return tf.saturate_cast(tf.round(s_fn(y_hat)[0]), tf.uint8).numpy()

    nbytes = sum(len(bytes(s)) for s in tf.reshape(strings, [-1]).numpy())
    return {"compress": _median_spread(lambda: compress()),
            "decompress": _median_spread(lambda: decompress()),
            "bytes": nbytes}


def bench_bmshj2018(ns, tf, x):
    nf = 192
    num_scales, smin, smax = 64, 0.11, 256.0

    def conv(args, **kw):
        return ns.signal_conv.SignalConv2D(*args, **kw)

    def gdn(name, inv=False):
        return ns.gdn.GDN(name=name, inverse=inv)

    # /root/reference/models/bmshj2018.py:55-137: 4x(5,5) down-2 analysis
    # (GDN on the first three), mirrored synthesis, 3-layer hyper pair.
    analysis = [
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=True, activation=gdn("gdn_0")),
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=True, activation=gdn("gdn_1")),
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=True, activation=gdn("gdn_2")),
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=True),
    ]
    synthesis = [
        conv((nf, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True, activation=gdn("igdn_0", True)),
        conv((nf, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True, activation=gdn("igdn_1", True)),
        conv((nf, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True, activation=gdn("igdn_2", True)),
        conv((3, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True),
    ]
    hyper_analysis = [
        conv((nf, (3, 3)), corr=True, strides_down=1, padding="same_zeros",
             use_bias=True, activation=tf.nn.relu),
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=True, activation=tf.nn.relu),
        conv((nf, (5, 5)), corr=True, strides_down=2, padding="same_zeros",
             use_bias=False),
    ]
    hyper_synthesis = [
        conv((nf, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True, kernel_parameter="variable",
             activation=tf.nn.relu),
        conv((nf, (5, 5)), corr=False, strides_up=2, padding="same_zeros",
             use_bias=True, kernel_parameter="variable",
             activation=tf.nn.relu),
        conv((nf, (3, 3)), corr=False, strides_up=1, padding="same_zeros",
             use_bias=True, kernel_parameter="variable"),
    ]
    prior = ns.deep_factorized.NoisyDeepFactorized(batch_shape=(nf,))
    offset = tf.math.log(tf.constant(smin))
    factor = (tf.math.log(tf.constant(smax)) - offset) / (num_scales - 1.0)
    scale_fn = lambda i: tf.math.exp(offset + factor * i)  # noqa: E731

    a_fn = lambda x: _apply(analysis, x / 255.0)
    s_fn = lambda y: _apply(synthesis, y) * 255.0
    ha_fn = lambda y: _apply(hyper_analysis, abs(y))
    hs_fn = lambda z: _apply(hyper_synthesis, z)

    side_em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        prior, coding_rank=3, compression=True,
        bottleneck_dtype=tf.float32)
    em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, num_scales, scale_fn, coding_rank=3,
        compression=True, bottleneck_dtype=tf.float32)

    def compress():
        xx = tf.cast(x, tf.float32)
        y = a_fn(xx)
        z = ha_fn(y)
        z_hat = side_em.quantize(z)
        indexes = hs_fn(z_hat)[:, : y.shape[1], : y.shape[2], :]
        side_string = side_em.compress(z)
        string = em.compress(y, indexes)
        return string, side_string, tf.shape(y), tf.shape(z)

    string, side_string, y_shape, z_shape = compress()

    def decompress():
        z_hat = side_em.decompress(side_string, z_shape[1:-1])
        indexes = hs_fn(z_hat)[:, : y_shape[1], : y_shape[2], :]
        y_hat = em.decompress(string, indexes)
        return tf.saturate_cast(tf.round(s_fn(y_hat)[0]), tf.uint8).numpy()

    nbytes = (sum(len(bytes(s))
                  for s in tf.reshape(string, [-1]).numpy())
              + sum(len(bytes(s))
                    for s in tf.reshape(side_string, [-1]).numpy()))
    return {"compress": _median_spread(lambda: compress()),
            "decompress": _median_spread(lambda: decompress()),
            "bytes": nbytes}


def bench_ms2020(ns, tf, x):
    # Paper config: /root/reference/models/ms2020.py:96-158.
    nf, latent_depth, hp_depth = 192, 320, 192
    num_slices, max_support = 10, 5
    num_scales, smin, smax = 64, 0.11, 256.0

    def conv(args, **kw):
        kw.setdefault("padding", "same_zeros")
        kw.setdefault("use_bias", True)
        return ns.signal_conv.SignalConv2D(*args, **kw)

    def gdn(name, inv=False):
        return ns.gdn.GDN(name=name, inverse=inv)

    analysis = [
        conv((nf, (5, 5)), corr=True, strides_down=2,
             activation=gdn("gdn_0")),
        conv((nf, (5, 5)), corr=True, strides_down=2,
             activation=gdn("gdn_1")),
        conv((nf, (5, 5)), corr=True, strides_down=2,
             activation=gdn("gdn_2")),
        conv((latent_depth, (5, 5)), corr=True, strides_down=2),
    ]
    synthesis = [
        conv((nf, (5, 5)), corr=False, strides_up=2,
             activation=gdn("igdn_0", True)),
        conv((nf, (5, 5)), corr=False, strides_up=2,
             activation=gdn("igdn_1", True)),
        conv((nf, (5, 5)), corr=False, strides_up=2,
             activation=gdn("igdn_2", True)),
        conv((3, (5, 5)), corr=False, strides_up=2),
    ]
    hyper_analysis = [
        conv((320, (3, 3)), corr=True, strides_down=1,
             activation=tf.nn.relu),
        conv((256, (5, 5)), corr=True, strides_down=2,
             activation=tf.nn.relu),
        conv((hp_depth, (5, 5)), corr=True, strides_down=2,
             use_bias=False),
    ]

    def hyper_synth():
        return [
            conv((192, (5, 5)), corr=False, strides_up=2,
                 activation=tf.nn.relu, kernel_parameter="variable"),
            conv((256, (5, 5)), corr=False, strides_up=2,
                 activation=tf.nn.relu, kernel_parameter="variable"),
            conv((320, (3, 3)), corr=False, strides_up=1,
                 activation=None, kernel_parameter="variable"),
        ]

    def slice_transform():
        sd = latent_depth // num_slices
        return [
            conv((224, (5, 5)), corr=False, strides_up=1,
                 activation=tf.nn.relu, kernel_parameter="variable"),
            conv((128, (5, 5)), corr=False, strides_up=1,
                 activation=tf.nn.relu, kernel_parameter="variable"),
            conv((sd, (3, 3)), corr=False, strides_up=1,
                 activation=None, kernel_parameter="variable"),
        ]

    hs_mean = hyper_synth()
    hs_scale = hyper_synth()
    cc_mean = [slice_transform() for _ in range(num_slices)]
    cc_scale = [slice_transform() for _ in range(num_slices)]
    lrp = [slice_transform() for _ in range(num_slices)]

    prior = ns.deep_factorized.NoisyDeepFactorized(batch_shape=(hp_depth,))
    offset = tf.math.log(tf.constant(smin))
    factor = (tf.math.log(tf.constant(smax)) - offset) / (num_scales - 1.0)
    scale_fn = lambda i: tf.math.exp(offset + factor * i)  # noqa: E731

    a_fn = lambda x: _apply(analysis, x / 255.0)
    s_fn = lambda y: _apply(synthesis, y) * 255.0
    ha_fn = lambda y: _apply(hyper_analysis, y)
    hsm_fn = lambda z: _apply(hs_mean, z)
    hss_fn = lambda z: _apply(hs_scale, z)

    em_z = ns.continuous_batched.ContinuousBatchedEntropyModel(
        prior, coding_rank=3, compression=True, offset_heuristic=False,
        bottleneck_dtype=tf.float32)
    em_y = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, num_scales, scale_fn, coding_rank=3,
        compression=True, bottleneck_dtype=tf.float32)

    def slice_params(stack, latent, support, y_shape):
        latent = latent[:, : y_shape[0], : y_shape[1], :]
        t = tf.concat([latent] + support, axis=-1)
        return _apply(stack, t)[:, : y_shape[0], : y_shape[1], :], t

    def compress():
        # Mirrors /root/reference/models/ms2020.py:341-389 (compress).
        xx = tf.cast(x, tf.float32)
        y = a_fn(xx)
        y_shape = tuple(y.shape[1:-1])
        z = ha_fn(y)
        z_string = em_z.compress(z)
        z_hat = em_z.decompress(z_string, tf.shape(z)[1:-1])
        scales = hss_fn(z_hat)
        means = hsm_fn(z_hat)
        y_slices = tf.split(y, num_slices, axis=-1)
        y_hat_slices = []
        y_strings = [z_string]
        for i, y_slice in enumerate(y_slices):
            support = (y_hat_slices[:max_support]
                       if max_support >= 0 else y_hat_slices)
            mu, mean_sup = slice_params(cc_mean[i], means, support, y_shape)
            sigma, _ = slice_params(cc_scale[i], scales, support, y_shape)
            y_strings.append(em_y.compress(y_slice, sigma, loc=mu))
            y_hat_slice = em_y.decompress(
                y_strings[-1], sigma, loc=mu)
            lrp_in = tf.concat([mean_sup, y_hat_slice], axis=-1)
            y_hat_slice += 0.5 * tf.math.tanh(_apply(lrp[i], lrp_in)[
                :, : y_shape[0], : y_shape[1], :])
            y_hat_slices.append(y_hat_slice)
        return y_strings, tf.shape(y), tf.shape(z)

    strings, y_shape_t, z_shape_t = compress()
    y_shape = (int(y_shape_t[1]), int(y_shape_t[2]))

    def decompress():
        # Mirrors /root/reference/models/ms2020.py:391-430 (decompress).
        z_hat = em_z.decompress(strings[0], z_shape_t[1:-1])
        scales = hss_fn(z_hat)
        means = hsm_fn(z_hat)
        y_hat_slices = []
        for i in range(num_slices):
            support = (y_hat_slices[:max_support]
                       if max_support >= 0 else y_hat_slices)
            mu, mean_sup = slice_params(cc_mean[i], means, support, y_shape)
            sigma, _ = slice_params(cc_scale[i], scales, support, y_shape)
            y_hat_slice = em_y.decompress(strings[i + 1], sigma, loc=mu)
            lrp_in = tf.concat([mean_sup, y_hat_slice], axis=-1)
            y_hat_slice += 0.5 * tf.math.tanh(_apply(lrp[i], lrp_in)[
                :, : y_shape[0], : y_shape[1], :])
            y_hat_slices.append(y_hat_slice)
        y_hat = tf.concat(y_hat_slices, axis=-1)
        return tf.saturate_cast(tf.round(s_fn(y_hat)[0]), tf.uint8).numpy()

    nbytes = sum(len(bytes(s))
                 for st in strings
                 for s in tf.reshape(st, [-1]).numpy())
    return {"compress": _median_spread(lambda: compress()),
            "decompress": _median_spread(lambda: decompress()),
            "bytes": nbytes}


def main():
    import ref_stack

    ns = ref_stack.load_layers()
    tf = ns.tf
    tf.random.set_seed(0)
    rng = np.random.RandomState(7)
    x = tf.constant(
        rng.randint(0, 256, (1, SIZE, SIZE, 3)).astype(np.float32))

    out = {"image": f"{SIZE}x{SIZE}",
           "host": f"{os.cpu_count()} CPU cores (reference coding ops are "
                   "CPU-only)",
           "weights": "random init",
           "repeats": REPEATS}
    for name, fn in [("bls2017", bench_bls2017),
                     ("bmshj2018", bench_bmshj2018),
                     ("ms2020", bench_ms2020)]:
        t0 = time.time()
        try:
            out[name] = fn(ns, tf, x)
            out[name]["total_bench_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001 — record, keep going
            import traceback
            traceback.print_exc()
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"ref bench {name}: {out[name]}", flush=True)

    path = os.path.join(_REPO, "docs", "ref_model_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
