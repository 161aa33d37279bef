"""Training-step throughput bench: the one perf dimension BENCH_MODELS
does not cover.

Times the jitted train step of each model family at paper-scale config
(the repo model defaults) and reference training geometry (256x256
patches, batch 8 — reference models/bls2017.py:326-433 defaults), on
the TPU chip.  Batches are device-resident (uploaded once, cycled), so
the number is compute + dispatch, not the axon tunnel's per-step upload
cost — the same "input pipeline excluded" convention every training
bench uses.  MFU is derived from XLA's own cost analysis
(compiled.cost_analysis()['flops']) against the v5e bf16 peak.

The reference denominator (--ref 1) builds the same architectures from
the reference's own Python classes (tests/golden/ref_stack.py, loaded
unmodified from the read-only mount) and times the eager
GradientTape step on this host's CPU.  Eager because Keras 3 breaks
GDN.call under tf.function (Python bool on parameter tensors — see
docs/ROUND_NOTES.md round 2); the reference publishes no training speed
numbers of its own (SURVEY.md §6), so as with tools/ref_model_bench.py
the denominator is "the reference stack on this host", labeled as such.

Usage:
  python tools/train_bench.py [--families bls2017,bmshj2018,ms2020]
      [--patch 256] [--batch 8] [--repeats 5] [--ref 1] [--ref_steps 3]
      [--out docs/train_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

V5E_BF16_PEAK_FLOPS = 197e12


def _time_train_k(step_body, params, opt_state, batch, base_key,
                  k_lo=1, k_hi=5, repeats=5):
    """Device-side train-step time via the repo's k-loop methodology
    (bench.py:113-160): k chained steps inside ONE jitted fori_loop,
    a scalar fetch forcing the round trip, two k values differenced.
    Host wall-clock around individual dispatches is meaningless through
    the remote-TPU tunnel (lazy dispatch; block_until_ready returning
    early has been observed).  The train chain needs no extra no-op
    dependency: step i+1's params consume step i's output, so nothing
    can be hoisted or dead-code-eliminated while the final loss (a
    function of the final params) is returned."""
    import functools

    import jax

    @functools.partial(jax.jit, static_argnums=(3,))
    def train_k(params, opt_state, batch, k):
        def body(i, carry):
            params, opt_state, _ = carry
            key = jax.random.fold_in(base_key, i)
            params, opt_state, m = step_body(params, opt_state, batch,
                                             key)
            return params, opt_state, m["loss"]

        return jax.lax.fori_loop(
            0, k, body, (params, opt_state, 0.0))[2]

    def fetch(k):
        t0 = time.perf_counter()
        np.asarray(train_k(params, opt_state, batch, k))
        return time.perf_counter() - t0

    t0 = time.time()
    fetch(k_hi)  # compile both k variants
    compile_s = time.time() - t0
    fetch(k_lo)
    times = [(fetch(k_hi) - fetch(k_lo)) / (k_hi - k_lo)
             for _ in range(repeats)]
    return (float(np.median(times)), float(np.min(times)),
            float(np.max(times)), compile_s)


def _bench_jax_family(family, patch, batch, repeats, seed=0):
    import jax
    import jax.numpy as jnp
    import optax

    if family == "bls2017":
        from compression_tpu.models.bls2017 import (
            BLS2017Model as Model, make_train_step)
    elif family == "bmshj2018":
        from compression_tpu.models.bmshj2018 import (
            BMSHJ2018Model as Model, make_train_step)
    elif family == "ms2020":
        from compression_tpu.models.ms2020 import (
            MS2020Model as Model, make_train_step)
    else:
        raise ValueError(family)

    model = Model()
    key = jax.random.PRNGKey(seed)
    key, init_key, time_key = jax.random.split(key, 3)
    t0 = time.time()
    params = jax.jit(model.init, static_argnames=("training",))(
        init_key, jnp.zeros((1, patch, patch, 3)), training=False)
    np.asarray(jax.tree.leaves(params)[0])  # force
    init_s = time.time() - t0
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, optimizer)

    # One device-resident batch (input pipeline excluded).  Constant
    # across steps — the chain stays live because params evolve.
    rng = np.random.RandomState(seed)
    batch_d = jax.device_put(
        rng.uniform(0, 255, (batch, patch, patch, 3)).astype(np.float32))

    med, lo, hi, compile_s = _time_train_k(
        step_fn, params, opt_state, batch_d, time_key, repeats=repeats)
    step_ms = med * 1e3

    flops = None
    try:
        lowered = step_fn.lower(params, opt_state, batch_d, time_key)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — MFU is a bonus metric
        print(f"  cost_analysis unavailable: {e}", file=sys.stderr)

    out = {
        "config": "model defaults (paper scale)",
        "patch": patch,
        "batch": batch,
        "timing": "device-side k-loop (bench.py methodology)",
        "repeats": repeats,
        "step_ms": round(step_ms, 2),
        "step_ms_min": round(lo * 1e3, 2),
        "step_ms_max": round(hi * 1e3, 2),
        "images_per_s": round(batch / (step_ms / 1e3), 1),
        "init_s": round(init_s, 1),
        "k_loop_compile_s": round(compile_s, 1),
    }
    if flops:
        out["xla_flops_per_step"] = flops
        out["mfu_vs_v5e_bf16_peak"] = round(
            flops / (step_ms / 1e3) / V5E_BF16_PEAK_FLOPS, 4)
    return out


def _bench_jax_hific(patch, batch, repeats, seed=0):
    """One full GAN training iteration (1 generator + 1 discriminator
    step, reference models/hific/train.py num_steps_disc=1) at the
    paper 'hific' config.  TPU-only row: the reference HiFiC trains on
    TF1/compare_gan, which does not run on this install."""
    import jax
    import jax.numpy as jnp
    import optax

    from compression_tpu.models import hific

    model = hific.HiFiCModel(cfg=hific.HiFiCConfig())
    disc = hific.Discriminator()
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    dummy = jnp.zeros((1, patch, patch, 3))
    t0 = time.time()
    params = model.init(init_key, dummy, training=False)
    _, y_hat0, _, _ = model.apply(
        params, dummy, training=True, key=jax.random.PRNGKey(1))
    d_vars = disc.init(jax.random.PRNGKey(2), dummy / 255.0, y_hat0,
                       update_stats=False)
    np.asarray(jax.tree.leaves(d_vars)[0])  # force
    init_s = time.time() - t0
    d_params = d_vars["params"]
    d_state = {k: v for k, v in d_vars.items() if k != "params"}
    g_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    g_state = g_opt.init(params)
    d_opt_state = d_opt.init(d_params)
    g_step, d_step = hific.make_train_steps(model, disc, g_opt, d_opt)

    rng = np.random.RandomState(seed)
    batch_d = jax.device_put(
        rng.uniform(0, 255, (batch, patch, patch, 3)).astype(np.float32))
    key, time_key = jax.random.split(key)

    # Same k-loop methodology as _time_train_k, with the G+D carry.
    import functools

    @functools.partial(jax.jit, static_argnums=(5,))
    def train_k(params, g_state, d_params, d_state, d_opt_state, k):
        def body(i, carry):
            params, g_state, d_params, d_state, d_opt_state, _ = carry
            kg = jax.random.fold_in(time_key, 2 * i)
            kd = jax.random.fold_in(time_key, 2 * i + 1)
            d_vars = {"params": d_params, **d_state}
            params, g_state, gm = g_step(
                params, g_state, d_vars, batch_d, kg, i)
            d_params, d_state, d_opt_state, dm = d_step(
                d_params, d_state, d_opt_state, params, batch_d, kd)
            return (params, g_state, d_params, d_state, d_opt_state,
                    gm["g_loss"] + dm["d_loss"])

        return jax.lax.fori_loop(
            0, k, body,
            (params, g_state, d_params, d_state, d_opt_state, 0.0))[5]

    def fetch(k):
        t0 = time.perf_counter()
        np.asarray(train_k(params, g_state, d_params, d_state,
                           d_opt_state, k))
        return time.perf_counter() - t0

    k_lo, k_hi = 1, 5
    t0 = time.time()
    fetch(k_hi)
    compile_s = time.time() - t0
    fetch(k_lo)
    times = [(fetch(k_hi) - fetch(k_lo)) / (k_hi - k_lo)
             for _ in range(repeats)]
    med = float(np.median(times))
    step_ms = med * 1e3
    return {
        "config": "paper 'hific' config, GAN + LPIPS, G+D per iteration",
        "patch": patch,
        "batch": batch,
        "timing": "device-side k-loop (bench.py methodology)",
        "repeats": repeats,
        "step_ms": round(step_ms, 2),
        "step_ms_min": round(float(np.min(times)) * 1e3, 2),
        "step_ms_max": round(float(np.max(times)) * 1e3, 2),
        "images_per_s": round(batch / (step_ms / 1e3), 1),
        "init_s": round(init_s, 1),
        "k_loop_compile_s": round(compile_s, 1),
    }


def _bench_ref_family(family, patch, batch, steps, seed=0):
    """Eager reference-stack train step on this host's CPU, same
    architecture/widths as the repo model defaults."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests",
        "golden"))
    import ref_stack
    ns = ref_stack.load_layers()
    tf = ns.tf
    tf.random.set_seed(seed)

    def conv(nf, k, name, down=0, up=0, act=None, bias=True,
             kernel_param="rdft"):
        kw = dict(name=name, padding="same_zeros", use_bias=bias,
                  activation=act, kernel_parameter=kernel_param)
        if down:
            return ns.signal_conv.SignalConv2D(
                nf, (k, k), corr=True, strides_down=down, **kw)
        return ns.signal_conv.SignalConv2D(
            nf, (k, k), corr=False, strides_up=up, **kw)

    def apply_(layers, x):
        for layer in layers:
            x = layer(x)
        return x

    lmbda = 0.01
    if family == "bls2017":
        nf = 128
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
        dists = [prior.base]

        def loss_fn(x):
            em = ns.continuous_batched.ContinuousBatchedEntropyModel(
                prior, coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            y = apply_(analysis, x / 255.0)
            y_hat, bits = em(y, training=True)
            x_hat = apply_(synthesis, y_hat) * 255.0
            num_pixels = tf.cast(
                tf.reduce_prod(tf.shape(x)[:-1]), bits.dtype)
            bpp = tf.reduce_sum(bits) / num_pixels
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            return bpp + lmbda * mse, bpp, mse

        convs = analysis + synthesis

    elif family == "bmshj2018":
        nf, num_scales = 128, 64
        offset = tf.math.log(tf.constant(0.11))
        factor = ((tf.math.log(tf.constant(256.0)) - offset)
                  / (num_scales - 1.0))
        scale_fn = lambda i: tf.math.exp(offset + factor * i)  # noqa: E731
        analysis = [
            conv(nf, 5, f"layer_{i}", down=2,
                 act=(ns.gdn.GDN(name=f"gdn_{i}") if i < 3 else None))
            for i in range(4)
        ]
        synthesis = [
            conv(nf if i < 3 else 3, 5, f"layer_{i}", up=2,
                 act=(ns.gdn.GDN(name=f"igdn_{i}", inverse=True)
                      if i < 3 else None))
            for i in range(4)
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
        dists = [hyperprior.base]

        def loss_fn(x):
            em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
                ns.uniform_noise.NoisyNormal, num_scales, scale_fn,
                coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            side_em = ns.continuous_batched.ContinuousBatchedEntropyModel(
                hyperprior, coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            y = apply_(analysis, x / 255.0)
            z = apply_(hyper_analysis, tf.abs(y))
            z_hat, side_bits = side_em(z, training=True)
            indexes = apply_(hyper_synthesis, z_hat)
            y_hat, bits = em(y, indexes, training=True)
            x_hat = apply_(synthesis, y_hat) * 255.0
            num_pixels = tf.cast(
                tf.reduce_prod(tf.shape(x)[:-1]), bits.dtype)
            bpp = (tf.reduce_sum(bits)
                   + tf.reduce_sum(side_bits)) / num_pixels
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            return bpp + lmbda * mse, bpp, mse

        convs = analysis + synthesis + hyper_analysis + hyper_synthesis

    elif family == "ms2020":
        nf, latent, hyper = 192, 320, 192
        nsl, msup, num_scales = 10, 5, 64
        haw, hsw, slw = (320, 256), (192, 256, 320), (224, 128)
        offset = tf.math.log(tf.constant(0.11))
        factor = ((tf.math.log(tf.constant(256.0)) - offset)
                  / (num_scales - 1.0))
        scale_fn = lambda i: tf.math.exp(offset + factor * i)  # noqa: E731
        analysis = [
            conv(nf if i < 3 else latent, 5, f"layer_{i}", down=2,
                 act=(ns.gdn.GDN(name=f"gdn_{i}") if i < 3 else None))
            for i in range(4)
        ]
        synthesis = [
            conv(nf if i < 3 else 3, 5, f"layer_{i}", up=2,
                 act=(ns.gdn.GDN(name=f"igdn_{i}", inverse=True)
                      if i < 3 else None))
            for i in range(4)
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
        dists = [hyperprior.base]

        def loss_fn(x):
            em_y = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
                ns.uniform_noise.NoisyNormal, num_scales, scale_fn,
                coding_rank=3, compression=False,
                bottleneck_dtype=tf.float32)
            em_z = ns.continuous_batched.ContinuousBatchedEntropyModel(
                hyperprior, coding_rank=3, compression=False,
                offset_heuristic=False, bottleneck_dtype=tf.float32)
            y = apply_(analysis, x / 255.0)
            z = apply_(hyper_analysis, y)
            _, z_bits = em_z(z, training=True)
            z_hat = em_z.quantize(z)
            latent_means = apply_(hs_mean, z_hat)
            latent_scales = apply_(hs_scale, z_hat)
            y_shape = tf.shape(y)[1:-1]
            y_slices = tf.split(y, nsl, axis=-1)
            y_hat_slices, y_bits = [], []
            for i, y_slice in enumerate(y_slices):
                support = y_hat_slices[:msup]
                mean_support = tf.concat(
                    [latent_means] + support, axis=-1)
                mu = apply_(cc_mean[i], mean_support)
                mu = mu[:, :y_shape[0], :y_shape[1], :]
                scale_support = tf.concat(
                    [latent_scales] + support, axis=-1)
                sigma = apply_(cc_scale[i], scale_support)
                sigma = sigma[:, :y_shape[0], :y_shape[1], :]
                _, bits = em_y(y_slice, sigma, loc=mu, training=True)
                y_bits.append(bits)
                y_hat_slice = em_y.quantize(y_slice, loc=mu)
                lrp_support = tf.concat(
                    [mean_support, y_hat_slice], axis=-1)
                lrp_t = 0.5 * tf.math.tanh(apply_(lrp[i], lrp_support))
                y_hat_slices.append(y_hat_slice + lrp_t)
            x_hat = apply_(synthesis,
                           tf.concat(y_hat_slices, axis=-1)) * 255.0
            num_pixels = tf.cast(
                tf.reduce_prod(tf.shape(x)[1:-1]), tf.float32)
            bpp = (tf.add_n([tf.reduce_sum(b) for b in y_bits])
                   + tf.reduce_sum(z_bits)) / (
                       num_pixels * tf.cast(tf.shape(x)[0], tf.float32))
            mse = tf.reduce_mean(tf.math.squared_difference(x, x_hat))
            return bpp + lmbda * mse, bpp, mse

        convs = (analysis + synthesis + hyper_analysis + hs_mean
                 + hs_scale
                 + [c for st in cc_mean + cc_scale + lrp for c in st])
    else:
        raise ValueError(family)

    rng = np.random.RandomState(seed)
    x0 = tf.constant(
        rng.uniform(0, 255, (batch, patch, patch, 3)).astype(np.float32))
    loss_fn(x0)  # build

    import rd_parity2
    variables = rd_parity2._collect_vars(ns, convs, dists)

    opt = tf.keras.optimizers.Adam(learning_rate=1e-4)

    def step(x):
        with tf.GradientTape() as tape:
            loss, bpp, mse = loss_fn(x)
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss

    step(x0)  # warmup (optimizer slot creation)
    times = []
    for _ in range(steps):
        t0 = time.time()
        float(step(x0))
        times.append(time.time() - t0)
    med = float(np.median(times))
    return {
        "mode": ("eager GradientTape (Keras 3 breaks reference GDN under "
                 "tf.function on this install; see docs/ROUND_NOTES.md)"),
        "host": "2 CPU cores",
        "patch": patch,
        "batch": batch,
        "steps_timed": steps,
        "step_ms": round(med * 1e3, 1),
        "images_per_s": round(batch / med, 2),
        "num_variables": len(variables),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="bls2017,bmshj2018,ms2020,hific")
    p.add_argument("--patch", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--ref", type=int, default=1)
    p.add_argument("--tpu", type=int, default=1)
    p.add_argument("--ref_steps", type=int, default=3)
    # Eager per-image cost is ~batch-linear on CPU, so the reference
    # times at batch 1 (ms2020 at 256x256 batch 8 would be ~15 min per
    # step); the comparison metric is images/s, not step latency.
    p.add_argument("--ref_batch", type=int, default=1)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "docs",
        "train_bench.json"))
    args = p.parse_args()

    from compression_tpu.util import compile_cache
    compile_cache.enable()

    families = [f.strip() for f in args.families.split(",") if f.strip()]
    results = {
        "measured": time.strftime("%Y-%m-%d"),
        "note": ("jitted TPU train step, device-resident batches "
                 "(input pipeline excluded), paper-scale model defaults; "
                 "reference = same architectures from the reference's "
                 "own classes on this host's CPU"),
    }
    for family in families:
        row = {}
        if args.tpu:
            print(f"=== {family}: TPU train step ===", flush=True)
            bench_fn = (_bench_jax_hific if family == "hific"
                        else lambda p, b, s: _bench_jax_family(
                            family, p, b, s))
            row["tpu"] = bench_fn(args.patch, args.batch, args.repeats)
            print(f"  tpu: {row['tpu']}", flush=True)
        if family == "hific":
            # No reference denominator: the reference HiFiC trains on
            # TF1/compare_gan, which does not run on this install.
            results[family] = row
            continue
        if args.ref:
            print(f"=== {family}: reference train step ===", flush=True)
            try:
                row["reference"] = _bench_ref_family(
                    family, args.patch, args.ref_batch, args.ref_steps)
                if "tpu" in row:
                    row["speedup_vs_reference_img_per_s"] = round(
                        row["tpu"]["images_per_s"]
                        / row["reference"]["images_per_s"], 1)
            except Exception as e:  # noqa: BLE001 — keep TPU rows
                row["reference"] = {"error": str(e)[:300]}
            print(f"  ref: {row['reference']}", flush=True)
        results[family] = row
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
