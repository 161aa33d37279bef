"""EM-level golden fixtures from the REFERENCE Python entropy-model stack.

Runs the reference entropy models UNMODIFIED from their read-only mount
(via ref_stack: tfp shim + reference C++ kernels in ref_ops.so) with fixed
weights/inputs, and saves everything a cross-implementation parity test
needs: prior weights, range-coding tables, quantization offsets, inputs,
container bytes and decompressed outputs.

Covers the production paths VERDICT r1 flagged as unproven:
  * `dfb`  — ContinuousBatchedEntropyModel + NoisyDeepFactorized
             (bls2017 z-branch; exercises estimate_tails + DeepFactorized
             table build end to end)
  * `nnb`  — ContinuousBatchedEntropyModel + NoisyNormal with
             reference-built tables (quantile-path table build)
  * `lsi`  — LocationScaleIndexedEntropyModel(NoisyNormal, 64 scales)
             with loc (bmshj2018/ms2020 y-branch)
  * `ci2`  — generic ContinuousIndexedEntropyModel with a 2-D index grid
             (meshgrid table batch + channel-axis flatten)
  * `unb`  — UniversalBatchedEntropyModel (Philox dither offsets)

Usage: TF_ENABLE_ONEDNN_OPTS=0 python make_golden_em.py
(oneDNN is disabled so reference float math is plain Eigen, the closest
analog to XLA-CPU; see tests/test_golden_em.py for tolerance policy)
"""

import numpy as np

import ref_stack

ns = ref_stack.load()
tf = ns.tf

OUT = {}


def save_strings(prefix, strings):
    flat = [bytes(s) for s in tf.reshape(strings, [-1]).numpy()]
    OUT[f"{prefix}__nbytes"] = np.asarray([len(b) for b in flat], np.int32)
    OUT[f"{prefix}__bytes"] = np.frombuffer(b"".join(flat), np.uint8)
    OUT[f"{prefix}__strings_shape"] = np.asarray(strings.shape, np.int32)


def fixture_deep_factorized_batched():
    rng = np.random.RandomState(42)
    channels = 4
    prior = ns.deep_factorized.NoisyDeepFactorized(batch_shape=(channels,))
    df = prior.base
    # Fixed, non-trivial weights (as if trained).
    for i, m in enumerate(df._matrices):
        m.assign(m.numpy() + rng.normal(0, 0.3, m.shape).astype(np.float32))
        OUT[f"dfb__matrix_{i}"] = m.numpy()
    for i, b in enumerate(df._biases):
        b.assign(rng.normal(0, 0.7, b.shape).astype(np.float32))
        OUT[f"dfb__bias_{i}"] = b.numpy()
    for i, f in enumerate(df._factors):
        f.assign(rng.uniform(-0.7, 0.7, f.shape).astype(np.float32))
        OUT[f"dfb__factor_{i}"] = f.numpy()

    em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        prior=prior, coding_rank=3, compression=True,
        bottleneck_dtype=tf.float32)
    OUT["dfb__cdf"] = em.cdf.numpy()
    OUT["dfb__cdf_offset"] = em.cdf_offset.numpy()
    qo = em.quantization_offset
    OUT["dfb__qoffset"] = (qo.numpy() if qo is not None
                           else np.zeros(channels, np.float32))
    # Tail/offset intermediates for localized diagnostics.
    OUT["dfb__lower_tail"] = ns.helpers.lower_tail(prior, em.tail_mass).numpy()
    OUT["dfb__upper_tail"] = ns.helpers.upper_tail(prior, em.tail_mass).numpy()

    x = tf.constant(rng.normal(0, 2.5, (2, 8, 8, channels)).astype(np.float32))
    OUT["dfb__x"] = x.numpy()
    strings = em.compress(x)
    save_strings("dfb", strings)
    xhat = em.decompress(strings, (8, 8))
    assert bool(tf.reduce_all(xhat == em.quantize(x)).numpy())
    OUT["dfb__xhat"] = xhat.numpy()
    _, bits = em(x, training=False)
    OUT["dfb__bits"] = bits.numpy()
    print(f"dfb: cdf {em.cdf.shape}, strings "
          f"{[int(n) for n in OUT['dfb__nbytes']]}")


def fixture_noisy_normal_batched():
    rng = np.random.RandomState(7)
    loc = np.float32(0.25)
    scales = np.asarray([0.13, 0.5, 1.0, 4.0, 27.0], np.float32)
    prior = ns.uniform_noise.NoisyNormal(loc=loc, scale=scales)
    em = ns.continuous_batched.ContinuousBatchedEntropyModel(
        prior=prior, coding_rank=3, compression=True,
        bottleneck_dtype=tf.float32)
    OUT["nnb__loc"] = loc
    OUT["nnb__scales"] = scales
    OUT["nnb__cdf"] = em.cdf.numpy()
    OUT["nnb__cdf_offset"] = em.cdf_offset.numpy()
    qo = em.quantization_offset
    OUT["nnb__qoffset"] = (qo.numpy() if qo is not None
                           else np.zeros(len(scales), np.float32))
    x = tf.constant(
        (loc + rng.normal(0, 1.5, (3, 6, 5, len(scales)))).astype(np.float32))
    OUT["nnb__x"] = x.numpy()
    strings = em.compress(x)
    save_strings("nnb", strings)
    xhat = em.decompress(strings, (6, 5))
    assert bool(tf.reduce_all(xhat == em.quantize(x)).numpy())
    OUT["nnb__xhat"] = xhat.numpy()
    _, bits = em(x, training=False)
    OUT["nnb__bits"] = bits.numpy()
    print(f"nnb: cdf {em.cdf.shape}, strings "
          f"{[int(n) for n in OUT['nnb__nbytes']]}")


def fixture_location_scale_indexed():
    rng = np.random.RandomState(3)
    num_scales = 64
    log_min, log_max = np.log(.11), np.log(256.)
    offset = np.float32(log_min)
    factor = np.float32((log_max - log_min) / (num_scales - 1.))
    scale_fn = lambda i: tf.exp(offset + factor * tf.cast(i, tf.float32))  # noqa: E731
    em = ns.continuous_indexed.LocationScaleIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, num_scales, scale_fn, coding_rank=1,
        compression=True, bottleneck_dtype=tf.float32)
    OUT["lsi__scale_fn_offset"] = offset
    OUT["lsi__scale_fn_factor"] = factor
    OUT["lsi__num_scales"] = np.int32(num_scales)
    OUT["lsi__cdf"] = em.cdf.numpy()
    OUT["lsi__cdf_offset"] = em.cdf_offset.numpy()

    n = 768
    idx = rng.randint(0, num_scales, (3, n)).astype(np.float32)
    loc = rng.normal(0, 1, (3, n)).astype(np.float32)
    scale = np.exp(offset + factor * idx)
    x = (loc + rng.normal(0, 1, (3, n)) * np.minimum(scale, 16)
         ).astype(np.float32)
    OUT["lsi__indexes"] = idx
    OUT["lsi__loc"] = loc
    OUT["lsi__x"] = x
    strings = em.compress(tf.constant(x), idx, loc=loc)
    save_strings("lsi", strings)
    xhat = em.decompress(strings, idx, loc=loc)
    assert bool(tf.reduce_all(
        xhat == em.quantize(tf.constant(x), loc=loc)).numpy())
    OUT["lsi__xhat"] = xhat.numpy()
    _, bits = em(tf.constant(x), idx, loc=loc, training=False)
    OUT["lsi__bits"] = bits.numpy()
    print(f"lsi: cdf {em.cdf.shape}, strings "
          f"{[int(b) for b in OUT['lsi__nbytes']]}")


def fixture_continuous_indexed_2d():
    rng = np.random.RandomState(11)
    index_ranges = (4, 6)
    parameter_fns = {
        "loc": lambda i: (i[..., 0] - 1.5) / 2.,
        "scale": lambda i: tf.exp(i[..., 1] - 2.),
    }
    em = ns.continuous_indexed.ContinuousIndexedEntropyModel(
        ns.uniform_noise.NoisyLogistic, index_ranges, parameter_fns,
        coding_rank=2, compression=True, bottleneck_dtype=tf.float32)
    OUT["ci2__index_ranges"] = np.asarray(index_ranges, np.int32)
    OUT["ci2__cdf"] = em.cdf.numpy()
    OUT["ci2__cdf_offset"] = em.cdf_offset.numpy()

    shape = (2, 96)
    idx = np.stack([rng.randint(0, index_ranges[0], shape),
                    rng.randint(0, index_ranges[1], shape)],
                   axis=-1).astype(np.float32)
    loc = (idx[..., 0] - 1.5) / 2.
    scale = np.exp(idx[..., 1] - 2.)
    x = (loc + rng.normal(0, 1, shape) * np.minimum(scale, 8)
         ).astype(np.float32)
    OUT["ci2__indexes"] = idx
    OUT["ci2__x"] = x
    strings = em.compress(tf.constant(x), idx)
    save_strings("ci2", strings)
    xhat = em.decompress(strings, idx)
    assert bool(tf.reduce_all(xhat == em.quantize(tf.constant(x))).numpy())
    OUT["ci2__xhat"] = xhat.numpy()
    _, bits = em(tf.constant(x), idx, training=False)
    OUT["ci2__bits"] = bits.numpy()
    print(f"ci2: cdf {em.cdf.shape}, strings "
          f"{[int(b) for b in OUT['ci2__nbytes']]}")


def fixture_universal_batched():
    rng = np.random.RandomState(19)
    loc = np.asarray([0.0, 0.25, -1.3], np.float32)
    scales = np.asarray([0.4, 1.0, 3.0], np.float32)
    prior = ns.uniform_noise.NoisyNormal(loc=loc, scale=scales)
    em = ns.universal.UniversalBatchedEntropyModel(
        prior, coding_rank=3, compression=True, bottleneck_dtype=tf.float32)
    OUT["unb__loc"] = loc
    OUT["unb__scales"] = scales
    OUT["unb__cdf"] = em.cdf.numpy()
    OUT["unb__cdf_offset"] = em.cdf_offset.numpy()
    x = tf.constant(
        (loc + rng.normal(0, 1.5, (2, 4, 6, 3))).astype(np.float32))
    OUT["unb__x"] = x.numpy()
    strings = em.compress(x)
    save_strings("unb", strings)
    xhat = em.decompress(strings, (4, 6))
    OUT["unb__xhat"] = xhat.numpy()
    print(f"unb: cdf {em.cdf.shape}, strings "
          f"{[int(b) for b in OUT['unb__nbytes']]}")


def fixture_universal_indexed():
    """UniversalIndexedEntropyModel with 2-D index ranges: the
    offset-index leading CDF dimension composed with a multi-dim index
    grid (reference universal.py:302-603) — the one EM config VERDICT r2
    flagged as not golden-pinned."""
    rng = np.random.RandomState(23)
    index_ranges = (3, 5)
    parameter_fns = {
        "loc": lambda i: (i[..., 0] - 1.0) / 2.,
        "scale": lambda i: tf.exp(i[..., 1] - 1.5),
    }
    em = ns.universal.UniversalIndexedEntropyModel(
        ns.uniform_noise.NoisyNormal, index_ranges, parameter_fns,
        coding_rank=2, compression=True, bottleneck_dtype=tf.float32)
    OUT["uni__index_ranges"] = np.asarray(index_ranges, np.int32)
    OUT["uni__cdf"] = em.cdf.numpy()
    OUT["uni__cdf_offset"] = em.cdf_offset.numpy()

    shape = (2, 80)
    idx = np.stack([rng.randint(0, index_ranges[0], shape),
                    rng.randint(0, index_ranges[1], shape)],
                   axis=-1).astype(np.float32)
    loc = (idx[..., 0] - 1.0) / 2.
    scale = np.exp(idx[..., 1] - 1.5)
    x = (loc + rng.normal(0, 1, shape) * np.minimum(scale, 8)
         ).astype(np.float32)
    OUT["uni__indexes"] = idx
    OUT["uni__x"] = x
    strings = em.compress(tf.constant(x), idx)
    save_strings("uni", strings)
    xhat = em.decompress(strings, idx)
    OUT["uni__xhat"] = xhat.numpy()
    _, bits = em(tf.constant(x), idx, training=False)
    OUT["uni__bits"] = bits.numpy()
    print(f"uni: cdf {em.cdf.shape}, strings "
          f"{[int(b) for b in OUT['uni__nbytes']]}")


def main():
    fixture_deep_factorized_batched()
    fixture_noisy_normal_batched()
    fixture_location_scale_indexed()
    fixture_continuous_indexed_2d()
    fixture_universal_batched()
    fixture_universal_indexed()
    np.savez_compressed("golden_em.npz", **OUT)
    print("saved golden_em.npz")


if __name__ == "__main__":
    main()
