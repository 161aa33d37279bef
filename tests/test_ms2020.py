"""End-to-end ms2020 (channel-wise autoregressive) tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.models import ms2020


def tiny_model():
    return ms2020.MS2020Model(
        lmbda=0.01, num_filters=8, latent_depth=8, hyperprior_depth=4,
        num_slices=4, max_support_slices=2, num_scales=8,
        scale_min=0.11, scale_max=32.0)


class TestModel:
    def test_forward(self):
        model = tiny_model()
        x = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (1, 64, 64, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        loss, bpp, mse = model.apply(
            params, x, training=True, key=jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert float(bpp) > 0

    def test_train_step(self):
        model = tiny_model()
        x = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (1, 64, 64, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        step = ms2020.make_train_step(model, optimizer)
        key = jax.random.PRNGKey(2)
        first = None
        for _ in range(8):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, x, sub)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) <= first * 1.01


class TestCodec:
    def test_roundtrip_deterministic(self):
        model = tiny_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
        codec = ms2020.MS2020Codec(model, params)
        x8 = np.random.RandomState(3).randint(
            0, 256, (64, 64, 3)).astype(np.uint8)
        container = codec.compress(x8)
        x_hat = codec.decompress(container)
        assert x_hat.shape == x8.shape
        # The compressor's own reconstruction path must agree with the
        # decompressor (slice-AR consistency), so a re-compress of the
        # container must be stable.
        x_hat2 = codec.decompress(codec.compress(x8))
        np.testing.assert_array_equal(x_hat, x_hat2)

    def test_container_has_slice_streams(self):
        from compression_tpu.util.packed_tensors import PackedTensors
        model = tiny_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
        codec = ms2020.MS2020Codec(model, params)
        x8 = np.random.RandomState(4).randint(
            0, 256, (64, 64, 3)).astype(np.uint8)
        packed = PackedTensors(codec.compress(x8))
        assert packed.model == "ms2020"
        fields = packed.unpack(
            [np.int32, np.int32, np.int32, "bytes"]
            + ["bytes"] * model.num_slices)
        assert len(fields) == 4 + model.num_slices


def test_non_multiple_of_64_input():
    # The reference fails here (uncropped hyper support, ms2020.py:244-263);
    # we crop the support to the latent extent, so any size >= 64 works.
    model = tiny_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    codec = ms2020.MS2020Codec(model, params)
    x8 = np.random.RandomState(22).randint(
        0, 256, (80, 72, 3)).astype(np.uint8)
    container = codec.compress(x8)
    out = codec.decompress(container)
    assert out.shape == x8.shape


def test_native_container_matches_classic():
    model = tiny_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    codec = ms2020.MS2020Codec(model, params)
    x8 = np.random.RandomState(23).randint(
        0, 256, (64, 64, 3)).astype(np.uint8)
    classic = codec.compress(x8)
    native = codec.compress_native(x8)
    np.testing.assert_array_equal(
        codec.decompress(native), codec.decompress(classic))


def test_roundtrip_equals_reconstruction():
    """decompress(compress(x)) == range-coder-free eval reconstruction:
    the slice-AR decode (incl. LRP corrections) must reproduce the
    quantize-path reconstruction exactly, not merely be self-consistent."""
    model = tiny_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    codec = ms2020.MS2020Codec(model, params)
    x8 = np.random.RandomState(13).randint(
        0, 256, (64, 64, 3)).astype(np.uint8)
    expected = codec.reconstruct(x8)
    np.testing.assert_array_equal(
        codec.decompress(codec.compress(x8)), expected)
    np.testing.assert_array_equal(
        codec.decompress(codec.compress_native(x8)), expected)
