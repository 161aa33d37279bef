"""End-to-end bmshj2018 (scale hyperprior) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.models import bmshj2018


def small_model():
    return bmshj2018.BMSHJ2018Model(
        lmbda=0.01, num_filters=8, num_scales=16, scale_min=0.11,
        scale_max=64.0)


class TestModel:
    def test_forward_and_shapes(self):
        model = small_model()
        x = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (1, 64, 64, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        loss, bpp, mse = model.apply(
            params, x, training=True, key=jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        y, z = model.apply(params, x, method=bmshj2018.BMSHJ2018Model.encode)
        assert y.shape == (1, 4, 4, 8)   # 64 / 2^4
        assert z.shape == (1, 1, 1, 8)   # further / 4

    def test_train_step(self):
        model = small_model()
        x = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (2, 64, 64, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        step = bmshj2018.make_train_step(model, optimizer)
        key = jax.random.PRNGKey(2)
        first = None
        for _ in range(15):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, x, sub)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first


class TestCodec:
    def test_roundtrip(self):
        model = small_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
        codec = bmshj2018.BMSHJ2018Codec(model, params)
        x8 = np.random.RandomState(3).randint(
            0, 256, (64, 64, 3)).astype(np.uint8)
        container = codec.compress(x8)
        x_hat = codec.decompress(container)
        assert x_hat.shape == x8.shape
        x_hat2 = codec.decompress(codec.compress(x8))
        np.testing.assert_array_equal(x_hat, x_hat2)

    def test_two_stream_container(self):
        model = small_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
        codec = bmshj2018.BMSHJ2018Codec(model, params)
        x8 = np.random.RandomState(4).randint(
            0, 256, (64, 48, 3)).astype(np.uint8)
        from compression_tpu.util.packed_tensors import PackedTensors
        packed = PackedTensors(codec.compress(x8))
        assert packed.model == "bmshj2018"
        strings, side, xs, ys, zs = packed.unpack(
            ["bytes", "bytes", np.int32, np.int32, np.int32])
        assert len(strings) == 1 and len(side) == 1
        np.testing.assert_array_equal(xs, [64, 48])


def test_native_container_matches_classic():
    model = small_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    codec = bmshj2018.BMSHJ2018Codec(model, params)
    x8 = np.random.RandomState(22).randint(
        0, 256, (64, 48, 3)).astype(np.uint8)
    classic = codec.compress(x8)
    native = codec.compress_native(x8)
    np.testing.assert_array_equal(
        codec.decompress(native), codec.decompress(classic))


def test_roundtrip_equals_reconstruction():
    """decompress(compress(x)) == range-coder-free eval reconstruction
    (reference round-trip contract), both container formats."""
    model = small_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    codec = bmshj2018.BMSHJ2018Codec(model, params)
    x8 = np.random.RandomState(12).randint(
        0, 256, (64, 64, 3)).astype(np.uint8)
    expected = codec.reconstruct(x8)
    np.testing.assert_array_equal(
        codec.decompress(codec.compress(x8)), expected)
    np.testing.assert_array_equal(
        codec.decompress(codec.compress_native(x8)), expected)
