"""End-to-end bls2017 model tests: training step runs and decreases loss,
codec round-trips through the .tfci container."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.models import bls2017


def small_model():
    return bls2017.BLS2017Model(lmbda=0.01, num_filters=16)


class TestModel:
    def test_forward(self):
        model = small_model()
        x = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (2, 64, 64, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        loss, bpp, mse = model.apply(
            params, x, training=True, key=jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert float(bpp) > 0 and float(mse) > 0

    def test_latent_shape(self):
        model = small_model()
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        y = model.apply(params, x, method=bls2017.BLS2017Model.encode)
        assert y.shape == (1, 4, 4, 16)  # 64 / (4*2*2) = 4
        x_hat = model.apply(params, y, method=bls2017.BLS2017Model.decode)
        assert x_hat.shape == x.shape

    def test_train_step_decreases_loss(self):
        model = small_model()
        x = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (2, 64, 64, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        step = bls2017.make_train_step(model, optimizer)
        key = jax.random.PRNGKey(2)
        first = None
        for i in range(30):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, x, sub)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first


class TestCodec:
    def test_roundtrip_container(self):
        model = small_model()
        x8 = np.random.RandomState(3).randint(
            0, 256, (96, 80, 3)).astype(np.uint8)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 96, 80, 3)), training=False)
        codec = bls2017.BLS2017Codec(model, params)
        container = codec.compress(x8)
        assert isinstance(container, bytes) and len(container) > 0
        x_hat = codec.decompress(container)
        assert x_hat.shape == x8.shape
        assert x_hat.dtype == np.uint8
        # Untrained model: just verify the pipeline is lossless w.r.t. the
        # quantized latent (deterministic decode == encode's reconstruction).
        x_hat2 = codec.decompress(codec.compress(x8))
        np.testing.assert_array_equal(x_hat, x_hat2)

    def test_odd_sizes(self):
        # Image sizes not divisible by 16: latents cover ceil(H/16).
        model = small_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 50, 35, 3)), training=False)
        codec = bls2017.BLS2017Codec(model, params)
        x8 = np.random.RandomState(4).randint(
            0, 256, (50, 35, 3)).astype(np.uint8)
        x_hat = codec.decompress(codec.compress(x8))
        assert x_hat.shape == x8.shape


def test_native_container_matches_classic():
    """Native (multi-stream + sidecar) container decodes to the exact same
    image as the reference-format container."""
    model = small_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 80, 3)), training=False)
    codec = bls2017.BLS2017Codec(model, params)
    x8 = np.random.RandomState(21).randint(
        0, 256, (96, 80, 3)).astype(np.uint8)
    classic = codec.compress(x8)
    native = codec.compress_native(x8)
    assert native != classic
    np.testing.assert_array_equal(
        codec.decompress(native), codec.decompress(classic))
    # Stream count = latent rows.
    from compression_tpu.util.packed_tensors import PackedTensors
    packed = PackedTensors(native)
    assert packed.num_tensors == 5
    strings = packed.unpack(["bytes", np.int32, np.int32, np.int32,
                             np.int32])[0]
    assert len(strings) == 96 // 16


def test_roundtrip_equals_reconstruction():
    """decompress(compress(x)) must equal the range-coder-free eval
    reconstruction (reference property, continuous_batched_test.py:103-110
    lifted to model level) — for both container formats."""
    model = small_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), training=False)
    codec = bls2017.BLS2017Codec(model, params)
    x8 = np.random.RandomState(11).randint(
        0, 256, (48, 48, 3)).astype(np.uint8)
    expected = codec.reconstruct(x8)
    np.testing.assert_array_equal(
        codec.decompress(codec.compress(x8)), expected)
    np.testing.assert_array_equal(
        codec.decompress(codec.compress_native(x8)), expected)
