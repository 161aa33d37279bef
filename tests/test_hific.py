"""HiFiC smoke tests (mirrors hific_test.py: builds all modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from compression_tpu.models import hific


def tiny_cfg():
    return hific.HiFiCConfig(
        num_down=2, num_filters_base=4, num_filters_bottleneck=8,
        num_residual_blocks=2, hyper_filters=4)


class TestModel:
    def test_forward_shapes(self):
        model = hific.HiFiCModel(cfg=tiny_cfg())
        x = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (1, 32, 32, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        x_hat, y_hat, nbpp, qbpp = model.apply(
            params, x, training=True, key=jax.random.PRNGKey(1))
        assert x_hat.shape == (1, 32, 32, 3)
        assert float(nbpp) > 0 and float(qbpp) > 0

    def test_generator_step(self):
        model = hific.HiFiCModel(cfg=tiny_cfg())
        x = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (1, 32, 32, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        opt = optax.adam(1e-4)
        g_step, _ = hific.make_train_steps(model, None, opt)
        state = opt.init(params)
        params, state, metrics = g_step(
            params, state, None, x, jax.random.PRNGKey(2), 0)
        assert np.isfinite(float(metrics["g_loss"]))

    def test_gan_steps(self):
        model = hific.HiFiCModel(cfg=tiny_cfg())
        disc = hific.Discriminator(num_filters_base=4, num_layers=2,
                                   num_down=2)
        x = jnp.asarray(
            np.random.RandomState(2).randint(0, 256, (1, 32, 32, 3)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, training=False)
        _, y_hat, _, _ = model.apply(
            params, x, training=True, key=jax.random.PRNGKey(1))
        d_vars = disc.init(
            jax.random.PRNGKey(3), x / 255.0, y_hat, update_stats=False)
        d_state = {k: v for k, v in d_vars.items() if k != "params"}
        d_params = d_vars["params"]
        g_opt, d_opt = optax.adam(1e-4), optax.adam(1e-4)
        g_step, d_step = hific.make_train_steps(model, disc, g_opt, d_opt)
        g_state = g_opt.init(params)
        d_opt_state = d_opt.init(d_params)
        params, g_state, gm = g_step(
            params, g_state, d_vars, x, jax.random.PRNGKey(4), 0)
        d_params, d_state, d_opt_state, dm = d_step(
            d_params, d_state, d_opt_state, params, x, jax.random.PRNGKey(5))
        assert np.isfinite(float(gm["g_loss"]))
        assert np.isfinite(float(dm["d_loss"]))

    def test_rd_loss_schedule(self):
        cfg = tiny_cfg()
        lo = hific.rd_loss(cfg, 1.0, 0.1, 0.05, 0)   # below target
        hi = hific.rd_loss(cfg, 1.0, 0.1, 0.50, 0)   # above target
        assert float(hi) > float(lo)


class TestCodec:
    def test_roundtrip(self):
        model = hific.HiFiCModel(cfg=tiny_cfg())
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), training=False)
        codec = hific.HiFiCCodec(model, params)
        x8 = np.random.RandomState(3).randint(
            0, 256, (32, 32, 3)).astype(np.uint8)
        container = codec.compress(x8)
        x_hat = codec.decompress(container)
        assert x_hat.shape == x8.shape
        x_hat2 = codec.decompress(codec.compress(x8))
        np.testing.assert_array_equal(x_hat, x_hat2)


class TestLPIPS:
    def test_zero_for_identical_positive_otherwise(self):
        from compression_tpu.models import lpips as lpips_mod

        params = lpips_mod.random_lpips_weights(seed=1)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        y = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        d_same = lpips_mod.lpips(params, x, x)
        d_diff = lpips_mod.lpips(params, x, y)
        assert d_same.shape == (2,)
        np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)
        assert np.all(np.asarray(d_diff) > 0)
        d_rev = lpips_mod.lpips(params, y, x)
        np.testing.assert_allclose(
            np.asarray(d_diff), np.asarray(d_rev), rtol=1e-5)

    def test_npz_round_trip(self, tmp_path):
        from compression_tpu.models import lpips as lpips_mod

        params = lpips_mod.random_lpips_weights(seed=2)
        path = str(tmp_path / "lpips.npz")
        np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
        loaded = lpips_mod.load_lpips_weights(path)
        for k in params:
            np.testing.assert_array_equal(
                np.asarray(params[k]), np.asarray(loaded[k]))
