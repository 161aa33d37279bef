"""HiFiC: High-Fidelity Generative Image Compression (Mentzer et al. 2020).

JAX/flax counterpart of the reference's models/hific/: encoder with
ChannelNorm, residual-block generator/decoder, spectral-normalized patch
discriminator conditioned on the latents, mean/scale hyperprior over the
bottleneck, and the rate-targeted loss schedule
(Loss = C*(1/lambda * R + CD * D) + CP * P with lambda switched on the
target rate; reference model.py:53-115, configs.py).

Deviations from the reference, by necessity or TPU-nativeness:
  * compare_gan is replaced with flax modules + nn.SpectralNorm.
  * The LPIPS perceptual term runs TPU-natively (`models/lpips.py`: VGG16
    feature stack + unit-normalized feature distance).  Pretrained VGG
    weights cannot be downloaded in this zero-egress environment; they
    load from a local npz when present, else a deterministic
    random-feature LPIPS (identical graph and cost) stands in.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.distributions import deep_factorized, uniform_noise
from compression_tpu.entropy_models import ContinuousBatchedEntropyModel
from compression_tpu.entropy_models.continuous_indexed import (
    LocationScaleIndexedEntropyModel,
)
from compression_tpu.layers import SignalConv2D
from compression_tpu.models.bmshj2018 import make_scale_fn
from compression_tpu.ops import round_ops
from compression_tpu.util.packed_tensors import PackedTensors

__all__ = ["HiFiCConfig", "HiFiCModel", "HiFiCCodec", "Discriminator",
           "make_train_steps"]

SCALES_MIN, SCALES_MAX, SCALES_LEVELS = 0.11, 256.0, 64


class HiFiCConfig(NamedTuple):
    """Mirrors the reference 'hific' config (configs.py:20-48)."""

    num_down: int = 4
    num_filters_base: int = 60
    num_filters_bottleneck: int = 220
    num_residual_blocks: int = 9
    hyper_filters: int = 320
    # Loss schedule.
    C: float = 0.1 * 2.0**-5
    CD: float = 0.75
    CP: float = 0.1 * 1.5
    target: float = 0.14
    target_factor_initial: float = 0.20 / 0.14
    schedule_steps: int = 50000
    lmbda_a: float = 0.1 * 2.0**-6
    lmbda_b: float = 0.1 * 2.0**1
    use_gan: bool = True


class ChannelNorm(nn.Module):
    """Normalizes over the channel axis (unbiased variance), then affine."""

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum(
            jnp.square(x - jax.lax.stop_gradient(mean)), axis=-1,
            keepdims=True) / (c - 1)
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * gamma + beta


class ResidualBlock(nn.Module):
    filters: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.filters, (self.kernel_size,) * 2, padding="SAME")(x)
        h = ChannelNorm()(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.filters, (self.kernel_size,) * 2, padding="SAME")(h)
        h = ChannelNorm()(h)
        return x + h


class Encoder(nn.Module):
    cfg: HiFiCConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(c.num_filters_base, (7, 7), padding="SAME")(x)
        x = ChannelNorm()(x)
        x = jax.nn.relu(x)
        for i in range(c.num_down):
            x = nn.Conv(
                c.num_filters_base * 2 ** (i + 1), (3, 3), strides=(2, 2),
                padding="SAME")(x)
            x = ChannelNorm()(x)
            x = jax.nn.relu(x)
        return nn.Conv(c.num_filters_bottleneck, (3, 3), padding="SAME")(x)


class Decoder(nn.Module):
    """Generator: head -> residual stack (+skip) -> upsampling tail."""

    cfg: HiFiCConfig

    @nn.compact
    def __call__(self, y):
        c = self.cfg
        top = c.num_filters_base * 2**c.num_down
        h = ChannelNorm()(y)
        h = nn.Conv(top, (3, 3), padding="SAME")(h)
        h = ChannelNorm()(h)
        head = h
        for i in range(c.num_residual_blocks):
            h = ResidualBlock(top, name=f"block_{i}")(h)
        h = h + head
        for scale in reversed(range(c.num_down)):
            h = nn.ConvTranspose(
                c.num_filters_base * 2**scale, (3, 3), strides=(2, 2),
                padding="SAME")(h)
            h = ChannelNorm()(h)
            h = jax.nn.relu(h)
        return nn.Conv(3, (7, 7), padding="SAME")(h)


class Discriminator(nn.Module):
    """Latent-conditioned patch discriminator with spectral norm."""

    num_filters_base: int = 64
    num_layers: int = 3
    num_down: int = 4

    @nn.compact
    def __call__(self, x, latent, update_stats=True):
        def sn(module):
            return nn.SpectralNorm(module)

        lat = sn(nn.Conv(12, (3, 3), padding="SAME"))(
            latent, update_stats=update_stats)
        lat = nn.leaky_relu(lat, 0.2)
        factor = 2**self.num_down
        lat = jax.image.resize(
            lat, (lat.shape[0], lat.shape[1] * factor,
                  lat.shape[2] * factor, lat.shape[3]), method="nearest")
        lat = lat[:, : x.shape[1], : x.shape[2], :]
        h = jnp.concatenate([x, lat], axis=-1)

        h = sn(nn.Conv(self.num_filters_base, (4, 4), strides=(2, 2),
                       padding="SAME"))(h, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        filters = self.num_filters_base
        for i in range(self.num_layers - 1):
            filters = min(filters * 2, 512)
            h = sn(nn.Conv(filters, (4, 4), strides=(2, 2),
                           padding="SAME"))(h, update_stats=update_stats)
            h = nn.leaky_relu(h, 0.2)
        filters = min(filters * 2, 512)
        h = sn(nn.Conv(filters, (4, 4), padding="SAME"))(
            h, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        logits = sn(nn.Conv(1, (4, 4), padding="SAME"))(
            h, update_stats=update_stats)
        return logits.reshape(-1, 1)


class HyperAnalysis(nn.Module):
    num_filters: int = 320

    @nn.compact
    def __call__(self, y):
        y = SignalConv2D(
            filters=self.num_filters, kernel_support=3, corr=True,
            padding="same_zeros", use_bias=True, name="layer_0")(y)
        y = jax.nn.relu(y)
        y = SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=True,
            strides_down=2, padding="same_zeros", use_bias=True,
            name="layer_1")(y)
        y = jax.nn.relu(y)
        return SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=True,
            strides_down=2, padding="same_zeros", use_bias=True,
            name="layer_2")(y)


class HyperSynthesis(nn.Module):
    num_filters: int = 320
    bottleneck: int = 220

    @nn.compact
    def __call__(self, z):
        z = SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=False,
            strides_up=2, padding="same_zeros", use_bias=True,
            kernel_parameter="variable", name="layer_0")(z)
        z = jax.nn.relu(z)
        z = SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=False,
            strides_up=2, padding="same_zeros", use_bias=True,
            kernel_parameter="variable", name="layer_1")(z)
        z = jax.nn.relu(z)
        return SignalConv2D(
            filters=self.bottleneck, kernel_support=3, corr=False,
            padding="same_zeros", use_bias=True,
            kernel_parameter="variable", name="layer_2")(z)


def _scheduled(initial, final, step, schedule_steps):
    """Two-phase schedule: `initial` before schedule_steps, then `final`."""
    return jnp.where(step < schedule_steps, initial, final)


class HiFiCModel(nn.Module):
    """Generator + probability model (discriminator is separate)."""

    cfg: HiFiCConfig = HiFiCConfig()

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.decoder = Decoder(c)
        self.hyper_analysis = HyperAnalysis(c.hyper_filters)
        self.hyper_synthesis_scale = HyperSynthesis(
            c.hyper_filters, c.num_filters_bottleneck)
        self.hyper_synthesis_mean = HyperSynthesis(
            c.hyper_filters, c.num_filters_bottleneck)
        self.hyperprior_params = self.param(
            "hyperprior",
            lambda key: deep_factorized.DeepFactorized.init_params(
                key, (c.hyper_filters,)))

    def hyperprior(self):
        return uniform_noise.UniformNoiseAdapter(
            deep_factorized.DeepFactorized(
                params=self.hyperprior_params,
                batch_shape=(self.cfg.hyper_filters,)))

    def scale_fn(self):
        return make_scale_fn(SCALES_MIN, SCALES_MAX, SCALES_LEVELS)

    def _scale_indexes(self, latent_scales):
        """Maps predicted scales to nearest scale-table index (continuous)."""
        log_min, log_max = np.log(SCALES_MIN), np.log(SCALES_MAX)
        s = jnp.clip(latent_scales, SCALES_MIN, SCALES_MAX)
        return (jnp.log(s) - log_min) / (log_max - log_min) * (
            SCALES_LEVELS - 1)

    def forward(self, x, training, key=None):
        """Returns (x_hat, y, nbpp, qbpp)."""
        c = self.cfg
        x = jnp.asarray(x, jnp.float32) / 255.0 * 2.0 - 1.0
        y = self.encoder(x)
        z = self.hyper_analysis(y)
        em_z = ContinuousBatchedEntropyModel(
            self.hyperprior(), coding_rank=3, compression=False,
            offset_heuristic=False)
        em_y = LocationScaleIndexedEntropyModel(
            uniform_noise.NoisyNormal, SCALES_LEVELS, self.scale_fn(),
            coding_rank=3, compression=False)

        k1 = None
        if key is not None:
            (k1,) = jax.random.split(key, 1)
        _, z_bits = em_z(z, training=training, key=k1)
        z_hat = em_z.quantize(z)
        raw_scales = self.hyper_synthesis_scale(z_hat)
        latent_means = self.hyper_synthesis_mean(z_hat)
        raw_scales = raw_scales[:, : y.shape[1], : y.shape[2], :]
        latent_means = latent_means[:, : y.shape[1], : y.shape[2], :]
        indexes = self._scale_indexes(jnp.exp(raw_scales))

        # Noisy rate (differentiable) and quantized rate (true bit count).
        _, y_bits_noisy = em_y(
            y, indexes, loc=latent_means, training=training, key=key)
        _, y_bits_q = em_y(y, indexes, loc=latent_means, training=False)

        y_hat = round_ops.round_st(y - latent_means) + latent_means
        x_hat = self.decoder(y_hat)

        num_pixels = np.prod(x.shape[1:-1])
        nbpp = (jnp.sum(y_bits_noisy) + jnp.sum(z_bits)) / (
            num_pixels * x.shape[0])
        qbpp = (jnp.sum(y_bits_q) + jnp.sum(z_bits)) / (
            num_pixels * x.shape[0])
        x_hat = (x_hat + 1.0) / 2.0 * 255.0
        return x_hat, y_hat, nbpp, qbpp

    def __call__(self, x, training=True, key=None):
        return self.forward(x, training, key)

    # Inference sub-graphs.
    def encode(self, x):
        x = jnp.asarray(x, jnp.float32) / 255.0 * 2.0 - 1.0
        y = self.encoder(x)
        z = self.hyper_analysis(y)
        return y, z

    def hyper_decode(self, z_hat):
        return (self.hyper_synthesis_scale(z_hat),
                self.hyper_synthesis_mean(z_hat))

    def scale_indexes(self, raw_scales):
        return self._scale_indexes(jnp.exp(raw_scales))

    def decode(self, y_hat):
        x = self.decoder(y_hat)
        return (x + 1.0) / 2.0 * 255.0


def rd_loss(cfg: HiFiCConfig, distortion, nbpp, qbpp, step):
    """Rate-targeted RD loss (reference _LossScaler.get_rd_loss)."""
    target = cfg.target * _scheduled(
        cfg.target_factor_initial, 1.0, step, cfg.schedule_steps)
    lmbda_a = cfg.lmbda_a * _scheduled(2.0, 1.0, step, cfg.schedule_steps)
    lmbda_b = cfg.lmbda_b * _scheduled(2.0, 1.0, step, cfg.schedule_steps)
    lmbda_inv = jnp.where(qbpp > target, 1.0 / lmbda_a, 1.0 / lmbda_b)
    weighted_rate = lmbda_inv * nbpp * cfg.C
    weighted_distortion = distortion * cfg.CD * cfg.C
    return weighted_rate + weighted_distortion


def make_train_steps(model: HiFiCModel, disc: Optional[Discriminator],
                     g_optimizer, d_optimizer=None,
                     perceptual_loss_fn: Optional[Callable] = None,
                     lpips_weights_path: Optional[str] = None):
    """Builds jitted generator/discriminator train steps.

    The perceptual term defaults to the JAX LPIPS metric
    (`models/lpips.py`; reference models/hific/model.py:642-668) when
    ``cfg.CP > 0`` — real weights from ``lpips_weights_path`` when the
    file exists, the deterministic random-feature variant otherwise.
    Pass ``perceptual_loss_fn(x, x_hat) -> scalar`` to override.
    """
    cfg = model.cfg
    if perceptual_loss_fn is None and cfg.CP > 0:
        from compression_tpu.models import lpips as lpips_mod

        _lpips = lpips_mod.make_lpips_loss(lpips_weights_path)
        perceptual_loss_fn = lambda x, x_hat: _lpips(
            x / 255.0, x_hat / 255.0)

    def g_loss_fn(params, d_vars, batch, key, step):
        x_hat, y_hat, nbpp, qbpp = model.apply(
            params, batch, training=True, key=key)
        x = jnp.asarray(batch, jnp.float32)
        distortion = jnp.mean(jnp.square(x - x_hat))
        loss = rd_loss(cfg, distortion, nbpp, qbpp, step)
        if perceptual_loss_fn is not None:
            loss = loss + cfg.CP * perceptual_loss_fn(x, x_hat)
        if disc is not None and d_vars is not None:
            logits_fake = disc.apply(
                d_vars, x_hat / 255.0, jax.lax.stop_gradient(y_hat),
                update_stats=False)
            # Non-saturating generator loss.
            g_adv = jnp.mean(jax.nn.softplus(-logits_fake))
            loss = loss + cfg.CP * g_adv
        return loss, (nbpp, qbpp, distortion)

    @jax.jit
    def g_step(params, opt_state, d_vars, batch, key, step):
        (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            params, d_vars, batch, key, step)
        updates, opt_state = g_optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        nbpp, qbpp, distortion = aux
        return params, opt_state, {
            "g_loss": loss, "nbpp": nbpp, "qbpp": qbpp,
            "distortion": distortion}

    if disc is None:
        return g_step, None

    def d_loss_fn(d_params, d_state, g_params, batch, key):
        x = jnp.asarray(batch, jnp.float32)
        x_hat, y_hat, _, _ = model.apply(
            g_params, batch, training=True, key=key)
        x_hat = jax.lax.stop_gradient(x_hat)
        y_hat = jax.lax.stop_gradient(y_hat)
        variables = {"params": d_params, **d_state}
        logits_real, mut = disc.apply(
            variables, x / 255.0, y_hat, update_stats=True,
            mutable=["batch_stats"])
        logits_fake, _ = disc.apply(
            variables, x_hat / 255.0, y_hat, update_stats=True,
            mutable=["batch_stats"])
        loss = jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(
            jax.nn.softplus(logits_fake))
        return loss, mut

    @jax.jit
    def d_step(d_params, d_state, d_opt_state, g_params, batch, key):
        (loss, new_state), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params, d_state, g_params, batch, key)
        updates, d_opt_state = d_optimizer.update(
            grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, new_state, d_opt_state, {"d_loss": loss}

    return g_step, d_step


class HiFiCCodec:
    """Inference codec with frozen tables (sender/receiver)."""

    MODEL_ID = "hific"

    def __init__(self, model: HiFiCModel, params):
        self.model = model
        self.params = params
        bound = model.bind(params)
        self.em_z = ContinuousBatchedEntropyModel(
            bound.hyperprior(), coding_rank=3, compression=True)
        self.em_y = LocationScaleIndexedEntropyModel(
            uniform_noise.NoisyNormal, SCALES_LEVELS,
            make_scale_fn(SCALES_MIN, SCALES_MAX, SCALES_LEVELS),
            coding_rank=3, compression=True)
        m = model
        self._encode = jax.jit(
            lambda p, x: m.apply(p, x, method=HiFiCModel.encode))
        self._hyper_decode = jax.jit(
            lambda p, z: m.apply(p, z, method=HiFiCModel.hyper_decode))
        self._scale_idx = jax.jit(
            lambda p, s: m.apply(p, s, method=HiFiCModel.scale_indexes))
        self._decode = jax.jit(
            lambda p, y: m.apply(p, y, method=HiFiCModel.decode))

    def _params_for(self, z_hat, y_shape):
        raw_scales, latent_means = self._hyper_decode(self.params, z_hat)
        raw_scales = raw_scales[:, : y_shape[0], : y_shape[1], :]
        latent_means = latent_means[:, : y_shape[0], : y_shape[1], :]
        indexes = self._scale_idx(self.params, raw_scales)
        return indexes, latent_means

    def compress(self, x) -> bytes:
        x = jnp.asarray(x, jnp.float32)[None]
        y, z = self._encode(self.params, x)
        x_shape = np.asarray(x.shape[1:-1], np.int32)
        y_shape = np.asarray(y.shape[1:-1], np.int32)
        z_shape = np.asarray(z.shape[1:-1], np.int32)
        z_strings = self.em_z.compress_to_strings(z)
        z_hat = self.em_z.decompress(z_strings, tuple(z_shape))
        indexes, means = self._params_for(z_hat, tuple(y_shape))
        y_strings = self.em_y.compress_to_strings(y, indexes, loc=means)
        packed = PackedTensors()
        packed.model = self.MODEL_ID
        packed.pack([y_strings, z_strings, x_shape, y_shape, z_shape])
        return packed.string

    def decompress(self, container: bytes) -> np.ndarray:
        packed = PackedTensors(container)
        assert packed.model == self.MODEL_ID
        y_strings, z_strings, x_shape, y_shape, z_shape = packed.unpack(
            ["bytes", "bytes", np.int32, np.int32, np.int32])
        z_hat = self.em_z.decompress(z_strings, tuple(z_shape))
        indexes, means = self._params_for(z_hat, tuple(y_shape))
        y_hat = self.em_y.decompress(y_strings, indexes, loc=means)
        x_hat = self._decode(self.params, y_hat)
        x_hat = np.asarray(x_hat)[0, : x_shape[0], : x_shape[1], :]
        return np.clip(np.round(x_hat), 0, 255).astype(np.uint8)


def train(config: HiFiCConfig = HiFiCConfig(), steps=1000, batch_size=2,
          patchsize=256, learning_rate=1e-4, data_iter=None, seed=0,
          num_steps_disc=1, log_every=100, init_params=None,
          lpips_weights_path=None):
    """Two-optimizer GAN training loop (reference model.py build_model).

    ``init_params`` warm-starts the generator (the reference's
    ``--init_autoencoder_from_ckpt_dir``: GAN training starts from a
    converged 'mselpips' model, models/hific/train.py).
    """
    import numpy as np_

    model = HiFiCModel(cfg=config)
    disc = Discriminator() if config.use_gan else None
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    dummy = jnp.zeros((1, patchsize, patchsize, 3))
    params = (init_params if init_params is not None
              else model.init(init_key, dummy, training=False))

    d_params = d_state = d_opt_state = d_vars = None
    g_opt = optax.adam(learning_rate)
    g_state = g_opt.init(params)
    d_opt = optax.adam(learning_rate) if disc is not None else None
    if disc is not None:
        _, y_hat, _, _ = model.apply(
            params, dummy, training=True, key=jax.random.PRNGKey(1))
        d_vars = disc.init(
            jax.random.PRNGKey(2), dummy / 255.0, y_hat, update_stats=False)
        d_params = d_vars["params"]
        d_state = {k: v for k, v in d_vars.items() if k != "params"}
        d_opt_state = d_opt.init(d_params)

    g_step, d_step = make_train_steps(
        model, disc, g_opt, d_opt, lpips_weights_path=lpips_weights_path)

    def default_iter():
        rng = np_.random.RandomState(seed)
        while True:
            yield rng.randint(
                0, 256, (batch_size, patchsize, patchsize, 3)).astype(
                    np_.float32)

    it = data_iter if data_iter is not None else default_iter()
    for step, batch in zip(range(steps), it):
        batch = jnp.asarray(batch)
        key, kg = jax.random.split(key)
        if disc is not None:
            d_vars = {"params": d_params, **d_state}
        params, g_state, gm = g_step(params, g_state, d_vars, batch, kg, step)
        if disc is not None:
            for _ in range(num_steps_disc):
                key, kd = jax.random.split(key)
                d_params, d_state, d_opt_state, dm = d_step(
                    d_params, d_state, d_opt_state, params, batch, kd)
        if log_every and step % log_every == 0:
            msg = " ".join(f"{k}={float(v):.4f}" for k, v in gm.items())
            print(f"step {step}: {msg}", flush=True)
    return model, params


_CONFIGS = {
    # Mirrors the reference configs.py: 'hific' = GAN training,
    # 'mselpips' = distortion/perceptual only.
    "hific": HiFiCConfig(use_gan=True),
    "mselpips": HiFiCConfig(use_gan=False, CP=0.0),
}


def get_config(config_name: str) -> HiFiCConfig:
    if config_name not in _CONFIGS:
        raise ValueError(
            f"Unknown config_name={config_name} not in "
            f"{sorted(_CONFIGS)}")
    return _CONFIGS[config_name]


def valid_configs():
    return sorted(_CONFIGS)


def main(argv=None):
    """HiFiC CLI: train / compress / decompress.

    Mirrors the reference entry points (models/hific/train.py flags
    --config/--num_steps/--batch_size/--crop_size/--num_steps_disc/
    --init_autoencoder_from_ckpt_dir/--lpips_weight_path; evaluate.py for
    the inference side) as subcommands of one tool.
    """
    import argparse

    from compression_tpu.util import checkpoint as ckpt_lib
    from compression_tpu.util import datasets

    parser = argparse.ArgumentParser(
        prog="hific", description="HiFiC TPU codec")
    sub = parser.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="Train a HiFiC model.")
    t.add_argument("--config", default="hific", choices=valid_configs(),
                   help="'hific' = GAN training, 'mselpips' = no GAN.")
    t.add_argument("--model_path", default="hific_ckpt")
    t.add_argument("--train_glob", default=None,
                   help="Glob/directory of training images; default = "
                        "synthetic noise (smoke run).")
    t.add_argument("--num_steps", type=int, default=10000)
    t.add_argument("--batchsize", type=int, default=2)
    t.add_argument("--patchsize", type=int, default=256)
    t.add_argument("--learning_rate", type=float, default=1e-4)
    t.add_argument("--num_steps_disc", type=int, default=1)
    t.add_argument("--target", type=float, default=None,
                   help="Override the config's target bpp.")
    t.add_argument("--lpips_weights_path", default=None,
                   help="Local VGG/LPIPS npz (no network egress here).")
    t.add_argument("--warm_start", default=None,
                   help="Checkpoint dir to initialize the generator from "
                        "(reference --init_autoencoder_from_ckpt_dir).")
    t.add_argument("--seed", type=int, default=0)

    for name in ("compress", "decompress"):
        c = sub.add_parser(name)
        c.add_argument("--model_path", default="hific_ckpt")
        c.add_argument("input_file")
        c.add_argument("output_file", nargs="?")

    args = parser.parse_args(argv)

    if args.command == "train":
        cfg = get_config(args.config)
        if args.target is not None:
            cfg = cfg._replace(target=args.target)
        init_params = None
        if args.warm_start:
            payload, _ = ckpt_lib.load_checkpoint(args.warm_start)
            init_params = payload["params"]
        data_iter = None
        if args.train_glob:
            data_iter = datasets.image_patch_iterator(
                args.train_glob, args.batchsize, args.patchsize, args.seed)
        model, params = train(
            cfg, steps=args.num_steps, batch_size=args.batchsize,
            patchsize=args.patchsize, learning_rate=args.learning_rate,
            data_iter=data_iter, seed=args.seed,
            num_steps_disc=args.num_steps_disc, init_params=init_params,
            lpips_weights_path=args.lpips_weights_path)
        ckpt_lib.save_checkpoint(
            args.model_path, params,
            config={"model_name": "hific", "config": args.config,
                    "target": cfg.target})
        print(f"saved checkpoint to {args.model_path}")
        return

    payload, config = ckpt_lib.load_checkpoint(args.model_path)
    cfg = get_config((config or {}).get("config", "hific"))
    if config and config.get("target") is not None:
        cfg = cfg._replace(target=config["target"])
    codec = HiFiCCodec(HiFiCModel(cfg=cfg), payload["params"])

    if args.command == "compress":
        img = datasets.load_image(args.input_file)
        container = codec.compress(img)
        out = args.output_file or args.input_file + ".tfci"
        with open(out, "wb") as f:
            f.write(container)
        bpp = len(container) * 8 / (img.shape[0] * img.shape[1])
        print(f"{out}: {len(container)} bytes, {bpp:.4f} bpp")
    else:
        with open(args.input_file, "rb") as f:
            container = f.read()
        img = codec.decompress(container)
        out = args.output_file or args.input_file + ".png"
        datasets.save_image(out, img)
        print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")


if __name__ == "__main__":
    main()
