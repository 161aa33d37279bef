"""Channel-wise autoregressive codec (Minnen & Singh 2020).

JAX/flax counterpart of the reference's models/ms2020.py: the latent is
split into `num_slices` channel slices; each slice's mean/scale-index is
predicted from the hyperprior outputs plus previously decoded slices
(`max_support_slices`), with a latent-residual-prediction (LRP) correction
``y_hat += 0.5*tanh(lrp)``.  The slice loop is the only autoregression in
the stack; all mu/sigma NN work stays on device, and only the byte-level
range coding per slice crosses to the coder (reference decode does 20
device<->host crossings per image; here it is 2 per slice maximum and the
transforms batch over all images in flight).

"Channel-wise Autoregressive Entropy Models for Learned Image Compression"
https://arxiv.org/abs/2007.08739
"""

from __future__ import annotations

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
from compression_tpu.layers import GDN, SignalConv2D
from compression_tpu.models.bmshj2018 import make_scale_fn
from compression_tpu.util.packed_tensors import PackedTensors

__all__ = ["MS2020Model", "MS2020Codec"]


class AnalysisTransform(nn.Module):
    num_filters: int = 192
    latent_depth: int = 320

    @nn.compact
    def __call__(self, x):
        x = x / 255.0
        for i in range(3):
            x = SignalConv2D(
                filters=self.num_filters, kernel_support=5, corr=True,
                strides_down=2, padding="same_zeros", use_bias=True,
                name=f"layer_{i}")(x)
            x = GDN(name=f"gdn_{i}")(x)
        x = SignalConv2D(
            filters=self.latent_depth, kernel_support=5, corr=True,
            strides_down=2, padding="same_zeros", use_bias=True,
            name="layer_3")(x)
        return x


class SynthesisTransform(nn.Module):
    num_filters: int = 192

    @nn.compact
    def __call__(self, y):
        for i in range(3):
            y = SignalConv2D(
                filters=self.num_filters, kernel_support=5, corr=False,
                strides_up=2, padding="same_zeros", use_bias=True,
                name=f"layer_{i}")(y)
            y = GDN(inverse=True, name=f"igdn_{i}")(y)
        y = SignalConv2D(
            filters=3, kernel_support=5, corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, name="layer_3")(y)
        return y * 255.0


class HyperAnalysisTransform(nn.Module):
    hyperprior_depth: int = 192
    widths: tuple = (320, 256)

    @nn.compact
    def __call__(self, y):
        y = SignalConv2D(
            filters=self.widths[0], kernel_support=3, corr=True,
            strides_down=1, padding="same_zeros", use_bias=True,
            name="layer_0")(y)
        y = jax.nn.relu(y)
        y = SignalConv2D(
            filters=self.widths[1], kernel_support=5, corr=True,
            strides_down=2, padding="same_zeros", use_bias=True,
            name="layer_1")(y)
        y = jax.nn.relu(y)
        y = SignalConv2D(
            filters=self.hyperprior_depth, kernel_support=5, corr=True,
            strides_down=2, padding="same_zeros", use_bias=False,
            name="layer_2")(y)
        return y


class HyperSynthesisTransform(nn.Module):
    widths: tuple = (192, 256, 320)

    @nn.compact
    def __call__(self, z):
        for i, (filters, support, up) in enumerate(
                zip(self.widths, (5, 5, 3), (2, 2, 1))):
            z = SignalConv2D(
                filters=filters, kernel_support=support, corr=False,
                strides_up=up, padding="same_zeros", use_bias=True,
                kernel_parameter="variable", name=f"layer_{i}")(z)
            z = jax.nn.relu(z)
        return z


class SliceTransform(nn.Module):
    """Channel-conditional mean/scale/LRP predictor for one slice."""

    slice_depth: int
    widths: tuple = (224, 128)

    @nn.compact
    def __call__(self, tensor):
        t = SignalConv2D(
            filters=self.widths[0], kernel_support=5, corr=False,
            strides_up=1, padding="same_zeros", use_bias=True,
            kernel_parameter="variable", name="layer_0")(tensor)
        t = jax.nn.relu(t)
        t = SignalConv2D(
            filters=self.widths[1], kernel_support=5, corr=False,
            strides_up=1, padding="same_zeros", use_bias=True,
            kernel_parameter="variable", name="layer_1")(t)
        t = jax.nn.relu(t)
        t = SignalConv2D(
            filters=self.slice_depth, kernel_support=3, corr=False,
            strides_up=1, padding="same_zeros", use_bias=True,
            kernel_parameter="variable", name="layer_2")(t)
        return t


class MS2020Model(nn.Module):
    lmbda: float = 0.01
    num_filters: int = 192
    latent_depth: int = 320
    hyperprior_depth: int = 192
    num_slices: int = 10
    max_support_slices: int = 5
    num_scales: int = 64
    scale_min: float = 0.11
    scale_max: float = 256.0
    # Transform widths (reference models/ms2020.py:96-158 constants),
    # overridable so compact configs stay structurally identical.
    ha_widths: tuple = (320, 256)
    hs_widths: tuple = (192, 256, 320)
    slice_widths: tuple = (224, 128)

    def setup(self):
        if self.latent_depth % self.num_slices:
            raise ValueError("Slices must evenly divide latent depth.")
        slice_depth = self.latent_depth // self.num_slices
        self.analysis = AnalysisTransform(
            self.num_filters, self.latent_depth)
        self.synthesis = SynthesisTransform(self.num_filters)
        self.hyper_analysis = HyperAnalysisTransform(
            self.hyperprior_depth, self.ha_widths)
        self.hyper_synthesis_mean = HyperSynthesisTransform(self.hs_widths)
        self.hyper_synthesis_scale = HyperSynthesisTransform(self.hs_widths)
        self.cc_mean_transforms = [
            SliceTransform(slice_depth, self.slice_widths,
                           name=f"cc_mean_{i}")
            for i in range(self.num_slices)]
        self.cc_scale_transforms = [
            SliceTransform(slice_depth, self.slice_widths,
                           name=f"cc_scale_{i}")
            for i in range(self.num_slices)]
        self.lrp_transforms = [
            SliceTransform(slice_depth, self.slice_widths,
                           name=f"lrp_{i}")
            for i in range(self.num_slices)]
        self.hyperprior_params = self.param(
            "hyperprior",
            lambda key: deep_factorized.DeepFactorized.init_params(
                key, (self.hyperprior_depth,)))

    def scale_fn(self):
        return make_scale_fn(self.scale_min, self.scale_max, self.num_scales)

    def hyperprior(self):
        return uniform_noise.UniformNoiseAdapter(
            deep_factorized.DeepFactorized(
                params=self.hyperprior_params,
                batch_shape=(self.hyperprior_depth,)))

    def _support(self, y_hat_slices):
        if self.max_support_slices < 0:
            return y_hat_slices
        return y_hat_slices[: self.max_support_slices]

    def _slice_params(self, transform, latent, support_slices, y_shape):
        # Crop the hyper-synthesis output to the latent extent BEFORE
        # concatenating with (already cropped) support slices.  The
        # reference (models/ms2020.py:244-263) concatenates uncropped and
        # only crops mu/sigma afterwards, which fails unless the hyper
        # upsample exactly matches the y shape (inputs divisible by 64).
        # Cropping first is an identity there and makes other sizes work.
        latent = latent[:, : y_shape[0], : y_shape[1], :]
        support = jnp.concatenate([latent] + support_slices, axis=-1)
        out = transform(support)
        return out[:, : y_shape[0], : y_shape[1], :], support

    def __call__(self, x, training=True, key=None):
        x = jnp.asarray(x, jnp.float32)
        em_z = ContinuousBatchedEntropyModel(
            self.hyperprior(), coding_rank=3, compression=False,
            offset_heuristic=False)
        em_y = LocationScaleIndexedEntropyModel(
            uniform_noise.NoisyNormal, self.num_scales, self.scale_fn(),
            coding_rank=3, compression=False)

        y = self.analysis(x)
        y_shape = y.shape[1:-1]
        z = self.hyper_analysis(y)
        num_pixels = np.prod(x.shape[1:-1])

        keys = (jax.random.split(key, self.num_slices + 1)
                if key is not None else [None] * (self.num_slices + 1))
        _, z_bits = em_z(z, training=training, key=keys[0])
        z_bpp = jnp.mean(z_bits) / num_pixels
        z_hat = em_z.quantize(z)

        latent_scales = self.hyper_synthesis_scale(z_hat)
        latent_means = self.hyper_synthesis_mean(z_hat)

        y_slices = jnp.split(y, self.num_slices, axis=-1)
        y_hat_slices = []
        y_bpps = []
        for i, y_slice in enumerate(y_slices):
            support_slices = self._support(y_hat_slices)
            mu, mean_support = self._slice_params(
                self.cc_mean_transforms[i], latent_means, support_slices,
                y_shape)
            sigma, _ = self._slice_params(
                self.cc_scale_transforms[i], latent_scales, support_slices,
                y_shape)
            _, slice_bits = em_y(
                y_slice, sigma, loc=mu, training=training, key=keys[i + 1])
            y_bpps.append(jnp.mean(slice_bits) / num_pixels)

            y_hat_slice = em_y.quantize(y_slice, loc=mu)
            lrp_support = jnp.concatenate(
                [mean_support, y_hat_slice], axis=-1)
            lrp = self.lrp_transforms[i](lrp_support)
            y_hat_slice = y_hat_slice + 0.5 * jnp.tanh(lrp)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self.synthesis(y_hat)
        x_hat = x_hat[:, : x.shape[1], : x.shape[2], :]

        total_bpp = sum(y_bpps) + z_bpp
        mse = jnp.mean(jnp.square(x - x_hat))
        loss = total_bpp + self.lmbda * mse
        return loss, total_bpp, mse

    # --- inference sub-graphs -------------------------------------------
    def encode(self, x):
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        return y, z

    def hyper_decode(self, z_hat):
        return (self.hyper_synthesis_scale(z_hat),
                self.hyper_synthesis_mean(z_hat))

    def slice_params(self, i, latent_means, latent_scales, support_slices,
                     y_shape):
        support_slices = list(support_slices)
        mu, mean_support = self._slice_params(
            self.cc_mean_transforms[i], latent_means, support_slices,
            y_shape)
        sigma, _ = self._slice_params(
            self.cc_scale_transforms[i], latent_scales, support_slices,
            y_shape)
        return mu, sigma, mean_support

    def lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_support))

    def decode(self, y_hat):
        return self.synthesis(y_hat)


def make_train_step(model: MS2020Model, optimizer):
    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            loss, bpp, mse = model.apply(p, batch, training=True, key=key)
            return loss, (bpp, mse)

        (loss, (bpp, mse)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "bpp": bpp, "mse": mse}

    return train_step


class MS2020Codec:
    """Inference codec: sequential slice loop with on-device transforms."""

    MODEL_ID = "ms2020"

    def __init__(self, model: MS2020Model, params):
        self.model = model
        self.params = params
        bound = model.bind(params)
        # offset_heuristic=False matches the reference's table build
        # (models/ms2020.py:323-326 passes it for em_z in fit() and
        # training alike).
        self.em_z = ContinuousBatchedEntropyModel(
            bound.hyperprior(), coding_rank=3, compression=True,
            offset_heuristic=False)
        self.em_y = LocationScaleIndexedEntropyModel(
            uniform_noise.NoisyNormal, model.num_scales,
            make_scale_fn(model.scale_min, model.scale_max,
                          model.num_scales),
            coding_rank=3, compression=True)
        m = model
        # Images upload as uint8 and cast on device; every entry point
        # shares these programs, so compress/decompress/reconstruct see
        # bit-identical transform outputs (the round-trip contract).
        self._encode = jax.jit(
            lambda p, x: m.apply(
                p, x.astype(jnp.float32), method=MS2020Model.encode))
        self._hyper_decode = jax.jit(
            lambda p, z: m.apply(p, z, method=MS2020Model.hyper_decode))
        self._decode = jax.jit(
            lambda p, y: m.apply(p, y, method=MS2020Model.decode))
        self._decode_u8 = jax.jit(
            lambda p, y: jnp.clip(jnp.round(m.apply(
                p, y, method=MS2020Model.decode)), 0, 255).astype(
                    jnp.uint8))
        self._slice_params = jax.jit(
            lambda p, i, lm, ls, sup, ys: m.apply(
                p, i, lm, ls, sup, ys, method=MS2020Model.slice_params),
            static_argnums=(1, 5))
        self._lrp = jax.jit(
            lambda p, i, ms, yh: m.apply(
                p, i, ms, yh, method=MS2020Model.lrp),
            static_argnums=(1,))
    def compress(self, x) -> bytes:
        x = jnp.asarray(x)[None]
        y, z = self._encode(self.params, x)
        x_shape = np.asarray(x.shape[1:-1], np.int32)
        y_shape = np.asarray(y.shape[1:-1], np.int32)
        z_shape = np.asarray(z.shape[1:-1], np.int32)

        z_strings = self.em_z.compress_to_strings(z)
        z_hat = self.em_z.decompress(z_strings, tuple(z_shape))
        latent_scales, latent_means = self._hyper_decode(self.params, z_hat)

        y_slices = jnp.split(y, self.model.num_slices, axis=-1)
        y_hat_slices = []
        y_strings = []
        for i, y_slice in enumerate(y_slices):
            support = (y_hat_slices if self.model.max_support_slices < 0
                       else y_hat_slices[: self.model.max_support_slices])
            mu, sigma, mean_support = self._slice_params(
                self.params, i, latent_means, latent_scales, tuple(support),
                tuple(int(s) for s in y_shape))
            slice_strings = self.em_y.compress_to_strings(
                y_slice, sigma, loc=mu)
            y_strings.append(slice_strings[0])
            y_hat_slice = self.em_y.decompress(slice_strings, sigma, loc=mu)
            y_hat_slice = y_hat_slice + self._lrp(
                self.params, i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        packed = PackedTensors()
        packed.model = self.MODEL_ID
        packed.pack(
            [x_shape, y_shape, z_shape, z_strings]
            + [[s] for s in y_strings])
        return packed.string

    def compress_native(self, x) -> bytes:
        """TPU-native container: row streams + escape sidecars for z and
        every y slice, produced by a SINGLE jitted device program.

        The slice loop stays sequential (decode dependency) but runs
        entirely inside one compiled program — analysis, hyper coding,
        all 10 slice conditionings, sidecar range encoding and escape
        compaction; ONE device dispatch per image where the reference
        pays ~20 host<->device crossings (models/ms2020.py:391-430,
        SURVEY §3.5).  The host only packs the container.
        """
        import os

        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            return self._compress_native_host(jnp.asarray(x)[None])
        flat_dev, meta = self._native_submit(x)
        return self._native_finalize(np.asarray(flat_dev), meta, x)

    def compress_native_many(self, images) -> list:
        """Throughput mode: pipelines N images through the async dispatch
        queue (see BLS2017Codec.compress_native_many); containers are
        byte-identical to per-image compress_native."""
        import os

        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            return [self._compress_native_host(jnp.asarray(x)[None])
                    for x in images]
        submitted = [self._native_submit(x) for x in images]
        flats = jax.device_get([s[0] for s in submitted])
        return [self._native_finalize(f, s[1], x)
                for (f, s), x in zip(zip(flats, submitted), images)]

    def _native_submit(self, x):
        """Uploads one image and submits its native-path programs;
        returns (device flat output, meta) without any blocking fetch.

        All transforms (analysis, hyper, slice conditioning, LRP) run
        in the SAME shared programs as compress()/reconstruct(); only
        the coding jits differ, and those touch floats through IEEE-
        exact ops alone.  The ~33 chained dispatches submit
        asynchronously (measured ~0.3-0.8 ms marginal each through the
        tunnel); device arrays never cross the host until the single
        packed fetch in _native_finalize.
        """
        x = jnp.asarray(x)[None]
        y, z = self._encode(self.params, x)
        y_shape = tuple(int(s) for s in y.shape[1:-1])
        cached = self._native_coders(y.shape, z.shape)
        (enc_z, enc_slice, pack_fn, _, geom) = cached

        z_out = enc_z(z)
        z_hat = self.em_z.quantize(z)
        latent_scales, latent_means = self._hyper_decode(self.params, z_hat)
        y_slices = jnp.split(y, self.model.num_slices, axis=-1)
        y_hat_slices = []
        mus, sigmas = [], []
        for i, y_slice in enumerate(y_slices):
            support = (y_hat_slices if self.model.max_support_slices < 0
                       else y_hat_slices[: self.model.max_support_slices])
            mu, sigma, mean_support = self._slice_params(
                self.params, i, latent_means, latent_scales, tuple(support),
                y_shape)
            mus.append(mu)
            sigmas.append(sigma)
            y_hat_slice = self.em_y.quantize(y_slice, mu)
            y_hat_slice = y_hat_slice + self._lrp(
                self.params, i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        # Encode has no decode dependency between slices (conditioning
        # uses quantize, not the coder), so ALL slices code in ONE wide
        # call — 10x the coder lanes of a per-slice call, one program
        # instead of ten (measured 26.7 -> ~4 ms device).  Streams are
        # independent, so the per-stream bytes — and the container —
        # are identical to per-slice coding.
        slices_out = enc_slice(y_slices, sigmas, mus)
        # ONE packed fetch for the hyper stream and all slice streams,
        # with stream buffers compacted and escape arrays sliced on
        # device (tunnel bandwidth).
        flat_dev = pack_fn(z_out, slices_out)
        return flat_dev, (geom, len(y_slices),
                          tuple(int(s) for s in x.shape[1:-1]))

    def _native_finalize(self, flat, meta, x) -> bytes:
        from compression_tpu.codec import jax_coder as jc
        from compression_tpu.models import native_format
        from compression_tpu.util import transfer as tr

        geom, ns, x_hw = meta
        (hy, wy, cy), n_y, (hz, wz, cz), n_z, spec_z, spec_y, s_y = geom
        outs = tr.unpack_host(flat, spec_z + spec_y)
        z_vals = outs[:7]
        (sl_words, sl_lens, sl_ei, sl_ev, sl_cnt, sl_ok,
         sl_cok) = outs[7:14]
        if not (bool(z_vals[5]) and bool(sl_ok)):
            import warnings
            warnings.warn(
                "compress_native escape budget exceeded; falling back to "
                "the host sidecar path for this image.",
                RuntimeWarning, stacklevel=2)
            return self._compress_native_host(jnp.asarray(x)[None])
        if not (bool(z_vals[6]) and bool(sl_cok)):
            import warnings
            warnings.warn(
                "compress_native compact fetch budget exceeded; doubling "
                "the budget (re-traces on the next call) and falling back "
                "to the host sidecar path for this image.",
                RuntimeWarning, stacklevel=2)
            self._compact_scale = 2 * getattr(self, "_compact_scale", 1)
            if hasattr(self, "_native_coder_cache"):
                del self._native_coder_cache
            return self._compress_native_host(jnp.asarray(x)[None])
        z_pairs, z_vv = native_format.esc_to_pairs(
            z_vals[2], z_vals[3], z_vals[4], n_z)
        # Split the stacked slice streams/sidecars back into per-slice
        # container fields (stream s belongs to slice s // s_y).
        pairs_all, vals_all = native_format.esc_to_pairs(
            sl_ei, sl_ev, sl_cnt, n_y)
        sl_strings = jc.compact_to_bytes_list(sl_words, sl_lens)
        slice_fields = []
        for i in range(ns):
            lo, hi = i * s_y, (i + 1) * s_y
            m = (pairs_all[:, 0] >= lo) & (pairs_all[:, 0] < hi)
            pairs_i = pairs_all[m] - np.asarray([lo, 0], np.int32)
            slice_fields += [
                sl_strings[lo:hi],
                pairs_i.ravel(), vals_all[m]]
        packed = PackedTensors()
        packed.model = self.MODEL_ID
        packed.pack(
            [np.asarray(x_hw, np.int32),
             np.asarray((hy, wy), np.int32),
             np.asarray((hz, wz), np.int32),
             jc.compact_to_bytes_list(z_vals[0], z_vals[1]),
             z_pairs.ravel(), z_vv]
            + slice_fields)
        return packed.string

    def _native_coders(self, y_full, z_full):
        """Builds (or returns cached) per-shape native coding jits.

        Returns (enc_z, enc_slice, dec_z_key, dec_slice, geom) where the
        encoders map device latents to device sidecar-coding outputs and
        geom carries the static stream geometry + transfer specs.
        """
        from compression_tpu.codec import jax_coder as jc
        from compression_tpu.models import native_format
        from compression_tpu.util import transfer as tr

        if not hasattr(self, "_native_coder_cache"):
            self._native_coder_cache = {}
        key = (tuple(y_full), tuple(z_full))
        cached = self._native_coder_cache.get(key)
        if cached is not None:
            return cached

        scale = getattr(self, "_compact_scale", 1)

        def geom_of(shape, channels, groups=1):
            """Stream geometry; ``groups`` stacks that many same-shape
            tensors into one wide coding call.  The fetch spec carries
            COMPACTED word buffers and a sliced escape sidecar (see
            bls2017._native_submit — the tunnel is bandwidth-sensitive),
            with adaptive-double fallback flags."""
            h, w = int(shape[1]), int(shape[2])
            c = int(channels)
            k = native_format.split_factor(w, c)
            s_streams, n = h * k, (w // k) * c
            total = groups * s_streams * n
            budget = jc.sidecar_budget(total)
            bw = jc.compact_budget_words(total, groups * s_streams, scale)
            fb = min(budget, scale * max(1024, total // 128))
            spec = [((bw,), "i32"),
                    ((groups * s_streams,), "i32"),
                    ((fb,), "i32"), ((fb,), "i32"),
                    ((), "i32"), ((), "bool"), ((), "bool")]
            return (h, w, c), n, s_streams, spec, (budget, bw, fb)

        ns = self.model.num_slices
        cs = int(y_full[3]) // ns
        gy, n_y, s_y, spec_y, (budget_y, bw_y, fb_y) = geom_of(
            y_full, cs, groups=ns)
        gz, n_z, s_z, spec_z, (budget_z, bw_z, fb_z) = geom_of(
            z_full, z_full[3])
        em_y, em_z = self.em_y, self.em_z

        enc_z = jax.jit(lambda zz: em_z.compress_sidecar_device(
            native_format.to_streams(zz), escape_budget=budget_z))

        def enc_slices(ys, sigs, mms):
            # One wide coding call over all slices' streams (encode has
            # no inter-slice decode dependency; stream bytes independent
            # of grouping).
            rows = jnp.concatenate(
                [native_format.to_streams(t) for t in ys])
            s_rows = jnp.concatenate(
                [native_format.to_streams(t) for t in sigs])
            m_rows = jnp.concatenate(
                [native_format.to_streams(t) for t in mms])
            return em_y.compress_sidecar_device(
                rows, s_rows, loc=m_rows, escape_budget=budget_y)

        def compacted(out, s_total, bw, fb):
            buf, lens, ei, ev, cnt, ok = out
            words, cok = jc.compact_streams(
                buf.reshape(s_total, -1), lens.reshape(-1), bw)
            return [words, lens.reshape(-1), ei[:fb], ev[:fb], cnt,
                    ok, cok & (cnt <= fb)]

        def pack_compact(z_out, y_out):
            return tr.pack_jit(
                compacted(z_out, s_z, bw_z, fb_z)
                + compacted(y_out, ns * s_y, bw_y, fb_y))

        geom = (gy, n_y, gz, n_z, spec_z, spec_y, s_y)
        cached = (enc_z, jax.jit(enc_slices), jax.jit(pack_compact),
                  None, geom)
        self._native_coder_cache[key] = cached
        return cached

    def _compress_native_host(self, x) -> bytes:
        """Host-wrapper native compress (untraced sidecar passes); the
        fallback behind compress_native and CTPU_FUSED_NATIVE=0."""
        from compression_tpu.codec import jax_coder as jc

        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        y, z = self._encode(self.params, x)
        x_shape = np.asarray(x.shape[1:-1], np.int32)
        y_shape = np.asarray(y.shape[1:-1], np.int32)
        z_shape = np.asarray(z.shape[1:-1], np.int32)

        from compression_tpu.models import native_format

        z_rows = native_format.to_streams(z)
        z_buf, z_len, z_ep, z_ev = self.em_z.compress_sidecar(z_rows)
        z_hat = self.em_z.quantize(z)
        latent_scales, latent_means = self._hyper_decode(self.params, z_hat)

        hy, wy = int(y.shape[1]), int(y.shape[2])
        y_slices = jnp.split(y, self.model.num_slices, axis=-1)
        y_hat_slices = []
        slice_fields = []
        for i, y_slice in enumerate(y_slices):
            support = (y_hat_slices if self.model.max_support_slices < 0
                       else y_hat_slices[: self.model.max_support_slices])
            mu, sigma, mean_support = self._slice_params(
                self.params, i, latent_means, latent_scales, tuple(support),
                tuple(int(s) for s in y_shape))
            cs = int(y_slice.shape[-1])
            y_rows = native_format.to_streams(y_slice)
            s_rows = native_format.to_streams(sigma)
            m_rows = native_format.to_streams(mu)
            buf, lens, ep, ev = self.em_y.compress_sidecar(
                y_rows, s_rows, loc=m_rows)
            slice_fields += [jc.to_bytes_list(buf, lens),
                             ep.ravel().astype(np.int32),
                             ev.astype(np.int32)]
            y_hat_rows = self.em_y.decompress_sidecar(
                buf, lens, s_rows, ep, ev, loc=m_rows)
            y_hat_slice = native_format.from_streams(
                y_hat_rows, hy, wy, cs)
            y_hat_slice = y_hat_slice + self._lrp(
                self.params, i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        packed = PackedTensors()
        packed.model = self.MODEL_ID
        packed.pack(
            [x_shape, y_shape, z_shape,
             jc.to_bytes_list(z_buf, z_len),
             z_ep.ravel().astype(np.int32), z_ev.astype(np.int32)]
            + slice_fields)
        return packed.string

    def _decompress_native(self, packed) -> np.ndarray:
        """Native-container decode: hyper sidecar decode, all 10
        autoregressive slice conditionings + sidecar range decodes, LRP
        and synthesis in a SINGLE jitted device program (one dispatch per
        image vs the reference's ~20 host<->device crossings,
        models/ms2020.py:391-430).  CTPU_FUSED_NATIVE=0 selects the
        untraced host-wrapper path."""
        import os

        from compression_tpu.codec import jax_coder as jc
        from compression_tpu.models import native_format

        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            return self._decompress_native_host(packed)
        x_hat, z_san, y_sans, x_hw = self._native_dec_submit(packed)
        fetched = jax.device_get((x_hat, z_san) + tuple(y_sans))
        x_hat, z_san = fetched[0], fetched[1]
        if self.em_y.decode_sanity_check and not (
                z_san.all() and all(s.all() for s in fetched[2:])):
            raise ValueError("Sanity check failed (corrupt bit streams).")
        return x_hat[0, : x_hw[0], : x_hw[1], :]

    def decompress_native_many(self, containers) -> list:
        """Throughput mode: pipelines N native containers through the
        async dispatch queue (mirrors compress_native_many)."""
        import os

        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            return [self.decompress(c) for c in containers]
        native_nt = 6 + 3 * self.model.num_slices
        submitted = []
        for c in containers:
            packed = PackedTensors(c)
            assert packed.model == self.MODEL_ID
            if packed.num_tensors != native_nt:
                submitted.append((None, c))
                continue
            submitted.append((self._native_dec_submit(packed), c))
        fetched = jax.device_get(
            [(s[0][0], s[0][1]) + tuple(s[0][2])
             for s in submitted if s[0] is not None])
        outs, it = [], iter(fetched)
        for s in submitted:
            if s[0] is None:
                outs.append(self.decompress(s[1]))
                continue
            got = next(it)
            x_hat, z_san, y_sans = got[0], got[1], got[2:]
            if self.em_y.decode_sanity_check and not (
                    z_san.all() and all(ss.all() for ss in y_sans)):
                raise ValueError(
                    "Sanity check failed (corrupt bit streams).")
            x_hw = s[0][3]
            outs.append(x_hat[0, : x_hw[0], : x_hw[1], :])
        return outs

    def _native_dec_submit(self, packed):
        """Submits one native container's decode dispatch chain; returns
        (device x_hat u8, device z sanity, list of device slice
        sanities, x_shape) with no blocking fetch."""
        from compression_tpu.codec import jax_coder as jc
        from compression_tpu.models import native_format
        from compression_tpu.util import transfer as tr

        ns = self.model.num_slices
        fields = packed.unpack(
            [np.int32, np.int32, np.int32, "bytes", np.int32, np.int32]
            + ["bytes", np.int32, np.int32] * ns)
        x_shape, y_shape, z_shape = fields[:3]
        z_strings, z_ep, z_ev = fields[3:6]
        hy, wy = int(y_shape[0]), int(y_shape[1])
        hz, wz = int(z_shape[0]), int(z_shape[1])
        cz = int(np.prod(self.em_z.prior_shape))
        cs = int(self.model.latent_depth) // ns
        k_z = native_format.split_factor_from_streams(
            len(list(z_strings)), hz)
        z_buf, z_len = jc.from_bytes_list(list(z_strings))
        # Upload RAW bytes (even width) and chunk-pack on device: u32
        # pre-chunking doubled the tunnel bytes of the container upload.
        if z_buf.shape[1] % 2:
            z_buf = np.pad(z_buf, ((0, 0), (0, 1)))
        n_z = (wz // k_z) * cz
        z_ei, z_evp = jc.sidecar_pad(
            z_ep.reshape(-1, 2), z_ev, n_z, z_buf.shape[0] * n_z)

        # Stack the slice streams: equal shapes by construction, padded
        # to the widest slice's chunk count; per-slice sidecars padded to
        # a common bucket.
        slice_strings = [list(fields[6 + 3 * i]) for i in range(ns)]
        k_y = native_format.split_factor_from_streams(
            len(slice_strings[0]), hy)
        n_y = (wy // k_y) * cs
        s_y = len(slice_strings[0])
        bufs, lens = zip(*(jc.from_bytes_list(s) for s in slice_strings))
        width = max(b.shape[1] for b in bufs)
        width += width % 2
        max_esc = max(fields[7 + 3 * i].size // 2 for i in range(ns))
        y_b8 = np.stack([
            np.pad(b, ((0, 0), (0, width - b.shape[1]))) for b in bufs])
        y_lens = np.stack(lens).astype(np.int32)
        esc = [jc.sidecar_pad(fields[7 + 3 * i].reshape(-1, 2),
                              fields[8 + 3 * i], n_y, s_y * n_y,
                              bucket=max(1024, max_esc))
               for i in range(ns)]
        y_ei = np.stack([e[0] for e in esc])
        y_evp = np.stack([e[1] for e in esc])

        # ONE packed upload; conditioning/LRP/synthesis run in the SAME
        # shared programs as the classic path and reconstruct(); the
        # chained dispatches submit asynchronously.
        in_arrays = [z_buf, z_len.astype(np.int32),
                     z_ei, z_evp, y_b8, y_lens,
                     y_ei, y_evp]
        in_spec = tr.pack_spec(in_arrays)
        if not hasattr(self, "_native_decoders"):
            self._native_decoders = {}
        key = (hy, wy, hz, wz, k_y, k_z, y_b8.shape[2], z_buf.shape[1],
               y_ei.shape[1], z_ei.shape[0])
        fns = self._native_decoders.get(key)
        if fns is None:
            em_z, em_y = self.em_z, self.em_y

            def decode_z(flat):
                (z_bb, z_lnd, z_eid, z_evd, y_bb, y_lnd, y_eid,
                 y_evd) = tr.unpack_jit(flat, in_spec)
                z16d = jc.chunks_from_bytes_jit(z_bb)
                z_rows, z_san = em_z.decompress_sidecar_device(
                    z16d, z_lnd, (1, wz // k_z), z_eid, z_evd)
                z_hat = native_format.from_streams(z_rows, hz, wz, cz)
                return z_hat, z_san, y_bb, y_lnd, y_eid, y_evd

            def decode_slice(bb, ln, sig, mm, ei, ev):
                s_rows = sig[0].reshape(hy * k_y, 1, wy // k_y, cs)
                m_rows = mm[0].reshape(hy * k_y, 1, wy // k_y, cs)
                y_rows, san = em_y.decompress_sidecar_device(
                    jc.chunks_from_bytes_jit(bb), ln, s_rows, ei, ev,
                    loc=m_rows)
                return native_format.from_streams(y_rows, hy, wy, cs), san

            fns = (jax.jit(decode_z), jax.jit(decode_slice))
            self._native_decoders[key] = fns
        dec_z, dec_slice = fns
        z_hat, z_san, y_bbd, y_lnd, y_eid, y_evd = dec_z(
            jnp.asarray(tr.pack_host(in_arrays)))
        latent_scales, latent_means = self._hyper_decode(self.params, z_hat)
        y_hat_slices = []
        y_sans = []
        for i in range(ns):
            support = (y_hat_slices if self.model.max_support_slices < 0
                       else y_hat_slices[: self.model.max_support_slices])
            mu, sigma, mean_support = self._slice_params(
                self.params, i, latent_means, latent_scales, tuple(support),
                (hy, wy))
            y_hat_slice, san = dec_slice(
                y_bbd[i], y_lnd[i], sigma, mu, y_eid[i], y_evd[i])
            y_sans.append(san)
            y_hat_slice = y_hat_slice + self._lrp(
                self.params, i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)
        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        return (self._decode_u8(self.params, y_hat), z_san, y_sans,
                (int(x_shape[0]), int(x_shape[1])))

    def _decompress_native_host(self, packed) -> np.ndarray:
        from compression_tpu.codec import jax_coder as jc

        ns = self.model.num_slices
        fields = packed.unpack(
            [np.int32, np.int32, np.int32, "bytes", np.int32, np.int32]
            + ["bytes", np.int32, np.int32] * ns)
        x_shape, y_shape, z_shape = fields[:3]
        z_strings, z_ep, z_ev = fields[3:6]

        from compression_tpu.models import native_format

        z_buf, z_len = jc.from_bytes_list(list(z_strings))
        hz, wz = int(z_shape[0]), int(z_shape[1])
        cz = int(np.prod(self.em_z.prior_shape))
        k_z = native_format.split_factor_from_streams(
            len(list(z_strings)), hz)
        z_rows = self.em_z.decompress_sidecar(
            z_buf, z_len, native_format.stream_broadcast_shape_k(wz, k_z),
            z_ep.reshape(-1, 2), z_ev)
        z_hat = native_format.from_streams(z_rows, hz, wz, cz)
        latent_scales, latent_means = self._hyper_decode(self.params, z_hat)

        hy, wy = int(y_shape[0]), int(y_shape[1])
        y_hat_slices = []
        for i in range(ns):
            strings, ep, ev = fields[6 + 3 * i : 9 + 3 * i]
            support = (y_hat_slices if self.model.max_support_slices < 0
                       else y_hat_slices[: self.model.max_support_slices])
            mu, sigma, mean_support = self._slice_params(
                self.params, i, latent_means, latent_scales, tuple(support),
                (hy, wy))
            cs = int(sigma.shape[-1])
            s_rows = native_format.to_streams(sigma)
            m_rows = native_format.to_streams(mu)
            buf, lens = jc.from_bytes_list(list(strings))
            y_hat_rows = self.em_y.decompress_sidecar(
                buf, lens, s_rows, ep.reshape(-1, 2), ev, loc=m_rows)
            y_hat_slice = native_format.from_streams(
                y_hat_rows, hy, wy, cs)
            y_hat_slice = y_hat_slice + self._lrp(
                self.params, i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self._decode_u8(self.params, y_hat)
        return np.asarray(x_hat)[0, : x_shape[0], : x_shape[1], :]

    # The round-3 single-jit device codec paths (compress_on_device /
    # decompress_on_device) were DEPRECATED and removed in round 5: the
    # post-compile-cache measurement (docs/device_paths.json) showed them
    # 10-15x slower than the chained-dispatch native container in both
    # directions — one giant program serializes the in-stream gamma decode
    # and cannot overlap the tunnel.  The EM-level building blocks
    # (compress_device / decompress_device) remain supported and tested.

    def reconstruct(self, x) -> np.ndarray:
        """Eval-mode reconstruction WITHOUT the range coder: quantized
        hyper-latent drives the slice-AR loop with em_y.quantize instead
        of compress/decompress.  decompress(compress(x)) must equal this
        exactly (the reference round-trip contract at model level)."""
        x = jnp.asarray(x)[None]
        y, z = self._encode(self.params, x)
        y_shape = y.shape[1:-1]
        z_hat = self.em_z.quantize(z)
        latent_scales, latent_means = self._hyper_decode(self.params, z_hat)

        y_slices = jnp.split(y, self.model.num_slices, axis=-1)
        y_hat_slices = []
        for i, y_slice in enumerate(y_slices):
            support = (y_hat_slices if self.model.max_support_slices < 0
                       else y_hat_slices[: self.model.max_support_slices])
            mu, _, mean_support = self._slice_params(
                self.params, i, latent_means, latent_scales, tuple(support),
                tuple(int(s) for s in y_shape))
            y_hat_slice = self.em_y.quantize(y_slice, loc=mu)
            y_hat_slice = y_hat_slice + self._lrp(
                self.params, i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self._decode_u8(self.params, y_hat)
        return np.asarray(x_hat)[0, : x.shape[1], : x.shape[2], :]

    def decompress(self, container: bytes) -> np.ndarray:
        packed = PackedTensors(container)
        assert packed.model == self.MODEL_ID
        if packed.num_tensors == 6 + 3 * self.model.num_slices:
            return self._decompress_native(packed)
        fields = packed.unpack(
            [np.int32, np.int32, np.int32, "bytes"]
            + ["bytes"] * self.model.num_slices)
        x_shape, y_shape, z_shape, z_strings = fields[:4]
        y_strings = fields[4:]

        z_hat = self.em_z.decompress(z_strings, tuple(z_shape))
        latent_scales, latent_means = self._hyper_decode(self.params, z_hat)

        y_hat_slices = []
        for i, slice_strings in enumerate(y_strings):
            support = (y_hat_slices if self.model.max_support_slices < 0
                       else y_hat_slices[: self.model.max_support_slices])
            mu, sigma, mean_support = self._slice_params(
                self.params, i, latent_means, latent_scales, tuple(support),
                tuple(int(s) for s in y_shape))
            y_hat_slice = self.em_y.decompress(slice_strings, sigma, loc=mu)
            y_hat_slice = y_hat_slice + self._lrp(
                self.params, i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self._decode_u8(self.params, y_hat)
        return np.asarray(x_hat)[0, : x_shape[0], : x_shape[1], :]


def main(argv=None):
    from compression_tpu.models import cli

    defaults = dict(
        lmbda=0.01, num_filters=192, latent_depth=320,
        hyperprior_depth=192, num_slices=10, max_support_slices=5,
        num_scales=64, scale_min=0.11, scale_max=256.0)

    def build_model(config):
        kwargs = {k: config.get(k, v) for k, v in defaults.items()}
        return MS2020Model(**kwargs)

    cli.run("ms2020", defaults, build_model, MS2020Codec, argv)


if __name__ == "__main__":
    main()
