"""Factorized-prior image codec (Ballé, Laparra, Simoncelli 2017).

JAX/flax counterpart of the reference's models/bls2017.py: a 3-layer
SignalConv2D analysis transform with GDN (downsampling 4,2,2), a mirrored
synthesis transform with IGDN, a NoisyDeepFactorized prior over the latent
channels, and a ContinuousBatchedEntropyModel with coding_rank=3.

"End-to-end Optimized Image Compression"
https://openreview.net/forum?id=rJxdQ3jeg
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.codec import jax_coder
from compression_tpu.distributions import deep_factorized, uniform_noise
from compression_tpu.entropy_models import ContinuousBatchedEntropyModel
from compression_tpu.layers import GDN, SignalConv2D
from compression_tpu.util.packed_tensors import PackedTensors

__all__ = [
    "AnalysisTransform",
    "SynthesisTransform",
    "BLS2017Model",
    "BLS2017Codec",
    "make_train_step",
]


class AnalysisTransform(nn.Module):
    """x/255 -> conv9x9 s4 GDN -> conv5x5 s2 GDN -> conv5x5 s2."""

    num_filters: int = 128

    @nn.compact
    def __call__(self, x):
        x = x / 255.0
        x = SignalConv2D(
            filters=self.num_filters, kernel_support=9, corr=True,
            strides_down=4, padding="same_zeros", use_bias=True,
            name="layer_0")(x)
        x = GDN(name="gdn_0")(x)
        x = SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=True,
            strides_down=2, padding="same_zeros", use_bias=True,
            name="layer_1")(x)
        x = GDN(name="gdn_1")(x)
        x = SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=True,
            strides_down=2, padding="same_zeros", use_bias=False,
            name="layer_2")(x)
        return x


class SynthesisTransform(nn.Module):
    """Mirrored upsampling transform with IGDN; output scaled to [0,255]."""

    num_filters: int = 128

    @nn.compact
    def __call__(self, y):
        y = SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=False,
            strides_up=2, padding="same_zeros", use_bias=True,
            name="layer_0")(y)
        y = GDN(inverse=True, name="igdn_0")(y)
        y = SignalConv2D(
            filters=self.num_filters, kernel_support=5, corr=False,
            strides_up=2, padding="same_zeros", use_bias=True,
            name="layer_1")(y)
        y = GDN(inverse=True, name="igdn_1")(y)
        y = SignalConv2D(
            filters=3, kernel_support=9, corr=False, strides_up=4,
            padding="same_zeros", use_bias=True, name="layer_2")(y)
        return y * 255.0


class BLS2017Model(nn.Module):
    """Rate-distortion training model."""

    lmbda: float = 0.01
    num_filters: int = 128

    def setup(self):
        self.analysis = AnalysisTransform(self.num_filters)
        self.synthesis = SynthesisTransform(self.num_filters)
        self.prior_params = self.param(
            "prior",
            lambda key: deep_factorized.DeepFactorized.init_params(
                key, (self.num_filters,)))

    def prior(self):
        return uniform_noise.UniformNoiseAdapter(
            deep_factorized.DeepFactorized(
                params=self.prior_params,
                batch_shape=(self.num_filters,)))

    def __call__(self, x, training=True, key=None):
        """Returns (loss, bpp, mse) for a uint8/float image batch NHWC."""
        x = jnp.asarray(x, jnp.float32)
        em = ContinuousBatchedEntropyModel(
            prior=self.prior(), coding_rank=3, compression=False,
            offset_heuristic=False)
        y = self.analysis(x)
        y_hat, bits = em(y, training=training, key=key)
        x_hat = self.synthesis(y_hat)
        # Crop any padding overshoot (image sizes not divisible by 16).
        x_hat = x_hat[:, : x.shape[1], : x.shape[2], :]
        num_pixels = np.prod(x.shape[:-1])
        bpp = jnp.sum(bits) / num_pixels
        mse = jnp.mean(jnp.square(x - x_hat))
        loss = bpp + self.lmbda * mse
        return loss, bpp, mse

    def encode(self, x):
        return self.analysis(x)

    def decode(self, y_hat):
        return self.synthesis(y_hat)


def make_train_step(model: BLS2017Model, optimizer):
    """Returns a jitted (params, opt_state, batch, key) -> ... train step."""

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            loss, bpp, mse = model.apply(
                p, batch, training=True, key=key)
            return loss, (bpp, mse)

        (loss, (bpp, mse)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "bpp": bpp, "mse": mse}

    return train_step


def train(lmbda=0.01, num_filters=128, batch_size=8, patchsize=256,
          steps=1000, learning_rate=1e-4, data_iter=None, seed=0,
          log_every=100):
    """Trains a BLS2017 model; returns (model, params).

    data_iter yields uint8/float NHWC batches; if None, random noise
    patches are used (smoke training only).
    """
    model = BLS2017Model(lmbda=lmbda, num_filters=num_filters)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    dummy = jnp.zeros((1, patchsize, patchsize, 3))
    params = model.init(init_key, dummy, training=False)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, optimizer)

    def default_iter():
        rng = np.random.RandomState(seed)
        while True:
            yield rng.randint(
                0, 256, (batch_size, patchsize, patchsize, 3)).astype(
                    np.float32)

    it = data_iter if data_iter is not None else default_iter()
    for step, batch in zip(range(steps), it):
        key, step_key = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(batch), step_key)
        if log_every and step % log_every == 0:
            print({k: float(v) for k, v in metrics.items()}, flush=True)
    return model, params


class BLS2017Codec:
    """Inference codec with frozen range-coding tables."""

    MODEL_ID = "bls2017"

    def __init__(self, model: BLS2017Model, params):
        self.model = model
        self.params = params
        prior = model.bind(params).prior()
        self.em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=3, compression=True)
        # Images upload as uint8 (3.9x fewer tunnel bytes than float32)
        # and cast on device; every codec entry point shares these two
        # programs, so compress/decompress/reconstruct see bit-identical
        # transform outputs.
        self._analysis = jax.jit(
            lambda p, x: model.apply(
                p, x.astype(jnp.float32), method=BLS2017Model.encode))
        self._synthesis = jax.jit(
            lambda p, y: model.apply(p, y, method=BLS2017Model.decode))
        self._synthesis_u8 = jax.jit(
            lambda p, y: jnp.clip(jnp.round(model.apply(
                p, y, method=BLS2017Model.decode)), 0, 255).astype(
                    jnp.uint8))

    def compress(self, x) -> bytes:
        """uint8 [H, W, 3] image -> .tfci container bytes."""
        x = jnp.asarray(x)[None]
        y = self._analysis(self.params, x)
        x_shape = np.asarray(x.shape[1:-1], np.int32)
        y_shape = np.asarray(y.shape[1:-1], np.int32)
        strings = self.em.compress_to_strings(y)
        packed = PackedTensors()
        packed.model = self.MODEL_ID
        packed.pack([strings, x_shape, y_shape])
        return packed.string

    def compress_native(self, x) -> bytes:
        """TPU-native container: one coder stream per latent row-block +
        escape sidecar, produced by a SINGLE jitted device program.

        Same model and tables as `compress`, but the latent is split into
        many independent coder streams (the axis the TPU kernels scale
        across) and out-of-range values are coded out of band, so both
        ends stay on the wide cond-free Pallas path.  Analysis transform,
        stream split, sidecar escape compaction and range encoding all run
        in ONE compiled program (one device dispatch per image); the host
        only packs the container.  Not byte-compatible with the reference
        .tfci format; `decompress` auto-detects the container kind.
        """
        import os

        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            return self._compress_native_host(np.asarray(x))
        flat_dev, meta = self._native_submit(x)
        return self._native_finalize(np.asarray(flat_dev), meta, x)

    def compress_native_many(self, images) -> list:
        """Throughput mode: pipelines N images through the async dispatch
        queue (all uploads + coding programs submit before the first
        fetch, so per-image tunnel RTTs overlap instead of serializing).
        Returns one container per image, each byte-identical to
        compress_native of that image.
        """
        import os

        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            return [self._compress_native_host(np.asarray(x))
                    for x in images]
        submitted = [self._native_submit(x) for x in images]
        flats = jax.device_get([s[0] for s in submitted])
        return [self._native_finalize(f, s[1], x)
                for (f, s), x in zip(zip(flats, submitted), images)]

    def _native_submit(self, x):
        """Uploads one image and submits its native-path programs;
        returns (device flat output, meta) without any blocking fetch."""
        from compression_tpu.models import native_format
        from compression_tpu.util import transfer as tr

        x = jnp.asarray(x)[None]
        # Analysis runs in the SAME shared program as compress() and
        # reconstruct() — y is bit-identical across entry points (the
        # round-trip contract) and never leaves the device.
        y = self._analysis(self.params, x)
        if not hasattr(self, "_native_encoders"):
            self._native_encoders = {}
        cached = self._native_encoders.get(y.shape)
        if cached is None:
            _, h, w, c = (int(s) for s in y.shape)
            k = native_format.split_factor(w, c)
            s_streams, n = h * k, (w // k) * c
            scale = getattr(self, "_compact_scale", 1)
            budget = jax_coder.sidecar_budget(s_streams * n)
            bw = jax_coder.compact_budget_words(s_streams * n, s_streams,
                                                scale)
            # Escape FETCH budget: the coding budget (1/32 of symbols)
            # is safety margin, but escapes are sorted ascending so only
            # the first `count` entries carry data — fetch a small slice
            # and fall into the adaptive-double path on overflow.
            fb = min(budget, scale * max(1024, s_streams * n // 128))
            spec = [((bw,), "i32"), ((s_streams,), "i32"),
                    ((fb,), "i32"), ((fb,), "i32"),
                    ((), "i32"), ((), "bool"), ((), "bool")]

            # The coding program touches floats only through IEEE-exact
            # ops (subtract/round), so it is deterministic on the shared
            # program's y; outputs pack into ONE int32 fetch, with the
            # per-stream byte buffers COMPACTED on device (the tunnel is
            # bandwidth-sensitive: ~35-65 us/KB measured, so fetching
            # ~260 KB of padding for ~90 KB of payload cost ~10 ms).
            def encode_all(yy):
                buf, lens, ei, ev, cnt, ok = self.em.compress_sidecar_device(
                    native_format.to_streams(yy), escape_budget=budget)
                words, cok = jax_coder.compact_streams(
                    buf.reshape(s_streams, -1), lens.reshape(-1), bw)
                return tr.pack_jit(
                    [words, lens.reshape(-1), ei[:fb], ev[:fb], cnt, ok,
                     cok & (cnt <= fb)])

            cached = (jax.jit(encode_all), spec, (h, w, c), n)
            self._native_encoders[y.shape] = cached
        fn, spec, geom, n = cached
        return fn(y), (spec, geom, n, tuple(int(s) for s in x.shape[1:-1]))

    def _native_finalize(self, flat, meta, x) -> bytes:
        from compression_tpu.models import native_format
        from compression_tpu.util import transfer as tr

        spec, (h, w, c), n, x_hw = meta
        (words, lens, esc_idx, esc_val, count, ok,
         cok) = tr.unpack_host(flat, spec)
        if not bool(ok):
            import warnings
            warnings.warn(
                "compress_native escape budget exceeded (extreme outlier "
                "latents); falling back to the host sidecar path for this "
                "image.", RuntimeWarning, stacklevel=2)
            return self._compress_native_host(np.asarray(x))
        if not bool(cok):
            # Pathological payload (> ~8 bits/symbol): double the fetch
            # budget for subsequent images and take the host path now.
            import warnings
            warnings.warn(
                "compress_native compact fetch budget exceeded; doubling "
                "the budget (re-traces on the next call) and falling back "
                "to the host sidecar path for this image.",
                RuntimeWarning, stacklevel=2)
            self._compact_scale = 2 * getattr(self, "_compact_scale", 1)
            self._native_encoders = {}
            return self._compress_native_host(np.asarray(x))
        pairs, vals = native_format.esc_to_pairs(esc_idx, esc_val, count, n)
        packed = PackedTensors()
        packed.model = self.MODEL_ID
        packed.pack([
            jax_coder.compact_to_bytes_list(words, lens),
            np.asarray(x_hw, np.int32),
            np.asarray((h, w), np.int32),
            pairs.ravel(), vals])
        return packed.string

    def _compress_native_host(self, x) -> bytes:
        """Host-wrapper native compress (untraced sidecar pass); the
        fallback behind compress_native and the CTPU_FUSED_NATIVE=0
        debug switch."""
        from compression_tpu.models import native_format

        x = jnp.asarray(x, jnp.float32)[None]
        y = self._analysis(self.params, x)
        x_shape = np.asarray(x.shape[1:-1], np.int32)
        y_shape = np.asarray(y.shape[1:-1], np.int32)
        y_rows = native_format.to_streams(y)
        buf, lengths, esc_pos, esc_val = self.em.compress_sidecar(y_rows)
        strings = jax_coder.to_bytes_list(buf, lengths)
        packed = PackedTensors()
        packed.model = self.MODEL_ID
        packed.pack([strings, x_shape, y_shape,
                     esc_pos.ravel().astype(np.int32),
                     esc_val.astype(np.int32)])
        return packed.string

    def reconstruct(self, x) -> np.ndarray:
        """Eval-mode reconstruction WITHOUT the range coder: quantize the
        latents with the codec's own entropy model and synthesize.  The
        reference round-trip contract is decompress(compress(x)) ==
        reconstruct(x) exactly (continuous_batched_test.py:103-110 lifted
        to model level)."""
        x = jnp.asarray(x)[None]
        y = self._analysis(self.params, x)
        y_hat = self.em.quantize(y)
        x_hat = self._synthesis_u8(self.params, y_hat)
        return np.asarray(x_hat)[0, : x.shape[1], : x.shape[2], :]

    def decompress(self, container: bytes) -> np.ndarray:
        packed = PackedTensors(container)
        assert packed.model == self.MODEL_ID
        if packed.num_tensors == 5:  # native multi-stream container
            return self._decompress_native(packed)
        strings, x_shape, y_shape = packed.unpack(
            ["bytes", np.int32, np.int32])
        y_hat = self.em.decompress(strings, tuple(y_shape))
        x_hat = self._synthesis_u8(self.params, y_hat)
        return np.asarray(x_hat)[0, : x_shape[0], : x_shape[1], :]

    def _decompress_native(self, packed) -> np.ndarray:
        """Native-container decode: sidecar range decode, stream merge and
        synthesis in a SINGLE jitted device program (one dispatch); the
        host only parses the container.  CTPU_FUSED_NATIVE=0 selects the
        untraced host-wrapper path instead."""
        import os

        from compression_tpu.models import native_format

        strings, x_shape, y_shape, esc_flat, esc_val = packed.unpack(
            ["bytes", np.int32, np.int32, np.int32, np.int32])
        buf, lens = jax_coder.from_bytes_list(strings)
        h, w = int(y_shape[0]), int(y_shape[1])
        c = int(np.prod(self.em.prior_shape))
        # k from the stream COUNT: containers from any split policy
        # (incl. pre-split k=1 writers) stay decodable (ADVICE r3).
        k = native_format.split_factor_from_streams(len(strings), h)
        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            y_rows = self.em.decompress_sidecar(
                buf, lens, native_format.stream_broadcast_shape_k(w, k),
                esc_flat.reshape(-1, 2), esc_val)
            y_hat = native_format.from_streams(y_rows, h, w, c)
            x_hat = self._synthesis_u8(self.params, y_hat)
            return np.asarray(x_hat)[0, : x_shape[0], : x_shape[1], :]
        x_hat, sanity, x_hw = self._native_dec_submit(packed)
        x_hat, sanity = jax.device_get((x_hat, sanity))
        if self.em.decode_sanity_check and not sanity.all():
            raise ValueError("Sanity check failed (corrupt bit streams).")
        return x_hat[0, : x_hw[0], : x_hw[1], :]

    def decompress_native_many(self, containers) -> list:
        """Throughput mode: pipelines N native containers through the
        async dispatch queue (mirrors compress_native_many).  Outputs are
        identical to per-container decompress."""
        import os

        if os.environ.get("CTPU_FUSED_NATIVE", "1") == "0":
            return [self.decompress(c) for c in containers]
        submitted = []
        for c in containers:
            packed = PackedTensors(c)
            assert packed.model == self.MODEL_ID
            if packed.num_tensors != 5:  # classic container: no pipeline
                submitted.append((None, None, c))
                continue
            x_hat, sanity, x_shape = self._native_dec_submit(packed)
            submitted.append((x_hat, sanity, x_shape))
        fetched = jax.device_get(
            [(s[0], s[1]) for s in submitted if s[0] is not None])
        outs, it = [], iter(fetched)
        for s in submitted:
            if s[0] is None:
                outs.append(self.decompress(s[2]))
                continue
            x_hat, sanity = next(it)
            if self.em.decode_sanity_check and not sanity.all():
                raise ValueError(
                    "Sanity check failed (corrupt bit streams).")
            outs.append(x_hat[0, : s[2][0], : s[2][1], :])
        return outs

    def _native_dec_submit(self, packed):
        """Submits one native container's decode programs; returns
        (device x_hat u8, device sanity, x_shape) with no blocking
        fetch.  The tail of _decompress_native refactored for
        pipelining."""
        from compression_tpu.models import native_format
        from compression_tpu.util import transfer as tr

        strings, x_shape, y_shape, esc_flat, esc_val = packed.unpack(
            ["bytes", np.int32, np.int32, np.int32, np.int32])
        buf, lens = jax_coder.from_bytes_list(strings)
        h, w = int(y_shape[0]), int(y_shape[1])
        c = int(np.prod(self.em.prior_shape))
        k = native_format.split_factor_from_streams(len(strings), h)
        n = (w // k) * c
        # Upload RAW bytes (even width) and chunk-pack on device: u32
        # pre-chunking doubled the tunnel bytes of the container upload.
        if buf.shape[1] % 2:
            buf = np.pad(buf, ((0, 0), (0, 1)))
        esc_idx, esc_v = jax_coder.sidecar_pad(
            esc_flat.reshape(-1, 2), esc_val, n, len(strings) * n)
        in_arrays = [buf, lens.astype(np.int32), esc_idx, esc_v]
        in_spec = tr.pack_spec(in_arrays)
        if not hasattr(self, "_native_decoders"):
            self._native_decoders = {}
        key = (h, w, k, buf.shape[1], esc_idx.shape[0])
        fn = self._native_decoders.get(key)
        if fn is None:
            def decode_streams_only(flat):
                bb, ln, ei, ev = tr.unpack_jit(flat, in_spec)
                s16 = jax_coder.chunks_from_bytes_jit(bb)
                y_rows, sanity = self.em.decompress_sidecar_device(
                    s16, ln, (1, w // k), ei, ev)
                return native_format.from_streams(y_rows, h, w, c), sanity

            fn = jax.jit(decode_streams_only)
            self._native_decoders[key] = fn
        y_hat, sanity = fn(jnp.asarray(tr.pack_host(in_arrays)))
        return (self._synthesis_u8(self.params, y_hat), sanity,
                (int(x_shape[0]), int(x_shape[1])))


def main(argv=None):
    from compression_tpu.models import cli

    def build_model(config):
        return BLS2017Model(
            lmbda=config.get("lmbda", 0.01),
            num_filters=config.get("num_filters", 128))

    cli.run("bls2017", dict(lmbda=0.01, num_filters=128),
            build_model, BLS2017Codec, argv)


if __name__ == "__main__":
    main()


# The round-3 single-jit device codec paths (compress_on_device /
# decompress_on_device: transforms + entropy coding in ONE XLA program)
# were DEPRECATED and removed in round 5: the post-compile-cache
# measurement (docs/device_paths.json) showed them 10-15x slower than
# the chained-dispatch native container in both directions on every
# family — one giant program serializes the in-stream gamma decode and
# cannot overlap the tunnel, while chained dispatch pipelines it.  The
# EM-level building blocks (compress_device / decompress_device on the
# entropy models) remain supported and tested.
