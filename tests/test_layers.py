"""Layer tests.

SignalConv is compared against an independent numpy implementation of the
DSP spec (explicit upsample -> pad -> correlate -> downsample), the same
strategy as the reference's signal_conv_test.py:168-737.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu.layers import GDN, SignalConv1D, SignalConv2D
from compression_tpu.layers import parameters, signal_conv
from compression_tpu.layers.initializers import identity_initializer


def np_upsample(x, strides_up, extra_pad_end):
    """Zero-insertion upsampling per spatial dim of an n-D array."""
    for d, s in enumerate(strides_up):
        if s == 1:
            continue
        n = x.shape[d]
        length = n * s if extra_pad_end else (n - 1) * s + 1
        shape = list(x.shape)
        shape[d] = length
        up = np.zeros(shape, x.dtype)
        idx = [slice(None)] * x.ndim
        idx[d] = slice(None, None, s)
        up[tuple(idx)] = x
        x = up
    return x


def np_correlate_valid(x, h):
    """n-D valid correlation (no scipy dependency)."""
    out_shape = tuple(x.shape[d] - h.shape[d] + 1 for d in range(x.ndim))
    out = np.zeros(out_shape, np.float64)
    for idx in np.ndindex(*h.shape):
        slices = tuple(
            slice(idx[d], idx[d] + out_shape[d]) for d in range(x.ndim))
        out += h[idx] * x[slices]
    return out


def np_signal_conv(x, kernel, corr, strides_up, strides_down, padding,
                   extra_pad_end):
    """Spec implementation for one (in->out) channel pair, spatial only."""
    rank = x.ndim
    up = np_upsample(x, strides_up, extra_pad_end)
    h = kernel if corr else np.flip(kernel, axis=tuple(range(rank)))
    if padding == "valid":
        padded = up
    else:
        pads = []
        for d in range(rank):
            k = kernel.shape[d]
            before = k // 2 if corr else (k - 1) // 2
            pads.append((before, k - 1 - before))
        mode = "constant" if padding == "same_zeros" else "reflect"
        padded = np.pad(up, pads, mode=mode)
    out = np_correlate_valid(padded, h)
    idx = tuple(slice(None, None, s) for s in strides_down)
    return out[idx]


class TestSignalConvAgainstSpec:
    @pytest.mark.parametrize(
        "corr,s_up,s_down,padding,extra_pad_end,k",
        [
            (corr, s_up, s_down, padding, extra, k)
            for corr, s_up, s_down, padding, extra, k in itertools.product(
                [True, False], [1, 2], [1, 2],
                ["valid", "same_zeros"], [True, False], [1, 3, 4, 5])
            if not (s_up > 1 and s_down > 1)  # rational resampling: skip
        ],
    )
    def test_1d(self, corr, s_up, s_down, padding, extra_pad_end, k):
        rng = np.random.RandomState(0)
        n = 11
        x = rng.randn(n).astype(np.float32)
        kernel = rng.randn(k).astype(np.float32)

        expected = np_signal_conv(
            x, kernel, corr, (s_up,), (s_down,), padding, extra_pad_end)

        got = signal_conv(
            jnp.asarray(x)[None, :, None],
            jnp.asarray(kernel)[:, None, None],
            corr=corr, strides_down=s_down, strides_up=s_up,
            padding=padding, extra_pad_end=extra_pad_end)
        got = np.asarray(got)[0, :, 0]
        assert got.shape == expected.shape, (got.shape, expected.shape)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("corr,s_up,s_down,padding", [
        (True, 1, 2, "same_zeros"),
        (False, 2, 1, "same_zeros"),
        (True, 1, 1, "valid"),
        (False, 1, 2, "valid"),
        (True, 1, 2, "same_reflect"),
    ])
    def test_2d(self, corr, s_up, s_down, padding):
        rng = np.random.RandomState(1)
        x = rng.randn(8, 9).astype(np.float32)
        kernel = rng.randn(5, 3).astype(np.float32)
        expected = np_signal_conv(
            x, kernel, corr, (s_up, s_up), (s_down, s_down), padding, True)
        got = signal_conv(
            jnp.asarray(x)[None, :, :, None],
            jnp.asarray(kernel)[:, :, None, None],
            corr=corr, strides_down=s_down, strides_up=s_up,
            padding=padding, extra_pad_end=True)
        got = np.asarray(got)[0, :, :, 0]
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_multichannel_sums_inputs(self):
        rng = np.random.RandomState(2)
        x = rng.randn(2, 10, 3).astype(np.float32)
        kernel = rng.randn(3, 3, 4).astype(np.float32)
        got = signal_conv(
            jnp.asarray(x)[:, :, :], jnp.asarray(kernel),
            corr=True, padding="same_zeros")
        expected = np.zeros((2, 10, 4))
        for b in range(2):
            for o in range(4):
                for i in range(3):
                    expected[b, :, o] += np_signal_conv(
                        x[b, :, i], kernel[:, i, o], True, (1,), (1,),
                        "same_zeros", True)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                                   atol=1e-5)

    def test_channel_separable(self):
        rng = np.random.RandomState(3)
        x = rng.randn(1, 12, 2).astype(np.float32)
        # Depthwise kernel: [k, 1, in*filters], filters=1.
        kernel = rng.randn(3, 1, 2).astype(np.float32)
        got = signal_conv(
            jnp.asarray(x), jnp.asarray(kernel), corr=True,
            padding="same_zeros", channel_separable=True)
        for i in range(2):
            expected = np_signal_conv(
                x[0, :, i], kernel[:, 0, i], True, (1,), (1,),
                "same_zeros", True)
            np.testing.assert_allclose(
                np.asarray(got)[0, :, i], expected, rtol=1e-4, atol=1e-5)


class TestSignalConvModule:
    def test_build_and_shapes(self):
        conv = SignalConv2D(
            filters=8, kernel_support=5, corr=True, strides_down=2,
            padding="same_zeros", use_bias=True)
        x = jnp.ones((2, 16, 16, 3))
        params = conv.init(jax.random.PRNGKey(0), x)
        y = conv.apply(params, x)
        assert y.shape == (2, 8, 8, 8)

    def test_upsampling_shapes(self):
        conv = SignalConv2D(
            filters=4, kernel_support=5, corr=False, strides_up=2,
            padding="same_zeros", use_bias=True)
        x = jnp.ones((1, 8, 8, 2))
        params = conv.init(jax.random.PRNGKey(0), x)
        y = conv.apply(params, x)
        assert y.shape == (1, 16, 16, 4)

    def test_rdft_kernel_roundtrip(self):
        rng = np.random.RandomState(0)
        kernel = rng.randn(5, 3, 2, 4).astype(np.float32)
        real, imag = parameters.rdft_init(kernel)
        back = parameters.rdft_to_kernel(real, imag, (5, 3))
        np.testing.assert_allclose(np.asarray(back), kernel, atol=1e-5)

    def test_identity_initializer(self):
        init = identity_initializer()
        kernel = init(None, (5, 3, 3), jnp.float32)
        x = jnp.asarray(np.random.RandomState(1).randn(1, 10, 3), jnp.float32)
        y = signal_conv(x, kernel, corr=True, padding="same_zeros")
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_gradients_finite(self):
        conv = SignalConv2D(
            filters=4, kernel_support=3, corr=True, strides_down=2,
            padding="same_zeros", use_bias=True)
        x = jnp.ones((1, 8, 8, 2))
        params = conv.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(conv.apply(p, x) ** 2))(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)


class TestGDN:
    def test_forward_math(self):
        gdn = GDN()
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 4, 4, 3), jnp.float32)
        params = gdn.init(jax.random.PRNGKey(0), x)
        y = gdn.apply(params, x)
        # At init: beta=1, gamma=0.1*I, alpha=epsilon=1:
        # y = x / (1 + 0.1 |x|).
        expected = np.asarray(x) / (1 + 0.1 * np.abs(np.asarray(x)))
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4,
                                   atol=1e-5)

    def test_igdn_inverts_gdn_at_init(self):
        x = jnp.asarray(
            np.random.RandomState(1).rand(1, 4, 4, 2), jnp.float32)
        gdn, igdn = GDN(), GDN(inverse=True)
        pg = gdn.init(jax.random.PRNGKey(0), x)
        y = gdn.apply(pg, x)
        # One fixed-point iteration of the inverse is not exact, but near
        # the identity region it should be close.
        z = igdn.apply(pg, y)
        np.testing.assert_allclose(np.asarray(z), np.asarray(x), rtol=0.05,
                                   atol=0.02)

    def test_alpha_epsilon_variants(self):
        x = jnp.asarray(
            np.random.RandomState(2).randn(2, 8, 3), jnp.float32)
        gdn = GDN(alpha=2.0, epsilon=0.5)
        params = gdn.init(jax.random.PRNGKey(0), x)
        y = gdn.apply(params, x)
        expected = np.asarray(x) / np.sqrt(
            1 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4,
                                   atol=1e-5)

    def test_trainable_alpha_epsilon(self):
        x = jnp.ones((1, 4, 2))
        gdn = GDN(alpha=None, epsilon=None)
        params = gdn.init(jax.random.PRNGKey(0), x)
        y = gdn.apply(params, x)
        assert np.all(np.isfinite(np.asarray(y)))
        g = jax.grad(lambda p: jnp.sum(gdn.apply(p, x) ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))

    def test_rectify(self):
        x = jnp.asarray([[-1.0, 2.0]])
        gdn = GDN(rectify=True)
        params = gdn.init(jax.random.PRNGKey(0), x)
        y = gdn.apply(params, x)
        assert float(y[0, 0]) == 0.0
        assert float(y[0, 1]) > 0


class TestGDNParameter:
    def test_value_roundtrip(self):
        initial = jnp.asarray([0.0, 0.5, 2.0])
        var = parameters.gdn_param_init(initial)
        value = parameters.gdn_param_value(var)
        np.testing.assert_allclose(np.asarray(value), np.asarray(initial),
                                   atol=1e-6)

    def test_minimum_enforced(self):
        var = jnp.asarray([-5.0, 0.0, 1.0])
        value = parameters.gdn_param_value(var, minimum=1e-6)
        assert np.all(np.asarray(value) >= 1e-6 - 1e-9)


def np_identity_kernel(support, channels=1):
    """Reference IdentityInitializer: 1 at support//2 per dim (initializers.py:25-55)."""
    k = np.zeros(tuple(support) + (channels, channels), np.float32)
    center = tuple(s // 2 for s in support)
    for c in range(channels):
        k[center + (c, c)] = 1.0
    return k


class TestSignalConvReferenceMatrix:
    """Ports the reference signal_conv_test.py:168-737 coverage: rational
    resampling, 3-D, same_zeros/same_reflect identity alignment, and the
    channel_separable output ordering."""

    @pytest.mark.parametrize(
        "corr,s_down,s_up,extra,k",
        [(corr, sd, su, extra, k)
         for corr in [True, False]
         for sd, su, extra in [(2, 3, True), (3, 2, True), (2, 2, False),
                               (5, 3, True), (2, 3, False)]
         for k in [1, 2, 3, 7]],
    )
    def test_1d_valid_rational_resampling(self, corr, s_down, s_up, extra, k):
        rng = np.random.RandomState(k + s_down * 10 + s_up)
        x = rng.randint(0, 32, 13).astype(np.float32)
        kernel = rng.randint(0, 16, k).astype(np.float32)
        expected = np_signal_conv(
            x, kernel, corr, (s_up,), (s_down,), "valid", extra)
        got = signal_conv(
            jnp.asarray(x)[None, :, None],
            jnp.asarray(kernel)[:, None, None],
            corr=corr, strides_down=s_down, strides_up=s_up,
            padding="valid", extra_pad_end=extra)
        got = np.asarray(got)[0, :, 0]
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, rtol=0, atol=1e-3)

    @pytest.mark.parametrize(
        "corr,s_down,s_up,ks",
        [(corr, sd, su, ks)
         for corr in [True, False]
         for sd, su in [((3, 5), (1, 1)), ((1, 1), (4, 3)), ((2, 2), (3, 2))]
         for ks in [(5, 2), (2, 3), (3, 3)]],
    )
    def test_2d_valid_anisotropic(self, corr, s_down, s_up, ks):
        rng = np.random.RandomState(sum(ks) + s_down[0])
        x = rng.randint(0, 32, (10, 9)).astype(np.float32)
        kernel = rng.randint(0, 16, ks).astype(np.float32)
        expected = np_signal_conv(
            x, kernel, corr, s_up, s_down, "valid", True)
        got = signal_conv(
            jnp.asarray(x)[None, :, :, None],
            jnp.asarray(kernel)[:, :, None, None],
            corr=corr, strides_down=s_down, strides_up=s_up,
            padding="valid", extra_pad_end=True)
        got = np.asarray(got)[0, :, :, 0]
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, rtol=0, atol=1e-3)

    @pytest.mark.parametrize(
        "corr,s_down,s_up",
        [(corr, sd, su)
         for corr in [True, False]
         for sd, su in [((1, 1, 1), (1, 1, 1)), ((2, 1, 2), (1, 1, 1)),
                        ((1, 1, 1), (2, 2, 1))]],
    )
    def test_3d_valid(self, corr, s_down, s_up):
        rng = np.random.RandomState(7)
        x = rng.randint(0, 32, (6, 5, 7)).astype(np.float32)
        kernel = rng.randint(0, 16, (3, 2, 3)).astype(np.float32)
        expected = np_signal_conv(
            x, kernel, corr, s_up, s_down, "valid", True)
        got = signal_conv(
            jnp.asarray(x)[None, :, :, :, None],
            jnp.asarray(kernel)[:, :, :, None, None],
            corr=corr, strides_down=s_down, strides_up=s_up,
            padding="valid", extra_pad_end=True)
        got = np.asarray(got)[0, :, :, :, 0]
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, rtol=0, atol=1e-3)

    @pytest.mark.parametrize(
        "rank,padding,corr,s_down,s_up,extra,k",
        [(rank, padding, corr, sd, su, extra, k)
         for rank in [1, 2]
         for padding in ["same_zeros", "same_reflect"]
         for corr in [True, False]
         for sd, su, extra in [(1, 1, True), (1, 2, False), (1, 3, True),
                               (2, 1, True), (5, 1, True), (2, 3, True)]
         for k in [1, 2, 3, 7]],
    )
    def test_same_identity_alignment(self, rank, padding, corr, s_down,
                                     s_up, extra, k):
        """Identity kernel => output equals the up/downsampled input
        (the reference's run_same strategy, signal_conv_test.py:268-314),
        pinning the centered-padding alignment for every mode."""
        n = 12 if rank == 1 else (8, 9)
        shape = (n,) if rank == 1 else n
        x = np.arange(np.prod(shape), dtype=np.float32).reshape(shape) + 1
        support = (k,) * rank
        kernel = np_identity_kernel(support)
        up = np_upsample(x, (s_up,) * rank, extra)
        idx = tuple(slice(None, None, s_down) for _ in range(rank))
        expected = up[idx]
        got = signal_conv(
            jnp.asarray(x)[None, ..., None],
            jnp.asarray(kernel),
            corr=corr, strides_down=s_down, strides_up=s_up,
            padding=padding, extra_pad_end=extra)
        got = np.asarray(got)[0, ..., 0]
        assert got.shape == expected.shape, (got.shape, expected.shape)
        np.testing.assert_allclose(got, expected, rtol=0, atol=1e-3)

    @pytest.mark.parametrize("rank", [1, 2])
    @pytest.mark.parametrize("filters", [1, 2])
    @pytest.mark.parametrize("s_up", [1, 2])
    def test_channel_separable_ordering(self, rank, filters, s_up):
        """channel_separable output ordering is channel_in*filters +
        filter_out (reference signal_conv_test.py:196-216)."""
        rng = np.random.RandomState(rank * 10 + filters + s_up)
        channels = 2
        shape = (9,) if rank == 1 else (7, 6)
        x = rng.randint(0, 32, (1,) + shape + (channels,)).astype(np.float32)
        support = (3,) * rank
        kernel = rng.randint(
            0, 16, support + (channels, filters)).astype(np.float32)
        # Layer layout for channel_separable: [spatial..., 1, in*filters],
        # input-channel-major (same as TF depthwise kernels).
        kernel_flat = kernel.reshape(support + (1, channels * filters))
        got = signal_conv(
            jnp.asarray(x), jnp.asarray(kernel_flat), corr=True,
            strides_up=s_up, padding="valid", extra_pad_end=True,
            channel_separable=True)
        got = np.asarray(got)
        for ci in range(channels):
            for fo in range(filters):
                expected = np_signal_conv(
                    x[0, ..., ci], kernel[..., ci, fo], True,
                    (s_up,) * rank, (1,) * rank, "valid", True)
                np.testing.assert_allclose(
                    got[0, ..., ci * filters + fo], expected,
                    rtol=0, atol=1e-3,
                    err_msg=f"ci={ci} fo={fo}")


class TestKernelInit:
    def test_variance_scaling_truncation_correction(self):
        """Kernel init must match Keras VarianceScaling(scale=1, fan_in,
        truncated_normal): samples have std sqrt(1/fan_in) AFTER the
        (-2, 2) truncation (the /0.8796 correction the reference's
        default kernel_initializer applies; its omission started kernels
        ~12% small and measurably slowed ms2020 training — round 3)."""
        conv = SignalConv2D(
            filters=256, kernel_support=5, corr=True, strides_down=1,
            padding="same_zeros", use_bias=False,
            kernel_parameter="variable")
        params = conv.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 64)))
        kernel = params["params"]["kernel"]
        fan_in = 5 * 5 * 64
        target = (1.0 / fan_in) ** 0.5
        std = float(jnp.std(kernel))
        assert abs(std - target) / target < 0.03, (std, target)
