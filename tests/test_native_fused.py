"""Chained-dispatch native codec paths (round 4).

Contract under test (models/{bls2017,bmshj2018,ms2020}.py native paths,
util/transfer.py, the traced sidecar EM methods):

  * the chained device path emits containers BYTE-IDENTICAL to the
    untraced host sidecar path (CTPU_FUSED_NATIVE=0),
  * decompress(compress_native(x)) == reconstruct(x) exactly,
  * transfer packing round-trips all supported dtypes both directions,
  * containers written with a k=1 stream layout (pre-split writers)
    still decode — k derives from the container's stream count
    (ADVICE r3: native_format.split_factor_from_streams),
  * the escape-budget-exceeded encoder falls back to the host path with
    a warning and a decodable container.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compression_tpu.models import bls2017, bmshj2018, ms2020
from compression_tpu.models import native_format


@pytest.fixture(autouse=True)
def _fused_default():
    old = os.environ.pop("CTPU_FUSED_NATIVE", None)
    yield
    if old is None:
        os.environ.pop("CTPU_FUSED_NATIVE", None)
    else:
        os.environ["CTPU_FUSED_NATIVE"] = old


def _image(h=64, w=64, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


def _build(family):
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3))
    if family == "bls2017":
        model = bls2017.BLS2017Model(lmbda=0.01, num_filters=16)
        params = model.init(key, dummy, training=False)
        return bls2017.BLS2017Codec(model, params)
    if family == "bmshj2018":
        model = bmshj2018.BMSHJ2018Model(lmbda=0.01, num_filters=16)
        params = model.init(key, dummy, training=False)
        return bmshj2018.BMSHJ2018Codec(model, params)
    if family == "hific":
        from compression_tpu.models import hific
        model = hific.HiFiCModel(cfg=hific.HiFiCConfig(
            num_down=2, num_filters_base=8, num_filters_bottleneck=12,
            num_residual_blocks=1, hyper_filters=12))
        params = model.init(key, dummy, training=False)
        return hific.HiFiCCodec(model, params)
    model = ms2020.MS2020Model(
        lmbda=0.01, num_filters=16, latent_depth=20, hyperprior_depth=8,
        num_slices=5, max_support_slices=3, ha_widths=(20, 16),
        hs_widths=(12, 16, 20), slice_widths=(14, 8))
    params = model.init(key, dummy, training=False)
    return ms2020.MS2020Codec(model, params)


@pytest.mark.parametrize("family", ["bls2017", "bmshj2018", "ms2020",
                                    "hific"])
def test_fused_container_matches_host_path(family):
    codec = _build(family)
    x8 = _image()
    fused = codec.compress_native(x8)
    os.environ["CTPU_FUSED_NATIVE"] = "0"
    host = codec.compress_native(x8)
    del os.environ["CTPU_FUSED_NATIVE"]
    assert fused == host


@pytest.mark.parametrize("family", ["bls2017", "bmshj2018", "ms2020",
                                    "hific"])
def test_fused_roundtrip_equals_reconstruct(family):
    codec = _build(family)
    x8 = _image(seed=11)
    native = codec.compress_native(x8)
    out = codec.decompress(native)
    rec = codec.reconstruct(x8)
    assert np.array_equal(out, rec)
    # The fused and host decode paths agree on the same container.
    os.environ["CTPU_FUSED_NATIVE"] = "0"
    out_host = codec.decompress(native)
    del os.environ["CTPU_FUSED_NATIVE"]
    assert np.array_equal(out_host, rec)


def test_k1_layout_container_still_decodes(monkeypatch):
    """Containers written by a k=1 (pre-split) writer decode correctly:
    the decoder derives k from the stream count, not from (W, C)."""
    codec = _build("bls2017")
    x8 = _image(seed=3)
    rec = codec.reconstruct(x8)
    # Force the writer to keep whole rows (k=1) regardless of MAX_ELEMS.
    monkeypatch.setattr(native_format, "split_factor",
                        lambda w, c, max_elems=512: 1)
    container = codec.compress_native(x8)
    monkeypatch.undo()
    assert np.array_equal(codec.decompress(container), rec)


def _force_outliers(codec, family):
    """Wraps the codec's shared latent jit so two latent values become
    extreme outliers (+-500, far outside any table's support): escapes
    are deterministic for every seed/config, so the budget-exceeded
    branch always runs instead of skipping (VERDICT/ADVICE r4).  The
    wrapper replaces the shared program for EVERY entry point
    (compress_native, the host fallback, reconstruct), preserving the
    round-trip contract."""
    if family == "bls2017":
        real = codec._analysis

        def patched(params, x):
            y = real(params, x)
            return y.at[0, 0, 0, 0].set(500.0).at[0, 1, 1, 0].set(-500.0)

        codec._analysis = patched
    else:
        real = codec._encode

        def patched(params, x):
            y, z = real(params, x)
            y = y.at[0, 0, 0, 0].set(500.0).at[0, 1, 1, 0].set(-500.0)
            return y, z

        codec._encode = patched


@pytest.mark.parametrize("family", ["bls2017", "bmshj2018", "ms2020",
                                    "hific"])
def test_escape_budget_fallback_warns_and_roundtrips(family, monkeypatch):
    codec = _build(family)
    x8 = _image(seed=5)
    _force_outliers(codec, family)
    rec = codec.reconstruct(x8)
    # Under the real budget the forced escapes fit: the fused container
    # round-trips (nonzero-escape container parity).
    container_ok = codec.compress_native(x8)
    assert np.array_equal(codec.decompress(container_ok), rec)
    # Shrink the budget below the (>= 2) escape count and rebuild the
    # coding jits: the fused encoder must report ok=False, warn, and
    # fall back to the host sidecar path with an equivalent container.
    from compression_tpu.codec import jax_coder as jc
    monkeypatch.setattr(jc, "sidecar_budget", lambda n: 1)
    for attr in ("_native_encoders", "_native_coder_cache"):
        if hasattr(codec, attr):
            delattr(codec, attr)
    with pytest.warns(RuntimeWarning, match="escape budget"):
        container = codec.compress_native(x8)
    assert container == container_ok  # host fallback == fused bytes
    assert np.array_equal(codec.decompress(container), rec)


def test_transfer_pack_roundtrips():
    from compression_tpu.util import transfer as tr

    rng = np.random.RandomState(0)
    arrays = [rng.randint(0, 256, (3, 7)).astype(np.uint8),
              rng.randint(-9, 9, (5,)).astype(np.int32),
              rng.randint(0, 2 ** 31, (2, 3)).astype(np.uint32),
              np.asarray(True),
              np.asarray(-42, np.int32)]
    spec = tr.pack_spec(arrays)
    # host -> device -> arrays (upload direction)
    outs = jax.jit(lambda f: tuple(tr.unpack_jit(f, spec)))(
        jnp.asarray(tr.pack_host(arrays)))
    for a, o in zip(arrays, outs):
        assert np.array_equal(np.asarray(o), a)
        assert np.asarray(o).dtype == np.asarray(a).dtype
    # device -> host (fetch direction)
    flat = jax.jit(tr.pack_jit)([jnp.asarray(a) for a in arrays])
    for a, o in zip(arrays, tr.unpack_host(np.asarray(flat), spec)):
        assert np.array_equal(o, a)


@pytest.mark.parametrize("family", ["bls2017", "ms2020", "hific"])
def test_throughput_mode_matches_per_image_calls(family):
    """compress_native_many / decompress_native_many == per-image calls,
    including a classic container mixed into the decode batch."""
    codec = _build(family)
    rng = np.random.RandomState(21)
    imgs = [rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
            for _ in range(3)]
    containers = codec.compress_native_many(imgs)
    assert containers == [codec.compress_native(x) for x in imgs]
    outs = codec.decompress_native_many(containers)
    for out, x in zip(outs, imgs):
        assert np.array_equal(out, codec.reconstruct(x))
    mixed = codec.decompress_native_many(
        [containers[0], codec.compress(imgs[1])])
    assert np.array_equal(mixed[0], codec.reconstruct(imgs[0]))
    assert np.array_equal(mixed[1], codec.reconstruct(imgs[1]))


def test_split_factor_from_streams_rejects_bad_counts():
    with pytest.raises(ValueError):
        native_format.split_factor_from_streams(7, 4)
    assert native_format.split_factor_from_streams(8, 4) == 2
    assert native_format.split_factor_from_streams(4, 4) == 1
