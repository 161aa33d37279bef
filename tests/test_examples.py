"""Smoke tests for the example scripts' pure-host pieces."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples import train_synthetic


def test_texture_source_shapes_and_range():
    sample = train_synthetic.make_texture_source(64, seed=3)
    batch = sample(2)
    assert batch.shape == (2, 64, 64, 3)
    assert batch.dtype == np.float32
    assert batch.min() >= 0.0 and batch.max() <= 255.0
    # Not constant, and reproducible per seed.
    assert batch.std() > 1.0
    again = train_synthetic.make_texture_source(64, seed=3)(2)
    np.testing.assert_allclose(batch, again)


def test_texture_source_is_low_frequency():
    # 1/f fields concentrate energy at low frequencies: the mean abs
    # difference between neighboring pixels is far below that of white
    # noise with the same range.
    img = train_synthetic.make_texture_source(128, seed=0)(1)[0, ..., 0]
    local = np.abs(np.diff(img, axis=0)).mean()
    global_spread = img.std()
    # (white noise measures ~1.15x; the 1/f field ~0.34x)
    assert local < 0.5 * global_spread


def test_train_bench_jax_side_runs():
    # The TPU-side timer of tools/train_bench.py on a tiny geometry:
    # real jitted train steps, device-resident batches, sane fields.
    from tools import train_bench
    row = train_bench._bench_jax_family("bls2017", patch=32, batch=1,
                                        repeats=2)
    assert row["step_ms"] > 0
    assert row["images_per_s"] > 0
    assert row["repeats"] == 2
