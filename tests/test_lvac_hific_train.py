"""Smoke tests for lvac training and the HiFiC training loop."""

import numpy as np

from compression_tpu.models import hific, lvac


def test_lvac_trains():
    model, params = lvac.train(steps=5, batch_size=2, frame=256, log_every=0)
    assert params is not None


def test_hific_train_loop_no_gan():
    cfg = hific.HiFiCConfig(
        num_down=2, num_filters_base=4, num_filters_bottleneck=8,
        num_residual_blocks=1, hyper_filters=4, use_gan=False)
    model, params = hific.train(
        config=cfg, steps=2, batch_size=1, patchsize=32, log_every=0)
    assert params is not None


def test_hific_train_loop_gan():
    cfg = hific.HiFiCConfig(
        num_down=2, num_filters_base=4, num_filters_bottleneck=8,
        num_residual_blocks=1, hyper_filters=4, use_gan=True)
    model, params = hific.train(
        config=cfg, steps=2, batch_size=1, patchsize=32, log_every=0)
    assert params is not None
