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


def test_hific_cli_train_and_roundtrip(tmp_path, monkeypatch):
    """The hific CLI trains, checkpoints, compresses and decompresses."""
    tiny = hific.HiFiCConfig(
        num_down=2, num_filters_base=4, num_filters_bottleneck=8,
        num_residual_blocks=1, hyper_filters=4, use_gan=False, CP=0.0)
    monkeypatch.setitem(hific._CONFIGS, "tiny", tiny)
    ckpt = str(tmp_path / "ckpt")
    hific.main(["train", "--config", "tiny", "--model_path", ckpt,
                "--num_steps", "2", "--batchsize", "1",
                "--patchsize", "32"])

    from compression_tpu.util import datasets
    img = (np.random.RandomState(0)
           .randint(0, 256, (64, 64, 3)).astype(np.uint8))
    png = str(tmp_path / "img.png")
    datasets.save_image(png, img)
    hific.main(["compress", "--model_path", ckpt, png])
    hific.main(["decompress", "--model_path", ckpt, png + ".tfci"])
    out = datasets.load_image(png + ".tfci.png")
    assert out.shape == img.shape
