"""HiFiC perceptual-objective evidence, self-contained (VERDICT r2 item 5).

The environment has no pretrained VGG/LPIPS weights (zero egress), so
absolute FID numbers vs the reference's Kodak table are out of reach.
What IS testable self-contained: does the GAN + perceptual objective
(reference models/hific/model.py:53-115 loss schedule) IMPROVE the
perceptual metrics at equal rate, compared to pure-MSE training of the
identical architecture?  That flips M5 from "architecture exists" to
"objective demonstrated".

Protocol (mirrors the reference recipe, models/hific/train.py: GAN
training warm-starts from a converged 'mselpips' autoencoder):
  1. pretrain the generator MSE-only for PRE steps;
  2a. continue MSE-only for FT more steps           -> "mse" model;
  2b. warm-start GAN+LPIPS from (1) for FT steps    -> "gan" model;
  3. reconstruct N_EVAL held-out images with both; compute PSNR,
     FID/KID on VGG16 features (deterministic random-init extractor —
     random VGG features are a known-usable perceptual embedding; both
     models are scored by the SAME embedding), and real compressed bpp
     on a subset.
Writes HIFIC_PARITY.json at the repo root.

Usage (TPU): python tools/hific_experiment.py
  env: HIFIC_PRE (2500), HIFIC_FT (1500), HIFIC_EVAL (384),
       HIFIC_BASE (16 base filters; VERDICT r3 item 7 mid config = 48),
       HIFIC_PATCH (64; mid config = 128), HIFIC_OUT (HIFIC_PARITY.json)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import os as _os

PATCH = int(_os.environ.get("HIFIC_PATCH", "64"))
BATCH = 8
BASE = int(_os.environ.get("HIFIC_BASE", "16"))


def small_cfg(use_gan, target=None):
    if target is None:
        target = float(_os.environ.get("HIFIC_RATE_TARGET", "0.30"))
    from compression_tpu.models import hific
    return hific.HiFiCConfig(
        num_down=3, num_filters_base=BASE,
        num_filters_bottleneck=max(48, BASE),
        num_residual_blocks=3, hyper_filters=max(48, BASE),
        target=target,                 # rate target (bpp)
        schedule_steps=1000,
        CP=(0.1 * 1.5 if use_gan else 0.0),
        use_gan=use_gan)


def data_iter(train_data, seed):
    rng = np.random.RandomState(seed)
    while True:
        yield train_data[rng.choice(len(train_data), BATCH)]


def reconstruct(model, params, images):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(params, x):
        x_hat, _, _, qbpp = model.apply(params, x, training=False)
        return x_hat, qbpp

    outs, qbpps = [], []
    for i in range(0, len(images), BATCH):
        x = jnp.asarray(images[i:i + BATCH], jnp.float32)
        x_hat, qbpp = fwd(params, x)
        outs.append(np.clip(np.round(np.asarray(x_hat)), 0, 255)
                    .astype(np.uint8))
        qbpps.append(float(qbpp))
    return np.concatenate(outs), float(np.mean(qbpps))


def perceptual_features(images):
    """Mean-pooled VGG16 taps of uint8 images: (relu3_3 256-D for FID;
    all-tap concat 1472-D for KID)."""
    import jax.numpy as jnp

    from compression_tpu.models import lpips

    vgg = lpips.random_lpips_weights(seed=0)
    f_fid, f_kid = [], []
    for i in range(0, len(images), 32):
        x = jnp.asarray(images[i:i + 32], jnp.float32) / 255.0
        taps = lpips.vgg16_features(vgg, x * 2.0 - 1.0)
        pooled = [np.asarray(t.mean(axis=(1, 2))) for t in taps]
        f_fid.append(pooled[2])
        f_kid.append(np.concatenate(pooled, axis=1))
    return np.concatenate(f_fid), np.concatenate(f_kid)


def hf_spectrum_error(ref_imgs, recon_imgs):
    """High-frequency power restoration error (dB).

    MSE-trained codecs systematically UNDERSHOOT high-frequency power
    (blur); the GAN objective exists to restore it.  Mean log-power
    error over the top half of the radial frequency band of the luma
    channel is a self-contained, embedding-free measure of that effect
    (lower = spectrum closer to the originals').
    """
    def band_power(imgs):
        luma = imgs.astype(np.float64) @ np.asarray([0.299, 0.587, 0.114])
        spec = np.abs(np.fft.rfft2(luma, axes=(1, 2))) ** 2
        h, w = spec.shape[1], spec.shape[2]
        fy = np.fft.fftfreq(h)[:, None]
        fx = np.fft.rfftfreq(h)[None, :]
        r = np.sqrt(fy * fy + fx * fx)
        out = []
        for lo, hi in ((0.25, 0.35), (0.35, 0.45), (0.45, 0.51)):
            m = (r >= lo) & (r < hi)
            out.append(spec[:, m].mean())
        return np.asarray(out)
    p_ref = band_power(ref_imgs)
    p_rec = band_power(recon_imgs)
    return float(np.mean(np.abs(10 * np.log10(p_rec / p_ref))))


def real_bpp(model, params, images):
    from compression_tpu.models import hific
    codec = hific.HiFiCCodec(model, params)
    nb, px = 0, 0
    for img in images:
        container = codec.compress(img)
        x_hat = codec.decompress(container)
        assert x_hat.shape == img.shape
        nb += len(container)
        px += img.shape[0] * img.shape[1]
    return 8.0 * nb / px


def main():
    from rd_corpus import rd_images
    from compression_tpu.models import hific
    from compression_tpu.util import metrics

    pre = int(os.environ.get("HIFIC_PRE", "2500"))
    ft = int(os.environ.get("HIFIC_FT", "1500"))
    n_eval = int(os.environ.get("HIFIC_EVAL", "384"))

    train_data = rd_images(np.random.RandomState(1234), 512, PATCH)
    eval_data = np.round(rd_images(
        np.random.RandomState(555), n_eval, PATCH)).astype(np.uint8)

    t0 = time.time()
    print(f"pretrain mse-only {pre} steps ...", flush=True)
    cfg_mse = small_cfg(use_gan=False)
    model, params_pre = hific.train(
        cfg_mse, steps=pre, batch_size=BATCH, patchsize=PATCH,
        data_iter=data_iter(train_data, 0), seed=0, log_every=500)

    print(f"branch A: mse-only +{ft} steps ...", flush=True)
    _, params_mse = hific.train(
        cfg_mse, steps=ft, batch_size=BATCH, patchsize=PATCH,
        data_iter=data_iter(train_data, 1), seed=1, log_every=500,
        init_params=params_pre)

    print(f"branch B: GAN+LPIPS +{ft} steps ...", flush=True)
    cfg_gan = small_cfg(use_gan=True)
    model_gan = hific.HiFiCModel(cfg=cfg_gan)
    _, params_gan = hific.train(
        cfg_gan, steps=ft, batch_size=BATCH, patchsize=PATCH,
        data_iter=data_iter(train_data, 1), seed=1, log_every=500,
        init_params=params_pre)

    # Branch C: same mse-only fine-tune but at HALF the rate target —
    # demonstrates the rate-target loss schedule steering the outcome
    # (VERDICT r2 weak #5: "nothing shows ... the rate-target loss
    # schedule changing training outcomes").
    rows_target = {}
    if os.environ.get("HIFIC_TARGET_BRANCH", "1") != "0":
        print(f"branch C: mse-only, target 0.15 +{ft} steps ...",
              flush=True)
        cfg_lo = small_cfg(use_gan=False, target=0.15)
        model_lo = hific.HiFiCModel(cfg=cfg_lo)
        _, params_lo = hific.train(
            cfg_lo, steps=ft, batch_size=BATCH, patchsize=PATCH,
            data_iter=data_iter(train_data, 1), seed=1, log_every=500,
            init_params=params_pre)
        _, qbpp_hi = reconstruct(model, params_mse, eval_data[:64])
        _, qbpp_lo = reconstruct(model_lo, params_lo, eval_data[:64])
        rows_target = {
            "target_0.30_qbpp": round(qbpp_hi, 4),
            "target_0.15_qbpp": round(qbpp_lo, 4),
            "schedule_steers_rate": bool(qbpp_lo < qbpp_hi),
        }
        print("rate-target branch:", rows_target, flush=True)

    rows = {}
    feats_ref_fid, feats_ref_kid = perceptual_features(eval_data)
    for name, m, p in (("mse", model, params_mse),
                       ("gan", model_gan, params_gan)):
        recon, qbpp = reconstruct(m, p, eval_data)
        f_fid, f_kid = perceptual_features(recon)
        fid = float(metrics.fid_from_features(feats_ref_fid, f_fid))
        kid = float(metrics.kid_from_features(
            feats_ref_kid, f_kid, block_size=96))
        ps = float(np.mean([metrics.psnr(a, b)
                            for a, b in zip(eval_data, recon)]))
        bpp = real_bpp(m, p, eval_data[:16])
        rows[name] = {"qbpp_eval": round(qbpp, 4),
                      "real_container_bpp_16imgs": round(bpp, 4),
                      "psnr_db": round(ps, 3),
                      "fid_vgg_relu3_3": round(fid, 4),
                      "kid_vgg_alltaps": round(kid, 6),
                      "hf_spectrum_err_db": round(
                          hf_spectrum_error(eval_data, recon), 3)}
        print(name, rows[name], flush=True)

    out = {
        "protocol": f"mse pretrain {pre} steps, then +{ft} steps "
                    "mse-only (A) vs GAN+LPIPS warm-start (B); identical "
                    "data order, rate target 0.30 bpp, "
                    f"{n_eval} held-out 64x64 eval images",
        "feature_extractor": "deterministic random-init VGG16 "
                             "(lpips.random_lpips_weights seed 0); both "
                             "models scored by the same embedding",
        "config": {k: (v if isinstance(v, (int, float, bool)) else str(v))
                   for k, v in small_cfg(True)._asdict().items()},
        "mse": rows["mse"],
        "gan": rows["gan"],
        "fid_improvement_pct": round(
            100 * (rows["mse"]["fid_vgg_relu3_3"]
                   - rows["gan"]["fid_vgg_relu3_3"])
            / max(rows["mse"]["fid_vgg_relu3_3"], 1e-9), 2),
        "kid_improvement_pct": round(
            100 * (rows["mse"]["kid_vgg_alltaps"]
                   - rows["gan"]["kid_vgg_alltaps"])
            / max(abs(rows["mse"]["kid_vgg_alltaps"]), 1e-12), 2),
        "rate_target_branch": rows_target,
        "hf_spectrum_improvement_db": round(
            rows["mse"]["hf_spectrum_err_db"]
            - rows["gan"]["hf_spectrum_err_db"], 3),
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("HIFIC_OUT", "HIFIC_PARITY.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
