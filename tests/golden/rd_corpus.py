"""Synthetic corpus for the 3-family RD parity study (VERDICT r2 item 1).

Round 2's 1/f-texture corpus saturated (PSNR pinned near 19.4 dB across a
17x lambda range: not an RD *curve*).  This corpus is built so a small
codec can actually trade rate for distortion across lambdas:

  * a smooth low-frequency base (cheap bits, high PSNR available),
  * anti-aliased shapes/edges (structure worth spending bits on),
  * band-limited noise whose amplitude AND bandwidth vary smoothly
    ACROSS each image (non-stationarity: a spatially adaptive model —
    the hyperprior — can code local scale; a factorized prior cannot,
    which is what separates the bmshj2018/ms2020 families from bls2017
    on the reference's own Kodak ordering),
  * correlated color channels (common luma + small chroma), leaving
    cross-channel structure for ms2020's channel-conditional slices.

Pure numpy, deterministic given the seed.
"""

import numpy as np


def _lowfreq(rng, size, cutoff=4.0, channels=1):
    """Smooth random field(s) in roughly [-1, 1], (size, size, channels)."""
    fy = np.fft.fftfreq(size)[:, None] * size
    fx = np.fft.rfftfreq(size)[None, :] * size
    mask = np.exp(-0.5 * (fy * fy + fx * fx) / cutoff ** 2)
    out = []
    for _ in range(channels):
        spec = (rng.normal(size=(size, size // 2 + 1))
                + 1j * rng.normal(size=(size, size // 2 + 1))) * mask
        img = np.fft.irfft2(spec, s=(size, size))
        img /= np.abs(img).max() + 1e-9
        out.append(img)
    return np.stack(out, axis=-1)


def _bandnoise(rng, size, lo, hi):
    """Noise band-limited to radial frequencies [lo, hi) cycles/image."""
    fy = np.fft.fftfreq(size)[:, None] * size
    fx = np.fft.rfftfreq(size)[None, :] * size
    r = np.sqrt(fy * fy + fx * fx)
    mask = ((r >= lo) & (r < hi)).astype(np.float64)
    spec = (rng.normal(size=(size, size // 2 + 1))
            + 1j * rng.normal(size=(size, size // 2 + 1))) * mask
    img = np.fft.irfft2(spec, s=(size, size))
    s = img.std()
    return img / (s + 1e-9)


def _shapes(rng, size, n):
    """Anti-aliased random ellipses, one intensity field in [-1, 1]."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    img = np.zeros((size, size))
    for _ in range(n):
        cy, cx = rng.uniform(0, size, 2)
        ry, rx = rng.uniform(size / 10, size / 3, 2)
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        u = ((xx - cx) * c + (yy - cy) * s) / rx
        v = (-(xx - cx) * s + (yy - cy) * c) / ry
        d = u * u + v * v
        # soft boundary (exponent clipped: same values, no overflow warn)
        edge = 1.0 / (1.0 + np.exp(np.minimum((d - 1.0) * 8.0, 60.0)))
        img = img * (1 - edge) + rng.uniform(-1, 1) * edge
    return img


def rd_images(rng, n, size):
    """(n, size, size, 3) float32 in [0, 255]."""
    out = []
    for _ in range(n):
        base = _lowfreq(rng, size, cutoff=rng.uniform(1.5, 4.0),
                        channels=3) * rng.uniform(0.4, 1.0)
        luma_shapes = _shapes(rng, size, rng.randint(2, 7))

        # Non-stationary texture: two bands, each gated by its own
        # smooth positive envelope.  Amplitudes/bands kept moderate so a
        # compact (32-filter) codec is rate-limited rather than
        # capacity-limited — probed: heavier texture pins the achievable
        # MSE near 125 regardless of lambda (no RD tradeoff visible).
        tex = np.zeros((size, size))
        for _ in range(2):
            lo = rng.uniform(2.5, size / 10)
            band = _bandnoise(rng, size, lo, lo * rng.uniform(1.5, 3.0))
            env = np.maximum(_lowfreq(rng, size, cutoff=2.5)[..., 0], 0.0)
            tex += band * env * rng.uniform(0.06, 0.3)

        luma = 0.55 * luma_shapes + tex
        chroma = _lowfreq(rng, size, cutoff=2.0, channels=3) * 0.15
        img = base * 0.5 + luma[..., None] + chroma

        img = img - img.min()
        img = img / (img.max() + 1e-9)
        out.append(255.0 * img)
    return np.asarray(out, np.float32)


def rd_corpus(n_train=512, n_eval=24, size=64):
    train = rd_images(np.random.RandomState(1234), n_train, size)
    evals = np.round(rd_images(np.random.RandomState(999), n_eval, size)
                     ).astype(np.uint8)
    return train, evals


if __name__ == "__main__":
    tr, ev = rd_corpus()
    print("train", tr.shape, tr.dtype, tr.min(), tr.max())
    print("eval", ev.shape, ev.dtype)
    # crude compressibility probe: PNG-ish via npz size
    import io
    import zlib
    raw = ev.tobytes()
    print("zlib ratio:", len(zlib.compress(raw, 6)) / len(raw))
