"""RD evaluation: bpp / PSNR / MS-SSIM of a trained codec over an image set.

The analog of the reference's published results pipeline
(results/image_compression/*): evaluates a registered model over a
directory (e.g. Kodak) and prints per-image and aggregate numbers that can
be compared against BASELINE.md's RD anchors.

Usage:
  python examples/evaluate.py --model_path registry --model bls2017 \
      --images /path/to/kodak [--out results.csv]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from compression_tpu.models import tfci as tfci_lib  # noqa: E402
from compression_tpu.util import datasets, metrics  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", default="registry")
    parser.add_argument("--model", required=True)
    parser.add_argument("--images", required=True)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    codec = tfci_lib._load_codec(args.model_path, args.model)
    exts = (".png", ".jpg", ".jpeg", ".npy")
    paths = sorted(
        os.path.join(args.images, f) for f in os.listdir(args.images)
        if f.lower().endswith(exts))
    if not paths:
        raise SystemExit(f"no images in {args.images}")

    rows = []
    for path in paths:
        img = datasets.load_image(path)
        container = codec.compress(img)
        rec = codec.decompress(container)
        bpp = len(container) * 8 / (img.shape[0] * img.shape[1])
        p = float(metrics.psnr(
            img.astype(np.float32), rec.astype(np.float32)))
        try:
            ms = float(metrics.msssim(
                img.astype(np.float32)[None], rec.astype(np.float32)[None]))
        except Exception:
            ms = float("nan")  # image too small for 5 scales
        rows.append((os.path.basename(path), bpp, p, ms))
        print(f"{rows[-1][0]}: {bpp:.4f} bpp  {p:.2f} dB  "
              f"MS-SSIM {ms:.4f}", flush=True)

    bpps = np.asarray([r[1] for r in rows])
    psnrs = np.asarray([r[2] for r in rows])
    mss = np.asarray([r[3] for r in rows])
    print(f"\naggregate ({len(rows)} images): "
          f"{bpps.mean():.4f} bpp  {psnrs.mean():.2f} dB  "
          f"MS-SSIM {np.nanmean(mss):.4f}")

    if args.out:
        with open(args.out, "w") as f:
            f.write("image,bpp,psnr,msssim\n")
            for name, bpp, p, ms in rows:
                f.write(f"{name},{bpp:.6f},{p:.4f},{ms:.6f}\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
