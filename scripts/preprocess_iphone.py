"""iPhone capture preprocessing: HEIC -> PNG, exposure normalization, splits.

CLI equivalent of the reference's Colab notebook
(notebooks/iphone_raw_preprocessing.ipynb): converts HEIC captures to
resized PNGs, normalizes exposure via EXIF-derived EV against linear
luminance, and writes allshot (80/10/10) and fewshot (8/2/20) split lists
with seed 0 — the few-shot protocol in BASELINE.md. COLMAP pose estimation
stays external (run colmap + a colmap2nerf-style converter afterwards to get
transforms_{split}.json).

Usage:
  python scripts/preprocess_iphone.py <raw_dir> <out_dir> \
      [--max-size 1600] [--seed 0] [--fewshot]
"""

from __future__ import annotations

import argparse
import json
import os
import random


def convert_images(raw_dir: str, out_dir: str, max_size: int):
    """HEIC/JPG -> RGB PNG, longest side resized to max_size."""
    from PIL import Image

    try:  # HEIC needs pillow-heif; degrade to jpg/png inputs without it
        import pillow_heif  # type: ignore

        pillow_heif.register_heif_opener()
        heic_ok = True
    except ImportError:
        heic_ok = False
        print("[preprocess] pillow-heif not installed; skipping .heic files")

    os.makedirs(out_dir, exist_ok=True)
    names = []
    for fname in sorted(os.listdir(raw_dir)):
        ext = os.path.splitext(fname)[1].lower()
        if ext in (".heic", ".heif") and not heic_ok:
            continue
        if ext not in (".heic", ".heif", ".jpg", ".jpeg", ".png"):
            continue
        img = Image.open(os.path.join(raw_dir, fname))
        exif = img.getexif()
        img = img.convert("RGB")
        scale = max_size / max(img.size)
        if scale < 1.0:
            img = img.resize(
                (round(img.width * scale), round(img.height * scale)),
                Image.LANCZOS,
            )
        out_name = os.path.splitext(fname)[0] + ".png"
        img.save(os.path.join(out_dir, out_name))
        names.append((out_name, _exposure_value(exif)))
    return names


def _exposure_value(exif) -> float:
    """EV = log2(N^2 / t) - log2(ISO / 100) from EXIF, NaN if missing."""
    import math

    try:
        f_number = float(exif[33437])  # FNumber
        exposure_time = float(exif[33434])  # ExposureTime
        iso = float(exif[34855])  # ISOSpeedRatings
        return math.log2(f_number**2 / exposure_time) - math.log2(iso / 100.0)
    except Exception:
        return float("nan")


def normalize_exposure(out_dir: str, names):
    """Scale each image's linear luminance to the median EV frame."""
    import math

    import numpy as np
    from PIL import Image

    evs = [ev for _, ev in names if not math.isnan(ev)]
    if not evs:
        print("[preprocess] no EXIF exposure data; skipping EV normalization")
        return
    ref_ev = float(np.median(evs))
    for name, ev in names:
        if math.isnan(ev):
            continue
        gain = 2.0 ** (ev - ref_ev)
        if abs(gain - 1.0) < 1e-3:
            continue
        path = os.path.join(out_dir, name)
        img = np.asarray(Image.open(path), np.float32) / 255.0
        linear = np.clip(img, 0, 1) ** 2.2
        img = np.clip(linear * gain, 0, 1) ** (1 / 2.2)
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
    print(f"[preprocess] exposure-normalized to EV {ref_ev:.2f}")


def write_splits(out_dir: str, names, seed: int, fewshot: bool):
    """allshot 80/10/10 or fewshot 8/2/20 split lists (seed 0 protocol)."""
    rng = random.Random(seed)
    files = [n for n, _ in names]
    rng.shuffle(files)
    n = len(files)
    if fewshot:
        n_train, n_val, n_test = 8, 2, 20
        if n < n_train + n_val + n_test:
            raise SystemExit(f"fewshot split needs >= 30 images, have {n}")
    else:
        n_train = int(0.8 * n)
        n_val = int(0.1 * n)
        n_test = n - n_train - n_val
    splits = {
        "train": sorted(files[:n_train]),
        "val": sorted(files[n_train : n_train + n_val]),
        "test": sorted(files[n_train + n_val : n_train + n_val + n_test]),
    }
    path = os.path.join(out_dir, "splits.json")
    with open(path, "w") as f:
        json.dump({"seed": seed, "fewshot": fewshot, **splits}, f, indent=2)
    print(f"[preprocess] wrote {path}: "
          f"{n_train} train / {n_val} val / {n_test} test")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("raw_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--max-size", type=int, default=1600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fewshot", action="store_true",
                    help="8/2/20 few-shot split instead of 80/10/10")
    args = ap.parse_args()

    names = convert_images(args.raw_dir, args.out_dir, args.max_size)
    if not names:
        raise SystemExit(f"no convertible images in {args.raw_dir}")
    normalize_exposure(args.out_dir, names)
    write_splits(args.out_dir, names, args.seed, args.fewshot)
    print("[preprocess] next: run COLMAP + colmap2nerf on the PNGs to get "
          "transforms_{train,val,test}.json")


if __name__ == "__main__":
    main()
