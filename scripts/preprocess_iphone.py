"""iPhone capture preprocessing: HEIC -> PNG, EV normalization, COLMAP poses.

CLI equivalent of the reference's Colab notebook
(notebooks/iphone_raw_preprocessing.ipynb), end to end: converts HEIC
captures to resized PNGs, normalizes exposure via EXIF-derived EV against
linear luminance, writes allshot (80/10/10) or fewshot (8/2/20) split lists
with seed 0 (the few-shot protocol in BASELINE.md), then orchestrates COLMAP
(feature_extractor / exhaustive_matcher / mapper / model_converter — the
notebook's cells 8-10 run the same binaries through instant-ngp's
colmap2nerf.py) and converts the text model into per-split blender-style
transforms_{train,val,test}.json loadable by data/blender.py. If the colmap
binary is absent the script stops after the splits with instructions, so the
image pipeline still works on machines without COLMAP.

Usage:
  python scripts/preprocess_iphone.py <raw_dir> <out_dir> \
      [--max-size 1600] [--seed 0] [--fewshot] [--skip-colmap] \
      [--colmap-exe colmap] [--aabb-scale 4]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import shutil
import subprocess

import numpy as np


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
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"seed": seed, "fewshot": fewshot, **splits}, f, indent=2)
    print(f"[preprocess] wrote {path}: "
          f"{n_train} train / {n_val} val / {n_test} test")
    return splits


# ---- COLMAP orchestration + transforms conversion --------------------------
#
# The notebook (cells 8-10) shells out to COLMAP and then runs instant-ngp's
# colmap2nerf.py. Here both stages are native: run_colmap() drives the four
# COLMAP stages via subprocess, and colmap_text_to_transforms() parses the
# exported text model (cameras.txt / images.txt) into blender-style
# transforms json with the same pose conventions colmap2nerf establishes
# (COLMAP world-to-camera -> NeRF camera-to-world with flipped y/z camera
# axes, recentered on the camera centroid and scaled to a mean camera
# distance of 4).


def run_colmap(image_dir: str, work_dir: str, colmap_exe: str = "colmap",
               camera_model: str = "OPENCV") -> str | None:
    """Feature extraction -> exhaustive matching -> mapping -> TXT export.

    Returns the text-model directory, or None (with a message) when the
    colmap binary is not on PATH.
    """
    if shutil.which(colmap_exe) is None:
        print(f"[preprocess] '{colmap_exe}' not found on PATH — skipping pose "
              "estimation. Install COLMAP and re-run, or run it manually and "
              "point colmap_text_to_transforms() at the text model.")
        return None
    os.makedirs(work_dir, exist_ok=True)
    db = os.path.join(work_dir, "database.db")
    sparse = os.path.join(work_dir, "sparse")
    text = os.path.join(work_dir, "text")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(text, exist_ok=True)
    stages = [
        [colmap_exe, "feature_extractor", "--database_path", db,
         "--image_path", image_dir,
         "--ImageReader.camera_model", camera_model,
         "--ImageReader.single_camera", "1"],
        [colmap_exe, "exhaustive_matcher", "--database_path", db],
        [colmap_exe, "mapper", "--database_path", db,
         "--image_path", image_dir, "--output_path", sparse],
        [colmap_exe, "model_converter",
         "--input_path", os.path.join(sparse, "0"),
         "--output_path", text, "--output_type", "TXT"],
    ]
    for cmd in stages:
        print("[preprocess] $", " ".join(cmd))
        subprocess.run(cmd, check=True)
    return text


def _quat_to_rotmat(q):
    """COLMAP (w, x, y, z) quaternion -> 3x3 rotation matrix."""
    w, x, y, z = (float(v) for v in q)
    n = math.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def parse_colmap_text_model(text_dir: str):
    """Parse cameras.txt + images.txt into (intrinsics dict, {name: c2w}).

    c2w is the NeRF-convention camera-to-world: COLMAP stores world-to-camera
    [R|t]; inverting gives an OpenCV-convention c2w whose y/z camera axes are
    then negated (the same flip data/scannet.py:52-53 applies to ScanNet's
    OpenCV poses).
    """
    cam_path = os.path.join(text_dir, "cameras.txt")
    img_path = os.path.join(text_dir, "images.txt")
    intrinsics = None
    with open(cam_path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            model, w, h = parts[1], int(parts[2]), int(parts[3])
            params = [float(p) for p in parts[4:]]
            if model == "OPENCV":
                fx, fy, cx, cy = params[:4]
                dist = dict(zip(("k1", "k2", "p1", "p2"), params[4:8]))
            elif model in ("PINHOLE",):
                fx, fy, cx, cy = params[:4]
                dist = {}
            elif model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
                fx = fy = params[0]
                cx, cy = params[1:3]
                dist = {"k1": params[3]} if model == "SIMPLE_RADIAL" else {}
            else:
                raise SystemExit(f"unsupported COLMAP camera model {model}")
            intrinsics = {"w": w, "h": h, "fl_x": fx, "fl_y": fy,
                          "cx": cx, "cy": cy, **dist}
            break
    if intrinsics is None:
        raise SystemExit(f"no camera found in {cam_path}")

    poses = {}
    with open(img_path) as f:
        # images.txt alternates a pose line with that image's 2D-point line,
        # which is EMPTY for images without points — parity must count blank
        # lines too, only comments are outside the alternation.
        lines = [l for l in f if not l.startswith("#")]
    for line in lines[::2]:
        parts = line.split()
        if not parts:
            continue
        q, t, name = parts[1:5], parts[5:8], parts[9]
        r_w2c = _quat_to_rotmat(q)
        t_w2c = np.array([float(v) for v in t])
        c2w = np.eye(4)
        c2w[:3, :3] = r_w2c.T
        c2w[:3, 3] = -r_w2c.T @ t_w2c
        c2w[:3, 1:3] *= -1.0  # OpenCV -> NeRF camera axes
        poses[name] = c2w
    return intrinsics, poses


def colmap_text_to_transforms(text_dir: str, splits: dict, out_dir: str,
                              aabb_scale: int = 4):
    """Write transforms_{train,val,test}.json from a COLMAP text model.

    Poses are recentered on the camera centroid and uniformly scaled so the
    mean camera distance is 4 (colmap2nerf's normalization target), keeping
    every split in one consistent frame. Frames missing from the COLMAP
    reconstruction (unregistered images) are dropped with a warning.
    """
    intrinsics, poses = parse_colmap_text_model(text_dir)
    if not poses:
        raise SystemExit(f"COLMAP registered no images in {text_dir}")
    centers = np.stack([m[:3, 3] for m in poses.values()])
    centroid = centers.mean(axis=0)
    scale = 4.0 / max(float(np.linalg.norm(centers - centroid, axis=1).mean()),
                      1e-9)
    camera_angle_x = 2.0 * math.atan(intrinsics["w"] / (2.0 * intrinsics["fl_x"]))

    written = []
    for split in ("train", "val", "test"):
        frames = []
        for name in splits.get(split, []):
            if name not in poses:
                print(f"[preprocess] WARNING: {name} not registered by "
                      f"COLMAP; dropped from {split}")
                continue
            m = poses[name].copy()
            m[:3, 3] = (m[:3, 3] - centroid) * scale
            frames.append({
                "file_path": f"./images/{os.path.splitext(name)[0]}",
                "transform_matrix": m.tolist(),
            })
        out = {"camera_angle_x": camera_angle_x, "aabb_scale": aabb_scale,
               **intrinsics, "frames": frames}
        path = os.path.join(out_dir, f"transforms_{split}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        written.append(path)
        print(f"[preprocess] wrote {path} ({len(frames)} frames)")
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("raw_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--max-size", type=int, default=1600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fewshot", action="store_true",
                    help="8/2/20 few-shot split instead of 80/10/10")
    ap.add_argument("--skip-colmap", action="store_true",
                    help="stop after image conversion + splits")
    ap.add_argument("--colmap-exe", default="colmap")
    ap.add_argument("--aabb-scale", type=int, default=4)
    args = ap.parse_args()

    image_dir = os.path.join(args.out_dir, "images")
    names = convert_images(args.raw_dir, image_dir, args.max_size)
    if not names:
        raise SystemExit(f"no convertible images in {args.raw_dir}")
    normalize_exposure(image_dir, names)
    splits = write_splits(args.out_dir, names, args.seed, args.fewshot)

    if args.skip_colmap:
        print("[preprocess] --skip-colmap: run COLMAP + re-invoke (or call "
              "colmap_text_to_transforms) for transforms_{split}.json")
        return
    text_dir = run_colmap(image_dir, os.path.join(args.out_dir, "colmap"),
                          args.colmap_exe)
    if text_dir is None:
        return
    colmap_text_to_transforms(text_dir, splits, args.out_dir,
                              aabb_scale=args.aabb_scale)
    print("[preprocess] done — train with --dataset_type blender "
          f"--datadir {args.out_dir}")


if __name__ == "__main__":
    main()
