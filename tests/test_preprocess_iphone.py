"""Tests for the iPhone preprocessing pipeline (scripts/preprocess_iphone.py):
image conversion + split protocol, COLMAP text-model parsing, the
colmap2nerf-style transforms writer, and the subprocess orchestration via a
stub colmap executable (reference: notebooks/iphone_raw_preprocessing.ipynb
cells 8-10)."""

import json
import math
import os
import stat
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from preprocess_iphone import (  # noqa: E402
    colmap_text_to_transforms,
    convert_images,
    parse_colmap_text_model,
    run_colmap,
    write_splits,
)


def _make_raw_images(raw_dir, n=5, size=64):
    from PIL import Image

    os.makedirs(raw_dir, exist_ok=True)
    for i in range(n):
        arr = np.full((size, size, 3), 40 * i, np.uint8)
        Image.fromarray(arr).save(os.path.join(raw_dir, f"img_{i:02d}.jpg"))


def _write_text_model(text_dir, names, fx=800.0, w=1600, h=1200):
    """COLMAP text export with cameras on a unit circle looking inward."""
    os.makedirs(text_dir, exist_ok=True)
    with open(os.path.join(text_dir, "cameras.txt"), "w") as f:
        f.write("# Camera list\n")
        f.write(f"1 OPENCV {w} {h} {fx} {fx} {w/2} {h/2} 0.01 0.0 0.0 0.0\n")
    with open(os.path.join(text_dir, "images.txt"), "w") as f:
        f.write("# Image list: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n")
        for i, name in enumerate(names):
            # Identity rotation, cameras spread along x: w2c t = -R @ C = -C.
            f.write(f"{i+1} 1 0 0 0 {-float(i)} 0.0 -2.0 1 {name}\n")
            f.write("\n")  # the 2D-points line


def test_convert_images_and_allshot_split(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    _make_raw_images(raw, n=10)
    names = convert_images(raw, os.path.join(out, "images"), max_size=32)
    assert len(names) == 10
    from PIL import Image

    im = Image.open(os.path.join(out, "images", "img_00.png"))
    assert max(im.size) == 32  # resized to max-size

    splits = write_splits(out, names, seed=0, fewshot=False)
    assert len(splits["train"]) == 8 and len(splits["val"]) == 1
    assert len(splits["test"]) == 1
    on_disk = json.load(open(os.path.join(out, "splits.json")))
    assert sorted(on_disk["train"]) == splits["train"]


def test_parse_colmap_text_model_pose_convention(tmp_path):
    """COLMAP w2c with identity R and t=(0,0,-2) puts the camera at
    C=(0,0,2); the NeRF c2w flips the y/z camera axes (OpenCV->NeRF)."""
    text = str(tmp_path / "text")
    _write_text_model(text, ["a.png"])
    intr, poses = parse_colmap_text_model(text)
    assert intr["w"] == 1600 and abs(intr["fl_x"] - 800.0) < 1e-9
    assert abs(intr["k1"] - 0.01) < 1e-12
    c2w = poses["a.png"]
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 0.0, 2.0], atol=1e-12)
    np.testing.assert_allclose(c2w[:3, :3], np.diag([1.0, -1.0, -1.0]),
                               atol=1e-12)


def test_transforms_written_normalized_and_split(tmp_path):
    text = str(tmp_path / "text")
    names = [f"img_{i:02d}.png" for i in range(4)]
    _write_text_model(text, names)
    splits = {"train": names[:2], "val": [names[2]],
              "test": [names[3], "unregistered.png"]}
    out = str(tmp_path / "out")
    os.makedirs(out)
    written = colmap_text_to_transforms(text, splits, out)
    assert [os.path.basename(p) for p in written] == [
        "transforms_train.json", "transforms_val.json", "transforms_test.json"]

    tr = json.load(open(written[0]))
    assert abs(tr["camera_angle_x"] - 2 * math.atan(1600 / 1600)) < 1e-12
    assert len(tr["frames"]) == 2
    # Unregistered images are dropped, not fabricated.
    te = json.load(open(written[2]))
    assert len(te["frames"]) == 1

    # Normalization: over ALL registered cameras, mean distance from the
    # centroid is 4 (colmap2nerf's scale target), shared across splits.
    centers = []
    for p in written:
        for fr in json.load(open(p))["frames"]:
            centers.append(np.array(fr["transform_matrix"])[:3, 3])
    centers = np.stack(centers)
    # splits cover all 4 registered cameras exactly once
    assert abs(np.linalg.norm(centers - centers.mean(0), axis=1).mean() - 4.0
               ) < 1e-6


def test_run_colmap_missing_binary(tmp_path, capsys):
    assert run_colmap(str(tmp_path), str(tmp_path / "w"),
                      colmap_exe="definitely-not-colmap") is None
    assert "not found on PATH" in capsys.readouterr().out


def test_full_orchestration_with_stub_colmap(tmp_path, monkeypatch):
    """End-to-end: images -> splits -> (stub) COLMAP -> transforms. The stub
    executable records each stage's argv and emits a text model on
    model_converter, exercising the real subprocess wiring."""
    raw, out = str(tmp_path / "raw"), str(tmp_path / "out")
    _make_raw_images(raw, n=4)
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "colmap"
    stub.write_text(f"""#!/bin/bash
echo "$@" >> {tmp_path}/stages.log
if [ "$1" = model_converter ]; then
  shift; while [ $# -gt 0 ]; do
    [ "$1" = --output_path ] && OUT="$2"; shift; done
  python {os.path.dirname(os.path.abspath(__file__))}/_stub_colmap_model.py "$OUT"
fi
""")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    image_dir = os.path.join(out, "images")
    names = convert_images(raw, image_dir, max_size=32)
    splits = write_splits(out, names, seed=0, fewshot=False)
    text = run_colmap(image_dir, os.path.join(out, "colmap"))
    assert text is not None
    written = colmap_text_to_transforms(text, splits, out)
    stages = open(f"{tmp_path}/stages.log").read()
    for stage in ("feature_extractor", "exhaustive_matcher", "mapper",
                  "model_converter"):
        assert stage in stages
    assert all(os.path.exists(p) for p in written)
    n_frames = sum(len(json.load(open(p))["frames"]) for p in written)
    assert n_frames == 4


def test_fewshot_split_requires_30_images(tmp_path):
    names = [(f"i{i}.png", float("nan")) for i in range(10)]
    with pytest.raises(SystemExit, match="fewshot split needs"):
        write_splits(str(tmp_path), names, seed=0, fewshot=True)
