"""Dataset loader tests against small generated on-disk fixtures."""

import json
import os

import numpy as np
import pytest


def _write_png(path, h=8, w=8, channels=4, value=128):
    import imageio.v2 as imageio

    img = np.full((h, w, channels), value, np.uint8)
    imageio.imwrite(path, img)


def _pose(t=(0, 0, 4)):
    m = np.eye(4)
    m[:3, 3] = t
    return m.tolist()


@pytest.fixture
def blender_dir(tmp_path):
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            name = f"./{split}/r_{i}"
            _write_png(tmp_path / split / f"r_{i}.png")
            frames.append({"file_path": name, "transform_matrix": _pose((i, 0, 4))})
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return tmp_path


def test_load_blender(blender_dir):
    from indoor_nerf_tpu.data.blender import load_blender_data

    imgs, poses, render_poses, hwf, i_split, bbox = load_blender_data(
        str(blender_dir), half_res=False, testskip=1
    )
    assert imgs.shape == (7, 8, 8, 4)  # RGBA kept
    assert imgs.dtype == np.float32 and imgs.max() <= 1.0
    assert poses.shape == (7, 4, 4)
    assert render_poses.shape == (40, 4, 4)
    H, W, focal = hwf
    assert (H, W) == (8, 8)
    np.testing.assert_allclose(focal, 0.5 * 8 / np.tan(0.5 * 0.6911), rtol=1e-6)
    assert [len(s) for s in i_split] == [3, 2, 2]
    mn, mx = bbox
    assert all(a < b for a, b in zip(mn, mx))


def test_load_blender_half_res(blender_dir):
    from indoor_nerf_tpu.data.blender import load_blender_data

    imgs, _, _, hwf, _, _ = load_blender_data(str(blender_dir), half_res=True)
    assert imgs.shape[1:3] == (4, 4)
    assert hwf[0] == 4


def test_ply_bounds_ascii_and_binary(tmp_path):
    from indoor_nerf_tpu.data.bbox import ply_bounds

    pts = np.array([[0, 0, 0], [1, 2, 3], [-1, -2, -0.5]], np.float32)
    ascii_path = tmp_path / "mesh_ascii.ply"
    with open(ascii_path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(" ".join(map(str, p)) + "\n")
    mn, mx = ply_bounds(str(ascii_path))
    np.testing.assert_allclose(mn, [-1, -2, -0.5])
    np.testing.assert_allclose(mx, [1, 2, 3])

    bin_path = tmp_path / "mesh_bin.ply"
    with open(bin_path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 3\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\n")
        f.write(b"end_header\n")
        dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("red", "u1")])
        arr = np.zeros(3, dt)
        arr["x"], arr["y"], arr["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
        f.write(arr.tobytes())
    mn, mx = ply_bounds(str(bin_path))
    np.testing.assert_allclose(mn, [-1, -2, -0.5])
    np.testing.assert_allclose(mx, [1, 2, 3])


def test_load_scannet(tmp_path):
    from indoor_nerf_tpu.data.scannet import load_scannet_data

    scene = "scene0000_00"
    nerfdir = tmp_path / f"nerfstyle_{scene}"
    os.makedirs(nerfdir)
    for split, n in [("train", 10), ("val", 2), ("test", 2)]:
        frames = []
        for i in range(n):
            name = f"{split}_{i}"
            _write_png(nerfdir / f"{name}.png", channels=3)
            frames.append({"file_path": name, "transform_matrix": _pose((i, 1, 2))})
        with open(nerfdir / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 1.0, "frames": frames}, f)
    scandir = tmp_path / "scans" / scene
    os.makedirs(scandir)
    with open(scandir / f"{scene}_vh_clean.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n0 0 0\n2 2 2\n")

    imgs, poses, render_poses, hwf, i_split, bbox = load_scannet_data(
        str(tmp_path), scene, half_res=False, trainskip=2, testskip=1
    )
    assert imgs.shape[0] == 5 + 2 + 2  # train subsampled by trainskip=2
    # OpenCV -> NeRF axis flip: columns 1,2 of the rotation negated.
    np.testing.assert_allclose(poses[0][:3, 1], [0, -1, 0])
    np.testing.assert_allclose(poses[0][:3, 2], [0, 0, -1])
    mn, mx = bbox
    np.testing.assert_allclose(mn, [-1, -1, -1])
    np.testing.assert_allclose(mx, [3, 3, 3])


def test_load_llff(tmp_path):
    from indoor_nerf_tpu.data.llff import load_llff_data

    n, h, w, focal = 5, 12, 16, 20.0
    imgdir = tmp_path / "images"
    os.makedirs(imgdir)
    for i in range(n):
        _write_png(imgdir / f"img_{i:03d}.png", h=h, w=w, channels=3)
    rng = np.random.default_rng(0)
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        # LLFF convention: [down, right, back] columns + translation + hwf col
        poses[i, :, :4] = np.array(
            [[0, 1, 0, 0.1 * i], [1, 0, 0, 0], [0, 0, 1, 2.0]], np.float64
        )
        poses[i, :, 4] = [h, w, focal]
    bds = np.stack([np.full(n, 1.0), np.full(n, 10.0)], -1)
    arr = np.concatenate([poses.reshape(n, -1), bds], -1)
    np.save(tmp_path / "poses_bounds.npy", arr)

    images, poses_out, bds_out, render_poses, i_test, bbox = load_llff_data(
        str(tmp_path), factor=None, recenter=True, bd_factor=0.75
    )
    assert images.shape == (n, h, w, 3)
    assert poses_out.shape == (n, 3, 5)
    assert render_poses.shape[0] > 0
    assert 0 <= i_test < n
    mn, mx = bbox
    assert all(a < b for a, b in zip(mn, mx))


def test_load_linemod(tmp_path):
    from indoor_nerf_tpu.data.linemod import load_LINEMOD_data

    K = [[100.0, 0, 4], [0, 100.0, 4], [0, 0, 1]]
    for split, n in [("train", 3), ("val", 1), ("test", 2)]:
        frames = []
        for i in range(n):
            p = tmp_path / f"{split}_{i}.png"
            _write_png(p, channels=3)
            frames.append({
                "file_path": str(p),
                "transform_matrix": _pose((0, i, 3)),
                "intrinsic_matrix": K,
            })
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump({"frames": frames, "near": 1.2, "far": 6.7}, f)

    imgs, poses, render_poses, hwf, K_out, i_split, near, far = (
        load_LINEMOD_data(str(tmp_path), half_res=False, testskip=1)
    )
    assert imgs.shape[0] == 6
    assert hwf[2] == 100.0
    assert near == 1.0 and far == 7.0  # floor/ceil of metadata
    assert K_out == K


def test_room_scene_multiview_consistency():
    """The procedural room (data/synthetic.py::make_room_scene) must be a
    real multi-view-consistent scene: re-rendering a view's rays through
    the analytic tracer reproduces that view exactly, the few-shot split
    honors n_train, and the scene geometry fits the advertised bbox."""
    from indoor_nerf_tpu.data.synthetic import _render_room, make_room_scene
    from indoor_nerf_tpu.ops.rays import get_rays_np

    sc = make_room_scene(n_views=6, H=32, W=32, n_train=4)
    assert sc["images"].shape == (6, 32, 32, 3)
    assert len(sc["i_split"][0]) == 4 and len(sc["i_split"][2]) == 2
    H, W, _ = sc["hwf"]
    for vi in (0, 3):
        ro, rd = get_rays_np(H, W, sc["K"], sc["poses"][vi])
        img = _render_room(ro.reshape(-1, 3), rd.reshape(-1, 3))
        np.testing.assert_allclose(
            img.reshape(H, W, 3), sc["images"][vi], atol=1e-6)
    # Cameras and all surfaces are inside the bbox.
    assert np.all(sc["poses"][:, :, 3] >= np.asarray(sc["bbox_min"]))
    assert np.all(sc["poses"][:, :, 3] <= np.asarray(sc["bbox_max"]))


def test_synthetic_variant_room_via_loader():
    """--dataset_type synthetic --synthetic_variant room dispatches to the
    room scene with the few-shot split flags."""
    from indoor_nerf_tpu.data.load import load_dataset
    from indoor_nerf_tpu.train.config import parse_args

    args = parse_args([
        "--expname", "x", "--dataset_type", "synthetic",
        "--synthetic_variant", "room", "--synthetic_n_views", "10",
        "--synthetic_res", "32", "--synthetic_n_train", "7",
    ])
    sc = load_dataset(args)
    assert sc.images.shape == (10, 32, 32, 3)
    assert len(sc.i_train) == 7
    assert sc.near == 0.1
    # Indoor scene: every ray hits geometry, nothing is pure white bg.
    assert sc.images.max() < 1.0


def test_load_deepvoxels(tmp_path):
    """Fixture-driven deepvoxels parse: intrinsics scaling to the 512 target,
    pose-dir stacking with the y/z flip, and train/val/test split assembly
    (reference: load_deepvoxels.py:6-108)."""
    import imageio.v2 as imageio

    from indoor_nerf_tpu.data.deepvoxels import load_dv_data

    rng = np.random.default_rng(0)
    counts = {"train": 3, "validation": 2, "test": 2}
    for split, n in counts.items():
        base = tmp_path / split / "cube"
        os.makedirs(base / "pose")
        os.makedirs(base / "rgb")
        if split == "train":
            with open(base / "intrinsics.txt", "w") as f:
                f.write("350.0 256.0 256.0\n")   # f cx cy
                f.write("0.0 0.0 0.0\n")          # grid barycenter
                f.write("0.8\n")                  # near plane
                f.write("1.0\n")                  # scale
                f.write("512. 512.\n")            # height width
                f.write("0\n")                    # world2cam flag
        for i in range(n):
            pose = np.eye(4)
            pose[:3, 3] = [0.1 * i, 0, 2.0]
            with open(base / "pose" / f"{i:03d}.txt", "w") as f:
                f.write(" ".join(str(v) for v in pose.reshape(-1)))
            img = rng.integers(0, 255, size=(512, 512, 3), dtype=np.uint8)
            imageio.imwrite(base / "rgb" / f"{i:03d}.png", img)

    imgs, poses, render_poses, hwf, i_split = load_dv_data(
        scene="cube", basedir=str(tmp_path), testskip=1
    )
    assert imgs.shape == (7, 512, 512, 3)
    assert poses.shape == (7, 3, 4)
    assert render_poses.shape == (2, 3, 4)
    H, W, focal = hwf
    assert (H, W) == (512, 512)
    # f is already expressed at the 512 target (512/512 * 350).
    assert abs(focal - 350.0) < 1e-6
    # Split layout: [train, val, test] contiguous.
    np.testing.assert_array_equal(i_split[0], np.arange(0, 3))
    np.testing.assert_array_equal(i_split[1], np.arange(3, 5))
    np.testing.assert_array_equal(i_split[2], np.arange(5, 7))
    # The y/z axis flip: identity file pose -> diag(1,-1,-1) rotation.
    np.testing.assert_allclose(
        poses[0, :3, :3], np.diag([1.0, -1.0, -1.0]), atol=1e-6
    )
