"""End-to-end Blender-format training through the full CLI driver.

Like tests/test_ndc_e2e.py for LLFF, this closes the loop for the blender
dataset path: the procedural multi-view-consistent scene
(data/synthetic.py) is EXPORTED to the exact transforms_{train,val,test}
.json + PNG layout the reference consumes (load_blender.py:38-91), then
trained via `--dataset_type blender` — exercising the JSON loader, the
camera_angle_x focal round trip, RGBA white-background compositing
(run_nerf.py:771-774), the frustum bbox estimator, and the testset
render, none of which the synthetic loader path touches.
"""

import json
import os
import pickle

import numpy as np
import pytest

from indoor_nerf_tpu.data.synthetic import make_synthetic_scene


def export_blender_scene(root, n_views=10, H=40, W=40):
    """Write the procedural scene in Blender-dataset layout."""
    import imageio.v2 as imageio

    scene = make_synthetic_scene(n_views=n_views, H=H, W=W)
    Hs, Ws, focal = scene["hwf"]
    camera_angle_x = float(2.0 * np.arctan(0.5 * Ws / focal))
    splits = {
        "train": scene["i_split"][0],
        "val": scene["i_split"][1],
        "test": scene["i_split"][2],
    }
    for split, idxs in splits.items():
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for j, i in enumerate(idxs):
            rgba = np.concatenate(
                [scene["images"][i], np.ones((Hs, Ws, 1), np.float32)],
                axis=-1,
            )
            imageio.imwrite(
                os.path.join(root, split, f"r_{j}.png"),
                (np.clip(rgba, 0, 1) * 255).astype(np.uint8),
            )
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :4] = scene["poses"][i][:3, :4]
            frames.append({
                "file_path": f"./{split}/r_{j}",
                "transform_matrix": c2w.tolist(),
            })
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return scene


@pytest.mark.slow
def test_blender_end_to_end(tmp_path):
    from indoor_nerf_tpu.train.config import parse_args
    from indoor_nerf_tpu.train.trainer import train

    scene_dir = tmp_path / "nerf_synthetic" / "proc"
    os.makedirs(scene_dir)
    export_blender_scene(str(scene_dir))

    args = parse_args([
        "--expname", "blender_e2e",
        "--basedir", str(tmp_path / "logs"),
        "--dataset_type", "blender",
        "--datadir", str(scene_dir),
        "--use_viewdirs",
        "--white_bkgd",
        "--i_embed", "1",
        "--finest_res", "64",
        "--log2_hashmap_size", "12",
        "--N_rand", "256",
        "--N_samples", "24",
        "--N_importance", "0",
        "--lrate", "0.01",
        "--n_iters", "200",
        "--i_print", "50",
        "--i_weights", "200",
        "--i_testset", "200",
        "--i_video", "100000",
        "--testskip", "1",
        "--precrop_iters", "0",
        "--no_batching",
    ])
    train(args)

    logdirs = [d for d in os.listdir(tmp_path / "logs")
               if d.startswith("blender_e2e")]
    assert logdirs, os.listdir(tmp_path / "logs")
    logdir = tmp_path / "logs" / logdirs[0]

    with open(logdir / "training_metrics.pkl", "rb") as f:
        td = pickle.load(f)
    final_train_psnr = td["psnr"][-1]
    # Real convergence (the mean-color floor on this scene is ~8 dB).
    assert np.isfinite(final_train_psnr) and final_train_psnr > 15.0, (
        td["psnr"]
    )

    testdir = logdir / "testset_000200"
    pkls = [f for f in os.listdir(testdir) if f.startswith("test_psnrs")]
    assert pkls, os.listdir(testdir)
    test_psnr = float(pkls[0].split("avg")[1].split(".pkl")[0])
    assert np.isfinite(test_psnr) and test_psnr > 10.0, pkls
