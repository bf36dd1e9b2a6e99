"""Tests for the HTTP render server and config->TrainConfig plumbing."""

import argparse
import importlib.util
import json
import os
import threading
import urllib.request

import numpy as np
import pytest


def _load_serve():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(root, "scripts", "serve.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TRAIN_FLAGS = [
    "--expname", "srv", "--dataset_type", "synthetic", "--use_viewdirs",
    "--white_bkgd", "--N_rand", "128", "--N_samples", "8",
    "--N_importance", "0", "--finest_res", "64", "--log2_hashmap_size", "10",
    "--testskip", "1",
]


@pytest.mark.slow
def test_serve_build_and_render(tmp_path):
    serve = _load_serve()
    flags = TRAIN_FLAGS + ["--basedir", str(tmp_path)]
    args = argparse.Namespace(port=0, width=16, height=16, train_args=flags)
    render, step, hw = serve.build(args)
    assert hw == (16, 16)
    from indoor_nerf_tpu.data.poses import pose_spherical

    rgb, dt = render(pose_spherical(45.0, -30.0, 4.0))
    assert rgb.shape == (16, 16, 3)
    assert np.all(np.isfinite(rgb))


def test_config_plumbing_chair_flags():
    """chair.txt's flags must reach the static TrainConfig correctly."""
    from indoor_nerf_tpu.data.load import load_dataset
    from indoor_nerf_tpu.train.config import parse_args
    from indoor_nerf_tpu.train.trainer import build_train_config

    args = parse_args(["--config", "configs/chair.txt"])
    assert args.no_batching and args.use_viewdirs and args.white_bkgd
    assert args.N_samples == 64 and args.N_importance == 128
    assert args.N_rand == 1024 and args.lrate_decay == 500
    assert args.half_res

    # Swap the dataset for the built-in synthetic one; the model/render
    # config must still reflect the chair hyperparameters.
    args.dataset_type = "synthetic"
    scene = load_dataset(args)
    cfg = build_train_config(args, scene)
    assert cfg.render.n_samples == 64
    assert cfg.render.n_importance == 128
    assert cfg.render.white_bkgd
    assert cfg.render.field.grid.finest_resolution == 512
    assert cfg.render.field.grid.log2_hashmap_size == 19
    assert cfg.lrate_decay == 500
    assert cfg.render.field.n_importance == 128
