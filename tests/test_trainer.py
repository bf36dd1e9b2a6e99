"""Integration tests for the full trainer driver + CLI config parsing."""

import glob
import os
import pickle

import numpy as np
import pytest

from indoor_nerf_tpu.train.config import parse_args


def _args(tmp_path, n_iters=25, **overrides):
    argv = [
        "--expname", "smoke",
        "--basedir", str(tmp_path),
        "--dataset_type", "synthetic",
        "--use_viewdirs",
        "--white_bkgd",
        "--N_rand", "128",
        "--N_samples", "16",
        "--N_importance", "0",
        "--finest_res", "64",
        "--log2_hashmap_size", "12",
        "--lrate", "0.01",
        "--n_iters", str(n_iters),
        "--i_print", "10",
        "--i_weights", "20",
        "--i_testset", "20",
        "--i_video", "100000",
        "--testskip", "1",
    ]
    for k, v in overrides.items():
        argv += [f"--{k}"] + ([] if v is True else [str(v)])
    return parse_args(argv)


def test_config_file_parsing(tmp_path):
    cfg = tmp_path / "test.txt"
    cfg.write_text(
        "# comment\n"
        "expname = from_file\n"
        "dataset_type = blender\n"
        "no_batching = True\n"
        "N_rand = 1024\n"
        "half_res = True\n"
        "lrate_decay = 500\n"
    )
    args = parse_args(["--config", str(cfg)])
    assert args.expname == "from_file"
    assert args.dataset_type == "blender"
    assert args.no_batching is True
    assert args.half_res is True
    assert args.N_rand == 1024
    assert args.lrate_decay == 500
    # CLI overrides the file (configargparse precedence).
    args = parse_args(["--config", str(cfg), "--N_rand", "64"])
    assert args.N_rand == 64


def test_reference_config_files_parse():
    for path in sorted(glob.glob("configs/*.txt")):
        args = parse_args(["--config", path])
        assert args.expname, path


def test_flagship_presets():
    """Every scene config has a *_tpu.txt flagship variant carrying the
    measured-fastest training preset, and --flagship applies the same
    values with config-file/CLI override precedence (VERDICT.md item 4)."""
    base = [p for p in sorted(glob.glob("configs/*.txt"))
            if not p.endswith("_tpu.txt")]
    for path in base:
        tpu = path[:-4] + "_tpu.txt"
        assert os.path.exists(tpu), f"missing flagship preset {tpu}"
        a = parse_args(["--config", tpu])
        assert (a.i_embed, a.block_size, a.block_io, a.use_occupancy,
                a.N_importance) == (3, 3, "bf16", True, 0), tpu
        assert (a.occ_samples, a.occ_weighting) == (32, "transmittance"), tpu
        # 8x4 level geometry at equal float budget (round-3 flagship:
        # halves scatter transactions, tpu_level_geometry_seeds.json).
        assert (a.n_levels, a.feats_per_level) == (8, 4), tpu
    b = parse_args(["--flagship"])
    assert (b.i_embed, b.block_size, b.block_io, b.use_occupancy) == (
        3, 3, "bf16", True)
    assert (b.occ_samples, b.occ_weighting) == (32, "transmittance")
    assert (b.n_levels, b.feats_per_level) == (8, 4)
    # Explicit flags beat the preset.
    c = parse_args(["--flagship", "--i_embed", "1"])
    assert c.i_embed == 1


def test_flagship_in_config_file(tmp_path):
    """`flagship = True` INSIDE a config file applies the preset (it was
    silently ignored: the preset check ran before file values were read),
    with the file's own explicit values still beating the preset."""
    cfg = tmp_path / "f.txt"
    cfg.write_text("expname = f\nflagship = True\nblock_size = 4\n")
    a = parse_args(["--config", str(cfg)])
    assert (a.i_embed, a.block_io, a.use_occupancy) == (3, "bf16", True)
    assert a.block_size == 4  # file value beats the preset
    # CLI still beats both.
    b = parse_args(["--config", str(cfg), "--i_embed", "1"])
    assert b.i_embed == 1


@pytest.mark.slow
def test_trainer_end_to_end_with_artifacts(tmp_path):
    from indoor_nerf_tpu.train.trainer import train

    args = _args(tmp_path, n_iters=25)
    time_metrics = train(args)
    assert "milestones" in time_metrics

    logdir = os.path.join(str(tmp_path), args.expname)
    assert os.path.exists(os.path.join(logdir, "args.txt"))
    assert os.path.exists(os.path.join(logdir, "training_metrics.pkl"))
    assert os.path.exists(os.path.join(logdir, "loss_vs_time.pkl"))
    # checkpoints at i_weights=20 and the final step 25
    ckpts = sorted(glob.glob(os.path.join(logdir, "*.ckpt")))
    assert len(ckpts) >= 2
    # metrics artifacts
    assert os.path.exists(os.path.join(logdir, "metrics", "config.json"))
    assert os.path.exists(os.path.join(logdir, "metrics", "training_curves.png"))
    assert glob.glob(os.path.join(logdir, "metrics", "metrics_iter_*.pkl"))
    # test-set render artifacts
    testdirs = glob.glob(os.path.join(logdir, "testset_*"))
    assert testdirs
    assert glob.glob(os.path.join(testdirs[0], "test_psnrs_avg*.pkl"))
    assert glob.glob(os.path.join(testdirs[0], "*.png"))

    with open(os.path.join(logdir, "training_metrics.pkl"), "rb") as f:
        td = pickle.load(f)
    assert len(td["losses"]) > 0
    assert np.isfinite(td["losses"]).all()


@pytest.mark.slow
def test_trainer_resume(tmp_path):
    from indoor_nerf_tpu.train.trainer import train

    args = _args(tmp_path, n_iters=20)
    train(args)
    args2 = _args(tmp_path, n_iters=30)
    args2.expname = "smoke"  # re-mangles to the same dir
    train(args2)
    logdir = os.path.join(str(tmp_path), args.expname)
    ckpts = sorted(glob.glob(os.path.join(logdir, "*.ckpt")))
    # resumed run continued from 20 -> final 30 exists
    assert any("000030" in c for c in ckpts), ckpts


@pytest.mark.slow
def test_render_only(tmp_path):
    from indoor_nerf_tpu.train.trainer import train

    args = _args(tmp_path, n_iters=20)
    train(args)
    args2 = _args(tmp_path, n_iters=20, render_only=True, render_test=True)
    args2.expname = "smoke"
    train(args2)
    logdir = os.path.join(str(tmp_path), args.expname)
    rdirs = glob.glob(os.path.join(logdir, "renderonly_test_*"))
    assert rdirs
    # mp4 if an ffmpeg backend exists, else the documented GIF fallback
    assert glob.glob(os.path.join(rdirs[0], "video.*"))

    # --render_baked: same surface through the baked snapshot (the bake of
    # this barely-trained field is low quality — plumbing, figures and
    # video are what this asserts; quality is asserted in test_baked.py).
    for f in glob.glob(os.path.join(rdirs[0], "*")):
        os.remove(f)
    os.rmdir(rdirs[0])
    args3 = _args(tmp_path, n_iters=20, render_only=True, render_test=True,
                  render_baked=True, render_baked_res=32)
    args3.expname = "smoke"
    train(args3)
    rdirs = glob.glob(os.path.join(logdir, "renderonly_test_*"))
    assert rdirs
    assert glob.glob(os.path.join(rdirs[0], "video.*"))
    assert glob.glob(os.path.join(rdirs[0], "0*.png"))


@pytest.mark.nightly
def test_every_config_preset_trains_one_step(tmp_path):
    """Every shipped configs/*.txt drives a REAL train step.

    Each preset is parsed with the actual configargparse path, its
    dataset swapped for the built-in synthetic scene and its size
    fields shrunk (structural flags — encoder, occupancy, hierarchy,
    priors, quantization, view-dependence — keep the preset's values),
    then one jitted step must run finite through the full driver.
    Presets sharing a jit-relevant structural signature share one run.
    Reference anchor: the 21 configs/*.txt of PocketNeRF/configs plus
    the *_tpu.txt flagship twins."""
    from indoor_nerf_tpu.train.trainer import train

    shrink = [
        "--dataset_type", "synthetic",
        "--basedir", str(tmp_path),
        "--N_rand", "64",
        "--N_samples", "8",
        "--finest_res", "32",
        "--log2_hashmap_size", "10",
        "--n_iters", "2",
        "--i_print", "1",
        "--i_weights", "100000",
        "--i_testset", "100000",
        "--i_video", "100000",
        "--no_reload",
    ]
    seen = {}
    for path in sorted(glob.glob("configs/*.txt")):
        a = parse_args(["--config", path] + shrink)
        if a.N_importance:
            a.N_importance = 8
        if getattr(a, "occ_samples", None):
            a.occ_samples = 8
        sig = (
            a.i_embed, bool(a.N_importance), a.use_viewdirs,
            a.use_occupancy, getattr(a, "block_size", None),
            getattr(a, "block_io", None),
            a.use_structural_priors, a.use_quantization,
            getattr(a, "use_acaq", False), a.white_bkgd,
            a.netdepth, a.netwidth,
        )
        seen.setdefault(sig, path)
    assert len(seen) >= 3, "signature dedup collapsed too far"
    for sig, path in sorted(seen.items(), key=lambda kv: kv[1]):
        a = parse_args(["--config", path] + shrink)
        if a.N_importance:
            a.N_importance = 8
        if getattr(a, "occ_samples", None):
            a.occ_samples = 8
        a.expname = "cfg_" + os.path.basename(path)[:-4]
        if a.use_structural_priors:
            a.structural_loss_start_iter = 1
        result = train(a)
        ips = result["iterations_per_second"]
        assert ips and np.all(np.isfinite(ips)), path
