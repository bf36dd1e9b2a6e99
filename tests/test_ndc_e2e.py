"""End-to-end NDC (LLFF forward-facing) training + rendering.

The reference's LLFF mode projects every ray into normalized device
coordinates before marching (run_nerf.py:129-131, run_nerf_helpers.py:
333-350) with near/far = 0/1. Round 1 shipped the ndc_rays math but no
test trained through it; these tests close that hole with a synthesized
multi-view-consistent forward-facing scene: cameras near the origin
looking down -z at a smooth-textured Lambertian plane, written to disk in
the exact poses_bounds.npy + images/ LLFF layout and driven through the
REAL CLI driver (train/trainer.py) with dataset_type=llff, ndc on.
"""

import os
import pickle

import numpy as np
import pytest

from indoor_nerf_tpu.ops.rays import get_rays_np

H, W, FOCAL = 40, 40, 45.0
PLANE_Z = -4.0


def _plane_color(px, py):
    """Smooth multi-channel texture on the z=PLANE_Z plane (band-limited so
    a small NeRF can fit it quickly; multi-view consistent by construction)."""
    r = 0.5 + 0.45 * np.sin(1.7 * px)
    g = 0.5 + 0.45 * np.sin(1.3 * py + 0.7)
    b = 0.5 + 0.45 * np.sin(1.1 * (px + py))
    return np.stack([r, g, b], axis=-1)


def _render_gt(c2w):
    """Analytic ground-truth image: intersect pixel rays with the plane."""
    K = np.array([[FOCAL, 0, 0.5 * W], [0, FOCAL, 0.5 * H], [0, 0, 1]],
                 np.float32)
    rays_o, rays_d = get_rays_np(H, W, K, c2w)
    t = (PLANE_Z - rays_o[..., 2]) / rays_d[..., 2]
    p = rays_o + t[..., None] * rays_d
    return _plane_color(p[..., 0], p[..., 1]).astype(np.float32)


def make_forward_facing_scene(root, n=8):
    """Write an LLFF-format scene (poses_bounds.npy + images/)."""
    import imageio.v2 as imageio

    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    poses_llff = np.zeros((n, 3, 5), np.float64)
    for i in range(n):
        ang = 2 * np.pi * i / n
        # NeRF convention c2w: columns [right, up, back], camera at a small
        # xy circle around the origin, looking straight down -z.
        c2w = np.concatenate(
            [np.eye(3), np.array([[0.25 * np.cos(ang)],
                                  [0.25 * np.sin(ang)], [0.0]])], axis=1
        ).astype(np.float32)
        img = _render_gt(c2w)
        imageio.imwrite(
            os.path.join(imgdir, f"img_{i:03d}.png"),
            (np.clip(img, 0, 1) * 255).astype(np.uint8),
        )
        # Inverse of the loader's axis fix (data/llff.py:246-249, reference
        # load_llff.py:250): LLFF columns are [down, right, back].
        poses_llff[i, :, 0] = -c2w[:, 1]
        poses_llff[i, :, 1] = c2w[:, 0]
        poses_llff[i, :, 2] = c2w[:, 2]
        poses_llff[i, :, 3] = c2w[:, 3]
        poses_llff[i, :, 4] = [H, W, FOCAL]
    bds = np.stack([np.full(n, 3.2), np.full(n, 5.0)], -1)
    np.save(
        os.path.join(root, "poses_bounds.npy"),
        np.concatenate([poses_llff.reshape(n, -1), bds], -1),
    )


def test_ndc_hwf_required():
    """render.ndc without TrainConfig.ndc_hwf must fail loudly, not train
    silently in world coordinates."""
    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import (
        TrainConfig, init_train_state, train_step,
    )

    fc = FieldConfig(grid=None, i_embed=0, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=8, n_importance=0, ndc=True)
    cfg = TrainConfig(render=rc, near=0.0, far=1.0, n_rand=16, ndc_hwf=None)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = {
        "rays_o": jnp.zeros((16, 3)),
        "rays_d": jnp.concatenate(
            [jnp.zeros((16, 2)), -jnp.ones((16, 1))], axis=1
        ),
        "target": jnp.zeros((16, 3)),
    }
    with pytest.raises(ValueError, match="ndc_hwf"):
        train_step(state, batch, jax.random.PRNGKey(1), cfg)


@pytest.mark.slow
@pytest.mark.nightly
def test_ndc_llff_end_to_end(tmp_path):
    """Train through ndc=True on the synthetic forward-facing scene via the
    full CLI driver; assert convergence and a finite held-out render."""
    from indoor_nerf_tpu.train.config import parse_args
    from indoor_nerf_tpu.train.trainer import train

    scene = tmp_path / "scene"
    os.makedirs(scene)
    make_forward_facing_scene(str(scene))

    args = parse_args([
        "--expname", "ndc",
        "--basedir", str(tmp_path / "logs"),
        "--dataset_type", "llff",
        "--datadir", str(scene),
        "--llffhold", "8",
        "--use_viewdirs",
        "--i_embed", "1",
        "--finest_res", "64",
        "--log2_hashmap_size", "12",
        "--N_rand", "256",
        "--N_samples", "32",
        "--N_importance", "0",
        "--lrate", "0.01",
        "--n_iters", "250",
        "--i_print", "50",
        "--i_weights", "250",
        "--i_testset", "250",
        "--i_video", "100000",
    ])
    args.factor = None  # fixture images are full-res; skip minify
    train(args)

    logdirs = [d for d in os.listdir(tmp_path / "logs") if d.startswith("ndc")]
    assert logdirs, os.listdir(tmp_path / "logs")
    logdir = tmp_path / "logs" / logdirs[0]

    with open(logdir / "training_metrics.pkl", "rb") as f:
        td = pickle.load(f)
    final_train_psnr = td["psnr"][-1]
    assert np.isfinite(final_train_psnr)
    # The band-limited plane is easy; require real convergence, far above
    # the ~7 dB of predicting the mean color.
    assert final_train_psnr > 22.0, td["psnr"]

    # Held-out render through the NDC eval path (renderer._prepare_rays).
    testdir = logdir / "testset_000250"
    pkls = [f for f in os.listdir(testdir) if f.startswith("test_psnrs")]
    assert pkls, os.listdir(testdir)
    test_psnr = float(pkls[0].split("avg")[1].split(".pkl")[0])
    assert np.isfinite(test_psnr) and test_psnr > 18.0, pkls
