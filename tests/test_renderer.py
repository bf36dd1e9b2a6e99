"""Tests for the ray renderer and full-image tiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.models.field import FieldConfig, init_field_params
from indoor_nerf_tpu.ops.encoding import HashGridConfig
from indoor_nerf_tpu.render.renderer import (
    RenderConfig,
    render_image,
    render_rays,
)

GRID = HashGridConfig(
    bbox_min=(-4.0, -4.0, -4.0),
    bbox_max=(4.0, 4.0, 4.0),
    n_levels=4,
    log2_hashmap_size=10,
    base_resolution=16,
    finest_resolution=64,
)


def _setup(n_importance=0, predict_normals=False):
    fc = FieldConfig(grid=GRID, n_importance=n_importance,
                     predict_normals=predict_normals)
    rc = RenderConfig(field=fc, n_samples=16, n_importance=n_importance)
    params = init_field_params(jax.random.PRNGKey(0), fc)
    return fc, rc, params


def _rays(n):
    key = jax.random.PRNGKey(7)
    rays_o = jnp.zeros((n, 3))
    rays_d = jax.random.normal(key, (n, 3))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((n, 1), 2.0)
    far = jnp.full((n, 1), 6.0)
    return rays_o, rays_d, viewdirs, near, far


def test_render_rays_coarse_only():
    _, rc, params = _setup()
    ro, rd, vd, near, far = _rays(32)
    out, _ = render_rays(jax.random.PRNGKey(0), params, ro, rd, vd, near, far, rc)
    assert out["rgb_map"].shape == (32, 3)
    assert out["depth_map"].shape == (32,)
    assert out["pts"].shape == (32, 16, 3)
    assert "rgb0" not in out
    for v in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(v)))


def test_render_rays_hierarchical():
    _, rc, params = _setup(n_importance=8)
    ro, rd, vd, near, far = _rays(16)
    out, _ = render_rays(
        jax.random.PRNGKey(0), params, ro, rd, vd, near, far, rc, retraw=True
    )
    assert out["rgb_map"].shape == (16, 3)
    assert out["rgb0"].shape == (16, 3)
    assert out["z_std"].shape == (16,)
    assert out["pts"].shape == (16, 24, 3)  # N_samples + N_importance
    assert out["raw"].shape == (16, 24, 4)


@pytest.mark.slow
def test_render_rays_normals():
    _, rc, params = _setup(n_importance=8, predict_normals=True)
    ro, rd, vd, near, far = _rays(8)
    out, _ = render_rays(jax.random.PRNGKey(0), params, ro, rd, vd, near, far, rc)
    assert out["normal_map"].shape == (8, 3)
    assert out["normal0"].shape == (8, 3)


def test_render_rays_deterministic_when_perturb_zero():
    _, rc, params = _setup()
    rc = rc.test_mode()
    ro, rd, vd, near, far = _rays(8)
    out1, _ = render_rays(None, params, ro, rd, vd, near, far, rc, train=False)
    out2, _ = render_rays(None, params, ro, rd, vd, near, far, rc, train=False)
    np.testing.assert_array_equal(np.asarray(out1["rgb_map"]),
                                  np.asarray(out2["rgb_map"]))


def test_render_image_shapes_and_tiling():
    _, rc, params = _setup()
    H, W = 12, 10  # deliberately not a multiple of the tile size
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    out = render_image(params, H, W, K, c2w, 2.0, 6.0, rc, tile_rays=32)
    assert out["rgb_map"].shape == (H, W, 3)
    assert out["depth_map"].shape == (H, W)
    assert np.all(np.isfinite(out["rgb_map"]))

    # Tiling must not change results: compare against one big tile.
    out2 = render_image(params, H, W, K, c2w, 2.0, 6.0, rc, tile_rays=256)
    np.testing.assert_allclose(out["rgb_map"], out2["rgb_map"], rtol=1e-5, atol=1e-6)


def test_pose_block_renderer_matches_per_pose():
    """B-poses-per-dispatch rendering (make_pose_block_renderer) must be
    numerically identical to pose-at-a-time rendering — it only changes
    how rays are batched into dispatches (VERDICT round-1 item 6)."""
    from indoor_nerf_tpu.render.renderer import make_pose_block_renderer

    _, rc, params = _setup()
    H, W = 10, 8
    K = np.array([[18.0, 0, W / 2], [0, 18.0, H / 2], [0, 0, 1]], np.float32)
    c2ws = []
    for i in range(3):
        m = np.eye(4, dtype=np.float32)[:3, :4]
        m[:, 3] = [0.2 * i, -0.1 * i, 0.05]
        c2ws.append(m)
    c2ws = np.stack(c2ws)

    block = make_pose_block_renderer(rc, H, W, pose_block=3, tile_rays=64)
    out_b = block(params, c2ws, K, 2.0, 6.0)
    assert out_b["rgb_map"].shape == (3, H, W, 3)
    for i in range(3):
        out_1 = render_image(
            params, H, W, K, c2ws[i], 2.0, 6.0, rc, tile_rays=64
        )
        np.testing.assert_allclose(
            np.asarray(out_b["rgb_map"][i]), out_1["rgb_map"],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_b["depth_map"][i]), out_1["depth_map"],
            rtol=1e-5, atol=1e-5,
        )


def test_render_path_pose_blocking(tmp_path):
    """render_path with pose_block > 1 (and a block that doesn't divide the
    pose count) produces the same frames as pose-at-a-time."""
    from indoor_nerf_tpu.render.path import render_path

    _, rc, params = _setup()
    H, W = 10, 8
    K = np.array([[18.0, 0, W / 2], [0, 18.0, H / 2], [0, 0, 1]], np.float64)
    poses = []
    for i in range(5):  # 5 poses, block 2 -> padded final block
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0.1 * i, 0.0, 0.02 * i]
        poses.append(m)
    poses = np.stack(poses)

    rgbs_b, depths_b, _ = render_path(
        poses, (H, W, 18.0), K, rc, params, 2.0, 6.0,
        save_figures=False, tile_rays=64, pose_block=2,
    )
    rgbs_1, depths_1, _ = render_path(
        poses, (H, W, 18.0), K, rc, params, 2.0, 6.0,
        save_figures=False, tile_rays=64, pose_block=1,
    )
    assert rgbs_b.shape == (5, H, W, 3)
    np.testing.assert_allclose(rgbs_b, rgbs_1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(depths_b, depths_1, rtol=1e-5, atol=1e-5)


def test_render_path_per_view_psnr_and_figures(tmp_path):
    """Per-view PSNR entries and saved figures must cover EVERY pose when
    pose_block > 1 (regression: they ran once per block using the block's
    last frame — 1-in-B PSNR sampling and missing PNGs)."""
    import glob as _glob

    from indoor_nerf_tpu.render.path import render_path

    _, rc, params = _setup()
    H, W = 10, 8
    K = np.array([[18.0, 0, W / 2], [0, 18.0, H / 2], [0, 0, 1]], np.float64)
    poses = []
    for i in range(5):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0.1 * i, 0.0, 0.02 * i]
        poses.append(m)
    poses = np.stack(poses)
    gt = np.zeros((5, H, W, 3), np.float32)

    savedir = str(tmp_path / "views")
    os.makedirs(savedir)
    rgbs, _, psnrs = render_path(
        poses, (H, W, 18.0), K, rc, params, 2.0, 6.0,
        gt_imgs=gt, savedir=savedir, save_figures=True,
        tile_rays=64, pose_block=2,
    )
    assert len(psnrs) == 5
    for i, rgb in enumerate(rgbs):
        want = -10.0 * np.log10(np.mean(np.square(rgb - gt[i])))
        np.testing.assert_allclose(psnrs[i], want, rtol=1e-6)
    assert sorted(os.path.basename(p) for p in
                  _glob.glob(os.path.join(savedir, "0*.png"))) == [
        "000.png", "001.png", "002.png", "003.png", "004.png"]
