"""Test-time appearance-latent fitting (render/appearance.py) and the
renderer's shared view_bias plumbing.

Protocol under test: NeRF-W half-image evaluation — fit a [D] latent on
the left half of a held-out view, score the right half (reference
setting: PocketNeRF's iPhone few-shot captures, whose EV normalization
leaves residual per-view exposure; notebooks/iphone_raw_preprocessing
.ipynb cell 5).

The fixture is a briefly-trained (~8 s CPU) tiny field on the room
scene: a random-init field has sigma ~ 0 everywhere, so view_bias has no
observable effect and fitting would be vacuous.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.data.pipeline import ImageRaySampler
from indoor_nerf_tpu.data.synthetic import make_room_scene
from indoor_nerf_tpu.models.field import FieldConfig
from indoor_nerf_tpu.ops.encoding import HashGridConfig
from indoor_nerf_tpu.render.appearance import (
    eval_view_with_fitted_latent,
    fit_view_latent,
    right_half_psnr,
)
from indoor_nerf_tpu.render.renderer import RenderConfig, make_image_renderer
from indoor_nerf_tpu.train.step import TrainConfig, init_train_state, train_step

H = W = 24


@pytest.fixture(scope="module")
def trained():
    scene = make_room_scene(n_views=5, H=H, W=W, n_train=4)
    grid = HashGridConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=4, log2_hashmap_size=10,
        base_resolution=16, finest_resolution=64,
    )
    fc = FieldConfig(grid=grid, i_embed=1, n_importance=0, n_appearance=5)
    rc = RenderConfig(field=fc, n_samples=16, n_importance=0)
    cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                      n_rand=256, lrate=0.01)
    sampler = ImageRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    key = jax.random.PRNGKey(1)
    for i in range(150):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next(i).items()}
        state, _ = step_fn(state, batch, sub)
    render = make_image_renderer(rc.test_mode(), H, W, 256)
    return state["params"], rc, fc, scene, render


def test_view_bias_zero_matches_unbiased(trained):
    params, rc, fc, scene, render = trained
    c2w = scene["poses"][4][:3, :4]
    out0 = render(params, c2w, scene["K"], scene["near"], scene["far"])
    outz = render(params, c2w, scene["K"], scene["near"], scene["far"],
                  view_bias=jnp.zeros((fc.input_ch_views,)))
    np.testing.assert_allclose(np.asarray(out0["rgb_map"]),
                               np.asarray(outz["rgb_map"]), atol=1e-6)


def test_fit_recovers_known_latent(trained):
    """GT rendered WITH a known latent z*; fitting from zero on the left
    half must close most of the right-half gap to it."""
    params, rc, fc, scene, render = trained
    c2w = scene["poses"][4]
    zstar = 0.6 * jax.random.normal(
        jax.random.PRNGKey(7), (fc.input_ch_views,))
    gt = np.asarray(render(params, c2w[:3, :4], scene["K"], scene["near"],
                           scene["far"], view_bias=zstar)["rgb_map"])
    res = eval_view_with_fitted_latent(
        render, params, np.asarray(c2w), scene["K"], scene["near"],
        scene["far"], gt, rc, n_steps=120, n_rays=256, lrate=0.05,
    )
    assert res["psnr_right_fitted"] > res["psnr_right_zero"] + 3.0, res


def test_fit_reuses_one_compile_across_views(trained):
    """Per-view fits must share one compiled program: params and the ray
    batch are jit ARGUMENTS of the module-level fitter (ADVICE round-3 —
    a per-call closure retraced for every view)."""
    from indoor_nerf_tpu.render import appearance

    params, rc, fc, scene, render = trained
    appearance._fit_latent.clear_cache()
    for view in (3, 4):
        c2w = scene["poses"][view]
        gt = np.asarray(scene["images"][view])
        fit_view_latent(
            params, np.asarray(c2w), scene["K"], scene["near"],
            scene["far"], gt, rc, n_steps=5, n_rays=128, seed=view,
        )
    assert appearance._fit_latent._cache_size() == 1


def test_fit_view_latent_loss_decreases(trained):
    params, rc, fc, scene, render = trained
    c2w = scene["poses"][4]
    zstar = 0.5 * jnp.ones((fc.input_ch_views,))
    gt = np.asarray(render(params, c2w[:3, :4], scene["K"], scene["near"],
                           scene["far"], view_bias=zstar)["rgb_map"])
    _, mse_fit = fit_view_latent(
        params, np.asarray(c2w), scene["K"], scene["near"], scene["far"],
        gt, rc, n_steps=80, n_rays=256,
    )
    _, mse_0 = fit_view_latent(
        params, np.asarray(c2w), scene["K"], scene["near"], scene["far"],
        gt, rc, n_steps=0, n_rays=256,
    )
    assert mse_fit < mse_0 * 0.5, (mse_fit, mse_0)


def test_fit_handles_exposure_shifted_view(trained):
    """The realistic failure: the held-out image is the model's own
    render scaled by an exposure gain. The fitted latent must recover
    most of the lost PSNR."""
    params, rc, fc, scene, render = trained
    c2w = scene["poses"][4]
    clean = np.asarray(render(params, c2w[:3, :4], scene["K"],
                              scene["near"], scene["far"])["rgb_map"])
    gt = np.clip(clean * 1.25, 0.0, 1.0)
    res = eval_view_with_fitted_latent(
        render, params, np.asarray(c2w), scene["K"], scene["near"],
        scene["far"], gt, rc, n_steps=120, n_rays=256, lrate=0.05,
    )
    # +1.07 dB measured on this fixture; the ceiling is the briefly-
    # trained view branch's capacity to express a multiplicative gain,
    # not the fitter (the known-latent test above recovers >3 dB).
    assert res["psnr_right_fitted"] > res["psnr_right_zero"] + 0.75, res


def test_right_half_psnr_ignores_left_half():
    gt = np.zeros((8, 8, 3), np.float32)
    pred = np.zeros((8, 8, 3), np.float32)
    pred[:, :4] = 1.0  # corrupt only the unscored half
    assert right_half_psnr(pred, gt) > 100.0


def test_jitter_test_gains_exposed():
    scene = make_room_scene(n_views=6, H=16, W=16, n_train=4,
                            exposure_jitter=0.3, jitter_test=True)
    g = scene["exposure_gains"]
    assert g.shape == (6,)
    # All six views jittered, and test gains differ from 1.
    assert np.any(np.abs(g[4:] - 1.0) > 1e-3)
    # Clean-protocol invariance: jitter_test=False leaves test gains at 1.
    scene2 = make_room_scene(n_views=6, H=16, W=16, n_train=4,
                             exposure_jitter=0.3)
    assert np.all(scene2["exposure_gains"][4:] == 1.0)


def test_affine_fit_recovers_exposure_gain():
    """The closed-form affine fitter recovers a synthetic per-channel
    gain/bias exactly (left half fits, right half scores)."""
    from indoor_nerf_tpu.render.appearance import (
        eval_view_with_fitted_affine,
        fit_affine_color,
    )

    rng = np.random.default_rng(0)
    pred = rng.uniform(0.1, 0.8, size=(16, 16, 3)).astype(np.float32)
    a_true = np.array([1.15, 0.9, 1.05], np.float32)
    b_true = np.array([0.02, -0.01, 0.0], np.float32)
    gt = np.clip(pred * a_true + b_true, 0.0, 1.0)
    a, b = fit_affine_color(pred, gt)
    np.testing.assert_allclose(a, a_true, atol=1e-4)
    np.testing.assert_allclose(b, b_true, atol=1e-4)

    out = eval_view_with_fitted_affine(pred, gt)
    # Affine-adjusted right half is a near-exact match; raw is not.
    assert out["psnr_right_affine"] > 60.0
    assert out["psnr_right_affine"] > out["psnr_right_zero"] + 5.0


def test_affine_fit_degenerate_constant_pred():
    """Near-constant predictions degrade to identity gain, not a blowup."""
    from indoor_nerf_tpu.render.appearance import fit_affine_color

    pred = np.full((8, 8, 3), 0.5, np.float32)
    gt = np.full((8, 8, 3), 0.7, np.float32)
    a, b = fit_affine_color(pred, gt)
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    np.testing.assert_allclose(a, 1.0, atol=1e-6)
    np.testing.assert_allclose(b, 0.2, atol=1e-6)


def test_affine_fit_does_not_leak_right_half():
    """Fitting uses ONLY the left half: corrupting the right half of gt
    must not change the fitted transform."""
    from indoor_nerf_tpu.render.appearance import fit_affine_color

    rng = np.random.default_rng(1)
    pred = rng.uniform(0.1, 0.9, size=(12, 12, 3)).astype(np.float32)
    gt = np.clip(pred * 1.2 - 0.05, 0.0, 1.0)
    gt_corrupt = gt.copy()
    gt_corrupt[:, 6:] = rng.uniform(size=(12, 6, 3))
    from indoor_nerf_tpu.render.appearance import (
        eval_view_with_fitted_affine,
    )

    o1 = eval_view_with_fitted_affine(pred, gt)
    o2 = eval_view_with_fitted_affine(pred, gt_corrupt)
    np.testing.assert_allclose(o1["gain"], o2["gain"], atol=1e-6)
    np.testing.assert_allclose(o1["bias"], o2["bias"], atol=1e-6)
