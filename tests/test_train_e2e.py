"""End-to-end convergence test on the procedural synthetic scene.

The de-facto regression check of the reference is "does PSNR climb"
(SURVEY.md §4): a few hundred steps on a tiny scene must clear a PSNR floor.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.data.pipeline import BatchedRaySampler, ImageRaySampler
from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
from indoor_nerf_tpu.losses.quantization import QuantConfig
from indoor_nerf_tpu.models.field import FieldConfig
from indoor_nerf_tpu.ops.encoding import HashGridConfig
from indoor_nerf_tpu.render.renderer import RenderConfig
from indoor_nerf_tpu.train.step import TrainConfig, init_train_state, train_step


def _make_config(scene, n_rand=512, **kw):
    grid = HashGridConfig(
        bbox_min=scene["bbox_min"],
        bbox_max=scene["bbox_max"],
        n_levels=8,
        log2_hashmap_size=14,
        base_resolution=16,
        finest_resolution=128,
    )
    fc_kw = {}
    if "quant" in kw:
        fc_kw["quant"] = kw.pop("quant")
    fc = FieldConfig(grid=grid, n_importance=0,
                     predict_normals=kw.pop("predict_normals", False),
                     use_quantization=kw.pop("use_quantization", False),
                     **fc_kw)
    rc = RenderConfig(field=fc, n_samples=32, n_importance=0, white_bkgd=True)
    return TrainConfig(
        render=rc, near=scene["near"], far=scene["far"], n_rand=n_rand,
        lrate=0.01, tv_loss_weight=1e-6, tv_cutoff_iter=100, **kw
    )


def _np_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_training_converges():
    scene = make_synthetic_scene(n_views=10, H=48, W=48)
    cfg = _make_config(scene)
    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand,
    )

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))

    key = jax.random.PRNGKey(1)
    first_psnr, last_psnr = None, None
    for i in range(250):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, _np_batch(sampler.next()), sub)
        if i == 0:
            first_psnr = float(metrics["psnr"])
        last_psnr = float(metrics["psnr"])

    assert np.isfinite(last_psnr)
    # The scene is mostly white background: even the init renders ~8-10 dB.
    # 400 steps of a working trainer reach far beyond that.
    assert last_psnr > first_psnr + 6.0, (first_psnr, last_psnr)
    assert last_psnr > 17.0, last_psnr


@pytest.mark.slow
def test_flagship_config_converges():
    """Convergence guard for the EXACT bench.py flagship configuration:
    block-hash encoder with 64-vertex (block_size 3) tiles, bfloat16 table
    IO on the gather AND the fused scatter backward, occupancy-guided
    sampling. Protects the benchmark config's quality against encoder or
    backward changes (measured 42.1 dB @1200 iters on TPU —
    convergence_tpu_b3bf16.json; this is the small-scale analogue)."""
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig

    scene = make_synthetic_scene(n_views=10, H=48, W=48)
    bg = BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=8, log2_rows=10, base_resolution=16, finest_resolution=128,
        block_size=3, gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    occ = OccupancyConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        resolution=32, warmup_steps=8,
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=32, n_importance=0,
                      white_bkgd=True, occupancy=occ, n_occ_samples=32)
    cfg = TrainConfig(
        render=rc, near=scene["near"], far=scene["far"], n_rand=512,
        lrate=0.01, tv_loss_weight=0.0,
    )
    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))

    key = jax.random.PRNGKey(1)
    first_psnr, last_psnr = None, None
    for i in range(250):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, _np_batch(sampler.next()), sub)
        if i == 0:
            first_psnr = float(metrics["psnr"])
        last_psnr = float(metrics["psnr"])

    assert np.isfinite(last_psnr)
    assert last_psnr > first_psnr + 6.0, (first_psnr, last_psnr)
    assert last_psnr > 17.0, last_psnr


@pytest.mark.slow
def test_training_with_priors_and_quantization_runs():
    """Smoke test: structural priors + A-CAQ active in the jitted step."""
    scene = make_synthetic_scene(n_views=6, H=32, W=32)
    cfg = _make_config(
        scene,
        n_rand=256,
        predict_normals=True,
        use_quantization=True,
        quant=QuantConfig(warmup_steps=10),  # embed quant active by step 30
        use_structural_priors=True,
        structural_loss_start_iter=5,
        structural_loss_ramp_iters=10,
        use_acaq=True,
        acaq_start_iter=5,
    )
    H, W, _ = scene["hwf"]
    sampler = ImageRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))

    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, _np_batch(sampler.next(i)), sub)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["psnr"]))
    # A-CAQ controller has adjusted bitwidths away from init (8.0).
    bits = np.asarray(state["quant"]["embed"]["soft_bits"])
    assert not np.allclose(bits, 8.0)
    # Quantizers calibrated once warmup passed (warmup_steps=10 above).
    assert bool(state["quant"]["weight"]["calibrated"])
    assert bool(np.all(state["quant"]["embed"]["calibrated"]))

    # Regression: eval-time render with an active quantizer and no traced
    # step (step=None). This is the testset/render_only path — it crashed
    # with a None-vs-int comparison before the calibrated-gated eval path.
    from indoor_nerf_tpu.render.renderer import render_rays

    batch = _np_batch(sampler.next(0))
    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((rays_o.shape[0], 1), cfg.near)
    far = jnp.full((rays_o.shape[0], 1), cfg.far)
    out, _ = jax.jit(
        functools.partial(
            render_rays, config=cfg.render.test_mode(), train=False
        )
    )(None, state["params"], rays_o, rays_d, viewdirs, near, far,
      quant_state=state["quant"])
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))


def test_sampler_img_idx_alignment():
    """Per-ray image ids (appearance embeddings) stay aligned with their
    rays through the batched pool's shuffle, epoch reshuffle, and tail
    wrap: every emitted target pixel must equal a pixel of the image the
    id claims, on a scene where images are constant-colored."""
    import numpy as np

    from indoor_nerf_tpu.data.pipeline import (
        BatchedRaySampler,
        ImageRaySampler,
    )

    H = W = 4
    n_img = 3
    # Image i is a constant color unique to i.
    colors = np.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6], [0.7, 0.8, 0.9]],
                        np.float32)
    images = np.tile(colors[:, None, None, :], (1, H, W, 1))
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n_img, 1, 1))
    poses[:, 2, 3] = 2.0
    K = np.asarray([[4.0, 0, 2.0], [0, 4.0, 2.0], [0, 0, 1]], np.float32)
    i_train = np.asarray([0, 2])  # absolute ids with a GAP (1 unused)

    s = BatchedRaySampler(images, poses, i_train, H, W, K, n_rand=7)
    seen = set()
    # 2 images x 16 rays = 32 pool rows; 12 batches of 7 cross the epoch
    # boundary twice and exercise the tail wrap (32 % 7 != 0).
    for _ in range(12):
        b = s.next()
        assert b["img_idx"].shape == (7,)
        for idx, px in zip(b["img_idx"], b["target"]):
            assert int(idx) in (0, 2)
            np.testing.assert_allclose(px, colors[int(idx)], rtol=1e-6)
            seen.add(int(idx))
    assert seen == {0, 2}

    si = ImageRaySampler(images, poses, i_train, H, W, K, n_rand=5)
    for step in range(6):
        b = si.next(step)
        assert b["img_idx"].shape == (5,)
        i0 = int(b["img_idx"][0])
        assert i0 in (0, 2)
        assert np.all(b["img_idx"] == i0)
        np.testing.assert_allclose(
            b["target"], np.tile(colors[i0], (5, 1)), rtol=1e-6)


def test_room_scene_exposure_jitter():
    """exposure_jitter scales only TRAIN images (per-view gain, clipped);
    held-out views stay clean; jitter is reproducible per seed."""
    import numpy as np

    from indoor_nerf_tpu.data.synthetic import make_room_scene

    a = make_room_scene(n_views=6, H=16, W=16, n_train=4)
    b = make_room_scene(n_views=6, H=16, W=16, n_train=4,
                        exposure_jitter=0.25)
    b2 = make_room_scene(n_views=6, H=16, W=16, n_train=4,
                         exposure_jitter=0.25)
    assert not np.allclose(a["images"][:4], b["images"][:4])
    np.testing.assert_array_equal(a["images"][4:], b["images"][4:])
    np.testing.assert_array_equal(b["images"], b2["images"])
    assert b["images"].max() <= 1.0 and b["images"].min() >= 0.0
    # Each jittered view is (up to clipping) a scalar multiple of clean.
    for i in range(4):
        mask = (a["images"][i] > 1e-3) & (b["images"][i] < 1.0 - 1e-6)
        ratio = b["images"][i][mask] / a["images"][i][mask]
        assert ratio.std() < 1e-4, ratio.std()
