"""Tests for occupancy-grid guided sampling."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.ops.occupancy import (
    OccupancyConfig,
    init_occupancy,
    occupancy_lookup,
    occupancy_update,
    occupancy_z_vals,
)

CFG = OccupancyConfig(
    bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0),
    resolution=16, warmup_steps=0,
)


def test_lookup_maps_cells():
    occ = init_occupancy(CFG)
    # mark one specific cell
    g = CFG.resolution
    dens = occ["density"].at[:].set(0.0)
    # cell containing the origin: rel=0.5 -> ijk = 8
    idx = (8 * g + 8) * g + 8
    occ = {"density": dens.at[idx].set(5.0)}
    v = occupancy_lookup(jnp.asarray([[0.01, 0.01, 0.01], [0.9, 0.9, 0.9]]), occ, CFG)
    np.testing.assert_allclose(np.asarray(v), [5.0, 0.0])


def test_update_registers_density_and_decays():
    cfg = OccupancyConfig(
        bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3, resolution=8,
        decay=0.5, update_fraction=1.0,
    )
    occ = init_occupancy(cfg)

    def sigma_fn(pts):
        # density only inside a small ball at origin
        return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.3, 10.0, 0.0)

    for i in range(6):
        occ = occupancy_update(jax.random.PRNGKey(i), occ, sigma_fn, cfg)
    dens = np.asarray(occ["density"]).reshape(8, 8, 8)
    # center cells occupied, corner cells decayed toward zero
    assert dens[4, 4, 4] > 1.0
    assert dens[0, 0, 0] < 0.1


def test_z_vals_concentrate_on_occupied():
    cfg = OccupancyConfig(
        bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3, resolution=16,
        warmup_steps=0, floor=1e-4,
    )
    occ = init_occupancy(cfg)
    # occupancy only in a slab z in [0.25, 0.5] along the ray direction +z
    g = cfg.resolution
    dens = np.zeros((g, g, g), np.float32)
    dens[:, :, 10:12] = 100.0  # cells 10,11 -> world z in [0.25, 0.5]
    occ = {"density": jnp.asarray(dens.reshape(-1))}

    n = 64
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    near = jnp.full((n, 1), 0.0)
    far = jnp.full((n, 1), 2.0)
    z = occupancy_z_vals(
        jax.random.PRNGKey(0), rays_o, rays_d, near, far, occ, cfg,
        n_samples=32, step=jnp.asarray(1000),
    )
    pts_z = -1.0 + np.asarray(z)  # world z of samples
    frac = np.mean((pts_z > 0.2) & (pts_z < 0.55))
    assert frac > 0.8, frac
    assert np.all(np.diff(np.asarray(z), axis=-1) >= 0)  # sorted


def test_transmittance_weighting_targets_visible_surface():
    """T*alpha candidate weighting puts samples at the FIRST surface and
    starves occluded-but-dense space, unlike raw density weighting."""
    g = 16
    base = dict(bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3, resolution=g,
                warmup_steps=0, floor=1e-4)
    # two dense slabs along +z: front (visible) and back (occluded)
    dens = np.zeros((g, g, g), np.float32)
    dens[:, :, 10:12] = 200.0  # world z in [0.25, 0.5]
    dens[:, :, 14:16] = 200.0  # world z in [0.75, 1.0]
    occ = {"density": jnp.asarray(dens.reshape(-1))}

    n = 64
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    near = jnp.full((n, 1), 0.0)
    far = jnp.full((n, 1), 2.0)
    step = jnp.asarray(1000)

    out = {}
    for w in ("density", "transmittance"):
        cfg = OccupancyConfig(weighting=w, **base)
        z = occupancy_z_vals(jax.random.PRNGKey(0), rays_o, rays_d, near,
                             far, occ, cfg, n_samples=32, step=step)
        z = np.asarray(z)
        assert np.isfinite(z).all()
        assert np.all(np.diff(z, axis=-1) >= 0)  # sorted
        pts_z = -1.0 + z
        out[w] = (np.mean((pts_z > 0.2) & (pts_z < 0.55)),   # front slab
                  np.mean((pts_z > 0.7) & (pts_z < 1.05)))   # back slab
    # density splits samples evenly across both slabs; transmittance
    # concentrates on the visible front while the occlusion_mix alpha term
    # keeps ~mix/(1+mix) carving pressure on the occluded back (pure
    # T*alpha has a measured fog lock-in failure — ops/occupancy.py).
    assert out["density"][1] > 0.25, out
    assert out["transmittance"][0] > 0.75, out
    assert 0.03 < out["transmittance"][1] < 0.3, out

    # occlusion_mix=0 is the pure T*alpha limit: back slab fully starved.
    cfg0 = OccupancyConfig(weighting="transmittance", occlusion_mix=0.0,
                           **base)
    z0 = np.asarray(occupancy_z_vals(jax.random.PRNGKey(0), rays_o, rays_d,
                                     near, far, occ, cfg0, n_samples=32,
                                     step=step))
    pts_z0 = -1.0 + z0
    assert np.mean((pts_z0 > 0.7) & (pts_z0 < 1.05)) < 0.05

    # warmup forces uniform sampling in both modes
    cfg = OccupancyConfig(**{**base, "warmup_steps": 16,
                             "weighting": "transmittance"})
    zw = np.asarray(occupancy_z_vals(
        jax.random.PRNGKey(0), rays_o, rays_d, near, far, occ, cfg,
        n_samples=32, step=jnp.asarray(0)))
    assert zw.min() < 0.15 and zw.max() > 1.85

    # deterministic mode (perturb=0) stays finite and sorted
    zd = np.asarray(occupancy_z_vals(
        jax.random.PRNGKey(0), rays_o, rays_d, near, far, occ, cfg,
        n_samples=32, step=step, perturb=0.0))
    assert np.isfinite(zd).all() and np.all(np.diff(zd, axis=-1) >= 0)


@pytest.mark.slow
def test_occupancy_training_converges():
    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import TrainConfig, init_train_state, train_step

    scene = make_synthetic_scene(n_views=10, H=48, W=48)
    grid = HashGridConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=8, log2_hashmap_size=14, base_resolution=16,
        finest_resolution=128,
    )
    occ_cfg = OccupancyConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        resolution=32, update_interval=8, warmup_steps=64,
    )
    fc = FieldConfig(grid=grid, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=32, white_bkgd=True,
                      occupancy=occ_cfg, n_occ_samples=24)
    cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                      n_rand=512, lrate=0.01, tv_loss_weight=0.0)
    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    key = jax.random.PRNGKey(1)
    last = None
    for i in range(250):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, metrics = step_fn(state, batch, sub)
        last = float(metrics["psnr"])
    assert np.isfinite(last)
    assert last > 17.0, last
    # The grid should have pruned most of the (mostly empty) scene: after
    # 50 EMA rounds at decay 0.95, never-refreshed empty cells sit at
    # 0.95^50 ~ 0.08 while occupied cells carry real densities >> 1.
    occupied = float(jnp.mean(state["occ"]["density"] > 0.5))
    assert occupied < 0.6, occupied
