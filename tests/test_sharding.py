"""Data-parallel sharding tests: N-device mesh must match single device.

Runs on the virtual 8-device CPU platform (conftest.py) — the "multi-node
without a cluster" strategy from SURVEY.md §4.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
from indoor_nerf_tpu.models.field import FieldConfig
from indoor_nerf_tpu.ops.encoding import HashGridConfig
from indoor_nerf_tpu.parallel.shard import (
    make_mesh,
    make_sharded_train_step,
    replicate_state,
)
from indoor_nerf_tpu.render.renderer import RenderConfig
from indoor_nerf_tpu.train.step import TrainConfig, init_train_state


def _cfg(scene, n_rand):
    grid = HashGridConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=4, log2_hashmap_size=12,
        base_resolution=16, finest_resolution=64,
    )
    fc = FieldConfig(grid=grid, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=16, white_bkgd=True)
    return TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                       n_rand=n_rand, tv_loss_weight=0.0)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


@pytest.mark.slow
def test_dp_step_matches_single_device():
    scene = make_synthetic_scene(n_views=6, H=32, W=32)
    n_rand = 512
    cfg = _cfg(scene, n_rand)
    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], n_rand,
    )
    batches = [sampler.next() for _ in range(5)]

    def run(mesh):
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        state = replicate_state(state, mesh)
        step = make_sharded_train_step(cfg, mesh, donate=False)
        key = jax.random.PRNGKey(1)
        losses = []
        for b in batches:
            key, sub = jax.random.split(key)
            state, metrics = step(state, {k: jnp.asarray(v) for k, v in b.items()}, sub)
            losses.append(float(metrics["loss"]))
        return state, losses

    mesh1 = make_mesh(jax.devices()[:1])
    mesh8 = make_mesh(jax.devices())
    state1, losses1 = run(mesh1)
    state8, losses8 = run(mesh8)

    np.testing.assert_allclose(losses1, losses8, rtol=2e-4, atol=1e-6)
    # Params after 5 steps agree across mesh sizes.
    p1 = jax.tree_util.tree_leaves(state1["params"])
    p8 = jax.tree_util.tree_leaves(state8["params"])
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_dp_full_feature_step_matches_single_device():
    """Priors + occupancy + quantization under DP: the global-view step must
    be mesh-size invariant (masked means, k-means, grid refreshes and the
    A-CAQ controller all reduce over the full batch)."""
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig

    scene = make_synthetic_scene(n_views=6, H=32, W=32)
    n_rand = 256
    grid = HashGridConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=4, log2_hashmap_size=12,
        base_resolution=16, finest_resolution=64,
    )
    occ = OccupancyConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        resolution=16, update_interval=2, warmup_steps=0,
        weighting="transmittance",  # the flagship sampler path
    )
    fc = FieldConfig(grid=grid, predict_normals=True, use_quantization=True)
    rc = RenderConfig(field=fc, n_samples=16, white_bkgd=True,
                      occupancy=occ, n_occ_samples=12)
    cfg = TrainConfig(
        render=rc, near=scene["near"], far=scene["far"], n_rand=n_rand,
        tv_loss_weight=1e-6, tv_cutoff_iter=100,
        use_structural_priors=True, structural_loss_start_iter=1,
        structural_loss_ramp_iters=2, use_acaq=True, acaq_start_iter=1,
        acaq_interval=2, distortion_loss_weight=1e-3,
    )
    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], n_rand,
    )
    batches = [sampler.next() for _ in range(4)]

    def run(mesh):
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        state = replicate_state(state, mesh)
        step = make_sharded_train_step(cfg, mesh, donate=False)
        key = jax.random.PRNGKey(1)
        losses = []
        for b in batches:
            key, sub = jax.random.split(key)
            state, metrics = step(
                state, {k: jnp.asarray(v) for k, v in b.items()}, sub
            )
            losses.append(float(metrics["loss"]))
        return state, losses

    state1, losses1 = run(make_mesh(jax.devices()[:1]))
    state8, losses8 = run(make_mesh(jax.devices()))
    np.testing.assert_allclose(losses1, losses8, rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state1["occ"]["density"]),
        np.asarray(state8["occ"]["density"]), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state1["quant"]["embed"]["soft_bits"]),
        np.asarray(state8["quant"]["embed"]["soft_bits"]), rtol=1e-6,
    )


@pytest.mark.slow
def test_dp_batch_actually_sharded():
    scene = make_synthetic_scene(n_views=4, H=16, W=16)
    cfg = _cfg(scene, 256)
    mesh = make_mesh(jax.devices())
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P("data"))
    x = jax.device_put(jnp.zeros((256, 3)), batch_sharding)
    # each device holds 256/8 = 32 rays
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(32, 3)}
