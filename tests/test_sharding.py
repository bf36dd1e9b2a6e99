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


def _block_cfg(scene, scatter_dtype="bfloat16", log2_rows=8):
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig

    return BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=4, log2_rows=log2_rows, base_resolution=16,
        finest_resolution=64,
        block_size=3, gather_dtype="bfloat16", scatter_dtype=scatter_dtype,
    )


def test_tp_block_encode_matches_single_device():
    """Level-sharded block-hash encode (parallel/tp.py::tp_block_encode) is
    bit-equal to the single-device encode in features and keep_mask, and its
    table gradient matches the fused single-device backward — the backward
    scatter stays local to each level owner, psum'd over data."""
    import indoor_nerf_tpu.ops.blockhash as bh
    from indoor_nerf_tpu.ops.blockhash import block_hash_encode, init_block_table
    from indoor_nerf_tpu.parallel.tp import tp_block_encode

    scene = make_synthetic_scene(n_views=2, H=8, W=8)
    cfg = _block_cfg(scene, log2_rows=6)
    key = jax.random.PRNGKey(0)
    table = init_block_table(key, cfg)
    lo = jnp.asarray(cfg.bbox_min)
    hi = jnp.asarray(cfg.bbox_max)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (64, 3),
        minval=lo - 0.1, maxval=hi + 0.1)  # some out-of-bbox points

    mesh = make_mesh(jax.devices(), axis_names=("data", "model"),
                     axis_sizes=(4, 2))

    old = bh._FORCE_PALLAS_SCATTER_INTERPRET
    bh._FORCE_PALLAS_SCATTER_INTERPRET = True
    try:
        ref_feats, ref_keep = block_hash_encode(x, table, cfg)
        tp_feats, tp_keep = tp_block_encode(x, table, cfg, mesh)
        np.testing.assert_allclose(np.asarray(tp_feats),
                                   np.asarray(ref_feats), rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(tp_keep),
                                      np.asarray(ref_keep))

        def loss_ref(t):
            f, _ = block_hash_encode(x, t, cfg)
            return jnp.sum(jnp.sin(3.0 * f))

        def loss_tp(t):
            f, _ = tp_block_encode(x, t, cfg, mesh)
            return jnp.sum(jnp.sin(3.0 * f))

        g_ref = jax.grad(loss_ref)(table)
        g_tp = jax.grad(loss_tp)(table)
        np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-7)
    finally:
        bh._FORCE_PALLAS_SCATTER_INTERPRET = old


@pytest.mark.slow
def test_tp_flagship_step_matches_single_device():
    """1-dev == data:4 x model:2 for the FLAGSHIP training path (i_embed 3,
    bf16 block table, transmittance occupancy sampling, distortion loss) with
    the table + RAdam moments level-sharded over the model axis
    (VERDICT r2 #2)."""
    import indoor_nerf_tpu.ops.blockhash as bh
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.parallel.shard import state_shardings

    scene = make_synthetic_scene(n_views=4, H=16, W=16)
    n_rand = 256
    bg = _block_cfg(scene)
    occ = OccupancyConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        resolution=16, update_interval=2, warmup_steps=0,
        weighting="transmittance",
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=12, white_bkgd=True,
                      occupancy=occ, n_occ_samples=12)
    cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                      n_rand=n_rand, tv_loss_weight=0.0,
                      distortion_loss_weight=1e-3)
    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], n_rand,
    )
    batches = [sampler.next() for _ in range(3)]

    def run(mesh, model_axis):
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        if model_axis is not None:
            state = jax.device_put(
                state, state_shardings(state, mesh, model_axis))
        else:
            state = replicate_state(state, mesh)
        step = make_sharded_train_step(cfg, mesh, model_axis=model_axis,
                                       donate=False, state_template=state)
        key = jax.random.PRNGKey(1)
        losses = []
        for b in batches:
            key, sub = jax.random.split(key)
            state, metrics = step(
                state, {k: jnp.asarray(v) for k, v in b.items()}, sub)
            losses.append(float(metrics["loss"]))
        return state, losses

    old = bh._FORCE_PALLAS_SCATTER_INTERPRET
    bh._FORCE_PALLAS_SCATTER_INTERPRET = True
    try:
        state1, losses1 = run(make_mesh(jax.devices()[:1]), None)
        mesh2d = make_mesh(jax.devices(), axis_names=("data", "model"),
                           axis_sizes=(4, 2))
        state_tp, losses_tp = run(mesh2d, "model")
    finally:
        bh._FORCE_PALLAS_SCATTER_INTERPRET = old

    np.testing.assert_allclose(losses1, losses_tp, rtol=3e-4, atol=1e-6)
    # The table (and every other param) after 3 steps agrees; the TP run's
    # table lives level-sharded on the mesh and gathers transparently.
    np.testing.assert_allclose(
        np.asarray(state_tp["params"]["table"]),
        np.asarray(state1["params"]["table"]), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_tp["occ"]["density"]),
        np.asarray(state1["occ"]["density"]), rtol=1e-3, atol=1e-6)
    # And the table really is sharded over the model axis.
    shards = state_tp["params"]["table"].addressable_shards
    assert {s.data.shape[0] for s in shards} == {
        state1["params"]["table"].shape[0] // 2}
