"""Sharded full-image rendering must match the single-device renderer."""

import jax
import numpy as np

from indoor_nerf_tpu.models.field import FieldConfig, init_field_params
from indoor_nerf_tpu.ops.encoding import HashGridConfig
from indoor_nerf_tpu.parallel.shard import make_mesh
from indoor_nerf_tpu.parallel.sp import make_sharded_image_renderer
from indoor_nerf_tpu.render.renderer import RenderConfig, render_image

GRID = HashGridConfig(
    bbox_min=(-4.0, -4.0, -4.0), bbox_max=(4.0, 4.0, 4.0),
    n_levels=4, log2_hashmap_size=10, base_resolution=16, finest_resolution=64,
)


def test_sharded_render_matches_single():
    fc = FieldConfig(grid=GRID, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=16)
    params = init_field_params(jax.random.PRNGKey(0), fc)

    H, W = 24, 20
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]

    want = render_image(params, H, W, K, c2w, 2.0, 6.0, rc, tile_rays=64)

    mesh = make_mesh(jax.devices(), ("data",))
    render = make_sharded_image_renderer(rc, H, W, mesh, tile_rays=16)
    got = render(params, c2w, K, 2.0, 6.0)

    np.testing.assert_allclose(
        np.asarray(got["rgb_map"]), want["rgb_map"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["depth_map"]), want["depth_map"], rtol=1e-5, atol=1e-6
    )


def test_sharded_render_with_model_sharded_table():
    """Eval rendering with the TP training layout: the block-hash table
    arrives level-sharded over the model axis; the renderer all_gathers it
    once per dispatch and matches the plain single-device render
    (VERDICT r2 #2 — no more silent single-device fallback)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig

    bg = BlockHashConfig(
        bbox_min=(-4.0, -4.0, -4.0), bbox_max=(4.0, 4.0, 4.0),
        n_levels=4, log2_rows=8, base_resolution=16, finest_resolution=64,
        block_size=3,
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=16)
    params = init_field_params(jax.random.PRNGKey(0), fc)

    H, W = 24, 20
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]

    want = render_image(params, H, W, K, c2w, 2.0, 6.0, rc, tile_rays=64)

    mesh = make_mesh(jax.devices(), ("data", "model"), (4, 2))
    table_sh = NamedSharding(mesh, P("model", None))
    repl = NamedSharding(mesh, P())
    params_tp = {
        k: jax.device_put(v, table_sh if k == "table" else repl)
        for k, v in params.items()
    }
    assert {s.data.shape[0]
            for s in params_tp["table"].addressable_shards} == {
                params["table"].shape[0] // 2}

    render = make_sharded_image_renderer(rc, H, W, mesh, tile_rays=16,
                                         model_axis="model")
    got = render(params_tp, c2w, K, 2.0, 6.0)
    np.testing.assert_allclose(
        np.asarray(got["rgb_map"]), want["rgb_map"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["depth_map"]), want["depth_map"], rtol=1e-5, atol=1e-6
    )
