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
