"""Sharded full-image rendering: the ray/sample axis across the mesh.

SURVEY.md §5.7: this model has no sequences — the structural analogue of
sequence parallelism is the rays × samples grid of a full-image render
(800x800 x 192 samples = 123M point queries). Rays are embarrassingly
parallel, so an eval render shards the flattened ray axis over the mesh's
data axis with shard_map; each device lax.map's over its local fixed-size
tiles. Compositing is per-ray, so no cross-shard reduction is needed at all
(the only cross-sample operation — the transmittance prefix product — stays
within a ray). No ring-attention analogue is required; documented here
explicitly.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from indoor_nerf_tpu.ops.rays import get_rays
from indoor_nerf_tpu.render.renderer import RenderConfig, _prepare_rays, render_rays


def make_sharded_image_renderer(
    config: RenderConfig,
    H: int,
    W: int,
    mesh: Mesh,
    data_axis: str = "data",
    tile_rays: int = 8192,
):
    """A mesh-parallel full-image renderer.

    Returns render_fn(params, c2w, K, near, far[, quant_state, occ_state])
    -> {rgb_map [H,W,3], depth_map, acc_map, disp_map}. Params/state are
    replicated; the ray axis is sharded over ``data_axis``.
    """
    n_dev = mesh.shape[data_axis]
    n = H * W
    chunk = tile_rays * n_dev
    n_pad = (n + chunk - 1) // chunk * chunk

    def local_render(params, quant_state, occ_state, ro, rd, vd, nr, fr):
        # Shapes here are per-device shards [n_pad/n_dev, .].
        def tile_fn(args):
            t_ro, t_rd, t_vd, t_nr, t_fr = args
            out, _ = render_rays(
                None, params, t_ro, t_rd, t_vd, t_nr, t_fr,
                config.test_mode(), quant_state=quant_state, train=False,
                step=None, occ_state=occ_state,
            )
            return {
                "rgb_map": out["rgb_map"],
                "depth_map": out["depth_map"],
                "acc_map": out["acc_map"],
                "disp_map": out["disp_map"],
            }

        def tiles(x):
            return x.reshape(-1, tile_rays, x.shape[-1])

        args = (
            tiles(ro), tiles(rd),
            tiles(vd) if vd is not None else None,
            tiles(nr), tiles(fr),
        )
        out = jax.lax.map(tile_fn, args)
        return {k: v.reshape(-1, *v.shape[2:]) for k, v in out.items()}

    @functools.partial(jax.jit, static_argnames=())
    def render_fn_jit(params, c2w, K, near, far, quant_state, occ_state):
        rays_o, rays_d = get_rays(H, W, K, c2w)
        focal = K[0][0]
        rays_o, rays_d, viewdirs, near_a, far_a = _prepare_rays(
            rays_o, rays_d, H, W, focal, near, far, config
        )
        pad = n_pad - n

        def padded(x):
            return jnp.pad(x, ((0, pad), (0, 0)))

        body = jax.shard_map(
            functools.partial(local_render),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(data_axis, None), P(data_axis, None),
                      P(data_axis, None) if viewdirs is not None else P(),
                      P(data_axis, None), P(data_axis, None)),
            out_specs=P(data_axis),
            check_vma=False,
        )
        out = body(
            params, quant_state, occ_state,
            padded(rays_o), padded(rays_d),
            padded(viewdirs) if viewdirs is not None else None,
            padded(near_a), padded(far_a),
        )
        return {
            "rgb_map": out["rgb_map"][:n].reshape(H, W, 3),
            "depth_map": out["depth_map"][:n].reshape(H, W),
            "acc_map": out["acc_map"][:n].reshape(H, W),
            "disp_map": out["disp_map"][:n].reshape(H, W),
        }

    def render_fn(params, c2w, K, near, far, quant_state=None, occ_state=None):
        return render_fn_jit(
            params,
            jnp.asarray(c2w, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(near, jnp.float32),
            jnp.asarray(far, jnp.float32),
            quant_state,
            occ_state,
        )

    return render_fn
