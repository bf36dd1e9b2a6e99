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
from typing import Any, Dict, Optional  # noqa: F401

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
    model_axis: Optional[str] = None,
):
    """A mesh-parallel full-image renderer.

    Returns render_fn(params, c2w, K, near, far[, quant_state, occ_state])
    -> {rgb_map [H,W,3], depth_map, acc_map, disp_map}. The ray axis is
    sharded over EVERY mesh axis (a 4x2 data x model mesh renders 8 distinct
    ray shards). With ``model_axis`` set, params arrive with the hash table
    level-sharded over that axis (the TP training layout, parallel/tp.py);
    each device all_gathers the table once per dispatch over ICI and renders
    its ray shard with the full table — eval renders are gather-once, not
    per-sample TP (one ~tens-of-MB gather per image vs per-tile activation
    exchanges). Everything else is replicated.
    """
    all_axes = tuple(mesh.axis_names)
    n_dev = int(np.prod([mesh.shape[a] for a in all_axes]))
    n = H * W
    chunk = tile_rays * n_dev
    n_pad = (n + chunk - 1) // chunk * chunk

    def local_render(params, quant_state, occ_state, ro, rd, vd, nr, fr):
        # Shapes here are per-device shards [n_pad/n_dev, .].
        if model_axis is not None:
            params = dict(params)
            params["table"] = jax.lax.all_gather(
                params["table"], model_axis, axis=0, tiled=True
            )

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

        ray_spec = P(all_axes, None)
        if model_axis is None:
            params_spec = P()
        else:
            # Match the TP training layout: the table leaf is level-sharded
            # over the model axis, every other param replicated.
            def leaf_spec(path, leaf):
                keys = [getattr(pp, "key", getattr(pp, "idx", None))
                        for pp in path]
                return P(model_axis, None) if "table" in keys else P()

            params_spec = jax.tree_util.tree_map_with_path(leaf_spec, params)
        body = jax.shard_map(
            functools.partial(local_render),
            mesh=mesh,
            in_specs=(params_spec, P(), P(), ray_spec, ray_spec,
                      ray_spec if viewdirs is not None else P(),
                      ray_spec, ray_spec),
            out_specs=P(all_axes),
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
