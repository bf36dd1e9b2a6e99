"""Baked deferred-shading renderer: an interactive snapshot of a trained field.

Deployment-grade fast rendering is the reference's stated end goal
("interactive, photorealistic rendering on consumer mobile devices",
PocketNeRF/README.md:43) but it ships no baked pipeline. This module adds a
TPU-native one (SNeRG-style, PAPERS.md "Baking Neural Radiance Fields"):

1. **Bake** (`bake_field`): evaluate the trained field's sigma-net once on a
   dense vertex grid and store (sigma, geo_feat) in the SAME halo'd 5^3
   block-tile layout the block-hash encoder uses (ops/blockhash.py) — but
   with PERFECT (collision-free) linear block indexing. Any voxel's 8
   interpolation corners live in ONE 128-lane row, so a render sample costs
   ONE wide gather instead of 8 narrow ones (the measured TPU gather rate is
   per-ROW, ~300M rows/s, with row width free up to the HBM bandwidth
   ceiling).
2. **Render** (`baked_render_rays` / `make_baked_image_renderer`): ray-AABB
   clip -> uniform depths -> one gather + tent-product trilinear per sample
   -> composite sigma AND the 15-dim geo feature along the ray -> run the
   trained color net ONCE PER RAY on the accumulated feature + view
   direction (deferred shading). The per-sample MLP cost of the online
   renderer disappears entirely.

Behavioral divergence from the online renderer (documented in
DIVERGENCES.md): (a) the field is frozen at vertex resolution — sub-voxel
detail is trilinear, exactly like the grid methods the bake approximates;
(b) deferred shading evaluates color(sum_w feat) instead of
sum_w color(feat) — the SNeRG approximation. Quality deltas are asserted in
tests/test_baked.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.models.field import FieldConfig, encode_position, encode_views

BLOCK = 4  # voxels per block edge (5^3 = 125 halo'd vertices <= 128 lanes)
SIDE = BLOCK + 1
LANES = 128


@dataclasses.dataclass(frozen=True)
class BakedConfig:
    """Static geometry + shading metadata of a baked snapshot."""

    bbox_min: Tuple[float, float, float]
    bbox_max: Tuple[float, float, float]
    resolution: int = 256  # voxels per edge; must be divisible by BLOCK
    n_features: int = 16  # 1 sigma + geo_feat_dim
    i_embed_views: int = 2  # view encoding of the trained field
    multires_views: int = 4
    table_dtype: str = "bfloat16"  # storage dtype; compute is f32

    @property
    def blocks_per_edge(self) -> int:
        return self.resolution // BLOCK

    @property
    def n_blocks(self) -> int:
        return self.blocks_per_edge**3


def _sigma_geo_query(params, config: FieldConfig, mlp_name: str, pts):
    """(sigma, geo_feat) of the trained sigma-net at ``[M, 3]`` points.

    Same forward as query_field's sigma branch (models/field.py) without the
    color net; out-of-bbox points get sigma = 0 (reference: run_nerf.py:66).
    """
    feats, keep, _ = encode_position(pts, params, config, None, False, None)
    h = feats
    sigma_net = params[mlp_name]["sigma_net"]
    for l, layer in enumerate(sigma_net):
        h = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32)
        if "b" in layer:
            h = h + layer["b"]
        if l != len(sigma_net) - 1:
            h = jax.nn.relu(h)
    sigma = jnp.where(keep, h[..., 0], 0.0)
    return sigma, h[..., 1:]


def bake_field(
    params: Dict[str, Any],
    config: FieldConfig,
    resolution: int = 256,
    table_dtype: str = "bfloat16",
    blocks_per_chunk: int = 2048,
) -> Dict[str, Any]:
    """Bake a trained grid field into a block-tile snapshot.

    Returns a pytree ``{"table": [n_blocks, F*128], "block_max": [n_blocks],
    "color_net": ..., "config": BakedConfig}``. ``block_max`` is the max
    sigma per block (empty-space statistics for samplers/debug).

    Only ``uses_grid`` fields (NeRFSmall sigma/color split) can be baked.
    """
    if not config.uses_grid:
        raise ValueError("bake_field needs a NeRFSmall-style grid field")
    if resolution % BLOCK != 0:
        raise ValueError(f"resolution must be divisible by {BLOCK}")
    src = config.grid if config.grid is not None else config.block_grid
    bbox_min = tuple(float(v) for v in src.bbox_min)
    bbox_max = tuple(float(v) for v in src.bbox_max)
    mlp_name = "fine" if "fine" in params else "coarse"
    geo_dim = config.geo_feat_dim
    bc = BakedConfig(
        bbox_min=bbox_min,
        bbox_max=bbox_max,
        resolution=resolution,
        n_features=1 + geo_dim,
        i_embed_views=config.i_embed_views,
        multires_views=config.multires_views,
        table_dtype=table_dtype,
    )
    E = bc.blocks_per_edge
    n_blocks = bc.n_blocks
    F = bc.n_features

    bmin = np.asarray(bbox_min, np.float32)
    bmax = np.asarray(bbox_max, np.float32)
    voxel = (bmax - bmin) / resolution  # [3]

    # Lane -> in-tile vertex offsets (lanes >= 125 are dead padding).
    lane = np.arange(LANES)
    lxyz = np.stack(
        [lane // (SIDE * SIDE), (lane // SIDE) % SIDE, lane % SIDE], axis=-1
    ).astype(np.float32)  # [128, 3]
    live = (lane < SIDE**3)[None, :]  # [1, 128]

    @functools.partial(jax.jit, static_argnames=())
    def bake_chunk(block_ids):
        # block ids -> block corner vertex coords -> 128 lane positions each.
        bx = block_ids // (E * E)
        by = (block_ids // E) % E
        bz = block_ids % E
        base = jnp.stack([bx, by, bz], axis=-1).astype(jnp.float32) * BLOCK
        vtx = base[:, None, :] + jnp.asarray(lxyz)[None, :, :]  # [m, 128, 3]
        pts = jnp.asarray(bmin) + vtx * jnp.asarray(voxel)
        sigma, geo = _sigma_geo_query(
            params, config, mlp_name, pts.reshape(-1, 3)
        )
        m = block_ids.shape[0]
        sigma = sigma.reshape(m, LANES) * jnp.asarray(live, jnp.float32)
        geo = geo.reshape(m, LANES, geo_dim) * jnp.asarray(
            live, jnp.float32
        )[..., None]
        # Pack feature-major lane planes: [m, F*128].
        row = jnp.concatenate(
            [sigma[:, None, :], jnp.moveaxis(geo, -1, 1)], axis=1
        ).reshape(m, F * LANES)
        return row.astype(jnp.dtype(table_dtype)), jnp.max(
            jax.nn.relu(sigma), axis=1
        )

    # Chunks stay ON DEVICE: host round-trips per chunk are the bake
    # bottleneck (measured ~2 MB/s through the axon tunnel vs ~ms on-device
    # concatenation).
    rows_out = []
    max_out = []
    ids = np.arange(n_blocks, dtype=np.int32)
    m = min(blocks_per_chunk, n_blocks)
    pad = (-len(ids)) % m
    ids = np.concatenate([ids, np.zeros(pad, np.int32)])
    for i in range(0, len(ids), m):
        row, bm = bake_chunk(jnp.asarray(ids[i : i + m]))
        rows_out.append(row)
        max_out.append(bm)
    table = jnp.concatenate(rows_out)[:n_blocks]
    block_max = jnp.concatenate(max_out)[:n_blocks]
    return {
        "table": table,
        # Contiguous sigma plane: the density pass fetches 128-lane rows
        # (256 B in bf16) instead of the full F*128 feature row (~4 KB) —
        # the fetch-volume split that makes the two-pass renderer fast.
        "sigma_table": table[:, :LANES],
        "block_max": block_max,
        "color_net": params[mlp_name]["color_net"],
        "config": bc,
    }


def _ray_aabb(rays_o, rays_d, bmin, bmax, near, far):
    """Per-ray [t0, t1] intersection with the scene box, clipped to
    [near, far]. Rays that miss get t1 <= t0 (zero-length interval)."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    ta = (bmin - rays_o) * inv
    tb = (bmax - rays_o) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t0 = jnp.maximum(t0, near)
    t1 = jnp.minimum(t1, far)
    return t0, jnp.maximum(t1, t0)


def _tent_interp(rows: jnp.ndarray, p: jnp.ndarray, n_features: int):
    """Trilinear interpolation over gathered tiles as a tent-product
    contraction (same trick as ops/blockhash.py, generalized to F planes).

    rows ``[M, F*128]`` (any float dtype — bf16 rows are NOT pre-cast, so
    the gathered bytes stream straight into the f32-accumulated contraction
    instead of materializing an f32 copy), p ``[M, 3]`` in-tile positions
    -> ``[M, F]`` f32.
    """
    m = rows.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 1)
    lx = (lane // (SIDE * SIDE)).astype(jnp.float32)
    ly = ((lane // SIDE) % SIDE).astype(jnp.float32)
    lz = (lane % SIDE).astype(jnp.float32)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - p[:, 0:1]))
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly - p[:, 1:2]))
    tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - p[:, 2:3]))
    w = (tx * ty * tz).astype(rows.dtype)  # [M, 128]
    return jnp.einsum(
        "mfl,ml->mf", rows.reshape(m, n_features, LANES), w,
        preferred_element_type=jnp.float32,
    )


def baked_render_rays(
    baked: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int = 128,
    white_bkgd: bool = True,
    k_geo: Optional[int] = 32,
) -> Dict[str, jnp.ndarray]:
    """Render a ``[N, 3]`` ray batch from a baked snapshot.

    Two passes split the fetch volume (the TPU render bottleneck):
    1. density: one 128-lane sigma row per sample -> weights along the ray;
    2. features: the FULL F*128 feature row only for the ``k_geo`` highest-
       weight samples per ray (surface hits carry ~all the weight mass).
    Then ONE deferred color-net evaluation per ray. ``k_geo=None`` fetches
    features for every sample (exact, ~F x the bytes).
    """
    bc: BakedConfig = baked["config"]
    n = rays_o.shape[0]
    E = bc.blocks_per_edge
    F = bc.n_features
    bmin = jnp.asarray(bc.bbox_min, jnp.float32)
    bmax = jnp.asarray(bc.bbox_max, jnp.float32)

    t0, t1 = _ray_aabb(rays_o, rays_d, bmin, bmax, near, far)
    ts = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z = t0[:, None] + (t1 - t0)[:, None] * ts[None, :]  # [N, S]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]

    # Vertex-space coordinates (vertex spacing 1); perfect block indexing.
    rel = (pts - bmin) / (bmax - bmin) * bc.resolution
    rel = jnp.clip(rel, 0.0, bc.resolution - 1e-4)
    blk = jnp.clip((rel // BLOCK).astype(jnp.int32), 0, E - 1)
    local = rel - blk.astype(jnp.float32) * BLOCK  # in [0, BLOCK]
    row_idx = (blk[..., 0] * E + blk[..., 1]) * E + blk[..., 2]  # [N, S]

    # Pass 1: density only (128-lane rows, interp streams the raw dtype).
    srows = jnp.take(baked["sigma_table"], row_idx.reshape(-1), axis=0)
    sigma = _tent_interp(srows, local.reshape(-1, 3), 1).reshape(
        n, n_samples
    )

    # Standard compositing (ops/volume.py semantics, 1e10 tail).
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((n, 1), 1e10, jnp.float32)], axis=-1
    ) * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((n, 1), jnp.float32), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[:, :-1]
    weights = alpha * trans  # [N, S]
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * z, axis=-1)

    # Pass 2: full feature rows for the top-k weighted samples per ray.
    if k_geo is not None and k_geo < n_samples:
        w_sel, sel = jax.lax.top_k(weights, k_geo)  # [N, k]
        row_sel = jnp.take_along_axis(row_idx, sel, axis=1)
        local_sel = jnp.take_along_axis(local, sel[..., None], axis=1)
    else:
        k_geo = n_samples
        w_sel, sel = weights, None
        row_sel, local_sel = row_idx, local
    rows = jnp.take(baked["table"], row_sel.reshape(-1), axis=0)
    feats = _tent_interp(rows, local_sel.reshape(-1, 3), F).reshape(
        n, k_geo, F
    )
    geo = feats[..., 1:]
    feat_ray = jnp.sum(w_sel[..., None] * geo, axis=1)  # [N, geo]

    # Deferred shading: one color-net pass per RAY.
    view_cfg = FieldConfig(
        i_embed=0,
        i_embed_views=bc.i_embed_views,
        multires_views=bc.multires_views,
    )
    view_feats = encode_views(viewdirs, view_cfg)
    h = jnp.concatenate([view_feats, feat_ray], axis=-1)
    for l, layer in enumerate(baked["color_net"]):
        h = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32)
        if "b" in layer:
            h = h + layer["b"]
        if l != len(baked["color_net"]) - 1:
            h = jax.nn.relu(h)
    rgb = jax.nn.sigmoid(h) * acc[..., None]
    if white_bkgd:
        rgb = rgb + (1.0 - acc[..., None])
    disp = 1.0 / jnp.maximum(
        1e-10, depth / jnp.maximum(acc, 1e-10)
    )
    return {
        "rgb_map": rgb,
        "depth_map": depth,
        "acc_map": acc,
        "disp_map": disp,
    }


def make_baked_image_renderer(
    baked: Dict[str, Any],
    H: int,
    W: int,
    tile_rays: int = 16384,
    n_samples: int = 128,
    white_bkgd: bool = True,
    k_geo: Optional[int] = 32,
):
    """A jitted full-image renderer over a baked snapshot.

    Mirrors make_image_renderer's tiling (render/renderer.py).
    """
    from indoor_nerf_tpu.ops.rays import get_rays

    @jax.jit
    def render_image(table, sigma_table, color_net, c2w, K, near, far):
        baked_dev = {
            "table": table,
            "sigma_table": sigma_table,
            "color_net": color_net,
            "config": baked["config"],
        }
        rays_o, rays_d = get_rays(H, W, K, c2w)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        nr = H * W
        n_pad = ((nr + tile_rays - 1) // tile_rays) * tile_rays

        def padded(x):
            return jnp.pad(x, ((0, n_pad - nr), (0, 0))).reshape(
                -1, tile_rays, x.shape[-1]
            )

        def tile_fn(args):
            ro, rd, vd = args
            return baked_render_rays(
                baked_dev, ro, rd, vd, near, far,
                n_samples=n_samples, white_bkgd=white_bkgd, k_geo=k_geo,
            )

        out = jax.lax.map(
            tile_fn, (padded(rays_o), padded(rays_d), padded(viewdirs))
        )
        flat = {k: v.reshape(n_pad, *v.shape[2:])[:nr] for k, v in out.items()}
        return {
            "rgb_map": flat["rgb_map"].reshape(H, W, 3),
            "depth_map": flat["depth_map"].reshape(H, W),
            "acc_map": flat["acc_map"].reshape(H, W),
            "disp_map": flat["disp_map"].reshape(H, W),
        }

    def render_fn(c2w, K, near, far):
        return render_image(
            baked["table"], baked["sigma_table"], baked["color_net"],
            jnp.asarray(c2w, jnp.float32), jnp.asarray(K, jnp.float32),
            jnp.asarray(near, jnp.float32), jnp.asarray(far, jnp.float32),
        )

    return render_fn
