"""Baked deferred-shading renderer: an interactive snapshot of a trained field.

Deployment-grade fast rendering is the reference's stated end goal
("interactive, photorealistic rendering on consumer mobile devices",
PocketNeRF/README.md:43) but it ships no baked pipeline. This module adds a
TPU-native one (SNeRG-style, PAPERS.md "Baking Neural Radiance Fields"):

1. **Bake** (`bake_field`): evaluate the trained field's sigma-net once per
   grid vertex, then lay the results out so every render fetch is ONE row:
   - sigma in halo'd 5^3 block tiles ([E^3, 128], 67 MB at 256^3 — small
     enough to gather at the fast rate), PERFECT (collision-free) linear
     block indexing, same tile trick as ops/blockhash.py;
   - geo features in a voxel-CORNER table ([R^3, 128]: all 8 trilinear
     corners x 16 lanes each, corner-major). One 256 B row per sample sits
     under BOTH measured gather walls on GB-scale tables (~50M rows/s and
     ~50 GB/s); the 8x vertex duplication is the price (~4.3 GB at 256^3).
   The whole bake is two jit dispatches (lax.map over chunks inside) —
   per-chunk host dispatches crawl through the axon tunnel.
2. **Render** (`baked_render_rays` / `make_baked_image_renderer`): ray-AABB
   clip -> uniform depths -> pass 1 composites sigma from tile rows ->
   pass 2 fetches voxel-corner rows for only the top-k weighted samples
   (quality is flat down to k=8) -> run the trained color net ONCE PER RAY
   on the accumulated feature + view direction (deferred shading). The
   per-sample MLP cost of the online renderer disappears entirely.
   Measured 800x800 on one v5e chip: 1.85 FPS at S=128 (~18x the online
   renderer), 2.3 FPS at S=64 — see BENCH_NOTES.md.

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
    # Storage dtype; compute is f32. "int8" quantizes BOTH tables,
    # "int8sig" only the sigma tile table (log1p space), "int8geo" only
    # the voxel-corner geo table — the mixed modes exist because the two
    # tables trade quality for bytes differently (BENCH_NOTES.md round-4
    # int8 attribution).
    table_dtype: str = "bfloat16"
    # Sigma int8 encoding space: "log1p" (127 levels over log density;
    # trilinear interp becomes a GEOMETRIC mean — a zero-density corner
    # collapses it, eroding surfaces: measured -1.17 dB at k1,
    # serving_table_r4e.json) or "sqrt" (127 levels over sqrt density;
    # interp is an arithmetic mean of sqrt — a zero corner merely halves
    # instead of annihilating, low-sigma resolution ~ (s/127)^2 stays
    # fine). Ignored unless sigma_quantized.
    sigma_enc: str = "sqrt"
    # Voxel-corner GEO table resolution (0 = same as ``resolution``).
    # Geo features are smooth relative to density, and the corner table is
    # the render's largest fetch cost BECAUSE of its size: GB-scale tables
    # gather at ~34-50M rows/s while sub-100MB tables run 4-10x faster
    # (BENCH_NOTES.md gather laws). Storing geo at resolution/2 shrinks the
    # table 8x (4.3 GB -> 537 MB at 256^3) at unchanged row count.
    geo_resolution: int = 0

    @property
    def blocks_per_edge(self) -> int:
        return self.resolution // BLOCK

    @property
    def n_blocks(self) -> int:
        return self.blocks_per_edge**3

    @property
    def geo_res(self) -> int:
        return self.geo_resolution or self.resolution

    @property
    def sigma_quantized(self) -> bool:
        return self.table_dtype in ("int8", "int8sig")

    @property
    def geo_quantized(self) -> bool:
        return self.table_dtype in ("int8", "int8geo")


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


def _visibility_mask(
    params: Dict[str, Any],
    config: FieldConfig,
    mlp_name: str,
    resolution: int,
    bmin: np.ndarray,
    bmax: np.ndarray,
    cameras: Dict[str, Any],
    n_samples: int = 128,
    subsample: int = 4,
    threshold: float = 1e-3,
    mask_resolution: int = 32,
) -> jnp.ndarray:
    """Per-VERTEX visibility keep-mask ``[V^3] bool`` from training views.

    SNeRG-style alpha culling (PAPERS.md "Baking Neural Radiance Fields"):
    march every ``subsample``-th pixel's ray of every training camera
    through the ONLINE field, scatter-max each sample's compositing weight
    into a COARSE ``mask_resolution^3`` cell grid, keep cells with weight
    >= ``threshold`` from SOME training ray, dilate by one cell, and map
    bake vertices through the coarse mask. Density in regions no training
    ray ever looked at is unconstrained by the loss — classic floaters —
    and the bake would otherwise densify it onto the grid (measured:
    -7 dB on held-out views in the unobserved azimuth wedge of the
    synthetic scene). The mask MUST be coarser than the bake grid: the
    visibility rays are sparse (subsampled pixels), so marking fine
    voxels directly leaves most truly-visible voxels unmarked and culls
    real surface (measured: -10 dB everywhere). mask_resolution^2 should
    not exceed the per-view ray count (H/subsample x W/subsample).
    """
    from indoor_nerf_tpu.ops.rays import get_rays

    poses = jnp.asarray(cameras["poses"], jnp.float32)  # [V, 3, 4]
    K = jnp.asarray(cameras["K"], jnp.float32)
    H = int(cameras["H"]) // subsample
    W = int(cameras["W"]) // subsample
    # Self-clamp: the mask can never be finer than the visibility rays —
    # mask cells facing a camera must each see >= ~1 ray or sparse rays
    # leave truly-visible cells unmarked and culling destroys surface.
    R = max(4, min(mask_resolution, H, W))
    Ks = K * jnp.asarray([[1.0 / subsample], [1.0 / subsample], [1.0]],
                         jnp.float32)
    near = float(cameras["near"])
    far = float(cameras["far"])
    bmin_j = jnp.asarray(bmin)
    bmax_j = jnp.asarray(bmax)

    # params enters as a jit ARGUMENT: a zero-arg closure would fold the
    # whole table into the program as an MLIR constant — a device->host
    # fetch of the table at trace time plus a table-sized executable,
    # both of which crawl (and have crashed) through the axon tunnel.
    @jax.jit
    def view_weights(params, grid, c2w):
        rays_o, rays_d = get_rays(H, W, Ks, c2w)
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        t0, t1 = _ray_aabb(ro, rd, bmin_j, bmax_j, near, far)
        ts = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        z = t0[:, None] + (t1 - t0)[:, None] * ts[None, :]
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        sigma, _ = _sigma_geo_query(
            params, config, mlp_name, pts.reshape(-1, 3))
        sigma = sigma.reshape(z.shape)
        dists = jnp.concatenate(
            [z[:, 1:] - z[:, :-1],
             jnp.full((z.shape[0], 1), 1e10, jnp.float32)], axis=-1
        ) * jnp.linalg.norm(rd, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
        trans = jnp.cumprod(
            jnp.concatenate(
                [jnp.ones((z.shape[0], 1), jnp.float32),
                 1.0 - alpha + 1e-10], axis=-1), axis=-1)[:, :-1]
        w = (alpha * trans).reshape(-1)
        rel = (pts.reshape(-1, 3) - bmin_j) / (bmax_j - bmin_j) * R
        v = jnp.clip(rel.astype(jnp.int32), 0, R - 1)
        vox = (v[:, 0] * R + v[:, 1]) * R + v[:, 2]
        return grid.at[vox].max(w)

    grid = jnp.zeros((R**3,), jnp.float32)
    for vi in range(poses.shape[0]):
        grid = view_weights(params, grid, poses[vi])

    keep_cell = (grid >= threshold).reshape(R, R, R)
    # Dilate by one cell (3^3 OR) so coarse-cell boundaries and the
    # trilinear support of kept voxels are never clipped.
    kc = jnp.pad(keep_cell, 1, constant_values=False)
    dil = jnp.zeros((R, R, R), jnp.bool_)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                dil = dil | kc[dx:dx + R, dy:dy + R, dz:dz + R]

    # Map bake vertices (resolution+1 per edge) through the coarse mask.
    V = resolution + 1
    vi = jnp.clip(
        (jnp.arange(V, dtype=jnp.int32) * R) // resolution, 0, R - 1)
    keep_vert = dil[vi[:, None, None], vi[None, :, None], vi[None, None, :]]
    return keep_vert.reshape(-1)


def bake_field(
    params: Dict[str, Any],
    config: FieldConfig,
    resolution: int = 256,
    table_dtype: str = "bfloat16",
    blocks_per_chunk: int = 2048,
    train_cameras: Optional[Dict[str, Any]] = None,
    vis_threshold: float = 1e-3,
    vis_subsample: int = 4,
    geo_resolution: int = -1,
    int8_clip_pct: float = 100.0,
    sigma_enc: str = "sqrt",
) -> Dict[str, Any]:
    """Bake a trained grid field into a block-tile snapshot.

    Returns a pytree ``{"table": [n_blocks, F*128], "block_max": [n_blocks],
    "color_net": ..., "config": BakedConfig}``. ``block_max`` is the max
    sigma per block (empty-space statistics for samplers/debug).

    ``train_cameras`` ({"poses" [V,3,4], "K", "H", "W", "near", "far"})
    enables SNeRG-style visibility culling: density in voxels that carry
    < ``vis_threshold`` compositing weight from every training ray is
    zeroed before baking (see _visibility_mask — floaters in unobserved
    regions otherwise dominate held-out-view error).

    Only ``uses_grid`` fields (NeRFSmall sigma/color split) can be baked.
    """
    if not config.uses_grid:
        raise ValueError("bake_field needs a NeRFSmall-style grid field")
    if sigma_enc not in ("sqrt", "log1p"):
        # Anything else would silently fall through to log1p in both
        # quantize_sigma and baked_render_rays (self-consistent but not
        # what the caller asked for).
        raise ValueError(f"sigma_enc must be 'sqrt' or 'log1p', got "
                         f"{sigma_enc!r}")
    if resolution % BLOCK != 0:
        raise ValueError(f"resolution must be divisible by {BLOCK}")
    if geo_resolution < 0:
        # Flagship default: geo at HALF the density resolution. Measured
        # quality-FREE (23.63 vs 23.64 dB held-out at the 256^3 flagship,
        # serving_table_r4b.json — geo features are smooth relative to
        # density) and it cuts the deployable artifact 4.3 GB -> 537 MB.
        # Pass 0 for full-resolution geo. DIVERGENCES.md #30.
        geo_resolution = resolution // 2
    if geo_resolution and resolution % geo_resolution != 0:
        # The stride keeps geo vertices an exact subset of bake vertices,
        # so the coarser table reuses the one vertex sweep (no re-query).
        raise ValueError("geo_resolution must divide resolution")
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
        geo_resolution=geo_resolution,
        sigma_enc=sigma_enc,
    )
    E = bc.blocks_per_edge
    n_blocks = bc.n_blocks
    V = resolution + 1  # vertices per edge

    bmin = np.asarray(bbox_min, np.float32)
    bmax = np.asarray(bbox_max, np.float32)
    voxel = (bmax - bmin) / resolution  # [3]
    quant_sig = table_dtype in ("int8", "int8sig")
    quant_geo = table_dtype in ("int8", "int8geo")
    dtype = (jnp.bfloat16 if (quant_sig or quant_geo)
             else jnp.dtype(table_dtype))

    # 1. Query every UNIQUE vertex once: [V^3] sigma and [V^3, geo] features.
    #    ONE jit dispatch with lax.map over fixed-size chunks inside, and all
    #    index math from iota on device: per-chunk host dispatches and index
    #    uploads each crawl through the axon tunnel (measured: they, not the
    #    compute, dominated earlier bakes).
    chunk = blocks_per_chunk * LANES
    n_chunks = -(-(V**3) // chunk)

    # params as a jit argument, not a closure constant (see view_weights).
    @jax.jit
    def bake_vertices(params):
        def one_chunk(ci):
            vert_ids = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
            vert_ids = jnp.minimum(vert_ids, V**3 - 1)
            vi = jnp.stack(
                [vert_ids // (V * V), (vert_ids // V) % V, vert_ids % V],
                axis=-1,
            ).astype(jnp.float32)
            pts = jnp.asarray(bmin) + vi * jnp.asarray(voxel)
            sigma, geo = _sigma_geo_query(params, config, mlp_name, pts)
            return sigma.astype(dtype), geo.astype(dtype)

        s, g = jax.lax.map(one_chunk, jnp.arange(n_chunks, dtype=jnp.int32))
        return s.reshape(-1)[: V**3], g.reshape(-1, geo_dim)[: V**3]

    vert_sigma, geo_table = bake_vertices(params)  # [V^3], [V^3, geo]

    if train_cameras is not None:
        keep_vert = _visibility_mask(
            params, config, mlp_name, resolution, bmin, bmax,
            train_cameras, subsample=vis_subsample,
            threshold=vis_threshold,
        )
        # Pre-ReLU sigma: a large negative value renders as zero density
        # (and as log1p(relu(.)) = 0 in the int8 log-space path).
        vert_sigma = jnp.where(
            keep_vert, vert_sigma, jnp.asarray(-1e4, vert_sigma.dtype))

    # Optional int8 snapshot: sigma in log1p space (127 levels over the
    # log range keeps surface densities resolvable), geo with per-feature
    # symmetric scales. Halves the fetch bytes and HBM of the quantized
    # table(s) — the deployment/"mobile" trade the reference aspires to
    # (PocketNeRF/README.md:43) made concrete. Interpolation then happens
    # in log space for sigma (a geometric mean — quality asserted in
    # tests/test_baked.py). ``int8_clip_pct`` < 100 sets each geo feature's
    # scale from that |value| percentile instead of the max (NeRF feature
    # distributions are heavy-tailed — tables grow ~1000x over training —
    # so a max-based scale spends most of the 127 levels on outliers).
    sigma_scale = geo_scale = None
    if quant_sig:

        @jax.jit
        def quantize_sigma(vs):
            v = jax.nn.relu(vs.astype(jnp.float32))
            enc = jnp.sqrt(v) if sigma_enc == "sqrt" else jnp.log1p(v)
            s_sig = jnp.maximum(jnp.max(enc) / 127.0, 1e-8)
            return jnp.round(enc / s_sig).astype(jnp.int8), s_sig

        vert_sigma, sigma_scale = quantize_sigma(vert_sigma)
    if quant_geo:

        @jax.jit
        def quantize_geo(vg):
            g32 = vg.astype(jnp.float32)
            if int8_clip_pct < 100.0:
                amax = jnp.percentile(jnp.abs(g32), int8_clip_pct, axis=0)
            else:
                amax = jnp.max(jnp.abs(g32), axis=0)
            s_geo = jnp.maximum(amax / 127.0, 1e-8)
            qg = jnp.clip(jnp.round(g32 / s_geo), -127, 127).astype(jnp.int8)
            return qg, s_geo

        geo_table, geo_scale = quantize_geo(geo_table)

    # 2. Sigma TILE table [n_blocks, 128]: gather each block's 5^3 halo'd
    #    vertices into one 128-lane row (on-device, no net queries). The
    #    density pass costs ONE 256 B row fetch per render sample, and the
    #    67 MB table is small enough to gather at the fast (~300M rows/s)
    #    rate.
    @jax.jit
    def build_sigma_tiles(vs):
        # Index math on device (a host-built [n_blocks, 128] index array
        # would crawl through the axon tunnel).
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, LANES), 1)
        lx = lane // (SIDE * SIDE)
        ly = (lane // SIDE) % SIDE
        lz = lane % SIDE
        live = lane < SIDE**3
        b = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, LANES), 0)
        bx = b // (E * E) * BLOCK
        by = (b // E) % E * BLOCK
        bz = b % E * BLOCK
        vid = jnp.where(
            live, ((bx + lx) * V + (by + ly)) * V + (bz + lz), 0
        )
        rows = jnp.take(vs, vid.reshape(-1), axis=0).reshape(n_blocks, LANES)
        rows = rows * live.astype(rows.dtype)
        bm = jnp.max(jax.nn.relu(rows.astype(jnp.float32)), axis=1)
        if quant_sig:  # dequantize back to density units
            bm = (jnp.square(bm * sigma_scale) if sigma_enc == "sqrt"
                  else jnp.expm1(bm * sigma_scale))
        return rows, bm

    sigma_table, block_max = build_sigma_tiles(vert_sigma)

    # 3. Voxel CORNER table [R^3, 128]: row = the voxel's 8 corner vertices
    #    x (geo features padded to 16 lanes each), corner-major
    #    (c = dx*4 + dy*2 + dz). The feature pass then costs exactly ONE
    #    256 B row per selected sample — simultaneously minimal rows (1) and
    #    near-minimal bytes. Measured on GB-scale tables both gather walls
    #    bind around ~50M rows/s and ~50 GB/s, and this layout sits under
    #    both; the 8x vertex duplication (~4.3 GB at 256^3 bf16) is the
    #    price. Built on device by 8 gathers from the vertex-major pass.
    if geo_dim > 15:
        raise ValueError("voxel-corner rows fit geo_feat_dim <= 15")
    R = bc.geo_res  # corner-table grid (<= bake resolution)
    vstride = resolution // R  # geo vertex -> bake vertex index stride
    stride = LANES // 8  # 16 lanes per corner
    total = R**3
    n_vchunks = -(-total // chunk)

    @jax.jit
    def build_voxel_table(vg):
        def one_chunk(ci):
            vox = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
            vox = jnp.minimum(vox, total - 1)
            x = vox // (R * R)
            y = (vox // R) % R
            z = vox % R
            parts = []
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        vid = (
                            ((x + dx) * V + (y + dy)) * V + (z + dz)
                        ) * vstride
                        corner = jnp.take(vg, vid, axis=0)  # [m, geo]
                        parts.append(
                            jnp.pad(corner, ((0, 0), (0, stride - geo_dim)))
                        )
            return jnp.concatenate(parts, axis=-1)  # [m, 128]

        rows = jax.lax.map(
            one_chunk, jnp.arange(n_vchunks, dtype=jnp.int32)
        )
        return rows.reshape(-1, LANES)[:total]

    voxel_geo = build_voxel_table(geo_table)

    out = {
        "sigma_table": sigma_table,
        "voxel_geo": voxel_geo,
        "block_max": block_max,
        "color_net": params[mlp_name]["color_net"],
        "config": bc,
    }
    if sigma_scale is not None:
        out["sigma_scale"] = sigma_scale
    if geo_scale is not None:
        out["geo_scale"] = geo_scale
    return out


def save_baked(path: str, baked: Dict[str, Any]) -> None:
    """Serialize a baked snapshot to one msgpack file (the deployable
    artifact: tables + color net + geometry; same format family as
    utils/checkpoint.py)."""
    from flax import serialization

    payload = {k: v for k, v in baked.items() if k != "config"}
    cfg = dataclasses.asdict(baked["config"])
    cfg["bbox_min"] = list(cfg["bbox_min"])  # msgpack has no tuple type
    cfg["bbox_max"] = list(cfg["bbox_max"])
    blob = serialization.msgpack_serialize(
        {
            "arrays": jax.device_get(payload),
            "config": cfg,
        }
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os

    os.replace(tmp, path)


def load_baked(path: str) -> Dict[str, Any]:
    """Load a snapshot written by save_baked."""
    from flax import serialization

    with open(path, "rb") as f:
        obj = serialization.msgpack_restore(f.read())
    baked = {k: jnp.asarray(v) if not isinstance(v, (dict, list)) else v
             for k, v in obj["arrays"].items()}
    cfg = dict(obj["config"])
    cfg["bbox_min"] = tuple(cfg["bbox_min"])
    cfg["bbox_max"] = tuple(cfg["bbox_max"])
    # Snapshots written before the sqrt sigma encoding existed are log1p.
    cfg.setdefault("sigma_enc", "log1p")
    baked["config"] = BakedConfig(**cfg)
    return baked


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


def _tent_interp(rows: jnp.ndarray, px, py, pz, n_features: int):
    """Trilinear interpolation over gathered tiles as a tent-product
    contraction (same trick as ops/blockhash.py, generalized to F planes).

    rows ``[M, F*128]`` (any float dtype — bf16 rows are NOT pre-cast, so
    the gathered bytes stream straight into the f32-accumulated contraction
    instead of materializing an f32 copy), px/py/pz ``[M]`` in-tile
    positions per axis (axis-SPLIT flat vectors: an ``[M, 3]`` operand
    would physically pad its 3-lane trailing dim to 128 — 42x the bytes of
    every coordinate intermediate, BENCH_NOTES.md layout rule #1)
    -> ``[M, F]`` f32.
    """
    m = rows.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 1)
    lx = (lane // (SIDE * SIDE)).astype(jnp.float32)
    ly = ((lane // SIDE) % SIDE).astype(jnp.float32)
    lz = (lane % SIDE).astype(jnp.float32)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - px[:, None]))
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly - py[:, None]))
    tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - pz[:, None]))
    wd = rows.dtype if jnp.issubdtype(rows.dtype, jnp.floating) else jnp.float32
    w = (tx * ty * tz).astype(wd)  # [M, 128]
    rowsf = rows if jnp.issubdtype(rows.dtype, jnp.floating) else rows.astype(wd)
    return jnp.einsum(
        "mfl,ml->mf", rowsf.reshape(m, n_features, LANES), w,
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
    k_geo: Optional[int] = 4,
    t_bounds: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    corner_matmul: bool = True,
    select_onehot: bool = True,
    renorm_k: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Render a ``[N, 3]`` ray batch from a baked snapshot.

    Two passes split the fetch volume (the TPU render bottleneck):
    1. density: one 128-lane sigma TILE row per sample -> weights;
    2. features: the 8 corner rows (~32 B each) of the vertex-major geo
       table, only for the ``k_geo`` highest-weight samples per ray
       (surface hits carry ~all the weight mass; quality is flat down to
       k=4 — 23.64 vs 23.79 dB at k=8 on the trained-scene sweep, and
       the same-session FPS pair measures 4.04 vs 3.10 at 800^2, see
       BENCH_NOTES.md). ``k_geo=None`` uses every sample.
    Then ONE deferred color-net evaluation per ray.

    ``t_bounds``: optional per-ray ``([N], [N])`` sampling interval along
    the ray (same z units as near/far); it is intersected with the scene
    AABB. The guided image renderer uses this to concentrate samples
    around coarse-pass depth.
    """
    bc: BakedConfig = baked["config"]
    n = rays_o.shape[0]
    E = bc.blocks_per_edge
    bmin = jnp.asarray(bc.bbox_min, jnp.float32)
    bmax = jnp.asarray(bc.bbox_max, jnp.float32)

    t0, t1 = _ray_aabb(rays_o, rays_d, bmin, bmax, near, far)
    if t_bounds is not None:
        # Intersect the guided interval with the AABB interval. When they
        # are disjoint (e.g. dmin-margin pushed past a border ray's AABB
        # exit) fall back to the FULL AABB range instead of collapsing the
        # march to one repeated sample at t0.
        g0 = jnp.maximum(t0, t_bounds[0])
        g1 = jnp.minimum(t1, t_bounds[1])
        empty = g1 <= g0
        t0 = jnp.where(empty, t0, g0)
        t1 = jnp.where(empty, t1, g1)
    ts = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z = t0[:, None] + (t1 - t0)[:, None] * ts[None, :]  # [N, S]

    # Vertex-space coordinates (vertex spacing 1) as AXIS-SPLIT [N, S]
    # planes: a [N, S, 3] coordinate tensor physically pads its 3-lane
    # trailing dim to 128 (BENCH_NOTES.md layout rule #1), multiplying the
    # bytes of every per-sample intermediate by ~42x. Keeping x/y/z as
    # separate fully-packed planes is exact and touches only real data.
    scale = bc.resolution / (bmax - bmin)  # [3]
    rel_axes = []
    for a in range(3):
        ra = (rays_o[:, None, a] + rays_d[:, None, a] * z - bmin[a]) * scale[a]
        rel_axes.append(jnp.clip(ra, 0.0, bc.resolution - 1e-4))
    relx, rely, relz = rel_axes  # each [N, S]

    def _blk(r):  # perfect block indexing per axis
        return jnp.clip((r // BLOCK).astype(jnp.int32), 0, E - 1)

    bx, by, bz = _blk(relx), _blk(rely), _blk(relz)
    row_idx = (bx * E + by) * E + bz  # [N, S]

    # Pass 1: density only (128-lane rows, interp streams the raw dtype).
    srows = jnp.take(baked["sigma_table"], row_idx.reshape(-1), axis=0)
    sigma = _tent_interp(
        srows,
        (relx - bx.astype(jnp.float32) * BLOCK).reshape(-1),
        (rely - by.astype(jnp.float32) * BLOCK).reshape(-1),
        (relz - bz.astype(jnp.float32) * BLOCK).reshape(-1),
        1,
    ).reshape(n, n_samples)
    if bc.sigma_quantized:
        # Interpolate in the encoding space, then dequantize: sqrt-space
        # interp is an arithmetic mean of sqrt (robust to zero corners);
        # log1p-space interp is a geometric mean (kept for comparison).
        enc = jax.nn.relu(sigma) * baked["sigma_scale"]
        sigma = (jnp.square(enc) if bc.sigma_enc == "sqrt"
                 else jnp.expm1(enc))

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

    # Weighted 2%/98% depth quantiles: the span that carries the ray's
    # opacity mass. Unlike mean depth these cover BIMODAL rays (a
    # silhouette pixel splitting between a near surface and the far wall),
    # which is what makes them safe guidance intervals for the two-level
    # renderer. Degenerate (acc ~ 0) rays give z[0]; the guided caller
    # falls back to the full range for those via acc_thresh.
    cumw = jnp.cumsum(weights, axis=-1)
    iota_s = jnp.arange(n_samples)
    lo_i = jnp.argmax(cumw >= 0.02 * acc[:, None], axis=-1)
    hi_i = jnp.argmax(cumw >= 0.98 * acc[:, None], axis=-1)
    t_lo = jnp.sum((iota_s == lo_i[:, None]) * z, axis=-1)
    t_hi = jnp.sum((iota_s == hi_i[:, None]) * z, axis=-1)

    # Pass 2: geo features for the top-k weighted samples per ray — ONE
    # 256 B voxel-corner row per sample (all 8 trilinear corners in-row),
    # the layout that sits under both measured gather walls (~50M rows/s
    # and ~50 GB/s on GB-scale tables).
    if k_geo is not None and k_geo < n_samples:
        # lax.top_k measured FREE here (4.08 vs 4.09 FPS with an
        # iterative-argmax rewrite, BENCH_NOTES.md) — S=24 per-ray sorts
        # are not the sample_pdf situation.
        w_sel, sel = jax.lax.top_k(weights, k_geo)  # [N, k]
        if renorm_k:
            # Top-k drops the unselected samples' weight mass, DIMMING the
            # accumulated feature (the deferred color net then sees a
            # systematically scaled-down input as k shrinks — measured
            # -0.31 dB k4->k2, serving_table_r4.json). Rescale the selected
            # weights to carry the ray's full opacity: exact when k = S
            # (sum of all weights IS acc), and turns top-k into a proper
            # normalized quadrature of the feature integral otherwise.
            w_sel = w_sel * (
                acc / jnp.maximum(jnp.sum(w_sel, axis=-1), 1e-9)
            )[:, None]
        if select_onehot:
            # Gather-free selection. take_along_axis on an [N, S] plane
            # lowers to N*k WIDTH-1 gather rows — the transaction-bound
            # regime of the measured gather laws (~150M rows/s,
            # BENCH_NOTES.md) — and pass 2 did it THREE times; the k4->k1
            # FPS delta (57 ms/frame, tpu_serving_ladder_r3b.json)
            # attributes pass 2's ~30 ns/selected-sample almost entirely
            # to these narrow gathers. Instead select only z with an
            # in-register one-hot reduction (XLA fuses compare+select+sum
            # over the [N, k, S] window; zero gather transactions) and
            # RECOMPUTE the rel planes from the rays — the identical
            # float pipeline that produced relx/rely/relz above, so the
            # selected coordinates are bit-exact
            # (tests/test_baked.py::test_onehot_selection_matches_gather).
            onehot = iota_s[None, None, :] == sel[:, :, None]  # [N, k, S]
            z_sel = jnp.sum(
                jnp.where(onehot, z[:, None, :], 0.0), axis=-1
            )  # [N, k]
            sel_axes = []
            for a in range(3):
                sa = (rays_o[:, None, a] + rays_d[:, None, a] * z_sel
                      - bmin[a]) * scale[a]
                sel_axes.append(jnp.clip(sa, 0.0, bc.resolution - 1e-4))
            selx, sely, selz = sel_axes
        else:
            # Width-1-gather selection (kept for same-session A/B probes).
            selx = jnp.take_along_axis(relx, sel, axis=1)  # [N, k] planes
            sely = jnp.take_along_axis(rely, sel, axis=1)
            selz = jnp.take_along_axis(relz, sel, axis=1)
    else:
        k_geo = n_samples
        w_sel = weights
        selx, sely, selz = relx, rely, relz
    R = bc.geo_res
    if R != bc.resolution:  # corner table on a coarser geo grid
        f = R / bc.resolution
        selx, sely, selz = selx * f, sely * f, selz * f
    v0x = jnp.clip(selx.astype(jnp.int32), 0, R - 1)
    v0y = jnp.clip(sely.astype(jnp.int32), 0, R - 1)
    v0z = jnp.clip(selz.astype(jnp.int32), 0, R - 1)
    vox = ((v0x * R + v0y) * R + v0z).reshape(-1)  # [M]
    # In-voxel fractions as flat [M] planes (axis-split, fully packed).
    fx = (selx - v0x.astype(jnp.float32)).reshape(-1)
    fy = (sely - v0y.astype(jnp.float32)).reshape(-1)
    fz = (selz - v0z.astype(jnp.float32)).reshape(-1)
    stride = LANES // 8  # lanes per corner in the voxel_geo row
    geo_dim = bc.n_features - 1
    if corner_matmul:
        # Lane-space trilinear contraction. The serving ladder
        # (tpu_serving_ladder_r3.json) showed pass 2 costs ~27 ms per
        # selected sample while the voxel_geo GATHER is size-insensitive
        # (gres arms flat) — the cost is the reshape of every gathered
        # row's LANE dim into [8, 16] (a Mosaic relayout of all fetched
        # bytes) plus an 8-wide einsum contraction. This path never
        # reshapes gathered data: corner weights are computed directly in
        # lane layout (corner id = lane // 16, corner-major bits), applied
        # elementwise, the per-sample selection weight w_sel and the
        # k-reduction happen IN lane space, and lanes fold into features
        # with ONE [128, geo] 0/1 matmul per RAY (exact: the fold is
        # linear, so fold(sum_k w_k * vals_k) == sum_k w_k * fold(vals_k)
        # — one matmul per ray instead of per selected sample, and the
        # [N, k, geo] per-sample feature tensor never materializes).
        m = vox.shape[0]
        crows = jnp.take(baked["voxel_geo"], vox, axis=0)  # [M, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 1)
        cid = lane // stride  # corner id, corner-major c = dx*4 + dy*2 + dz
        w128 = jnp.float32(1.0)
        for fr, bit in ((fx, cid // 4), (fy, (cid // 2) % 2), (fz, cid % 2)):
            f = fr[:, None]
            w128 = w128 * jnp.where(bit == 1, f, 1.0 - f)
        cd = (crows.dtype if jnp.issubdtype(crows.dtype, jnp.floating)
              else jnp.float32)
        # Selection weight applied in lane space; reduce k before the fold.
        vals = crows.astype(cd) * (w128 * w_sel.reshape(-1)[:, None]).astype(cd)
        acc128 = jnp.sum(
            vals.reshape(n, k_geo, LANES).astype(jnp.float32), axis=1
        )  # [N, 128]
        fold = (jax.lax.broadcasted_iota(jnp.int32, (LANES, geo_dim), 0)
                % stride
                == jax.lax.broadcasted_iota(jnp.int32, (LANES, geo_dim), 1)
                ).astype(jnp.float32)
        feat_ray = jnp.dot(acc128, fold,
                           preferred_element_type=jnp.float32)  # [N, geo]
        if bc.geo_quantized:
            feat_ray = feat_ray * baked["geo_scale"][None, :]
    else:
        # Reference-layout contraction (kept for same-session A/B probes).
        crows = jnp.take(baked["voxel_geo"], vox, axis=0).reshape(
            n, k_geo, 8, stride
        )
        frac = jnp.stack(
            [fx.reshape(n, k_geo), fy.reshape(n, k_geo),
             fz.reshape(n, k_geo)], axis=-1)  # [N, k, 3]
        corner = jnp.asarray(
            [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
            jnp.float32,
        )  # [8, 3] — same corner-major order the bake packs lanes in
        cw = jnp.where(corner[None, None, :, :] == 1.0, frac[:, :, None, :],
                       1.0 - frac[:, :, None, :])  # [N, k, 8, 3]
        cw = cw[..., 0] * cw[..., 1] * cw[..., 2]  # [N, k, 8]
        cd = (crows.dtype if jnp.issubdtype(crows.dtype, jnp.floating)
              else jnp.float32)
        geo = jnp.einsum(
            "nkcf,nkc->nkf", crows[..., :geo_dim].astype(cd),
            cw.astype(cd), preferred_element_type=jnp.float32,
        )
        if bc.geo_quantized:
            geo = geo * baked["geo_scale"][None, None, :]
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
        "t_lo": t_lo,
        "t_hi": t_hi,
    }


def make_baked_image_renderer(
    baked: Dict[str, Any],
    H: int,
    W: int,
    tile_rays: int = 16384,
    n_samples: int = 128,
    white_bkgd: bool = True,
    k_geo: Optional[int] = 4,
    guided: int = 0,
    n_coarse: int = 128,
    margin_frac: float = 0.04,
    acc_thresh: float = 0.5,
    pose_block: int = 4,
    corner_matmul: bool = True,
    select_onehot: bool = True,
    renorm_k: bool = True,
):
    """A jitted full-image renderer over a baked snapshot.

    ``pose_block`` is advertised on the returned function; render_path
    passes that many poses per call (as ``[B, 3, 4]``), amortizing the
    fixed ~0.17 s/dispatch axon-tunnel latency across B frames
    (BENCH_NOTES.md render decomposition; VERDICT round-1 item 6). A
    plain ``[3, 4]`` pose still renders a single frame.

    Mirrors make_image_renderer's tiling (render/renderer.py).

    ``guided > 0`` enables DEPTH-GUIDED two-level rendering (the frame is
    gather-ROW-RATE bound, so fewer fetched rows = proportionally faster):
    first the image renders at 1/guided resolution with ``n_coarse``
    uniform samples, then each full-res ray marches only ``n_samples``
    (choose it SMALL, e.g. 24-32) fine samples inside a conservative depth
    interval — the 3x3-neighborhood min/max of coarse depth, widened by
    ``margin_frac`` x (far-near). Coarse pixels with accumulated opacity
    below ``acc_thresh`` in their whole 3x3 neighborhood (background /
    silhouette-uncertain) fall back to the full [near, far] range, so
    misses never clip geometry; structures thinner than the coarse pixel
    grid in a LOW-opacity region are the documented approximation (they
    alias exactly as a uniform ``n_samples`` march would). Total fetch
    volume: H*W*(n_coarse/guided^2 + n_samples) rows vs H*W*128 — ~2.6x
    fewer at guided=4, n_samples=32.
    """
    from indoor_nerf_tpu.ops.rays import get_rays

    @jax.jit
    def render_image(arrays, c2ws, K, near, far):
        # c2ws: [B, 3, 4] pose BLOCK — all B frames render in this one
        # dispatch, amortizing the fixed per-dispatch latency (~0.17 s
        # through the axon tunnel; BENCH_NOTES.md render decomposition).
        B = c2ws.shape[0]
        baked_dev = {**arrays, "config": baked["config"]}
        rays_o, rays_d = jax.vmap(lambda p: get_rays(H, W, K, p))(c2ws)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        def tiled(ro, rd, vd, n_s, bounds=None):
            nr = ro.shape[0]
            n_pad = ((nr + tile_rays - 1) // tile_rays) * tile_rays

            def padded(x):
                if x.ndim == 1:
                    return jnp.pad(x, (0, n_pad - nr)).reshape(-1, tile_rays)
                return jnp.pad(x, ((0, n_pad - nr), (0, 0))).reshape(
                    -1, tile_rays, x.shape[-1]
                )

            args = (padded(ro), padded(rd), padded(vd))
            if bounds is not None:
                args = args + (padded(bounds[0]), padded(bounds[1]))

            def tile_fn(a):
                tb = (a[3], a[4]) if bounds is not None else None
                return baked_render_rays(
                    baked_dev, a[0], a[1], a[2], near, far,
                    n_samples=n_s, white_bkgd=white_bkgd, k_geo=k_geo,
                    t_bounds=tb, corner_matmul=corner_matmul,
                    select_onehot=select_onehot, renorm_k=renorm_k,
                )

            out = jax.lax.map(tile_fn, args)
            return {
                k: v.reshape(n_pad, *v.shape[2:])[:nr] for k, v in out.items()
            }

        if guided:
            g = guided
            Hc, Wc = -(-H // g), -(-W // g)
            # Coarse intrinsics: scale by 1/g AND shift the principal point
            # so coarse pixel i casts through the CENTER of its g x g
            # full-res block (g*i + (g-1)/2), not the top-left corner. With
            # the corner alignment, non-divisible H/W left border blocks'
            # depth bounds sourced from rays up to g-1 pixels away; centers
            # halve the worst-case offset and stay inside every block.
            off = (g - 1) / (2.0 * g)
            scale = jnp.asarray([[1.0 / g], [1.0 / g], [1.0]], jnp.float32)
            Kc = (K * scale).at[0, 2].add(-off).at[1, 2].add(-off)
            ro_c, rd_c = jax.vmap(lambda p: get_rays(Hc, Wc, Kc, p))(c2ws)
            ro_c = ro_c.reshape(-1, 3)
            rd_c = rd_c.reshape(-1, 3)
            vd_c = rd_c / jnp.linalg.norm(rd_c, axis=-1, keepdims=True)
            coarse = tiled(ro_c, rd_c, vd_c, n_coarse)

            acc_c = coarse["acc_map"].reshape(B, Hc, Wc)
            hit = acc_c > acc_thresh
            big = jnp.float32(3e38)
            dmin = jnp.where(hit, coarse["t_lo"].reshape(B, Hc, Wc), big)
            dmax = jnp.where(hit, coarse["t_hi"].reshape(B, Hc, Wc), -big)
            # Per-frame 3x3 neighborhood min/max (SAME keeps edges valid).
            dmin = -jax.lax.reduce_window(
                -dmin, -big, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
            dmax = jax.lax.reduce_window(
                dmax, -big, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
            m = margin_frac * (far - near)
            no_hit = dmax < -1e37  # whole neighborhood below acc_thresh
            dmin = jnp.where(no_hit, near, dmin - m)
            dmax = jnp.where(no_hit, far, dmax + m)
            # Nearest-neighbor upsample to full resolution, per frame.
            dmin = jnp.repeat(jnp.repeat(dmin, g, 1), g, 2)
            dmax = jnp.repeat(jnp.repeat(dmax, g, 1), g, 2)
            dmin = dmin[:, :H, :W].reshape(-1)
            dmax = dmax[:, :H, :W].reshape(-1)
            flat = tiled(rays_o, rays_d, viewdirs, n_samples, (dmin, dmax))
        else:
            flat = tiled(rays_o, rays_d, viewdirs, n_samples)
        return {
            "rgb_map": flat["rgb_map"].reshape(B, H, W, 3),
            "depth_map": flat["depth_map"].reshape(B, H, W),
            "acc_map": flat["acc_map"].reshape(B, H, W),
            "disp_map": flat["disp_map"].reshape(B, H, W),
        }

    arrays = {k: v for k, v in baked.items() if k != "config"}

    def render_fn(c2w, K, near, far):
        """c2w ``[3, 4]`` renders one frame; ``[B, 3, 4]`` renders a pose
        BLOCK in one device dispatch (render_path passes blocks when
        ``render_fn.pose_block`` > 1)."""
        c2w = jnp.asarray(c2w, jnp.float32)
        single = c2w.ndim == 2
        out = render_image(
            arrays,
            c2w[None] if single else c2w,
            jnp.asarray(K, jnp.float32),
            jnp.asarray(near, jnp.float32), jnp.asarray(far, jnp.float32),
        )
        if single:
            out = {k: v[0] for k, v in out.items()}
        return out

    render_fn.pose_block = int(pose_block)
    return render_fn
