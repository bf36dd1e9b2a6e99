"""Tests for the baked deferred-shading renderer (render/baked.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
from indoor_nerf_tpu.models.field import FieldConfig, init_field_params
from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
from indoor_nerf_tpu.render.baked import (
    _ray_aabb,
    _sigma_geo_query,
    _tent_interp,
    bake_field,
    make_baked_image_renderer,
)
from indoor_nerf_tpu.render.renderer import RenderConfig, make_image_renderer
from indoor_nerf_tpu.train.step import TrainConfig, init_train_state, train_step


def _tiny_field(bbox=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))):
    bg = BlockHashConfig(
        bbox_min=bbox[0], bbox_max=bbox[1],
        n_levels=4, log2_rows=6, base_resolution=8, finest_resolution=32,
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    params = init_field_params(jax.random.PRNGKey(0), fc)
    return fc, params


def test_ray_aabb():
    bmin = jnp.asarray([-1.0, -1.0, -1.0])
    bmax = jnp.asarray([1.0, 1.0, 1.0])
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 5.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t0, t1 = _ray_aabb(o, d, bmin, bmax, 0.0, 10.0)
    np.testing.assert_allclose(np.asarray(t0[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1[0]), 4.0, atol=1e-5)
    # Second ray misses: zero-length interval.
    assert float(t1[1]) <= float(t0[1]) + 1e-6


def test_bake_exact_at_vertices():
    """The baked tables reproduce the field query exactly at vertices:
    sigma via tent interp of the tile row (the tent selects one lane
    there), geo via a direct vertex-major row lookup."""
    fc, params = _tiny_field()
    baked = bake_field(params, fc, resolution=8, table_dtype="float32",
                       blocks_per_chunk=8, geo_resolution=0)
    bc = baked["config"]
    assert baked["sigma_table"].shape == (bc.n_blocks, 128)
    assert baked["voxel_geo"].shape == (8**3, 128)

    rng = np.random.default_rng(0)
    vij = rng.integers(0, 9, size=(40, 3))  # vertex ids in [0, 8]
    bmin = np.asarray(bc.bbox_min)
    bmax = np.asarray(bc.bbox_max)
    pts = bmin + vij / 8.0 * (bmax - bmin)
    sigma, geo = _sigma_geo_query(params, fc, "coarse",
                                  jnp.asarray(pts, jnp.float32))

    rel = vij.astype(np.float64)  # vertex-space coords == vertex ids
    blk = np.clip(rel // 4, 0, bc.blocks_per_edge - 1).astype(np.int32)
    local = rel - blk * 4
    E = bc.blocks_per_edge
    row_idx = (blk[:, 0] * E + blk[:, 1]) * E + blk[:, 2]
    rows = jnp.take(baked["sigma_table"], jnp.asarray(row_idx), axis=0)
    lx, ly, lz = (jnp.asarray(local[:, a], jnp.float32) for a in range(3))
    feats = _tent_interp(rows, lx, ly, lz, 1)
    np.testing.assert_allclose(
        np.asarray(feats[:, 0]), np.asarray(sigma), rtol=1e-4, atol=1e-5
    )
    # geo: corner 0 (dx=dy=dz=0) of the voxel AT the vertex equals the
    # vertex's own features (clip voxel ids at the top edge to corner 7).
    vclip = np.minimum(vij, 7)
    c = vij - vclip  # 1 where clipped (top face) else 0
    cidx = c[:, 0] * 4 + c[:, 1] * 2 + c[:, 2]
    vox = (vclip[:, 0] * 8 + vclip[:, 1]) * 8 + vclip[:, 2]
    rows = np.asarray(jnp.take(baked["voxel_geo"], jnp.asarray(vox), axis=0))
    got = rows.reshape(-1, 8, 16)[np.arange(len(vij)), cidx, :15]
    np.testing.assert_allclose(got, np.asarray(geo), rtol=1e-4, atol=1e-5)


def test_corner_matmul_matches_einsum_path():
    """The lane-space pass-2 contraction (corner weights computed at
    corner id = lane // 16, lanes folded into features by one [128, geo]
    0/1 matmul) is numerically the reference-layout einsum contraction —
    same trilinear weights, same corners, different schedule."""
    fc, params = _tiny_field()
    baked = bake_field(params, fc, resolution=8, table_dtype="float32",
                       blocks_per_chunk=8)
    rng = np.random.default_rng(3)
    n = 96
    o = np.tile([[0.0, 0.0, -3.0]], (n, 1)) + 0.1 * rng.standard_normal(
        (n, 3))
    d = np.stack([np.linspace(-0.4, 0.4, n),
                  0.2 * rng.standard_normal(n), np.ones(n)], axis=-1)
    rays_o = jnp.asarray(o, jnp.float32)
    rays_d = jnp.asarray(d, jnp.float32)
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    from indoor_nerf_tpu.render.baked import baked_render_rays

    a = baked_render_rays(baked, rays_o, rays_d, vd, 0.5, 6.0,
                          n_samples=24, k_geo=4, corner_matmul=True)
    b = baked_render_rays(baked, rays_o, rays_d, vd, 0.5, 6.0,
                          n_samples=24, k_geo=4, corner_matmul=False)
    np.testing.assert_allclose(np.asarray(a["rgb_map"]),
                               np.asarray(b["rgb_map"]),
                               rtol=1e-4, atol=1e-5)
    # And with every sample selected (k_geo=None) on an int8 bake.
    baked8 = bake_field(params, fc, resolution=8, table_dtype="int8",
                        blocks_per_chunk=8)
    a8 = baked_render_rays(baked8, rays_o, rays_d, vd, 0.5, 6.0,
                           n_samples=16, k_geo=None, corner_matmul=True)
    b8 = baked_render_rays(baked8, rays_o, rays_d, vd, 0.5, 6.0,
                           n_samples=16, k_geo=None, corner_matmul=False)
    np.testing.assert_allclose(np.asarray(a8["rgb_map"]),
                               np.asarray(b8["rgb_map"]),
                               rtol=1e-4, atol=1e-5)
    # And on the shipped DEFAULT bfloat16 bake, where the matmul path adds
    # one extra bf16 rounding at vals = crows * w128 before the lane fold
    # (ADVICE round-3) — looser tolerance for that rounding.
    baked16 = bake_field(params, fc, resolution=8, table_dtype="bfloat16",
                         blocks_per_chunk=8)
    a16 = baked_render_rays(baked16, rays_o, rays_d, vd, 0.5, 6.0,
                            n_samples=24, k_geo=4, corner_matmul=True)
    b16 = baked_render_rays(baked16, rays_o, rays_d, vd, 0.5, 6.0,
                            n_samples=24, k_geo=4, corner_matmul=False)
    np.testing.assert_allclose(np.asarray(a16["rgb_map"]),
                               np.asarray(b16["rgb_map"]),
                               rtol=2e-2, atol=2e-3)


def test_bake_geo_resolution_subset():
    """A coarser voxel-corner geo table (geo_resolution = resolution/s) is
    exactly the strided-vertex subset of the full-res table, and the render
    path samples it with matching trilinear weights (exact wherever the geo
    field is trilinear on the coarse grid — checked at coarse vertices)."""
    fc, params = _tiny_field()
    full = bake_field(params, fc, resolution=8, table_dtype="float32",
                      blocks_per_chunk=8, geo_resolution=0)
    half = bake_field(params, fc, resolution=8, table_dtype="float32",
                      blocks_per_chunk=8, geo_resolution=4)
    assert full["voxel_geo"].shape == (8**3, 128)
    assert half["voxel_geo"].shape == (4**3, 128)
    assert half["config"].geo_res == 4
    # Flagship DEFAULT is geo at HALF the density resolution (measured
    # quality-free and 8x smaller, serving_table_r4b.json; DIVERGENCES #30)
    # — the default bake must equal the explicit half-res bake.
    default = bake_field(params, fc, resolution=8, table_dtype="float32",
                         blocks_per_chunk=8)
    assert default["config"].geo_res == 4
    assert default["voxel_geo"].shape == half["voxel_geo"].shape
    # sigma table unaffected by geo_resolution
    np.testing.assert_array_equal(np.asarray(full["sigma_table"]),
                                  np.asarray(half["sigma_table"]))
    # Corner (dx,dy,dz) of coarse voxel (x,y,z) == the field's features at
    # bake vertex (2(x+dx), 2(y+dy), 2(z+dz)) — compare against the
    # matching corner rows of the FULL-res table.
    fullg = np.asarray(full["voxel_geo"]).reshape(8**3, 8, 16)
    halfg = np.asarray(half["voxel_geo"]).reshape(4**3, 8, 16)
    rng = np.random.default_rng(1)
    for _ in range(20):
        x, y, z = rng.integers(0, 4, size=3)
        cx, cy, cz = rng.integers(0, 2, size=3)
        c = cx * 4 + cy * 2 + cz
        # full-res voxel whose corner-0 is that bake vertex (clip at edge)
        vx, vy, vz = np.minimum([2 * (x + cx), 2 * (y + cy), 2 * (z + cz)],
                                7)
        dx, dy, dz = (2 * (x + cx) - vx, 2 * (y + cy) - vy,
                      2 * (z + cz) - vz)
        cf = dx * 4 + dy * 2 + dz
        np.testing.assert_allclose(
            halfg[(x * 4 + y) * 4 + z, c],
            fullg[(vx * 8 + vy) * 8 + vz, cf], rtol=1e-6)

    # Render parity: the two bakes must stay in the same quality class on
    # arbitrary rays (geo is smooth at this scale, not exactly trilinear,
    # so allow a small tolerance), and shapes/finiteness must hold.
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -3.0]], (64, 1)), jnp.float32)
    d = np.stack([np.linspace(-0.3, 0.3, 64), np.zeros(64), np.ones(64)],
                 axis=-1)
    rays_d = jnp.asarray(d, jnp.float32)
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    from indoor_nerf_tpu.render.baked import baked_render_rays

    o_full = baked_render_rays(full, rays_o, rays_d, vd, 0.5, 6.0,
                               n_samples=32, k_geo=4)
    o_half = baked_render_rays(half, rays_o, rays_d, vd, 0.5, 6.0,
                               n_samples=32, k_geo=4)
    a = np.asarray(o_full["rgb_map"])
    b = np.asarray(o_half["rgb_map"])
    assert np.all(np.isfinite(b))
    # Same weights/acc (sigma path identical); rgb close (geo coarser).
    np.testing.assert_allclose(np.asarray(o_half["acc_map"]),
                               np.asarray(o_full["acc_map"]), atol=1e-5)
    assert float(np.max(np.abs(a - b))) < 0.25
    # load/save round-trips the new config field; old snapshots without it
    # default to geo_resolution=0 (full res).
    import os
    import tempfile

    from indoor_nerf_tpu.render.baked import load_baked, save_baked

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "half.msgpack")
        save_baked(p, half)
        again = load_baked(p)
    assert again["config"].geo_res == 4


@pytest.mark.slow
@pytest.mark.nightly
def test_baked_render_matches_online():
    """Train a small field, bake it, and check the baked render stays in the
    online render's quality class on a held-out view."""
    scene = make_synthetic_scene(n_views=8, H=40, W=40)
    bg = BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=8, log2_rows=7, base_resolution=16, finest_resolution=64,
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=32, white_bkgd=True)
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
    for _ in range(200):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, metrics = step_fn(state, batch, sub)

    i_test = scene["i_split"][2][0]
    gt = np.asarray(scene["images"][i_test])
    c2w = np.asarray(scene["poses"][i_test])[:3, :4]

    online = make_image_renderer(rc.test_mode(), H, W, 4096)(
        state["params"], c2w, scene["K"], scene["near"], scene["far"]
    )
    psnr_online = -10 * np.log10(
        np.mean((np.asarray(online["rgb_map"]) - gt) ** 2)
    )

    baked = bake_field(state["params"], fc, resolution=48,
                       table_dtype="float32", blocks_per_chunk=256)
    render = make_baked_image_renderer(baked, H, W, tile_rays=1024,
                                       n_samples=64)
    out = render(c2w, scene["K"], scene["near"], scene["far"])
    rgb = np.asarray(out["rgb_map"])
    assert np.all(np.isfinite(rgb))
    psnr_baked = -10 * np.log10(np.mean((rgb - gt) ** 2))

    # The bake trades sub-voxel detail + exact view-dependence for speed;
    # it must stay within a few dB of the online render, not collapse.
    assert psnr_baked > 16.0, (psnr_baked, psnr_online)
    assert psnr_baked > psnr_online - 6.0, (psnr_baked, psnr_online)

    # Visibility culling (SNeRG-style): zero density in voxels no training
    # ray puts weight on. Must not HURT held-out quality (it removes only
    # unobserved-region floaters) and must actually cull something.
    train_cams = {
        "poses": scene["poses"][scene["i_split"][0]],
        "K": scene["K"], "H": H, "W": W,
        "near": scene["near"], "far": scene["far"],
    }
    baked_c = bake_field(state["params"], fc, resolution=48,
                         table_dtype="float32", blocks_per_chunk=256,
                         train_cameras=train_cams, vis_subsample=2)
    rgb_c = np.asarray(
        make_baked_image_renderer(baked_c, H, W, tile_rays=1024,
                                  n_samples=96)(
            c2w, scene["K"], scene["near"], scene["far"])["rgb_map"])
    assert np.all(np.isfinite(rgb_c))
    psnr_c = -10 * np.log10(np.mean((rgb_c - gt) ** 2))
    assert psnr_c > psnr_baked - 0.3, (psnr_c, psnr_baked)
    # Culling really zeroed unobserved vertices (the -1e4 sentinel).
    assert float(jnp.min(baked_c["sigma_table"])) < -1e3

    # int8 snapshot (log-space sigma + per-feature geo scales) stays within
    # ~1 dB of the float bake, and survives a save/load round trip.
    import os
    import tempfile

    from indoor_nerf_tpu.render.baked import load_baked, save_baked

    baked8 = bake_field(state["params"], fc, resolution=48,
                        table_dtype="int8", blocks_per_chunk=256)
    assert baked8["sigma_table"].dtype == jnp.int8
    assert baked8["voxel_geo"].dtype == jnp.int8
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "snap.msgpack")
        save_baked(p, baked8)
        baked8 = load_baked(p)
    render8 = make_baked_image_renderer(baked8, H, W, tile_rays=1024,
                                        n_samples=96)
    rgb8 = np.asarray(render8(c2w, scene["K"], scene["near"],
                              scene["far"])["rgb_map"])
    psnr8 = -10 * np.log10(np.mean((rgb8 - gt) ** 2))
    # At this deliberately tiny CI protocol (48^3 bake, 200 train steps)
    # int8 costs ~2 dB; the "within ~1 dB" claim is measured at the 256^3
    # deployment scale (scripts/eval_baked_quality.py, BENCH_NOTES.md).
    # The guard here is against catastrophic int8 breakage, not the
    # deployment delta.
    assert psnr8 > psnr_baked - 3.0, (psnr8, psnr_baked)

    # Depth-guided two-level rendering: a low-res coarse pass bounds the
    # per-ray depth interval, and FEWER fine samples concentrated there
    # must stay in the plain baked render's quality class (the whole point
    # is fewer fetched rows at equal quality).
    render_g = make_baked_image_renderer(
        baked, H, W, tile_rays=1024, n_samples=24, guided=4, n_coarse=96,
    )
    rgb_g = np.asarray(render_g(c2w, scene["K"], scene["near"],
                                scene["far"])["rgb_map"])
    assert np.all(np.isfinite(rgb_g))
    psnr_g = -10 * np.log10(np.mean((rgb_g - gt) ** 2))
    assert psnr_g > psnr_baked - 1.0, (psnr_g, psnr_baked)


def test_guided_render_non_divisible_resolution():
    """Guided rendering at H, W not divisible by `guided` must stay finite
    and match the divisible-resolution quality class: coarse rays now cast
    through block CENTERS and empty guided intervals fall back to the full
    AABB range (round-1 advisor finding on baked.py)."""
    fc, params = _tiny_field(bbox=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)))
    baked = bake_field(params, fc, resolution=8, table_dtype="float32",
                       blocks_per_chunk=8)
    H, W = 11, 13  # deliberately not multiples of guided=4
    K = np.array([[14.0, 0, W / 2], [0, 14.0, H / 2], [0, 0, 1]], np.float32)
    c2w = np.concatenate(
        [np.eye(3, dtype=np.float32), np.array([[0.0], [0.0], [3.5]],
                                               np.float32)], axis=1
    )
    render_g = make_baked_image_renderer(
        baked, H, W, tile_rays=512, n_samples=16, guided=4, n_coarse=32,
    )
    out = render_g(c2w, K, 2.0, 6.0)
    assert out["rgb_map"].shape == (H, W, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))
    # Every ray must march a non-degenerate interval: acc finite, and the
    # plain (unguided) render agrees within a loose tolerance.
    render_p = make_baked_image_renderer(
        baked, H, W, tile_rays=512, n_samples=64,
    )
    ref = render_p(c2w, K, 2.0, 6.0)
    diff = float(np.mean(np.abs(
        np.asarray(out["rgb_map"]) - np.asarray(ref["rgb_map"]))))
    assert diff < 0.1, diff


def test_onehot_selection_matches_gather():
    """The gather-free pass-2 selection (one-hot z reduction + rel-plane
    recompute from the rays) is BIT-EXACT vs the take_along_axis path:
    the recompute runs the identical float pipeline that produced the
    rel planes, and the one-hot sum has exactly one nonzero term."""
    fc, params = _tiny_field()
    baked = bake_field(params, fc, resolution=8, table_dtype="float32",
                       blocks_per_chunk=8)
    rng = np.random.default_rng(5)
    n = 96
    o = np.tile([[0.0, 0.0, -3.0]], (n, 1)) + 0.1 * rng.standard_normal(
        (n, 3))
    d = np.stack([np.linspace(-0.4, 0.4, n),
                  0.2 * rng.standard_normal(n), np.ones(n)], axis=-1)
    rays_o = jnp.asarray(o, jnp.float32)
    rays_d = jnp.asarray(d, jnp.float32)
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    from indoor_nerf_tpu.render.baked import baked_render_rays

    for cm in (True, False):
        a = baked_render_rays(baked, rays_o, rays_d, vd, 0.5, 6.0,
                              n_samples=24, k_geo=4, corner_matmul=cm,
                              select_onehot=True)
        b = baked_render_rays(baked, rays_o, rays_d, vd, 0.5, 6.0,
                              n_samples=24, k_geo=4, corner_matmul=cm,
                              select_onehot=False)
        for key in ("rgb_map", "depth_map", "acc_map"):
            np.testing.assert_array_equal(
                np.asarray(a[key]), np.asarray(b[key]),
                err_msg=f"{key} (corner_matmul={cm})")
    # Guided t_bounds path too (the fine pass also selects).
    tb = (jnp.full((n,), 2.0, jnp.float32), jnp.full((n,), 5.0, jnp.float32))
    a = baked_render_rays(baked, rays_o, rays_d, vd, 0.5, 6.0,
                          n_samples=16, k_geo=2, t_bounds=tb,
                          select_onehot=True)
    b = baked_render_rays(baked, rays_o, rays_d, vd, 0.5, 6.0,
                          n_samples=16, k_geo=2, t_bounds=tb,
                          select_onehot=False)
    np.testing.assert_array_equal(np.asarray(a["rgb_map"]),
                                  np.asarray(b["rgb_map"]))


def test_mixed_int8_modes_and_clip_percentile():
    """int8sig / int8geo quantize exactly one table each, their quantized
    halves are bit-identical to the full-int8 bake's, and a <100 geo clip
    percentile never widens the per-feature scales."""
    fc, params = _tiny_field()
    kw = dict(resolution=16, blocks_per_chunk=16)
    b_full = bake_field(params, fc, table_dtype="int8", **kw)
    b_sig = bake_field(params, fc, table_dtype="int8sig", **kw)
    b_geo = bake_field(params, fc, table_dtype="int8geo", **kw)

    assert b_sig["sigma_table"].dtype == jnp.int8
    assert b_sig["voxel_geo"].dtype == jnp.bfloat16
    assert "sigma_scale" in b_sig and "geo_scale" not in b_sig
    assert b_geo["sigma_table"].dtype == jnp.bfloat16
    assert b_geo["voxel_geo"].dtype == jnp.int8
    assert "geo_scale" in b_geo and "sigma_scale" not in b_geo
    np.testing.assert_array_equal(np.asarray(b_sig["sigma_table"]),
                                  np.asarray(b_full["sigma_table"]))
    np.testing.assert_array_equal(np.asarray(b_geo["voxel_geo"]),
                                  np.asarray(b_full["voxel_geo"]))
    # block_max is in density units regardless of the sigma storage dtype.
    np.testing.assert_allclose(np.asarray(b_sig["block_max"]),
                               np.asarray(b_full["block_max"]), rtol=1e-6)

    # Percentile clipping: scales can only shrink vs the max-based scale.
    b_clip = bake_field(params, fc, table_dtype="int8geo",
                        int8_clip_pct=99.0, **kw)
    assert np.all(np.asarray(b_clip["geo_scale"])
                  <= np.asarray(b_geo["geo_scale"]) + 1e-12)

    # Both mixed modes render finite images through the standard path.
    for b in (b_sig, b_geo, b_clip):
        r = make_baked_image_renderer(b, 8, 8, tile_rays=64, n_samples=16)
        K = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 3.0
        out = r(c2w, K, 0.5, 6.0)
        assert np.all(np.isfinite(np.asarray(out["rgb_map"])))


def test_topk_weight_renormalization_improves_low_k():
    """renorm_k rescales the selected top-k weights to carry the ray's full
    opacity (exact when k = S). Dropping the unselected mass systematically
    DIMS the accumulated feature as k shrinks (measured -0.31 dB k4->k2 at
    deployment scale, serving_table_r4.json); renormalized low-k must beat
    unrenormalized low-k on a trained scene."""
    scene = make_synthetic_scene(n_views=8, H=40, W=40)
    bg = BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=8, log2_rows=7, base_resolution=16, finest_resolution=64,
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=32, white_bkgd=True)
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
    for _ in range(200):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, _ = step_fn(state, batch, sub)
    baked = bake_field(state["params"], fc, resolution=48,
                       table_dtype="float32", blocks_per_chunk=256)
    i_test = scene["i_split"][2][0]
    gt = np.asarray(scene["images"][i_test])
    c2w = np.asarray(scene["poses"][i_test])[:3, :4]

    def render_psnr(k, rn):
        r = make_baked_image_renderer(baked, H, W, tile_rays=1024,
                                      n_samples=64, k_geo=k, renorm_k=rn)
        rgb = np.asarray(r(c2w, scene["K"], scene["near"],
                           scene["far"])["rgb_map"])
        assert np.all(np.isfinite(rgb))
        return -10 * np.log10(np.mean((rgb - gt) ** 2))

    for k in (1, 2):
        off, on = render_psnr(k, False), render_psnr(k, True)
        assert on > off + 0.2, (k, off, on)
    # k_geo=None path is renorm-free and unaffected by the flag.
    assert abs(render_psnr(None, True) - render_psnr(None, False)) < 1e-6


def test_sigma_sqrt_encoding_beats_log1p_at_zero_corners():
    """The int8 sigma table interpolates in its encoding space. With a
    zero-density corner in the tile (every surface boundary), log1p-space
    interpolation is a geometric mean that collapses toward zero, while
    sqrt-space interpolation merely scales — reconstructed mid-voxel
    density must stay far closer to the true arithmetic mean."""
    fc, params = _tiny_field()
    kw = dict(resolution=16, blocks_per_chunk=16)
    b_sqrt = bake_field(params, fc, table_dtype="int8sig",
                        sigma_enc="sqrt", **kw)
    b_log = bake_field(params, fc, table_dtype="int8sig",
                       sigma_enc="log1p", **kw)
    assert b_sqrt["config"].sigma_enc == "sqrt"
    assert b_log["config"].sigma_enc == "log1p"

    # Controlled check of the decode math itself: a 1-D edge between a
    # zero corner and density 100, interpolated at the midpoint.
    true_mid = 50.0
    for enc, dec in ((np.sqrt, np.square), (np.log1p, np.expm1)):
        scale = enc(100.0) / 127.0
        q0, q1 = 0.0, np.round(enc(100.0) / scale)
        mid = dec(0.5 * (q0 + q1) * scale)
        if enc is np.sqrt:
            sqrt_err = abs(mid - true_mid)
        else:
            log_err = abs(mid - true_mid)
    # sqrt reconstructs 25 (the 0.25x corner-weight square), log1p ~9 (the
    # geometric collapse): sqrt is strictly closer to the true 50, and the
    # gap widens with density (at 1000: 250 vs ~31).
    assert sqrt_err < log_err, (sqrt_err, log_err)

    # Both encodings render finite images.
    K = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 3.0
    for b in (b_sqrt, b_log):
        r = make_baked_image_renderer(b, 8, 8, tile_rays=64, n_samples=16)
        assert np.all(np.isfinite(np.asarray(r(c2w, K, 0.5, 6.0)["rgb_map"])))

    # save/load round-trips the encoding; PRE-sigma_enc snapshots (no
    # field in the msgpack) must load as log1p.
    import os
    import tempfile

    from indoor_nerf_tpu.render.baked import load_baked, save_baked

    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "s.msgpack")
        save_baked(pth, b_sqrt)
        assert load_baked(pth)["config"].sigma_enc == "sqrt"
