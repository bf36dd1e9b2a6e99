"""Tests for the TPU-native block-hash encoder and the lane_select kernel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.ops.blockhash import (
    BLOCK,
    SIDE,
    BlockHashConfig,
    block_hash_encode,
    init_block_table,
)
from indoor_nerf_tpu.ops.pallas.lane_gather import lane_select

CFG = BlockHashConfig(
    bbox_min=(-1.0, -1.0, -1.0),
    bbox_max=(1.0, 1.0, 1.0),
    n_levels=4,
    log2_rows=8,
    base_resolution=16,
    finest_resolution=128,
)


def test_lane_select_matches_take_along_axis(rng):
    vals = jnp.asarray(rng.normal(size=(300, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, size=(300, 8)), jnp.int32)
    got = lane_select(vals, idx, 8)
    want = jnp.take_along_axis(vals, idx, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_lane_select_grad(rng):
    vals = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, size=(64, 8)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)

    def f(v):
        return jnp.sum(lane_select(v, idx, 8) * g)

    grad = jax.grad(f)(vals)
    # Independent dense reference.
    want = np.zeros((64, 128), np.float32)
    for i in range(64):
        for j in range(8):
            want[i, int(idx[i, j])] += float(g[i, j])
    np.testing.assert_allclose(np.asarray(grad), want, rtol=1e-5, atol=1e-6)


def test_block_encode_shapes_and_mask(rng):
    table = init_block_table(jax.random.PRNGKey(0), CFG)
    assert table.shape == (CFG.n_levels * CFG.rows_per_level, 2 * 128)
    x = jnp.asarray(
        [[0.0, 0.0, 0.0], [5.0, 0.0, 0.0], [-0.5, 0.3, 0.9]], jnp.float32
    )
    feats, keep = block_hash_encode(x, table, CFG)
    assert feats.shape == (3, CFG.out_dim)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])
    feats2, _ = block_hash_encode(x, table, CFG)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


def test_block_encode_continuity_within_block(rng):
    """Inside one voxel the encoding is trilinear -> Lipschitz in x."""
    table = init_block_table(jax.random.PRNGKey(0), CFG)
    x0 = jnp.asarray([[0.111, 0.222, 0.333]], jnp.float32)
    eps = 1e-5
    x1 = x0 + eps
    f0, _ = block_hash_encode(x0, table, CFG)
    f1, _ = block_hash_encode(x1, table, CFG)
    # feature scale ~1e-4; displacement eps in a (2/128)-wide voxel moves
    # weights by ~eps*res/2 <= 1e-3 -> delta <= ~1e-7
    assert float(jnp.max(jnp.abs(f1 - f0))) < 1e-6


@pytest.mark.parametrize("block_size", [4, 3])
def test_block_encode_matches_manual_reference(rng, block_size):
    """Spot-check one point against a hand-rolled numpy reference
    (both tile layouts: 5^3-in-128-lanes and 4^3-in-64-lanes)."""
    import dataclasses

    from indoor_nerf_tpu.ops.blockhash import _stagger, _BLOCK_PRIMES
    from indoor_nerf_tpu.ops.encoding import level_resolutions

    cfg = dataclasses.replace(CFG, block_size=block_size)
    side = cfg.side
    lpf = cfg.lanes_per_feature
    table = np.asarray(init_block_table(jax.random.PRNGKey(1), cfg))
    assert table.shape[1] == 2 * lpf
    x = np.array([[0.37, -0.58, 0.12]], np.float32)
    got, _ = block_hash_encode(jnp.asarray(x), jnp.asarray(table), cfg)
    got = np.asarray(got)[0]

    res = level_resolutions(cfg.as_hash_grid())
    bmin = np.array(cfg.bbox_min, np.float32)
    bmax = np.array(cfg.bbox_max, np.float32)
    R = cfg.rows_per_level
    stag = _stagger(cfg.n_levels, block_size)
    for lvl in range(cfg.n_levels):
        grid = (bmax - bmin) / res[lvl]
        relv = (x[0] - bmin) / grid
        bl = np.floor(relv).astype(np.int64)
        w = relv - bl
        acc = np.zeros(2, np.float64)
        for c in range(8):
            bits = np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1])
            v0 = bl + stag[lvl]
            blk = (v0) // block_size
            local = v0 - blk * block_size + bits
            # corner may cross into the next block cell within the halo tile
            h = 0
            for d in range(3):
                h ^= int(blk[d]) * int(_BLOCK_PRIMES[d])
            h ^= lvl * int(_BLOCK_PRIMES[3])
            row = (h % (1 << 64)) & (R - 1)
            lane = local[0] * side * side + local[1] * side + local[2]
            cw = np.prod([w[d] if bits[d] else 1 - w[d] for d in range(3)])
            for f in range(2):
                acc[f] += cw * table[lvl * R + row, f * lpf + lane]
        np.testing.assert_allclose(
            got[2 * lvl : 2 * lvl + 2], acc, rtol=1e-4, atol=1e-8
        )


def test_block_encode_gradients_flow(rng):
    table = init_block_table(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(32, 3)), jnp.float32)

    def loss(t):
        f, _ = block_hash_encode(x, t, CFG)
        return jnp.sum(f**2)

    g = jax.grad(loss)(table)
    assert float(jnp.sum(jnp.abs(g))) > 0
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("block_size", [4, 3])
def test_block_encode_fused_bf16_backward(rng, block_size):
    """scatter_dtype='bfloat16': forward bit-identical, gradient close to the
    f32 autodiff transpose, zero point-position cotangent (documented)."""
    import dataclasses

    CFG = dataclasses.replace(
        globals()["CFG"], block_size=block_size
    )
    cfg16 = dataclasses.replace(CFG, scatter_dtype="bfloat16")
    # Scale up so bf16 relative error is visible against the tiny init.
    table = init_block_table(jax.random.PRNGKey(0), CFG) * 1e4
    x = jnp.asarray(rng.uniform(-0.95, 0.95, size=(512, 3)), jnp.float32)

    f32, m32 = block_hash_encode(x, table, CFG)
    f16, m16 = block_hash_encode(x, table, cfg16)
    np.testing.assert_array_equal(np.asarray(f32), np.asarray(f16))
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(m16))

    def loss(t, cfg):
        f, _ = block_hash_encode(x, t, cfg)
        return jnp.sum(f**2)

    g32 = jax.grad(lambda t: loss(t, CFG))(table)
    g16 = jax.grad(lambda t: loss(t, cfg16))(table)
    rel = float(jnp.linalg.norm(g16 - g32) / jnp.linalg.norm(g32))
    assert rel < 0.02, rel
    assert g16.dtype == jnp.float32

    gx = jax.grad(
        lambda xx: jnp.sum(block_hash_encode(xx, table, cfg16)[0] ** 2)
    )(x)
    assert float(jnp.sum(jnp.abs(gx))) == 0.0


@pytest.mark.parametrize("block_size", [4, 3])
def test_block_encode_int8_gather(rng, block_size):
    """gather_dtype='int8': forward within per-level quantization error of
    f32, straight-through table gradient (close to the f32 transpose —
    the quantizer is invisible to the backward, like the reference's STE
    fake-quant PocketNeRF/quantization.py:173-187), zero point cotangent."""
    import dataclasses

    CFG = dataclasses.replace(globals()["CFG"], block_size=block_size)
    cfg8 = dataclasses.replace(
        CFG, gather_dtype="int8", scatter_dtype="bfloat16"
    )
    table = init_block_table(jax.random.PRNGKey(0), CFG) * 1e4
    x = jnp.asarray(rng.uniform(-0.95, 0.95, size=(512, 3)), jnp.float32)

    f32, m32 = block_hash_encode(x, table, CFG)
    f8, m8 = block_hash_encode(x, table, cfg8)
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(m8))
    # Symmetric per-level scale = absmax/127; interpolated features are
    # convex combinations of row values, so the error is bounded by half a
    # quantization step per feature.
    step = float(jnp.max(jnp.abs(table))) / 127.0
    assert float(jnp.max(jnp.abs(f8 - f32))) <= step, (
        float(jnp.max(jnp.abs(f8 - f32))), step)
    # Not bit-identical (it IS quantized).
    assert float(jnp.max(jnp.abs(f8 - f32))) > 0.0

    def loss(t, cfg):
        f, _ = block_hash_encode(x, t, cfg)
        return jnp.sum(f**2)

    g32 = jax.grad(lambda t: loss(t, CFG))(table)
    g8 = jax.grad(lambda t: loss(t, cfg8))(table)
    rel = float(jnp.linalg.norm(g8 - g32) / jnp.linalg.norm(g32))
    # STE: the backward ignores quantization; difference comes only from
    # the quantized forward features feeding d(sum f^2) = 2f and the bf16
    # cotangent rows.
    assert rel < 0.05, rel
    assert g8.dtype == jnp.float32

    gx = jax.grad(
        lambda xx: jnp.sum(block_hash_encode(xx, table, cfg8)[0] ** 2)
    )(x)
    assert float(jnp.sum(jnp.abs(gx))) == 0.0


@pytest.mark.slow
def test_block_encode_strided(rng):
    """Ray-axis decimation (ray_strides): stride-1 everywhere is bitwise
    the plain encode; knot samples of strided levels are exact; along an
    axis-aligned ray inside one coarse voxel the lerp is exact (trilinear
    is linear in each axis); gradients flow into the table."""
    import dataclasses

    from indoor_nerf_tpu.ops.blockhash import block_hash_encode_strided

    base = dataclasses.replace(
        globals()["CFG"], scatter_dtype="bfloat16", block_size=3
    )
    table = init_block_table(jax.random.PRNGKey(0), base) * 1e4
    R, S = 16, 32
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, size=(R, S, 3)), jnp.float32)

    cfg1 = dataclasses.replace(base, ray_strides=(1,) * base.n_levels)
    f1, k1 = block_hash_encode_strided(pts, table, cfg1)
    fp, kp = block_hash_encode(pts.reshape(-1, 3), table, base)
    np.testing.assert_array_equal(
        np.asarray(f1), np.asarray(fp.reshape(R, S, -1)))
    np.testing.assert_array_equal(
        np.asarray(k1), np.asarray(kp.reshape(R, S)))

    strides = (4, 4, 2, 1)  # CFG has 4 levels
    cfgs = dataclasses.replace(base, ray_strides=strides)
    # The strided contract is RAY-STRUCTURED sorted samples (what
    # query_field passes: o + d*z with z sorted — the z-aware lerp
    # parametrizes knots by arc length along the ray). Build real rays
    # with IRREGULAR sorted z (the importance-sampled regime the z-aware
    # lerp exists for).
    o = jnp.asarray(rng.uniform(-0.5, 0.5, size=(R, 1, 3)), jnp.float32)
    d = rng.normal(size=(R, 1, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    z = np.sort(rng.uniform(0.0, 0.9, size=(R, S, 1)), axis=1)
    pts_ray = o + d * jnp.asarray(z, jnp.float32)
    f1r, _ = block_hash_encode_strided(
        pts_ray, table, cfg1)
    fs, _ = block_hash_encode_strided(pts_ray, table, cfgs)
    # Knot samples (both stride-4 group and stride-2 group include 0 and
    # S-1) are exact.
    for s_idx in (0, S - 1):
        np.testing.assert_allclose(
            np.asarray(fs[:, s_idx]), np.asarray(f1r[:, s_idx]),
            rtol=0, atol=1e-5)
    # Stride-1 levels (the last F features) are exact at EVERY sample.
    F = base.n_features_per_level
    np.testing.assert_allclose(
        np.asarray(fs[..., -F:]), np.asarray(f1r[..., -F:]),
        rtol=0, atol=1e-5)
    # z-aware lerp: a knot interval's interior samples interpolate at
    # their ARC-LENGTH fraction, not their index fraction. For a linear
    # feature field along an in-voxel segment this is exact even with
    # irregular z (checked via the segment test below); here assert the
    # interpolation weights track z by reconstructing sample 1 of a
    # 3-knot bracket manually at a strided level.
    assert np.all(np.isfinite(np.asarray(fs)))

    # Axis-aligned segment inside one level-0 voxel with IRREGULARLY
    # spaced samples: the z-aware lerp is exact (trilinear is linear in
    # each axis, and knots are parametrized by arc length — the old
    # index-space lerp fails this with non-uniform spacing).
    # Level 0 has base_resolution 16 over bbox [-1,1] -> voxel edge 1/8.
    x0 = jnp.asarray([0.012, 0.05, 0.07], jnp.float32)
    t_irreg = np.sort(rng.uniform(0.0, 1.0, size=S))
    t_irreg[0], t_irreg[-1] = 0.0, 1.0
    seg = x0[None, :] + jnp.asarray(
        [[0.1 / 16 * t, 0.0, 0.0] for t in t_irreg], jnp.float32)
    seg = seg[None, :, :]  # [1, S, 3]
    f_seg_s, _ = block_hash_encode_strided(seg, table, cfgs)
    f_seg_1, _ = block_hash_encode_strided(seg, table, cfg1)
    np.testing.assert_allclose(
        np.asarray(f_seg_s[..., :F]), np.asarray(f_seg_1[..., :F]),
        rtol=0, atol=2e-4)

    # Table gradient flows through the strided path (knot scatter + lerp
    # transpose) and is finite.
    g = jax.grad(
        lambda t: jnp.sum(block_hash_encode_strided(pts, t, cfgs)[0] ** 2)
    )(table)
    assert g.dtype == jnp.float32
    gg = np.asarray(g)
    assert np.all(np.isfinite(gg)) and float(np.abs(gg).sum()) > 0.0


@pytest.mark.slow
def test_blockhash_training_converges():
    """The block-hash field trains to the same quality class as exact NGP."""
    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import TrainConfig, init_train_state, train_step

    scene = make_synthetic_scene(n_views=8, H=40, W=40)
    bg = BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=8, log2_rows=7, base_resolution=16, finest_resolution=128,
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=24, white_bkgd=True)
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
    for i in range(220):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, metrics = step_fn(state, batch, sub)
        last = float(metrics["psnr"])
    assert np.isfinite(last)
    assert last > 17.0, last


def test_blockhash_acaq_quantization():
    """A-CAQ fake-quant on the block-hash table: calibration, bit-dependent
    coarseness, STE gradients, and the eval (step=None) path."""
    from indoor_nerf_tpu.losses.quantization import QuantConfig
    from indoor_nerf_tpu.models.field import (
        FieldConfig,
        _quantize_block_table,
        encode_position,
        init_field_params,
    )
    from indoor_nerf_tpu.train.step import TrainConfig, init_train_state
    from indoor_nerf_tpu.render.renderer import RenderConfig

    fc = FieldConfig(
        block_grid=CFG, i_embed=3, n_importance=0,
        use_quantization=True, quant=QuantConfig(warmup_steps=0),
    )
    cfg = TrainConfig(
        render=RenderConfig(field=fc, n_samples=8),
        near=0.1, far=4.0, n_rand=32,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert state["quant"]["embed"]["soft_bits"].shape == (CFG.n_levels,)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, 3)), jnp.float32)
    params = state["params"]
    step = jnp.asarray(10, jnp.int32)

    feats_q, _, qs = encode_position(x, params, fc, state["quant"], True, step)
    feats_fp, _, _ = encode_position(x, params, fc, None, True, step)
    assert bool(np.all(np.asarray(qs["embed"]["calibrated"])))
    assert np.all(np.isfinite(np.asarray(feats_q)))
    # 8-bit quantization of a U(-1e-4, 1e-4) table perturbs the encoding.
    assert not np.allclose(np.asarray(feats_q), np.asarray(feats_fp))

    # Fewer bits -> coarser: 2-bit error dominates 8-bit error.
    qs2 = jax.tree_util.tree_map(lambda v: v, qs)
    qs2["embed"] = dict(qs["embed"], soft_bits=jnp.full((CFG.n_levels,), 2.0))
    feats_q2, _, _ = encode_position(x, params, fc, qs2, True, step)
    err8 = float(jnp.mean((feats_q - feats_fp) ** 2))
    err2 = float(jnp.mean((feats_q2 - feats_fp) ** 2))
    assert err2 > err8

    # STE: gradients flow through the quantized table unchanged in pattern.
    def loss(t):
        tq, _ = _quantize_block_table(t, qs, fc, True, step)
        f, _ = block_hash_encode(x, tq, CFG)
        return jnp.sum(f**2)

    g = jax.grad(loss)(params["table"])
    assert float(jnp.sum(jnp.abs(g))) > 0
    assert np.all(np.isfinite(np.asarray(g)))

    # Eval path: no traced step; gate on the calibrated flags.
    feats_e, _, _ = encode_position(x, params, fc, qs, False, None)
    assert np.all(np.isfinite(np.asarray(feats_e)))
    # Uncalibrated eval state leaves the encoding untouched.
    qs_uncal = jax.tree_util.tree_map(lambda v: v, qs)
    qs_uncal["embed"] = dict(
        qs["embed"], calibrated=jnp.zeros((CFG.n_levels,), jnp.bool_)
    )
    feats_e0, _, _ = encode_position(x, params, fc, qs_uncal, False, None)
    np.testing.assert_allclose(np.asarray(feats_e0), np.asarray(feats_fp))


def test_stride_knots_single_sample():
    """S == 1 degenerate case: one knot, identity weight row (regression:
    j = min(0, K-2) = -1 used to wrap and zero the interpolation row)."""
    from indoor_nerf_tpu.ops.blockhash import _stride_knots

    for k in (1, 2, 4):
        ks, W = _stride_knots(1, k)
        np.testing.assert_array_equal(ks, np.array([0], np.int32))
        np.testing.assert_array_equal(W, np.ones((1, 1), np.float32))
    # And the general invariant: rows always sum to 1 (partition of unity).
    for S, k in ((2, 4), (5, 2), (32, 4), (7, 3)):
        _, W = _stride_knots(S, k)
        np.testing.assert_allclose(W.sum(axis=1), np.ones(S), rtol=1e-6)


# ---------------------------------------------------------------------------
# Grouped encode (ray_groups): shared tile row per G consecutive samples.
# ---------------------------------------------------------------------------


def _ray_pts(rng, n_rays, n_samples, lo=-0.9, hi=0.9):
    """Sorted ray-structured samples: random segments through the box."""
    o = rng.uniform(lo, hi, size=(n_rays, 1, 3))
    d = rng.normal(size=(n_rays, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.sort(rng.uniform(0.0, 0.6, size=(n_rays, n_samples, 1)), axis=1)
    return jnp.asarray(np.clip(o + t * d, lo, hi), jnp.float32)


def test_block_encode_grouped_g1_bitexact(rng):
    """ray_groups of all 1s routes through the plain encode bit-for-bit."""
    import dataclasses

    from indoor_nerf_tpu.ops.blockhash import block_hash_encode_grouped

    cfg = dataclasses.replace(CFG, ray_groups=(1,) * CFG.n_levels)
    table = init_block_table(jax.random.PRNGKey(0), CFG)
    pts = _ray_pts(rng, 16, 12)
    f0, k0 = block_hash_encode(pts.reshape(-1, 3), table, CFG)
    fg, kg = block_hash_encode_grouped(pts, table, cfg)
    np.testing.assert_array_equal(
        np.asarray(f0.reshape(16, 12, -1)), np.asarray(fg))
    np.testing.assert_array_equal(
        np.asarray(k0.reshape(16, 12)), np.asarray(kg))


def test_block_encode_grouped_identical_samples_exact(rng):
    """Groups of identical points share every block -> grouped == plain."""
    import dataclasses

    from indoor_nerf_tpu.ops.blockhash import block_hash_encode_grouped

    G = 4
    cfg = dataclasses.replace(CFG, ray_groups=(G,) * CFG.n_levels)
    table = init_block_table(jax.random.PRNGKey(0), CFG)
    base = rng.uniform(-0.9, 0.9, size=(8, 3, 3))  # 8 rays x 3 groups
    pts = jnp.asarray(
        np.repeat(base, G, axis=1), jnp.float32)  # [8, 12, 3]
    f0, _ = block_hash_encode(pts.reshape(-1, 3), table, CFG)
    fg, _ = block_hash_encode_grouped(pts, table, cfg)
    np.testing.assert_allclose(
        np.asarray(f0.reshape(8, 12, -1)), np.asarray(fg),
        rtol=0, atol=1e-7)


def test_block_encode_grouped_forward_exact(rng):
    """The grouped FORWARD is the exact per-sample encode on ANY input —
    grouping only changes where backward gradient rows land (see
    _encode_grouped_fused); features must match the plain encode
    bit-for-bit even when groups straddle partition blocks."""
    import dataclasses

    from indoor_nerf_tpu.ops.blockhash import block_hash_encode_grouped

    G = 4
    Rn, S = 12, 16
    cfg = dataclasses.replace(CFG, ray_groups=(G,) * CFG.n_levels)
    table = init_block_table(jax.random.PRNGKey(0), CFG)
    pts = _ray_pts(rng, Rn, S)

    f0, _ = block_hash_encode(pts.reshape(-1, 3), table, CFG)
    fg, _ = block_hash_encode_grouped(pts, table, cfg)
    np.testing.assert_array_equal(
        np.asarray(f0).reshape(Rn, S, -1), np.asarray(fg))


@pytest.mark.parametrize("force_kernel", [False, True])
def test_block_encode_grouped_fused_backward(rng, force_kernel):
    """Grouped fused backward (incl. the Pallas level0-subset kernel in
    interpreter mode): forward bit-identical to the plain encode; on
    groups of identical samples (every group trivially shares its anchor
    block) the f32 grouped table gradient equals the UNGROUPED XLA
    autodiff transpose; bf16 grouped grad is close to f32; zero dx."""
    import dataclasses

    from indoor_nerf_tpu.ops import blockhash as bh

    G = 2
    groups = (G, G, 1, 1)  # mixed classes: grouped coarse + plain fine
    cfg32 = dataclasses.replace(CFG, ray_groups=groups)
    cfg16 = dataclasses.replace(cfg32, scatter_dtype="bfloat16")
    table = init_block_table(jax.random.PRNGKey(0), CFG) * 1e4
    base = rng.uniform(-0.9, 0.9, size=(24, 4, 3))
    pts = jnp.asarray(np.repeat(base, G, axis=1), jnp.float32)  # [24, 8, 3]

    f32v, _ = bh.block_hash_encode_grouped(pts, table, cfg32)
    f0, _ = block_hash_encode(pts.reshape(-1, 3), table, CFG)
    np.testing.assert_array_equal(
        np.asarray(f0).reshape(24, 8, -1), np.asarray(f32v))

    old = bh._FORCE_PALLAS_SCATTER_INTERPRET
    bh._FORCE_PALLAS_SCATTER_INTERPRET = force_kernel
    try:
        f16v, _ = bh.block_hash_encode_grouped(pts, table, cfg16)
        np.testing.assert_array_equal(np.asarray(f32v), np.asarray(f16v))

        def loss_grouped(t, cfg):
            f, _ = bh.block_hash_encode_grouped(pts, t, cfg)
            return jnp.sum(f ** 2)

        def loss_plain(t):
            f, _ = block_hash_encode(pts.reshape(-1, 3), t, CFG)
            return jnp.sum(f ** 2)

        g32 = jax.grad(lambda t: loss_grouped(t, cfg32))(table)
        g16 = jax.grad(lambda t: loss_grouped(t, cfg16))(table)
        g_ref = jax.grad(loss_plain)(table)  # ungrouped autodiff transpose
    finally:
        bh._FORCE_PALLAS_SCATTER_INTERPRET = old
    rel_ref = float(jnp.linalg.norm(g32 - g_ref) / jnp.linalg.norm(g_ref))
    assert rel_ref < 1e-5, rel_ref
    rel = float(jnp.linalg.norm(g16 - g32) / jnp.linalg.norm(g32))
    assert rel < 0.02, rel
    assert g16.dtype == jnp.float32

    gx = jax.grad(
        lambda xx: jnp.sum(
            bh.block_hash_encode_grouped(xx, table, cfg16)[0] ** 2)
    )(pts)
    assert float(jnp.sum(jnp.abs(gx))) == 0.0


def test_block_encode_grouped_nondivisible_falls_back(rng):
    """A class whose G does not divide S uses the ungrouped encode."""
    import dataclasses

    from indoor_nerf_tpu.ops.blockhash import block_hash_encode_grouped

    cfg = dataclasses.replace(CFG, ray_groups=(4,) * CFG.n_levels)
    table = init_block_table(jax.random.PRNGKey(0), CFG)
    pts = _ray_pts(rng, 6, 10)  # 10 % 4 != 0
    f0, _ = block_hash_encode(pts.reshape(-1, 3), table, CFG)
    fg, _ = block_hash_encode_grouped(pts, table, cfg)
    np.testing.assert_array_equal(
        np.asarray(f0.reshape(6, 10, -1)), np.asarray(fg))


@pytest.mark.nightly
def test_blockhash_grouped_training_converges():
    """End-to-end: the grouped encode trains through train_step."""
    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    scene = make_synthetic_scene(n_views=8, H=40, W=40)
    bg = BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=8, log2_rows=7, base_resolution=16, finest_resolution=128,
        scatter_dtype="bfloat16",
        ray_groups=(4, 4, 4, 4, 2, 2, 1, 1),
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=24, white_bkgd=True)
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
    for i in range(220):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, metrics = step_fn(state, batch, sub)
        last = float(metrics["psnr"])
    assert np.isfinite(last)
    assert last > 17.0, last
