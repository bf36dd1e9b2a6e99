"""Tests for the MLPs and the field query."""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.models.field import (
    FieldConfig,
    field_output_channels,
    init_field_params,
    query_field,
)
from indoor_nerf_tpu.models.mlp import (
    apply_nerf_big,
    apply_nerf_small,
    init_nerf_big,
    init_nerf_small,
)
from indoor_nerf_tpu.ops.encoding import HashGridConfig

GRID = HashGridConfig(
    bbox_min=(-2.0, -2.0, -2.0),
    bbox_max=(2.0, 2.0, 2.0),
    n_levels=8,
    log2_hashmap_size=12,
    base_resolution=16,
    finest_resolution=128,
)


def _field_cfg(**kw):
    return FieldConfig(grid=GRID, n_importance=kw.pop("n_importance", 0), **kw)


def test_nerf_small_shapes():
    key = jax.random.PRNGKey(0)
    p = init_nerf_small(key, input_ch=16, input_ch_views=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (32, 16))
    out = apply_nerf_small(p, x, v)
    assert out.shape == (32, 4)


def test_nerf_small_param_structure():
    p = init_nerf_small(
        jax.random.PRNGKey(0), input_ch=32, input_ch_views=16,
        num_layers=2, hidden_dim=64, geo_feat_dim=15,
        num_layers_color=3, hidden_dim_color=64,
    )
    # sigma net: 32->64 (no bias), 64->16 (1 sigma + 15 geo)
    assert p["sigma_net"][0]["w"].shape == (32, 64)
    assert "b" not in p["sigma_net"][0]
    assert p["sigma_net"][1]["w"].shape == (64, 16)
    # color net: (16+15)->64, 64->64, 64->3
    assert p["color_net"][0]["w"].shape == (31, 64)
    assert p["color_net"][2]["w"].shape == (64, 3)
    # torch-default init bound: 1/sqrt(fan_in)
    assert float(jnp.max(jnp.abs(p["sigma_net"][0]["w"]))) <= 1.0 / np.sqrt(32)


def test_nerf_small_normals_unit_length():
    p = init_nerf_small(
        jax.random.PRNGKey(0), input_ch=16, input_ch_views=16, predict_normals=True
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 16))
    out = apply_nerf_small(p, x, v, predict_normals=True)
    assert out.shape == (8, 7)
    norms = jnp.linalg.norm(out[:, 4:7], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-4)


def test_nerf_big_shapes():
    p = init_nerf_big(
        jax.random.PRNGKey(0), input_ch=63, input_ch_views=27, use_viewdirs=True
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 63))
    v = jax.random.normal(jax.random.PRNGKey(2), (16, 27))
    out = apply_nerf_big(p, x, v, use_viewdirs=True)
    assert out.shape == (16, 4)
    # skip connection: layer 5 input is W + input_ch
    assert p["pts_linears"][5]["w"].shape == (256 + 63, 256)


def test_query_field_shapes_and_bbox_masking():
    cfg = _field_cfg()
    params = init_field_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 3), minval=-1, maxval=1)
    # put one whole ray outside the bbox
    pts = pts.at[2].set(pts[2] + 10.0)
    vd = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    raw, _ = query_field(params, "coarse", pts, vd, cfg)
    assert raw.shape == (4, 8, field_output_channels(cfg))
    # sigma of out-of-bbox points is exactly zero
    np.testing.assert_array_equal(np.asarray(raw[2, :, 3]), 0.0)
    # in-bbox sigma generally nonzero
    assert float(jnp.max(jnp.abs(raw[0, :, 3]))) > 0.0


def test_query_field_jits():
    cfg = _field_cfg()
    params = init_field_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def f(params, pts, vd):
        raw, _ = query_field(params, "coarse", pts, vd, cfg)
        return raw

    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 3), minval=-1, maxval=1)
    vd = jnp.ones((4, 3)) / np.sqrt(3)
    out = f(params, pts, vd)
    assert out.shape == (4, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_level_anneal_weights_schedule():
    """FreeNeRF-style level annealing: level 0 always active, frontier fades
    in linearly, all levels active from anneal_iters on."""
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.models.field import level_anneal_weights

    w0 = np.asarray(level_anneal_weights(jnp.asarray(0), 8, 100))
    assert w0[0] == 1.0 and np.all(w0[1:] == 0.0)
    w_half = np.asarray(level_anneal_weights(jnp.asarray(50), 8, 100))
    assert w_half[0] == 1.0 and w_half[-1] == 0.0
    assert np.all(np.diff(w_half) <= 0)  # monotone over levels
    w_done = np.asarray(level_anneal_weights(jnp.asarray(100), 8, 100))
    assert np.all(w_done == 1.0)
    assert np.all(np.asarray(
        level_anneal_weights(jnp.asarray(10**6), 8, 100)) == 1.0)


def test_freq_anneal_masks_encode_and_is_noop_when_done(rng):
    """With annealing on, early-step encodes expose only coarse levels;
    past anneal_iters (and at eval, step=None) the encode is bit-identical
    to the unannealed one. Covers the hash, block-hash, and strided paths."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.models.field import (
        FieldConfig,
        encode_position,
        init_field_params,
    )
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig

    bb = dict(bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3)
    x = jnp.asarray(rng.uniform(-1, 1, size=(32, 3)), jnp.float32)
    for fc_base in (
        FieldConfig(grid=HashGridConfig(n_levels=4, log2_hashmap_size=8,
                                        finest_resolution=64, **bb),
                    i_embed=1),
        FieldConfig(block_grid=BlockHashConfig(n_levels=4, log2_rows=6,
                                               finest_resolution=64,
                                               block_size=3, **bb),
                    i_embed=3),
    ):
        fc_ann = dataclasses.replace(fc_base, freq_anneal_iters=100)
        params = init_field_params(jax.random.PRNGKey(0), fc_base)
        ref, _, _ = encode_position(x, params, fc_base, None, True,
                                    jnp.asarray(50))
        early, _, _ = encode_position(x, params, fc_ann, None, True,
                                      jnp.asarray(0))
        F = 2
        e = np.asarray(early).reshape(32, 4, F)
        assert np.allclose(e[:, 1:], 0.0)  # only level 0 active at step 0
        assert np.allclose(e[:, 0], np.asarray(ref).reshape(32, 4, F)[:, 0])
        done, _, _ = encode_position(x, params, fc_ann, None, True,
                                     jnp.asarray(100))
        np.testing.assert_array_equal(np.asarray(done), np.asarray(ref))
        ev, _, _ = encode_position(x, params, fc_ann, None, False, None)
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(ref))


def test_view_anneal_scales_view_branch(rng):
    """View-dependence annealing: at step 0 the raw output matches a
    zeroed-view-features query (diffuse), at/after view_anneal_iters (and
    at eval, step=None) it is bit-identical to the unannealed query, and
    sigma is untouched at every step (the ramp feeds only the color net)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.models.field import (
        FieldConfig,
        init_field_params,
        query_field,
    )
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig

    bg = BlockHashConfig(bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3,
                         n_levels=4, log2_rows=6, finest_resolution=64,
                         block_size=3)
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    fc_ann = dataclasses.replace(fc, view_anneal_iters=100)
    params = init_field_params(jax.random.PRNGKey(0), fc)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(8, 4, 3)), jnp.float32)
    vd = rng.normal(size=(8, 3))
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True),
                     jnp.float32)

    ref, _ = query_field(params, "coarse", pts, vd, fc, None, True,
                         jnp.asarray(50))
    early, _ = query_field(params, "coarse", pts, vd, fc_ann, None, True,
                           jnp.asarray(0))
    # sigma (last channel) never changes; rgb differs (views suppressed).
    np.testing.assert_array_equal(np.asarray(early[..., 3]),
                                  np.asarray(ref[..., 3]))
    assert not np.allclose(np.asarray(early[..., :3]),
                           np.asarray(ref[..., :3]))
    # step 0 == all view directions equivalent (diffuse): two different
    # direction sets give identical raw output.
    vd2 = jnp.asarray(np.roll(np.asarray(vd), 1, axis=0))
    early2, _ = query_field(params, "coarse", pts, vd2, fc_ann, None, True,
                            jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(early), np.asarray(early2))
    # ramp midpoint actually interpolates (neither diffuse nor full).
    mid, _ = query_field(params, "coarse", pts, vd, fc_ann, None, True,
                         jnp.asarray(50))
    assert not np.allclose(np.asarray(mid), np.asarray(early))
    assert not np.allclose(np.asarray(mid), np.asarray(ref))
    # done + eval are bit-identical to the unannealed query.
    done, _ = query_field(params, "coarse", pts, vd, fc_ann, None, True,
                          jnp.asarray(100))
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref))
    ev_ref, _ = query_field(params, "coarse", pts, vd, fc, None, False,
                            None)
    ev_ann, _ = query_field(params, "coarse", pts, vd, fc_ann, None, False,
                            None)
    np.testing.assert_array_equal(np.asarray(ev_ann), np.asarray(ev_ref))


def test_appearance_latents(rng):
    """Per-image appearance latents: zero-init is a bit-exact no-op; a
    nonzero row changes only that image's rays; eval (no view_bias) is
    unaffected; and the train step moves exactly the sampled rows."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.models.field import (
        FieldConfig,
        init_field_params,
        query_field,
    )
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig

    bg = BlockHashConfig(bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3,
                         n_levels=4, log2_rows=6, finest_resolution=64,
                         block_size=3)
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    fc_app = dataclasses.replace(fc, n_appearance=5)
    params = init_field_params(jax.random.PRNGKey(0), fc_app)
    assert params["appearance"].shape == (5, fc.input_ch_views)
    np.testing.assert_array_equal(np.asarray(params["appearance"]), 0.0)

    pts = jnp.asarray(rng.uniform(-1, 1, size=(8, 4, 3)), jnp.float32)
    vd = rng.normal(size=(8, 3))
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True),
                     jnp.float32)
    ids = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 4], jnp.int32)

    ref, _ = query_field(params, "coarse", pts, vd, fc, None, True, None)
    bias0 = jnp.take(params["appearance"], ids, axis=0)
    with_zero, _ = query_field(params, "coarse", pts, vd, fc_app, None,
                               True, None, view_bias=bias0)
    np.testing.assert_array_equal(np.asarray(with_zero), np.asarray(ref))

    # Nonzero row for image 2 changes rays 4-5's rgb only; sigma never.
    p2 = dict(params)
    p2["appearance"] = params["appearance"].at[2].set(0.5)
    bias2 = jnp.take(p2["appearance"], ids, axis=0)
    out2, _ = query_field(p2, "coarse", pts, vd, fc_app, None, True, None,
                          view_bias=bias2)
    a, b = np.asarray(ref), np.asarray(out2)
    np.testing.assert_array_equal(b[..., 3], a[..., 3])
    changed = np.any(np.abs(b[..., :3] - a[..., :3]) > 0, axis=1)
    np.testing.assert_array_equal(
        np.any(changed, axis=-1), np.asarray([0, 0, 0, 0, 1, 1, 0, 0],
                                             bool))

    # Train step: gradient reaches exactly the sampled images' rows.
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    rc = RenderConfig(field=fc_app, n_samples=8, n_importance=0,
                      white_bkgd=True)
    cfg = TrainConfig(render=rc, near=0.5, far=4.0, n_rand=8, lrate=0.01,
                      tv_loss_weight=0.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    # Aim every ray INTO the bbox (misses carry zero view-feature grad).
    din = np.asarray(vd).copy()
    din[:, 2] = np.abs(din[:, 2]) + 1.0
    din /= np.linalg.norm(din, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (8, 1)),
                              jnp.float32),
        "rays_d": jnp.asarray(din, jnp.float32),
        "target": jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32),
        "img_idx": ids,
    }
    # Rays must HIT density for view-feature grads to be nonzero, and
    # RAdam makes no update while n_sma < 5 (first ~5 steps, reference
    # radam.py:78,88) — so bump the table and run several steps.
    state["params"]["table"] = state["params"]["table"] * 0 + 0.5
    batch["img_idx"] = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    cur = state
    for i in range(8):
        cur, _ = step_fn(cur, batch, jax.random.PRNGKey(10 + i))
    d2 = np.abs(np.asarray(cur["params"]["appearance"])).max(axis=1)
    # Only the two sampled images' rows moved.
    assert np.all(d2[:2] > 0.0), d2
    assert np.all(d2[2:] == 0.0), d2
