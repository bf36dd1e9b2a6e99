"""Unobserved-view depth-smoothness regularizer (RegNeRF-style extension).

Covers the host-side novel-pose patch sampler (data/pipeline.py::
UnobservedPatchSampler), the depth-TV loss term in the jitted step, the
baseline-invariance contract (reg plumbing must not perturb runs that do
not use it), and DP mesh-size invariance of the regularized step.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.data.pipeline import ImageRaySampler, UnobservedPatchSampler
from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
from indoor_nerf_tpu.models.field import FieldConfig
from indoor_nerf_tpu.ops.encoding import HashGridConfig
from indoor_nerf_tpu.render.renderer import RenderConfig
from indoor_nerf_tpu.train.step import TrainConfig, init_train_state, train_step


def _cfg(scene, n_rand=256, **kw):
    grid = HashGridConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=4, log2_hashmap_size=12,
        base_resolution=16, finest_resolution=64,
    )
    fc = FieldConfig(grid=grid, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=16, white_bkgd=True)
    return TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                       n_rand=n_rand, tv_loss_weight=0.0, **kw)


def _batch(scene, cfg, with_reg, n_patches=2, patch=8, seed=0):
    H, W, _ = scene["hwf"]
    sampler = ImageRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand, seed=seed,
    )
    b = sampler.next(0)
    if with_reg:
        reg = UnobservedPatchSampler(
            scene["poses"][scene["i_split"][0]], H, W, scene["K"],
            n_patches=n_patches, patch=patch, seed=seed + 13,
        )
        b.update(reg.next())
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_patch_sampler_shapes_and_geometry():
    scene = make_synthetic_scene(n_views=8, H=32, W=32)
    H, W, _ = scene["hwf"]
    train_poses = scene["poses"][scene["i_split"][0]]
    s = UnobservedPatchSampler(train_poses, H, W, scene["K"],
                               n_patches=3, patch=8, seed=0)
    out = s.next()
    assert out["reg_rays_o"].shape == (3 * 64, 3)
    assert out["reg_rays_d"].shape == (3 * 64, 3)
    assert out["reg_rays_o"].dtype == np.float32

    # All rays of one patch share an origin; consecutive calls move it.
    o = out["reg_rays_o"].reshape(3, 64, 3)
    for p in range(3):
        np.testing.assert_allclose(
            o[p], np.broadcast_to(o[p][0], o[p].shape), atol=1e-6)
    out2 = s.next()
    assert not np.allclose(out["reg_rays_o"][0], out2["reg_rays_o"][0])

    # Novel poses look INTO the scene: patch-mean direction points from
    # the camera toward the estimated look-at center (the synthetic scene
    # is inward-facing, so the center sits inside the camera shell).
    d = out["reg_rays_d"].reshape(3, 64, 3).mean(1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    to_center = s.center[None] - o[:, 0]
    to_center = to_center / np.linalg.norm(to_center, axis=-1, keepdims=True)
    assert np.all(np.sum(d * to_center, -1) > 0.8)

    # Novel origins stay near the training-camera hull (lerp + jitter).
    radius = np.linalg.norm(train_poses[:, :3, 3], axis=-1)
    novel_r = np.linalg.norm(o[:, 0], axis=-1)
    assert np.all(novel_r < radius.max() * 1.5 + 3 * s.sigma)


def test_patch_sampler_single_camera_and_size_guard():
    scene = make_synthetic_scene(n_views=4, H=16, W=16)
    H, W, _ = scene["hwf"]
    one = scene["poses"][scene["i_split"][0]][:1]
    s = UnobservedPatchSampler(one, H, W, scene["K"], n_patches=1, patch=8)
    out = s.next()
    assert np.all(np.isfinite(out["reg_rays_d"]))
    with pytest.raises(ValueError):
        UnobservedPatchSampler(one, H, W, scene["K"], n_patches=1, patch=32)


def test_depth_tv_term_active_and_differentiable():
    scene = make_synthetic_scene(n_views=6, H=32, W=32)
    cfg = _cfg(scene, reg_depth_tv_weight=0.1, reg_patch_size=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    b = _batch(scene, cfg, with_reg=True)
    state2, metrics = step_fn(state, b, jax.random.PRNGKey(1))
    tv = float(metrics["reg_depth_tv"])
    assert np.isfinite(tv) and tv > 0.0

    # The term contributes to the total loss...
    cfg0 = _cfg(scene, reg_depth_tv_weight=0.0)
    step0 = jax.jit(functools.partial(train_step, config=cfg0))
    b0 = {k: v for k, v in b.items() if not k.startswith("reg_")}
    _, m0 = step0(state, b0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(m0["loss"]) + 0.1 * tv, rtol=1e-5)

    # ...and its gradient actually moves the parameters: train past the
    # RAdam rectification threshold (N_sma < 5 freezes params for the
    # first ~5 steps, train/optim.py:95-103) at a HUGE weight and check
    # that params diverge from a near-zero-weight run.
    cfg_hi = _cfg(scene, reg_depth_tv_weight=100.0, reg_patch_size=8)
    step_hi = jax.jit(functools.partial(train_step, config=cfg_hi))
    cfg_lo = _cfg(scene, reg_depth_tv_weight=1e-12, reg_patch_size=8)
    step_lo = jax.jit(functools.partial(train_step, config=cfg_lo))
    s_hi = s_lo = state
    for i in range(8):
        k = jax.random.PRNGKey(10 + i)
        s_hi, _ = step_hi(s_hi, b, k)
        s_lo, _ = step_lo(s_lo, b, k)
    diff = sum(
        float(jnp.abs(a - c).sum()) for a, c in zip(
            jax.tree_util.tree_leaves(s_hi["params"]),
            jax.tree_util.tree_leaves(s_lo["params"]))
    )
    assert diff > 1e-4, diff


def test_reg_off_is_bit_identical_to_baseline():
    """Weight 0 + reg fields present, and weight 0 + absent, produce the
    SAME update as the pre-extension step (the RNG stream is derived by
    fold_in, not by widening the split)."""
    scene = make_synthetic_scene(n_views=6, H=32, W=32)
    cfg = _cfg(scene, reg_depth_tv_weight=0.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    b = _batch(scene, cfg, with_reg=True)
    b_no = {k: v for k, v in b.items() if not k.startswith("reg_")}
    s1, m1 = step_fn(state, b, jax.random.PRNGKey(1))
    s2, m2 = step_fn(state, b_no, jax.random.PRNGKey(1))
    assert float(m1["loss"]) == float(m2["loss"])
    for a, c in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_reg_step_matches_single_device_on_mesh():
    """DP invariance: patch rows shard over the data axis; the global-view
    depth-TV (a mean over ALL patches) must not depend on mesh size."""
    from indoor_nerf_tpu.parallel.shard import (
        make_mesh,
        make_sharded_train_step,
        replicate_state,
    )

    scene = make_synthetic_scene(n_views=6, H=32, W=32)
    cfg = _cfg(scene, n_rand=256, reg_depth_tv_weight=0.1, reg_patch_size=8)
    batches = [_batch(scene, cfg, with_reg=True, n_patches=2, seed=s)
               for s in range(3)]

    def run(mesh):
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        state = replicate_state(state, mesh)
        step = make_sharded_train_step(cfg, mesh, donate=False)
        key = jax.random.PRNGKey(1)
        losses, tvs = [], []
        for b in batches:
            key, sub = jax.random.split(key)
            state, metrics = step(state, b, sub)
            losses.append(float(metrics["loss"]))
            tvs.append(float(metrics["reg_depth_tv"]))
        return losses, tvs

    l1, t1 = run(make_mesh(jax.devices()[:1]))
    l8, t8 = run(make_mesh(jax.devices()))
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(t1, t8, rtol=2e-4, atol=1e-6)


def test_planar_mode_is_zero_on_slanted_planes():
    """Second differences of disparity: a plane costs exactly zero at any
    slant (disparity of a plane is affine in pixel coords), while 'tv'
    mode charges the slope; a floater spike costs in both modes."""
    from indoor_nerf_tpu.ops.tv import patch_depth_regularizer

    ps, near, far = 8, 2.0, 6.0
    u, v = np.meshgrid(np.arange(ps), np.arange(ps), indexing="xy")
    disp = 0.5 + 0.03 * u + 0.02 * v  # affine disparity == slanted plane
    depth = jnp.asarray(((far - near) / disp).reshape(-1), jnp.float32)
    acc = jnp.ones_like(depth)
    planar = float(patch_depth_regularizer(depth, acc, ps, near, far,
                                           mode="planar"))
    tv = float(patch_depth_regularizer(depth, acc, ps, near, far,
                                       mode="tv"))
    assert planar < 1e-9, planar
    assert tv > 1e-4, tv  # first differences charge the legit slope

    # A floater: one spiked pixel pays in BOTH modes.
    d2 = np.asarray(depth).copy().reshape(ps, ps)
    d2[4, 4] *= 0.3
    d2 = jnp.asarray(d2.reshape(-1))
    assert float(patch_depth_regularizer(d2, acc, ps, near, far,
                                         mode="planar")) > 1e-3
    assert float(patch_depth_regularizer(d2, acc, ps, near, far,
                                         mode="tv")) > float(tv)

    # Empty rays (acc=0) are background-at-infinity: zero disparity,
    # zero planar cost — not garbage from the tiny depth denominator.
    zero = float(patch_depth_regularizer(
        jnp.full((ps * ps,), 1e-8, jnp.float32),
        jnp.zeros((ps * ps,), jnp.float32), ps, near, far, mode="planar"))
    assert zero == 0.0


def test_reg_start_iter_gates_the_loss():
    """Before reg_start_iter the regularized step must match a
    weight-zero step bit-for-bit; after it, the loss must differ."""
    scene = make_synthetic_scene(n_views=6, H=32, W=32)
    cfg_on = _cfg(scene, reg_depth_tv_weight=0.5, reg_patch_size=8,
                  reg_start_iter=3)
    cfg_off = _cfg(scene, reg_depth_tv_weight=0.0, reg_patch_size=8)
    batch = _batch(scene, cfg_on, with_reg=True)
    key = jax.random.PRNGKey(0)

    def run(cfg, state):
        return train_step(state, batch, key, cfg)

    s_on = init_train_state(jax.random.PRNGKey(1), cfg_on)
    s_off = init_train_state(jax.random.PRNGKey(1), cfg_off)
    # step 0 < reg_start_iter: gate closed, losses identical.
    _, m_on = jax.jit(functools.partial(run, cfg_on))(s_on)
    _, m_off = jax.jit(functools.partial(run, cfg_off))(s_off)
    assert float(m_on["loss"]) == float(m_off["loss"])
    # step past the gate: the reg term must now contribute.
    s_on3 = dict(s_on, step=jnp.asarray(3, s_on["step"].dtype))
    s_off3 = dict(s_off, step=jnp.asarray(3, s_off["step"].dtype))
    _, m_on3 = jax.jit(functools.partial(run, cfg_on))(s_on3)
    _, m_off3 = jax.jit(functools.partial(run, cfg_off))(s_off3)
    assert float(m_on3["loss"]) != float(m_off3["loss"])


def test_patch_sampler_train_pose_mode():
    """pose_mode='train' emits patches whose origins are EXACTLY training
    camera centers (classic monocular smoothness — photometrically
    opposed; round-5 follow-up to the novel-pose refutation)."""
    scene = make_synthetic_scene(n_views=8, H=32, W=32)
    H, W, _ = scene["hwf"]
    train_poses = scene["poses"][scene["i_split"][0]]
    s = UnobservedPatchSampler(train_poses, H, W, scene["K"],
                               n_patches=4, patch=8, seed=0,
                               pose_mode="train")
    out = s.next()
    o = out["reg_rays_o"].reshape(4, 64, 3)
    centers = train_poses[:, :3, 3]
    for p in range(4):
        d = np.linalg.norm(centers - o[p][0][None], axis=-1)
        assert d.min() < 1e-5  # origin IS some training camera
    with pytest.raises(ValueError):
        UnobservedPatchSampler(train_poses, H, W, scene["K"],
                               n_patches=1, pose_mode="typo")
