"""Tests for raw2outputs alpha compositing against an independent numpy model."""

import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.volume import raw2outputs


def _raw2outputs_np(raw, z_vals, rays_d, white_bkgd=False):
    """Slow-but-obvious numpy model of volume compositing."""
    n, s = z_vals.shape
    dists = np.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], np.full((n, 1), 1e10, np.float32)], -1
    )
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    sigma = np.maximum(raw[..., 3], 0.0)
    alpha = 1.0 - np.exp(-sigma * dists)
    weights = np.zeros_like(alpha)
    for i in range(n):
        trans = 1.0
        for j in range(s):
            weights[i, j] = alpha[i, j] * trans
            trans *= 1.0 - alpha[i, j] + 1e-10
    rgb_map = (weights[..., None] * rgb).sum(-2)
    acc = weights.sum(-1)
    depth = (weights * z_vals).sum(-1) / np.maximum(acc, 1e-10)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, depth, acc, weights


def test_raw2outputs_matches_numpy_model(rng):
    n, s = 16, 32
    raw = rng.normal(size=(n, s, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(n, s)), -1).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    rgb, depth, acc, weights = _raw2outputs_np(raw, z, d)
    np.testing.assert_allclose(out["rgb_map"], rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["depth_map"], depth, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["acc_map"], acc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["weights"], weights, rtol=1e-4, atol=1e-5)


def test_raw2outputs_opaque_first_sample():
    # A huge sigma at sample 0 should make the ray's color/depth come from it.
    n, s = 2, 8
    raw = np.zeros((n, s, 4), np.float32)
    raw[:, 0, 3] = 1e4
    raw[:, 0, :3] = 10.0  # sigmoid -> ~1
    z = np.broadcast_to(np.linspace(2, 6, s, dtype=np.float32), (n, s))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    np.testing.assert_allclose(out["rgb_map"], 1.0, atol=1e-3)
    np.testing.assert_allclose(out["depth_map"], 2.0, atol=1e-3)
    np.testing.assert_allclose(out["acc_map"], 1.0, atol=1e-4)


def test_raw2outputs_empty_ray_white_bkgd():
    # All-zero sigma: acc == 0, white background gives rgb == 1, no NaNs.
    n, s = 3, 16
    raw = np.zeros((n, s, 4), np.float32)
    raw[..., 3] = -5.0  # relu -> 0
    z = np.broadcast_to(np.linspace(2, 6, s, dtype=np.float32), (n, s))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), white_bkgd=True)
    assert np.all(np.isfinite(out["rgb_map"]))
    assert np.all(np.isfinite(out["depth_map"]))
    np.testing.assert_allclose(out["rgb_map"], 1.0, atol=1e-5)
    np.testing.assert_allclose(out["acc_map"], 0.0, atol=1e-6)


def test_raw2outputs_sparsity_entropy():
    # Concentrated weights -> low entropy; spread weights -> higher entropy.
    n, s = 1, 16
    z = np.broadcast_to(np.linspace(2, 6, s, dtype=np.float32), (n, s))
    d = np.array([[0.0, 0.0, 1.0]], np.float32)

    concentrated = np.zeros((n, s, 4), np.float32)
    concentrated[:, 8, 3] = 1e4
    spread = np.zeros((n, s, 4), np.float32)
    spread[..., 3] = 0.5

    e_c = float(raw2outputs(jnp.asarray(concentrated), jnp.asarray(z), jnp.asarray(d))["sparsity_loss"][0])
    e_s = float(raw2outputs(jnp.asarray(spread), jnp.asarray(z), jnp.asarray(d))["sparsity_loss"][0])
    assert e_c < e_s
    assert e_c < 0.1


def test_raw2outputs_normals():
    n, s = 4, 8
    raw = np.zeros((n, s, 7), np.float32)
    raw[:, 0, 3] = 1e4  # opaque first sample
    raw[:, 0, 4:7] = [0.0, 0.0, 2.0]  # unnormalized normal
    z = np.broadcast_to(np.linspace(2, 6, s, dtype=np.float32), (n, s))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    out = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), predict_normals=True
    )
    np.testing.assert_allclose(out["normal_map"], [[0.0, 0.0, 1.0]] * n, atol=1e-4)
