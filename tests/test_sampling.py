"""Tests for stratified sampling and hierarchical inverse-CDF resampling."""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals


def test_stratified_deterministic():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = np.asarray(stratified_z_vals(None, near, far, 8, perturb=0.0))
    np.testing.assert_allclose(z[0], np.linspace(2.0, 6.0, 8), rtol=1e-6)
    np.testing.assert_allclose(z, np.broadcast_to(z[0], (4, 8)), rtol=1e-6)


def test_stratified_lindisp():
    near = jnp.full((1, 1), 1.0)
    far = jnp.full((1, 1), 4.0)
    z = np.asarray(stratified_z_vals(None, near, far, 3, perturb=0.0, lindisp=True))
    # 1 / lerp(1/near, 1/far): midpoint = 1 / ((1 + 0.25)/2) = 1.6
    np.testing.assert_allclose(z[0], [1.0, 1.6, 4.0], rtol=1e-6)


def test_stratified_perturb_within_bins():
    key = jax.random.PRNGKey(0)
    near = jnp.full((128, 1), 2.0)
    far = jnp.full((128, 1), 6.0)
    base = np.asarray(stratified_z_vals(None, near, far, 16, perturb=0.0))
    z = np.asarray(stratified_z_vals(key, near, far, 16, perturb=1.0))
    mids = 0.5 * (base[..., 1:] + base[..., :-1])
    lower = np.concatenate([base[..., :1], mids], -1)
    upper = np.concatenate([mids, base[..., -1:]], -1)
    assert np.all(z >= lower) and np.all(z <= upper)
    assert np.all(np.diff(z, axis=-1) > 0)  # still sorted within each ray


def _sample_pdf_np(bins, weights, u):
    """Independent numpy model of inverse-CDF sampling."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    out = np.zeros_like(u)
    for n in range(u.shape[0]):
        inds = np.searchsorted(cdf[n], u[n], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        denom = cdf[n][above] - cdf[n][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[n] - cdf[n][below]) / denom
        out[n] = bins[n][below] + t * (bins[n][above] - bins[n][below])
    return out


def test_sample_pdf_matches_numpy_model(rng):
    bins = np.sort(rng.uniform(0, 10, size=(8, 63)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(8, 62)).astype(np.float32)
    got = np.asarray(
        sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), 32, det=True)
    )
    u = np.broadcast_to(np.linspace(0, 1, 32, dtype=np.float32), (8, 32)).copy()
    want = _sample_pdf_np(bins, weights, u)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
    weights = jnp.zeros((1, 10)).at[0, 5].set(100.0)  # all mass in bin 5
    key = jax.random.PRNGKey(3)
    s = np.asarray(sample_pdf(key, bins, weights, 256, det=False))
    # Bin 5 spans [0.5, 0.6]; nearly all samples must land there.
    frac = np.mean((s >= 0.5) & (s <= 0.6))
    assert frac > 0.95


def test_sample_pdf_stays_in_range(rng):
    bins = np.sort(rng.uniform(2, 6, size=(16, 63)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(16, 62)).astype(np.float32)
    s = np.asarray(
        sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights), 128)
    )
    assert s.min() >= bins.min() - 1e-5
    assert s.max() <= bins.max() + 1e-5


def test_sample_pdf_nondet_output_sorted():
    """Stratified-jittered u is sorted by construction, so the monotone
    inverse CDF emits sorted z — occupancy_z_vals relies on this to skip
    its lane sort (tpu_fwd_attrib.json)."""
    rng = np.random.default_rng(3)
    bins = np.sort(rng.uniform(2, 6, size=(64, 63)), axis=-1)
    weights = rng.uniform(0.1, 2.0, size=(64, 62)).astype(np.float32)
    for seed in range(3):
        z = np.asarray(
            sample_pdf(
                jax.random.PRNGKey(seed), jnp.asarray(bins, jnp.float32),
                jnp.asarray(weights), 48, det=False,
            )
        )
        assert (np.diff(z, axis=-1) >= 0).all()


def test_occupancy_z_vals_sorted_and_in_range():
    from indoor_nerf_tpu.ops.occupancy import (
        OccupancyConfig,
        init_occupancy,
        occupancy_z_vals,
    )

    cfg = OccupancyConfig(
        bbox_min=(-1.5,) * 3, bbox_max=(1.5,) * 3, resolution=16,
        warmup_steps=0,
    )
    occ = init_occupancy(cfg)
    occ = {**occ, "density": occ["density"] + 1.0}
    n = 32
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    z = np.asarray(
        occupancy_z_vals(
            jax.random.PRNGKey(1), jnp.zeros((n, 3)),
            jnp.asarray(d, jnp.float32), 2.0 * jnp.ones((n, 1)),
            6.0 * jnp.ones((n, 1)), occ, cfg, 24, jnp.asarray(100),
        )
    )
    assert (np.diff(z, axis=-1) >= 0).all()
    assert (z >= 2.0 - 1e-5).all() and (z <= 6.0 + 1e-5).all()
