"""Tests for the fused tile interpolation op (CPU reference path)."""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.pallas.tile_interp import (
    _reference_interp,
    tile_interp,
)


def _naive(rows, p):
    """Independent numpy model: trilinear over the 5^3 tile."""
    m = rows.shape[0]
    out = np.zeros((m, 2), np.float64)
    for i in range(m):
        for lane in range(125):
            lx, ly, lz = lane // 25, (lane // 5) % 5, lane % 5
            w = 1.0
            for l, q in ((lx, p[i, 0]), (ly, p[i, 1]), (lz, p[i, 2])):
                w *= max(0.0, 1.0 - abs(l - q))
            out[i, 0] += rows[i, lane] * w
            out[i, 1] += rows[i, 128 + lane] * w
    return out


def test_tile_interp_matches_naive(rng):
    rows = rng.normal(size=(20, 256)).astype(np.float32)
    p = rng.uniform(0, 4, size=(20, 3)).astype(np.float32)
    got = np.asarray(tile_interp(jnp.asarray(rows), jnp.asarray(p)))
    want = _naive(rows, p)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tile_interp_custom_vjp_matches_autodiff(rng):
    rows = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    # Keep p off the tent kinks (integers) where the subgradient is ambiguous.
    p = jnp.asarray(rng.uniform(0.1, 3.9, size=(16, 3)), jnp.float32)
    p = jnp.where(jnp.abs(p - jnp.round(p)) < 0.05, p + 0.07, p)
    g = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)

    def loss_custom(rows, p):
        return jnp.sum(tile_interp(rows, p) * g)

    def loss_ref(rows, p):
        return jnp.sum(_reference_interp(rows, p) * g)

    dr_c, dp_c = jax.grad(loss_custom, argnums=(0, 1))(rows, p)
    dr_r, dp_r = jax.grad(loss_ref, argnums=(0, 1))(rows, p)
    np.testing.assert_allclose(np.asarray(dr_c), np.asarray(dr_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp_c), np.asarray(dp_r),
                               rtol=1e-4, atol=1e-5)
