"""Tests for hash-grid, SH, and frequency encodings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.ops.encoding import (
    HashGridConfig,
    hash_encode,
    hash_grid_indices,
    init_hash_table,
    level_resolutions,
    positional_encode,
    positional_encode_dim,
    sh_encode,
    trilinear_interp,
)

CFG = HashGridConfig(
    bbox_min=(-1.0, -1.0, -1.0),
    bbox_max=(1.0, 1.0, 1.0),
    n_levels=4,
    log2_hashmap_size=12,
    base_resolution=16,
    finest_resolution=128,
)


def test_level_resolutions_geometric():
    res = level_resolutions(CFG)
    assert res[0] == 16.0
    assert res[-1] == 128.0
    # floor(base * b^l), b = (128/16)^(1/3) = 2
    np.testing.assert_allclose(res, [16.0, 32.0, 64.0, 128.0])


def test_trilinear_interp_corners_and_center(rng):
    feats = jnp.asarray(rng.normal(size=(5, 8, 2)), jnp.float32)
    # At each corner, interp returns exactly that corner's features.
    for c in range(8):
        w = jnp.asarray([[(c >> 2) & 1, (c >> 1) & 1, c & 1]], jnp.float32)
        w = jnp.broadcast_to(w, (5, 3))
        out = trilinear_interp(feats, w)
        np.testing.assert_allclose(out, feats[:, c], rtol=1e-6)
    # At the center, interp returns the mean of the 8 corners.
    out = trilinear_interp(feats, jnp.full((5, 3), 0.5))
    np.testing.assert_allclose(out, np.mean(np.asarray(feats), axis=1), rtol=1e-5)


def test_trilinear_matches_three_step_lerp(rng):
    """The product-weight form must equal the reference's 3-step lerp."""
    feats = np.asarray(rng.normal(size=(16, 8, 2)), np.float32)
    w = np.asarray(rng.uniform(size=(16, 3)), np.float32)
    c00 = feats[:, 0] * (1 - w[:, :1]) + feats[:, 4] * w[:, :1]
    c01 = feats[:, 1] * (1 - w[:, :1]) + feats[:, 5] * w[:, :1]
    c10 = feats[:, 2] * (1 - w[:, :1]) + feats[:, 6] * w[:, :1]
    c11 = feats[:, 3] * (1 - w[:, :1]) + feats[:, 7] * w[:, :1]
    c0 = c00 * (1 - w[:, 1:2]) + c10 * w[:, 1:2]
    c1 = c01 * (1 - w[:, 1:2]) + c11 * w[:, 1:2]
    want = c0 * (1 - w[:, 2:3]) + c1 * w[:, 2:3]
    got = trilinear_interp(jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hash_grid_keep_mask():
    x = jnp.asarray(
        [[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [-1.0, -1.0, -1.0], [1.5, 1.5, 1.5]],
        jnp.float32,
    )
    _, _, keep = hash_grid_indices(x, CFG)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True, False])


def test_hash_encode_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, CFG)
    assert table.shape == (CFG.n_levels * CFG.table_size, 2)
    assert float(jnp.max(jnp.abs(table))) <= 1e-4

    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    feats, keep = hash_encode(x, table, CFG)
    assert feats.shape == (64, CFG.out_dim)
    assert bool(jnp.all(keep))
    feats2, _ = hash_encode(x, table, CFG)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


def test_hash_encode_matches_per_level_reference(rng):
    """Fused all-levels encode must equal a naive per-level numpy loop."""
    key = jax.random.PRNGKey(0)
    table = np.asarray(init_hash_table(key, CFG))
    x = np.asarray(rng.uniform(-0.99, 0.99, size=(32, 3)), np.float32)

    res = level_resolutions(CFG)
    box_min = np.array(CFG.bbox_min, np.float32)
    box_max = np.array(CFG.bbox_max, np.float32)
    primes = [1, 2654435761, 805459861]

    want = np.zeros((32, CFG.out_dim), np.float32)
    for lvl in range(CFG.n_levels):
        grid = (box_max - box_min) / res[lvl]
        bl = np.floor((x - box_min) / grid).astype(np.int64)
        vmin = bl * grid + box_min
        w = (x - vmin) / grid
        for n in range(32):
            acc = np.zeros(2, np.float32)
            for c in range(8):
                bits = [(c >> 2) & 1, (c >> 1) & 1, c & 1]
                corner = bl[n] + bits
                h = 0
                for d in range(3):
                    h ^= int(corner[d]) * primes[d]
                h &= CFG.table_size - 1
                cw = np.prod([w[n, d] if bits[d] else 1 - w[n, d] for d in range(3)])
                acc += cw * table[lvl * CFG.table_size + h]
            want[n, 2 * lvl : 2 * lvl + 2] = acc

    got, _ = hash_encode(jnp.asarray(x), jnp.asarray(table), CFG)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-7)


def test_sh_encode_degree4_known_directions():
    # +z direction: m=0 terms only among l=1; check a few closed forms.
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    out = np.asarray(sh_encode(d, degree=4))[0]
    assert out.shape == (16,)
    np.testing.assert_allclose(out[0], 0.28209479177387814, rtol=1e-6)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-7)  # -C1 * y
    np.testing.assert_allclose(out[2], 0.4886025119029199, rtol=1e-6)  # C1 * z
    np.testing.assert_allclose(out[3], 0.0, atol=1e-7)  # -C1 * x
    # l=2, m=0: C2[2] * (2 z^2 - x^2 - y^2) = 0.31539... * 2
    np.testing.assert_allclose(out[6], 0.31539156525252005 * 2.0, rtol=1e-6)
    # l=3, m=0: C3[3] * z (2 z^2 - 3 x^2 - 3 y^2) = 0.3731... * 2
    np.testing.assert_allclose(out[12], 0.3731763325901154 * 2.0, rtol=1e-6)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_sh_encode_dims(degree, rng):
    d = rng.normal(size=(10, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    out = sh_encode(jnp.asarray(d, jnp.float32), degree=degree)
    assert out.shape == (10, degree**2)


def test_positional_encode_values():
    x = jnp.asarray([[0.5, -0.25, 1.0]], jnp.float32)
    multires = 4
    out = np.asarray(positional_encode(x, multires))
    assert out.shape == (1, positional_encode_dim(multires))
    np.testing.assert_allclose(out[0, :3], [0.5, -0.25, 1.0], rtol=1e-6)
    # First band: freq 2^0 = 1 → sin(x), cos(x)
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -0.25, 1.0]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.5, -0.25, 1.0]), rtol=1e-6)
    # Last band: freq 2^3 = 8
    np.testing.assert_allclose(
        out[0, -3:], np.cos(np.array([0.5, -0.25, 1.0]) * 8), rtol=1e-6
    )
