"""Golden tests for the spatial hash against an independent big-int model."""

import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.hashing import BOX_OFFSETS, spatial_hash

PRIMES = [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737]


def hash_bigint(coords, log2T):
    """Arbitrary-precision Python-int model of the XOR-of-primes hash."""
    out = 0
    for i, c in enumerate(coords):
        out ^= (int(c) * PRIMES[i]) % (1 << 64)
    return out & ((1 << log2T) - 1)


def test_hash_matches_bigint_model(rng):
    coords = rng.integers(0, 1024, size=(256, 3))
    got = np.asarray(spatial_hash(jnp.asarray(coords, jnp.int32), 19))
    want = np.array([hash_bigint(c, 19) for c in coords], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hash_large_coords_wraparound(rng):
    # Coordinates large enough that the int64 product overflows 2^32; the
    # uint32 implementation must still match the masked big-int result.
    coords = rng.integers(0, 2**31 - 1, size=(64, 3))
    got = np.asarray(spatial_hash(jnp.asarray(coords, jnp.int32), 19))
    want = np.array([hash_bigint(c, 19) for c in coords], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hash_range():
    coords = jnp.arange(3 * 1000, dtype=jnp.int32).reshape(1000, 3)
    h = np.asarray(spatial_hash(coords, 10))
    assert h.min() >= 0 and h.max() < 1024


def test_box_offsets_ordering():
    # Corner c must have bits (c>>2&1, c>>1&1, c&1) — the reference's
    # 0->000 ... 7->111 ordering that the trilinear weights rely on.
    for c in range(8):
        assert list(BOX_OFFSETS[c]) == [(c >> 2) & 1, (c >> 1) & 1, c & 1]
