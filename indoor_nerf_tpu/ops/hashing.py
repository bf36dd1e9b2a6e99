"""Spatial hashing for the multiresolution hash grid.

TPU-native reimplementation of the reference spatial hash
(reference: PocketNeRF/utils.py:13-24) and the 8-corner voxel offsets
(PocketNeRF/utils.py:9). The hash is the Instant-NGP XOR-of-primes hash

    h(x, y, z) = (x * 1) ^ (y * 2654435761) ^ (z * 805459861)  mod 2^T

computed here in uint32. The reference computes it in int64 (torch promotes
``int32 * python_int`` past 2^31), but only the low ``log2_hashmap_size < 32``
bits survive the final mask, and the low 32 bits of a product are identical
in mod-2^32 and mod-2^64 arithmetic — so uint32 is bit-exact and lets the
whole index computation live on the TPU's native 32-bit integer path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# The 8 corners of a unit voxel, ordered so corner c has bits
# (i, j, k) = (c >> 2 & 1, c >> 1 & 1, c & 1), matching the reference's
# itertools-style ordering: 0->000, 1->001, ..., 7->111
# (reference: PocketNeRF/utils.py:9, hash_encoding.py:67).
BOX_OFFSETS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)

# First 7 primes of the Instant-NGP hash (reference: PocketNeRF/utils.py:18).
_PRIMES = np.array(
    [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737],
    dtype=np.uint32,
)


def spatial_hash(coords: jnp.ndarray, log2_hashmap_size: int) -> jnp.ndarray:
    """XOR-of-primes spatial hash of integer grid coordinates.

    Args:
      coords: integer array ``[..., D]`` with ``D <= 7`` (typically D=3).
      log2_hashmap_size: log2 of the hash table size T.

    Returns:
      uint32 array ``[...]`` of hash-table indices in ``[0, 2^log2T)``.
    """
    d = coords.shape[-1]
    if d > len(_PRIMES):
        raise ValueError(f"spatial_hash supports up to {len(_PRIMES)} dims, got {d}")
    c = coords.astype(jnp.uint32)
    # XOR-accumulate c[..., i] * prime[i]; uint32 arithmetic wraps mod 2^32.
    out = c[..., 0] * _PRIMES[0]
    for i in range(1, d):
        out = out ^ (c[..., i] * _PRIMES[i])
    mask = jnp.uint32((1 << log2_hashmap_size) - 1)
    return out & mask
