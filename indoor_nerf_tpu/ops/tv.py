"""Regularization losses on the hash grid: total variation and sigma sparsity.

Equivalents of PocketNeRF/loss.py. The TV loss samples a random cube of grid
vertices per level, hashes them, and penalizes squared adjacent differences.
Cube sizes are static per level, so the whole 16-level loss compiles into one
fixed-shape program; only the random cube origin is traced.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.encoding import HashGridConfig, level_resolutions
from indoor_nerf_tpu.ops.hashing import spatial_hash


def _level_cube_size(resolution: float, min_resolution: int) -> int:
    """Static cube edge length for one level (reference: loss.py:16-22)."""
    min_cube = min_resolution - 1
    max_cube = 50  # can be tuned (reference: loss.py:18)
    return int(math.floor(np.clip(resolution / 10.0, min_cube, max_cube)))


def total_variation_loss(
    key: jax.Array, table: jnp.ndarray, config: HashGridConfig
) -> jnp.ndarray:
    """Sum of per-level TV losses over random cubes of grid vertices.

    Equivalent to summing total_variation_loss over levels
    (reference: PocketNeRF/loss.py:11-43, summed at run_nerf.py:1031-1034).

    Args:
      key: PRNG key for the random cube origins (one per level).
      table: fused ``[L * T, F]`` hash table.
    """
    res = level_resolutions(config)  # [L] float32, static
    keys = jax.random.split(key, config.n_levels)
    total = jnp.zeros((), jnp.float32)
    for level in range(config.n_levels):
        resolution = int(res[level])
        cube = _level_cube_size(res[level], config.base_resolution)
        # Random cube origin in [0, resolution - cube) per axis
        # (reference: loss.py:25).
        min_vertex = jax.random.randint(
            keys[level], (3,), 0, resolution - cube, dtype=jnp.int32
        )
        ax = jnp.arange(cube + 1, dtype=jnp.int32)
        gx = min_vertex[0] + ax
        gy = min_vertex[1] + ax
        gz = min_vertex[2] + ax
        cube_idx = jnp.stack(
            jnp.meshgrid(gx, gy, gz, indexing="ij"), axis=-1
        )  # [C+1, C+1, C+1, 3]
        hashed = spatial_hash(cube_idx, config.log2_hashmap_size).astype(jnp.int32)
        flat = hashed + level * config.table_size
        emb = jnp.take(table, flat, axis=0)  # [C+1, C+1, C+1, F]
        tv_x = jnp.sum((emb[1:, :, :, :] - emb[:-1, :, :, :]) ** 2)
        tv_y = jnp.sum((emb[:, 1:, :, :] - emb[:, :-1, :, :]) ** 2)
        tv_z = jnp.sum((emb[:, :, 1:, :] - emb[:, :, :-1, :]) ** 2)
        total = total + (tv_x + tv_y + tv_z) / cube
    return total


def sigma_sparsity_loss(sigmas: jnp.ndarray) -> jnp.ndarray:
    """Cauchy sparsity loss on sigma values (reference: loss.py:45-47).

    Unused by the live training loss at reference HEAD (the entropy sparsity
    from raw2outputs is used instead), kept for parity.
    """
    return jnp.sum(jnp.log(1.0 + 2.0 * sigmas**2), axis=-1)


def patch_depth_regularizer(
    depth: jnp.ndarray,
    acc: jnp.ndarray,
    patch: int,
    near: float,
    far: float,
    mode: str = "tv",
) -> jnp.ndarray:
    """Depth-smoothness loss over novel-view ray patches (extension).

    ``depth``/``acc`` are flat ``[P * patch**2]`` maps from rendering
    ``UnobservedPatchSampler`` rays (data/pipeline.py); no reference
    counterpart (PocketNeRF regularizes only observed batches,
    structural_priors.py).

    mode="tv": RegNeRF-style squared FIRST differences of depth
    normalized by (far - near) (Niemeyer et al., CVPR 2022, eq. 5).
    Note this penalizes legitimate planar SLOPE too — at wide per-pixel
    angular footprints (low-res indoor protocols) slanted walls pay.

    mode="planar": squared SECOND differences of normalized disparity.
    The disparity (1/z-depth) of a plane is an affine function of pixel
    coordinates, so planes — floors, walls, the dominant indoor geometry
    — cost EXACTLY zero at any slant, while floaters (high-curvature
    depth noise) still pay. Empty rays map to disparity 0 (background
    at infinity), so sky patches are flat-free rather than garbage:
    disp = (far - near) * acc / max(depth, eps).
    """
    d = depth.reshape(-1, patch, patch)
    if mode == "planar":
        a = acc.reshape(-1, patch, patch)
        nd = (far - near) * a / jnp.maximum(d, 1e-6)
        return (
            jnp.mean(jnp.square(nd[:, 2:, :] - 2.0 * nd[:, 1:-1, :]
                                + nd[:, :-2, :]))
            + jnp.mean(jnp.square(nd[:, :, 2:] - 2.0 * nd[:, :, 1:-1]
                                  + nd[:, :, :-2]))
        )
    nd = d / (far - near)
    return (
        jnp.mean(jnp.square(nd[:, 1:, :] - nd[:, :-1, :]))
        + jnp.mean(jnp.square(nd[:, :, 1:] - nd[:, :, :-1]))
    )
