"""Tensor parallelism for the hash grid: level-sharded tables via shard_map.

The hash grid is this model's only large parameter (a [L*T, F] table, e.g.
16 x 2^19 x 2 = 64 MB fp32 at chair settings, GBs at production scales), and
its gather traffic is the compute bottleneck — so the natural model-parallel
axis is the LEVEL axis: device j of the 'model' axis owns levels
[j*L/m, (j+1)*L/m), computes its levels' features for every ray in its data
shard, and the per-level feature slices are concatenated with an all_gather
over ICI. Gradients transpose automatically (all_gather <-> psum_scatter),
so the backward scatter-adds stay local to each level's owner — no
all-reduce of table gradients across the model axis at all.

This mirrors how embedding tables are sharded in TPU recommender systems:
shard the table, gather locally, exchange only the (much smaller)
activations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from indoor_nerf_tpu.ops.encoding import (
    HashGridConfig,
    hash_grid_indices,
    trilinear_interp,
)


def _local_level_encode(
    x: jnp.ndarray,
    table_local: jnp.ndarray,
    config: HashGridConfig,
    model_axis: str,
    n_model: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device body: encode this device's level shard, all_gather features.

    table_local: ``[(L/m) * T, F]`` — this device's contiguous level block.
    """
    levels_per = config.n_levels // n_model
    j = jax.lax.axis_index(model_axis)

    # Full-level index computation is cheap VPU work; slice out our levels
    # [N, L/m, 8] and rebase the flat indices into the local table block.
    flat_idx, weights, keep = hash_grid_indices(x, config)  # [N, L, 8], [N, L, 3]
    start = j * levels_per * config.table_size
    local_idx = jax.lax.dynamic_slice(
        flat_idx, (0, j * levels_per, 0),
        (x.shape[0], levels_per, 8),
    ) - start
    local_w = jax.lax.dynamic_slice(
        weights, (0, j * levels_per, 0), (x.shape[0], levels_per, 3)
    )

    corner_feats = jnp.take(table_local, local_idx, axis=0)  # [N, L/m, 8, F]
    feats = trilinear_interp(corner_feats, local_w)  # [N, L/m, F]
    feats = feats.reshape(x.shape[0], levels_per * config.n_features_per_level)

    # Concatenate level-feature slices across the model axis (ICI).
    full = jax.lax.all_gather(feats, model_axis, axis=1, tiled=True)
    return full, keep


def tp_hash_encode(
    x: jnp.ndarray,
    table: jnp.ndarray,
    config: HashGridConfig,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Level-sharded hash encode over a ('data', 'model') mesh.

    Args:
      x: ``[N, 3]`` points, sharded over ``data_axis``.
      table: ``[L*T, F]`` fused table, sharded over ``model_axis`` on dim 0
        (contiguous level blocks — L must divide evenly by the axis size).

    Returns (features ``[N, L*F]`` sharded over data, keep_mask ``[N]``).
    """
    n_model = mesh.shape[model_axis]
    if config.n_levels % n_model != 0:
        raise ValueError(
            f"n_levels {config.n_levels} not divisible by model axis {n_model}"
        )

    body = functools.partial(
        _local_level_encode,
        config=config,
        model_axis=model_axis,
        n_model=n_model,
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None)),
        out_specs=(P(data_axis, None), P(data_axis)),
        check_vma=False,
    )(x, table)


def table_sharding(mesh: Mesh, model_axis: str = "model") -> NamedSharding:
    """The hash table's NamedSharding: level blocks over the model axis."""
    return NamedSharding(mesh, P(model_axis, None))
