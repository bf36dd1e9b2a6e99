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

import contextlib
import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


# ---- Block-hash (flagship) tensor parallelism ------------------------------
#
# Same level-axis design as tp_hash_encode, for the TPU-native block-hash
# table (ops/blockhash.py, [L*R, F*lanes] level-major — contiguous level
# blocks shard cleanly). Each model-axis device encodes its own level block
# for every point in its data shard with the SAME fused kernels as the
# single-device path (Pallas VMEM scatter backward included, now operating
# on the local level block), and only the [N, (L/m)*F] activations cross the
# ICI. shard_map's transpose inserts the psum over the data axis for the
# table cotangent automatically; the backward scatter itself never leaves
# the level owner.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _block_interp_local(table_local, rows, p, levels_per, config):
    """Local-level-block gather+interp with the fused low-precision backward.

    table_local ``[(L/m)*R, F*lanes]``, rows ``[M]`` LOCAL row ids, p
    ``[M, 3]`` in-tile positions. The custom VJP mirrors
    ops/blockhash._encode_fused with the level window rebased to the local
    block (level0=0, n_levels=L/m) so the Pallas scatter accumulates into the
    local shard only.
    """
    from indoor_nerf_tpu.ops.blockhash import _gather_interp

    local_cfg = dataclasses.replace(config, n_levels=levels_per)
    return _gather_interp(table_local, rows, p, local_cfg)


def _block_interp_local_fwd(table_local, rows, p, levels_per, config):
    out = _block_interp_local(table_local, rows, p, levels_per, config)
    return out, (rows, p)


def _block_interp_local_bwd(levels_per, config, res, g):
    from indoor_nerf_tpu.ops.blockhash import _cot_rows, _scatter_cot

    rows, p = res
    local_cfg = dataclasses.replace(config, n_levels=levels_per)
    dt = (jnp.bfloat16 if config.scatter_dtype == "bfloat16"
          else jnp.float32)
    cot = _cot_rows(p, g, local_cfg).astype(dt)
    grad_local = _scatter_cot(cot, rows, levels_per, 0, local_cfg)
    # Integer primal => float0 cotangent; p gets zero (same contract as
    # _encode_fused: no gradient w.r.t. positions in fused mode).
    return (grad_local, np.zeros(rows.shape, jax.dtypes.float0),
            jnp.zeros_like(p))


_block_interp_local.defvjp(_block_interp_local_fwd, _block_interp_local_bwd)


def tp_block_encode(
    x: jnp.ndarray,
    table: jnp.ndarray,
    config,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Level-sharded block-hash encode over a ('data', 'model') mesh.

    Args:
      x: ``[N, 3]`` points, sharded over ``data_axis``.
      table: ``[L*R, F*lanes]`` fused block table, level blocks sharded over
        ``model_axis`` on dim 0.
      config: BlockHashConfig (ray_strides/ray_groups unsupported here — the
        flagship default is unstrided; strided TP would need per-level-class
        subprograms per shard).

    Returns (features ``[N, L*F]`` sharded over data, keep_mask ``[N]``).
    """
    from indoor_nerf_tpu.ops.blockhash import _tile_coords

    if config.ray_strides is not None or config.ray_groups is not None:
        raise NotImplementedError(
            "ray_strides/ray_groups are not supported under tensor "
            "parallelism; train TP runs unstrided (the flagship default)")
    n_model = mesh.shape[model_axis]
    L = config.n_levels
    if L % n_model != 0:
        raise ValueError(f"n_levels {L} not divisible by model axis {n_model}")
    levels_per = L // n_model
    R = config.rows_per_level
    F = config.n_features_per_level

    def body(x_local, table_local):
        j = jax.lax.axis_index(model_axis)
        n = x_local.shape[0]
        # Full-level index math is cheap VPU work (no table access); slice
        # out this device's contiguous level block and rebase row ids into
        # the local shard.
        flat_row, p, keep = _tile_coords(x_local, config)
        rows = flat_row.reshape(n, L)
        ps = p.reshape(n, L, 3)
        rows_l = jax.lax.dynamic_slice(
            rows, (0, j * levels_per), (n, levels_per)) - j * levels_per * R
        p_l = jax.lax.dynamic_slice(
            ps, (0, j * levels_per, 0), (n, levels_per, 3))
        if config.scatter_dtype == "bfloat16" or config.gather_dtype == "int8":
            feats = _block_interp_local(
                table_local, rows_l.reshape(-1), p_l.reshape(-1, 3),
                levels_per, config)
        else:
            from indoor_nerf_tpu.ops.blockhash import _gather_interp

            local_cfg = dataclasses.replace(config, n_levels=levels_per)
            feats = _gather_interp(
                table_local, rows_l.reshape(-1), p_l.reshape(-1, 3), local_cfg)
        feats = feats.reshape(n, levels_per * F)
        full = jax.lax.all_gather(feats, model_axis, axis=1, tiled=True)
        return full, keep

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None)),
        out_specs=(P(data_axis, None), P(data_axis)),
        check_vma=False,
    )(x, table)


# TP context: set by make_sharded_train_step (parallel/shard.py) around the
# step so models/field.py::encode_position routes block-hash encodes through
# tp_block_encode during tracing — keeps FieldConfig free of Mesh objects.
_BLOCK_TP: Optional[Tuple[Mesh, str, str]] = None


@contextlib.contextmanager
def block_tp_context(mesh: Mesh, data_axis: str = "data",
                     model_axis: str = "model"):
    global _BLOCK_TP
    prev = _BLOCK_TP
    _BLOCK_TP = (mesh, data_axis, model_axis)
    try:
        yield
    finally:
        _BLOCK_TP = prev


def current_block_tp() -> Optional[Tuple[Mesh, str, str]]:
    return _BLOCK_TP
