"""Pallas TPU kernel: batched within-row (lane) gather with custom VJP.

The TPU-native block-hash encoder (ops/blockhash.py) fetches one 128-lane
row per (point, level) and then needs the 8 voxel-corner features selected
from each fetched row. XLA lowers such per-lane selection to its generic
gather, which is rate-limited to ~160-300M gathered elements/s on v5e;
Mosaic's ``tpu.dynamic_gather`` along the lane dimension runs it at ~27G
elements/s (measured) via ``jnp.take_along_axis(values, idx, axis=1)``
inside a Pallas kernel.

Semantics: out[i, j] = values[i, idx[i, j]]      (values [N,128], idx [N,k])

Backward is a one-hot masked reduction, also as a Pallas kernel so the
[N, k, 128] one-hot is never materialized in HBM (it would be GBs for
realistic batches).

On non-TPU backends both directions fall back to pure jnp (tests run on the
forced-CPU platform).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_CHUNK = 2048  # rows per pallas program (forward)
_GRAD_CHUNK = 512  # smaller: the unrolled one-hot reduce holds k live vregs


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _select_kernel(idx_ref, val_ref, out_ref):
    # Mosaic lane-dim dynamic_gather requires operand, indices and output to
    # share one 2D shape, hence the pre-broadcast [CHUNK, 128] indices.
    out_ref[...] = jnp.take_along_axis(val_ref[...], idx_ref[...], axis=1)


def _select_tpu(values: jnp.ndarray, idx_full: jnp.ndarray) -> jnp.ndarray:
    n = values.shape[0]
    n_pad = (n + _CHUNK - 1) // _CHUNK * _CHUNK
    if n_pad != n:
        values = jnp.pad(values, ((0, n_pad - n), (0, 0)))
        idx_full = jnp.pad(idx_full, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _select_kernel,
        grid=(n_pad // _CHUNK,),
        in_specs=[
            pl.BlockSpec((_CHUNK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CHUNK, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), values.dtype),
    )(idx_full, values)
    return out[:n]


def _grad_kernel(k: int, idx_ref, g_ref, out_ref):
    # dvalues[i, l] = sum_j g[i, j] * (idx[i, j] == l); k statically unrolled.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_GRAD_CHUNK, LANES), 1)
    acc = jnp.zeros((_GRAD_CHUNK, LANES), g_ref.dtype)
    for j in range(k):
        acc = acc + jnp.where(
            lanes == idx_ref[:, j][:, None], g_ref[:, j][:, None], 0.0
        )
    out_ref[...] = acc


def _grad_tpu(idx: jnp.ndarray, g: jnp.ndarray, k: int) -> jnp.ndarray:
    n = idx.shape[0]
    n_pad = (n + _GRAD_CHUNK - 1) // _GRAD_CHUNK * _GRAD_CHUNK
    # Pad the k axis to a lane-friendly width for clean VMEM tiling.
    k_pad = max(8, k)
    idx_p = jnp.pad(idx, ((0, n_pad - n), (0, k_pad - k)), constant_values=0)
    g_p = jnp.pad(g, ((0, n_pad - n), (0, k_pad - k)))
    out = pl.pallas_call(
        functools.partial(_grad_kernel, k),
        grid=(n_pad // _GRAD_CHUNK,),
        in_specs=[
            pl.BlockSpec((_GRAD_CHUNK, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_GRAD_CHUNK, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_GRAD_CHUNK, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), g.dtype),
    )(idx_p, g_p)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lane_select(values: jnp.ndarray, idx: jnp.ndarray, k: int) -> jnp.ndarray:
    """Gather ``k`` lanes from each 128-lane row.

    Args:
      values: ``[N, 128]``.
      idx: ``[N, k]`` int32 lane indices in [0, 128).
      k: static number of selections per row (k <= 128).

    Returns ``[N, k]`` with out[i, j] = values[i, idx[i, j]].
    """
    if _on_tpu():
        idx_full = jnp.pad(idx, ((0, 0), (0, LANES - k)))
        return _select_tpu(values, idx_full)[:, :k]
    return jnp.take_along_axis(values, idx, axis=1)


def _fwd(values, idx, k):
    return lane_select(values, idx, k), idx


def _bwd(k, idx, g):
    if _on_tpu():
        dvalues = _grad_tpu(idx, g, k)
    else:
        lanes = jnp.arange(LANES, dtype=idx.dtype)
        dvalues = jnp.sum(
            jnp.where(idx[:, :, None] == lanes, g[:, :, None], 0.0), axis=1
        )
    return dvalues, None


lane_select.defvjp(_fwd, _bwd)
