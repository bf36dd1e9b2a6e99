"""Pallas TPU kernel: fused tent-product interpolation over gathered tiles.

The block-hash encode (ops/blockhash.py) is two stages: a wide-row XLA
gather (rows [M, 2*128]) and a tent-weighted reduction to [M, 2]. Left to
XLA, the reduction's weight construction + multiplies materialize several
[M, 128] f32 intermediates in HBM (~5 extra passes over 1.6 GB each at
M = 3.1M). This kernel fuses the whole reduction: one read of the rows, one
read of the 3 tile coordinates, one [M, 2] write — VMEM does the rest.

Forward:  out[m, f] = sum_lane rows[m, f*128+lane] * w(m, lane)
          w(m, lane) = tent(lx[lane]-px[m]) tent(ly[lane]-py[m]) tent(lz[lane]-pz[m])
Backward: d rows[m, f*128+lane] = g[m, f] * w(m, lane)    (same-shape kernel)
          d p via the tent derivative (sign within support), also fused.

Falls back to pure jnp off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indoor_nerf_tpu.ops.pallas.lane_gather import _on_tpu

LANES = 128
_CHUNK = 1024

# 5x5x5 tile occupies 125 of the 128 lanes.
_SIDE = 5


def _lane_coords(n_rows: int):
    """Lane -> tile coordinates as [n_rows, 128] f32, built from iota so the
    same code works inside Pallas kernels (which cannot capture array
    constants) and in the jnp fallback."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 1)
    lx = (lane // (_SIDE * _SIDE)).astype(jnp.float32)
    ly = ((lane // _SIDE) % _SIDE).astype(jnp.float32)
    lz = (lane % _SIDE).astype(jnp.float32)
    return lx, ly, lz


def _w_lane(px, py, pz):
    """Tent-product weights [chunk, 128] from positions [chunk, 1]."""
    lx, ly, lz = _lane_coords(px.shape[0])
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - px))
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly - py))
    tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - pz))
    return tx * ty * tz, (tx, ty, tz)


def _fwd_kernel(rows_ref, p_ref, out_ref):
    p = p_ref[...]  # [chunk, 128]: px/py/pz broadcast in lane groups 0..2
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]
    w, _ = _w_lane(px, py, pz)
    f0 = rows_ref[:, :LANES]
    f1 = rows_ref[:, LANES:]
    out = jnp.concatenate(
        [
            jnp.sum(f0 * w, axis=1, keepdims=True),
            jnp.sum(f1 * w, axis=1, keepdims=True),
        ],
        axis=1,
    )  # [chunk, 2]
    out_ref[...] = jnp.pad(out, ((0, 0), (0, LANES - 2)))


def _bwd_rows_kernel(p_ref, g_ref, drows_ref):
    p = p_ref[...]
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    w, _ = _w_lane(px, py, pz)
    g0 = g_ref[:, 0:1]
    g1 = g_ref[:, 1:2]
    drows_ref[:, :LANES] = g0 * w
    drows_ref[:, LANES:] = g1 * w


def _pad_rows(x, n_pad, n):
    return jnp.pad(x, ((0, n_pad - n), (0, 0)))


def _tile_interp_fwd_tpu(rows: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    n = rows.shape[0]
    n_pad = (n + _CHUNK - 1) // _CHUNK * _CHUNK
    rows_p = _pad_rows(rows, n_pad, n)
    p_p = jnp.pad(p, ((0, n_pad - n), (0, LANES - 3)))
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n_pad // _CHUNK,),
        in_specs=[
            pl.BlockSpec((_CHUNK, 2 * LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CHUNK, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), rows.dtype),
    )(rows_p, p_p)
    return out[:n, :2]


def _tile_interp_bwd_rows_tpu(p: jnp.ndarray, g: jnp.ndarray, n_lanes2: int
                              ) -> jnp.ndarray:
    n = p.shape[0]
    n_pad = (n + _CHUNK - 1) // _CHUNK * _CHUNK
    p_p = jnp.pad(p, ((0, n_pad - n), (0, LANES - 3)))
    g_p = jnp.pad(g, ((0, n_pad - n), (0, LANES - 2)))
    drows = pl.pallas_call(
        _bwd_rows_kernel,
        grid=(n_pad // _CHUNK,),
        in_specs=[
            pl.BlockSpec((_CHUNK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CHUNK, 2 * LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2 * LANES), g.dtype),
    )(p_p, g_p)
    return drows[:n]


def _reference_interp(rows: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    w, _ = _w_lane(p[:, 0:1], p[:, 1:2], p[:, 2:3])
    f0 = jnp.sum(rows[:, :LANES] * w, axis=1, keepdims=True)
    f1 = jnp.sum(rows[:, LANES:] * w, axis=1, keepdims=True)
    return jnp.concatenate([f0, f1], axis=1)


@jax.custom_vjp
def tile_interp(rows: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Fused interpolation: rows ``[M, 256]`` (two 128-lane feature planes),
    p ``[M, 3]`` positions within the tile -> features ``[M, 2]``."""
    if _on_tpu():
        return _tile_interp_fwd_tpu(rows, p)
    return _reference_interp(rows, p)


def _fwd(rows, p):
    return tile_interp(rows, p), (rows, p)


def _bwd(res, g):
    rows, p = res
    if _on_tpu():
        drows = _tile_interp_bwd_rows_tpu(p, g, rows.shape[1])
    else:
        w, _ = _w_lane(p[:, 0:1], p[:, 1:2], p[:, 2:3])
        drows = jnp.concatenate([g[:, 0:1] * w, g[:, 1:2] * w], axis=1)

    # dp (rarely consumed — sample positions carry no parameter gradients in
    # training — but computed exactly for correctness): the tent derivative
    # is -sign(l - p) on the open support, with the product rule across axes.
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    w, (tx, ty, tz) = _w_lane(px, py, pz)
    lx, ly, lz = _lane_coords(p.shape[0])
    dtx = jnp.where(jnp.abs(lx - px) < 1.0, jnp.sign(lx - px), 0.0)
    dty = jnp.where(jnp.abs(ly - py) < 1.0, jnp.sign(ly - py), 0.0)
    dtz = jnp.where(jnp.abs(lz - pz) < 1.0, jnp.sign(lz - pz), 0.0)
    gval = g[:, 0:1] * rows[:, :LANES] + g[:, 1:2] * rows[:, LANES:]
    dp = jnp.stack(
        [
            jnp.sum(gval * dtx * ty * tz, axis=1),
            jnp.sum(gval * tx * dty * tz, axis=1),
            jnp.sum(gval * tx * ty * dtz, axis=1),
        ],
        axis=1,
    )
    return drows, dp


tile_interp.defvjp(_fwd, _bwd)
