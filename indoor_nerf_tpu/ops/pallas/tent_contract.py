"""Pallas TPU kernel: tent-product contraction for the block-hash encode.

The flagship encode-forward (ops/blockhash.py::_gather_interp) is a wide
row gather ``[M, F*lpf]`` followed by the tent-product trilinear
contraction to ``[M, F]``. roofline_r4.json prices the XLA-fused form at
12.17 ms against a 3.5 ms row-transaction wall — the contraction's weight
construction (lane decode + three tents + product) plus the per-feature
multiply-reduce runs on the VPU at ~2-3x the fetch cost (VERDICT round-4
weak #5 / next-round item 2).

This kernel computes ONLY the contraction: rows stay an XLA gather (the
gather is transaction-bound and XLA is already at the wall for the bare
fetch), and the kernel streams the gathered rows through VMEM once —
  out[m, f] = sum_lane rows[m, f*lpf + lane] * w(m, lane)
  w(m, lane) = tent(lx-px) * tent(ly-py) * tent(lz-pz)
with the lane -> (lx, ly, lz) tile decode done on iota (shift/mask when
``side`` is a power of two — the flagship block_size=3 layout has
side = 4, lpf = 64). One read of rows + one read of p, one [M, F] write.

Every kernel operand block is (8, 128)-aligned: the [M, 3] positions are
padded to 128 lanes once outside the kernel (narrow 3-lane blocks are the
fragile Mosaic direction — unaligned small DMAs per grid step).

Used INSIDE the fused custom-VJP encode (blockhash._encode_fused), whose
backward is already hand-written — so unlike the retired tile_interp
kernel this adds NO new VJP boundary and blocks no XLA fusion that the
production path still relies on.

Reference role: the contraction half of the HashEmbedder trilinear
interpolation (PocketNeRF/hash_encoding.py:56-80).

Falls back to the jnp expression off-TPU; ``interpret=True`` runs the
kernel in interpreter mode for the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 2048  # rows per grid step (default; tunable per call)
_PLANES = 128  # lane padding of the position operand


def _tents(p_ref, side: int, lpf: int):
    px = p_ref[:, 0:1]
    py = p_ref[:, 1:2]
    pz = p_ref[:, 2:3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (px.shape[0], lpf), 1)
    if side & (side - 1) == 0:
        # Power-of-two tile side (the flagship block_size=3 -> side=4):
        # shift/mask decode — Mosaic lowers integer division slowly.
        s = side.bit_length() - 1
        lx = jax.lax.shift_right_logical(lane, 2 * s).astype(jnp.float32)
        ly = (jax.lax.shift_right_logical(lane, s) & (side - 1)).astype(
            jnp.float32)
        lz = (lane & (side - 1)).astype(jnp.float32)
    else:
        lx = (lane // (side * side)).astype(jnp.float32)
        ly = ((lane // side) % side).astype(jnp.float32)
        lz = (lane % side).astype(jnp.float32)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - px))
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly - py))
    tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - pz))
    return tx * ty * tz  # [chunk, lpf]


def _kernel(rows_ref, p_ref, out_ref, *, side: int, F: int, lpf: int):
    w = _tents(p_ref, side, lpf)
    outs = []
    for f in range(F):
        r = rows_ref[:, f * lpf:(f + 1) * lpf].astype(jnp.float32)
        outs.append(jnp.sum(r * w, axis=1, keepdims=True))
    out = jnp.concatenate(outs, axis=1)  # [chunk, F]
    out_ref[...] = jnp.pad(out, ((0, 0), (0, out_ref.shape[1] - F))).astype(
        out_ref.dtype)


def _kernel_mxu(rows_ref, p_ref, sel_ref, out_ref, *, side: int, F: int,
                lpf: int):
    """Segment reduction on the MXU: out = (rows . w_tiled) @ sel.

    The VPU kernel's per-feature lane reductions produce [chunk, 1]
    vregs (127/128 lanes dead) plus a lane concat; one [chunk, W] x
    [W, 128] bf16 matmul against the constant 0/1 segment matrix does
    all F reductions at once on the otherwise-idle MXU, emitting the
    final [chunk, 128] block directly (lanes >= F are zero columns).
    The weighted product is rounded to bf16 once before the matmul —
    same precision class as the bf16 row gather itself.
    """
    w = _tents(p_ref, side, lpf)
    wt = jnp.concatenate([w] * F, axis=1)  # [chunk, W], 64-aligned copies
    prod = (rows_ref[...].astype(jnp.float32) * wt).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        prod, sel_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "side", "F", "interpret", "chunk", "out_dtype", "input_fusion",
    "reduce"))
def tent_contract(
    rows: jnp.ndarray, p: jnp.ndarray, side: int, F: int,
    interpret: bool = False, chunk: int = _CHUNK,
    out_dtype=jnp.float32, input_fusion: bool = False,
    reduce: str = "vpu",
) -> jnp.ndarray:
    """Contraction ``rows [M, F*lpf] x p [M, 3] -> [M, F]``.

    ``rows`` may be bfloat16 or float32 (multiply in f32 either way).
    ``p`` is the in-tile position (tent support [0, side-1]).
    ``chunk`` sets rows per grid step (VMEM per step = ~3 blocks x chunk;
    fewer, larger steps amortize Mosaic's per-step overhead).
    ``out_dtype=bfloat16`` halves the padded [M, 128] output write — free
    downstream, the MLP casts its inputs to bf16 anyway (models/mlp.py).
    ``input_fusion`` lets XLA fuse the producer of ``rows`` (the row
    gather) into the kernel's input loads, eliding the materialized
    [M, W] intermediate the pallas_call boundary otherwise forces.
    """
    M, W = rows.shape
    lpf = W // F
    m_pad = (M + chunk - 1) // chunk * chunk
    if m_pad != M:
        rows = jnp.pad(rows, ((0, m_pad - M), (0, 0)))
        p = jnp.pad(p, ((0, m_pad - M), (0, 0)))
    # Lane-align the position operand (3 -> 128); [M, 3] f32 already
    # occupies a full 128-lane tile physically, so this adds no HBM bytes.
    p = jnp.pad(p, ((0, 0), (0, _PLANES - 3)))
    in_specs = [
        pl.BlockSpec((chunk, W), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, _PLANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [rows, p]
    if reduce == "mxu":
        kern = functools.partial(_kernel_mxu, side=side, F=F, lpf=lpf)
        # Constant 0/1 segment matrix sel[w, f] = (w // lpf == f); the
        # constant index_map makes Mosaic fetch it once, not per step.
        seg = jnp.arange(W, dtype=jnp.int32) // lpf
        sel = (seg[:, None] == jnp.arange(128)[None, :]).astype(jnp.bfloat16)
        in_specs.append(pl.BlockSpec((W, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(sel)
    else:
        kern = functools.partial(_kernel, side=side, F=F, lpf=lpf)
    kwargs = {}
    if not interpret:
        # VMEM need: Mosaic's stack allocation measures ~1.9x the naive
        # double-buffered block sum (measured: chunk 4096, W=256, bf16
        # rows/out -> 19.66 MB vs the naive 10.5 MB; tpu_probe_tent_sweep
        # round-5 compile crash). Budget 4x single-buffer + slack.
        need = 4 * chunk * (W * rows.dtype.itemsize + _PLANES * 4
                            + 128 * jnp.dtype(out_dtype).itemsize) + (2 << 20)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            allow_input_fusion=[input_fusion] + [False] * (len(operands) - 1),
            **({"vmem_limit_bytes": need}
               if need > 16 * 1024 * 1024 else {}),
        )
    out = pl.pallas_call(
        kern,
        grid=(m_pad // chunk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 128), out_dtype),
        interpret=interpret,
        **kwargs,
    )(*operands)
    return out[:M, :F]
