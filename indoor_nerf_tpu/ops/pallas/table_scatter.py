"""Pallas TPU kernel: table scatter-add with VMEM-resident accumulation.

The block-hash encode backward scatters M = N_points * n_levels cotangent
rows (one 128-lane row per (point, level)) into the ``[L*R, W]`` gradient
table. XLA's scatter-add is TRANSACTION-bound at ~59M rows/s into an HBM
table regardless of row bytes (tpu_probe_bwd.json; dtype- and
split-invariant) — every row pays ~3 HBM round trips. At flagship shapes
(4.19M rows) that is ~71 ms, the single largest slice of the 149 ms train
step.

This kernel moves the accumulation into VMEM: one level's table block
``[R, W]`` f32 (4 MB at R=8192, W=128) stays resident across a chunked
sweep of that level's cotangent rows, so HBM traffic collapses to ONE
streaming read of the rows plus one table write — the per-row
read-modify-write happens at VPU/VMEM speed. Grid = (level, chunk); the
output block index depends only on `level`, so Pallas keeps it in VMEM
across the chunk steps (multiple-revisit accumulation) and writes it back
once per level.

Data layout: inputs arrive level-major (``[L, N, W]`` rows, ``[L, n/128,
128]`` indices) so every block slices contiguous memory and satisfies the
Mosaic block-shape rule (last two dims (8,128)-divisible or full). The
caller's transpose from the encode's (point, level) order fuses into the
cotangent formation.

Two in-kernel accumulation strategies (selected by `aligned`):
- row RMW: ``acc[pl.ds(r, 1), :] += row`` — one dynamic-sublane update.
- aligned vreg RMW: update the aligned 8-row group containing r with a
  sublane-masked row — the store is 8-sublane aligned, which Mosaic
  prefers (CLAUDE.md: dynamic sublane ops are the fragile direction).

Role in the reference: this is the TPU answer to `nn.Embedding` autograd
(PocketNeRF/hash_encoding.py:30-34), whose CUDA backward is a hardware
atomic-add scatter.

Falls back to the XLA scatter off-TPU; `interpret=True` runs the kernel
in interpreter mode for CPU correctness tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indoor_nerf_tpu.ops.pallas.lane_gather import _on_tpu

_CHUNK = 2048  # cotangent rows per grid step (multiple of 128)
# fori_loop unroll of the 8-row groups. KEEP AT 1: the unroll=2 compile
# wedged the v5e via the axon tunnel (2026-08-17, concurrent-job run —
# unverified in isolation, but not worth the chip risk for an unknown
# gain; the serial RMW is ~18 ns/row either way).
_UNROLL = 1


def _scatter_kernel_rowrmw(idx_ref, cot_ref, acc_ref):
    """Serial row read-modify-write at dynamic (unaligned) sublane offsets.
    Mosaic requires 8-aligned vector loads on the sublane dim, so cotangent
    rows are fetched in aligned groups of 8 and peeled statically; the acc
    store itself is a 1-row dynamic store (may not lower on all Mosaic
    versions — the `aligned` variant is the production path)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    chunk = cot_ref.shape[1]

    def body(j, carry):
        j8 = pl.multiple_of(j * 8, 8)
        rows8 = cot_ref[0, pl.ds(j8, 8), :].astype(acc_ref.dtype)  # [8, W]
        for k in range(8):
            i = j * 8 + k
            r = idx_ref[0, i // 128, i % 128]
            acc_ref[0, pl.ds(r, 1), :] += rows8[k : k + 1, :]
        return carry

    jax.lax.fori_loop(0, chunk // 8, body, 0, unroll=_UNROLL)


def _scatter_kernel_aligned(idx_ref, cot_ref, acc_ref):
    """Aligned-vreg accumulation: each update touches the aligned 8-row
    group containing the target row, with the cotangent masked into the
    right sublane — every VMEM access stays 8-sublane aligned (CLAUDE.md:
    dynamic sublane ops are the fragile Mosaic direction)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    chunk = cot_ref.shape[1]
    W = cot_ref.shape[2]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)

    def body(j, carry):
        j8 = pl.multiple_of(j * 8, 8)
        rows8 = cot_ref[0, pl.ds(j8, 8), :].astype(acc_ref.dtype)
        for k in range(8):
            i = j * 8 + k
            r = idx_ref[0, i // 128, i % 128]
            base = pl.multiple_of((r // 8) * 8, 8)
            sub = r - base
            upd = jnp.where(
                sub_iota == sub, rows8[k : k + 1, :],
                jnp.zeros((), acc_ref.dtype),
            )
            acc_ref[0, pl.ds(base, 8), :] += upd
        return carry

    jax.lax.fori_loop(0, chunk // 8, body, 0)


def _scatter_kernel_rowrmw2(idx_ref, cot_ref, acc0_ref, acc1_ref):
    """Dual-bank row RMW: even entries accumulate into acc0, odd into acc1
    (merged by the caller). Two separate output refs let Mosaic prove
    store/load independence between consecutive iterations and pipeline
    the RMWs — a single accumulator serializes on potential aliasing.

    WARNING (measured 2026-08-17): compiling this variant on the v5e via
    the axon tunnel HUNG the compile and wedged the chip (~40 min
    recovery). Correct in interpreter mode; do NOT run banks=2 on TPU
    until the Mosaic issue is understood. banks=1 is the production path.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc0_ref[...] = jnp.zeros_like(acc0_ref)
        acc1_ref[...] = jnp.zeros_like(acc1_ref)

    chunk = cot_ref.shape[1]

    def body(j, carry):
        j8 = pl.multiple_of(j * 8, 8)
        rows8 = cot_ref[0, pl.ds(j8, 8), :].astype(acc0_ref.dtype)
        for k in range(8):
            i = j * 8 + k
            r = idx_ref[0, i // 128, i % 128]
            tgt = acc0_ref if k % 2 == 0 else acc1_ref
            tgt[0, pl.ds(r, 1), :] += rows8[k : k + 1, :]
        return carry

    jax.lax.fori_loop(0, chunk // 8, body, 0)


def _scatter_kernel_runmerge(idx_ref, cot_ref, acc_ref):
    """Row RMW with RUN-MERGING: consecutive entries targeting the SAME
    row accumulate in a register and flush with one RMW when the row
    changes. The entry stream is sample-consecutive along rays (cotT is
    [L, N, W] with N = ray-major x sample), and at coarse levels a ray
    crosses only a handful of tiles across its ~64 samples, so most
    entries merge — trading the ~18 ns VMEM RMW for a ~cheap vector add.
    Fine levels degenerate to one flush per entry (the plain RMW cost
    plus a predicate). Exact for any input (merging is associative).

    The run register carries across chunk steps of the same level via a
    flush at the top of each chunk (run state is re-seeded from the first
    entry), and the final partial run flushes at chunk end — so every
    chunk is self-contained: seed from entry 0, flush after entry
    chunk-1. Correct because padding rows target row 0 with zero
    cotangent."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    chunk = cot_ref.shape[1]
    W = cot_ref.shape[2]

    def body(j, carry):
        run_row, run_acc = carry
        j8 = pl.multiple_of(j * 8, 8)
        rows8 = cot_ref[0, pl.ds(j8, 8), :].astype(acc_ref.dtype)  # [8, W]
        for k in range(8):
            i = j * 8 + k
            r = idx_ref[0, i // 128, i % 128]
            same = r == run_row

            @pl.when(jnp.logical_not(same))
            def _flush(run_row=run_row, run_acc=run_acc):
                acc_ref[0, pl.ds(run_row, 1), :] += run_acc

            row = rows8[k : k + 1, :]
            run_acc = jnp.where(same, run_acc + row, row)
            run_row = r
        return run_row, run_acc

    # Seed: a virtual empty run targeting row 0 with zero contribution.
    run_row, run_acc = jax.lax.fori_loop(
        0, chunk // 8, body,
        (jnp.int32(0), jnp.zeros((1, W), acc_ref.dtype)),
    )
    acc_ref[0, pl.ds(run_row, 1), :] += run_acc


def _scatter_kernel_skiprow(idx_ref, cot_ref, acc_ref):
    """Row RMW with NEGATIVE-row skip: entries whose id is -1 are dropped
    without touching VMEM. Companion of merge_consecutive_rows() — the exact
    within-ray run-length dedup pre-pass marks all-but-the-last entry of
    each same-row run as -1, so the serial loop pays one predicate per
    entry instead of one RMW. (VERDICT r2 #1: the sort-free segmented
    reduction, measured honestly — see BENCH_NOTES.md for the result.)"""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    chunk = cot_ref.shape[1]

    def body(j, carry):
        j8 = pl.multiple_of(j * 8, 8)
        rows8 = cot_ref[0, pl.ds(j8, 8), :].astype(acc_ref.dtype)
        for k in range(8):
            i = j * 8 + k
            r = idx_ref[0, i // 128, i % 128]

            @pl.when(r >= 0)
            def _apply(r=r, k=k):
                acc_ref[0, pl.ds(r, 1), :] += rows8[k : k + 1, :]

        return carry

    jax.lax.fori_loop(0, chunk // 8, body, 0, unroll=_UNROLL)


def merge_consecutive_rows(cot: jnp.ndarray, flat_row: jnp.ndarray,
                           n_levels: int):
    """Exact within-ray run-length dedup: segment-sum consecutive equal
    row ids to the run's LAST entry, mark the others -1 (skipped by
    _scatter_kernel_skiprow). Pure VPU work (one cumsum + shifts), exact
    gradients — the dedup removes precisely the coarse-level repeat RMWs.

    cot ``[M, W]`` / flat_row ``[M]`` in the (point, level) interleaved
    order of blockhash._tile_coords (entry m = point m//L, level m%L), so
    consecutive SAMPLES of a ray at the SAME level sit L apart: reshape to
    [N, L] and run the merge along axis 0 per level column (rays are
    concatenated along N; a spurious cross-ray merge is harmless — same
    row id means the same accumulation target either way).
    """
    M, W = cot.shape
    L = n_levels
    N = M // L
    G = 8  # merge window along the sample axis (coarse runs measure 5-8)
    if N % G != 0:
        return cot, flat_row  # shapes that don't window: no-op
    rows3 = flat_row.reshape(N // G, G, L)
    cot4 = cot.reshape(N // G, G, L, W).astype(jnp.float32)
    # Contiguous-run start index per entry (within the window): the last
    # position <= j where the row id changed — three int doubling maxes.
    iota = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None, :, None],
                            rows3.shape)
    changed = jnp.concatenate(
        [jnp.ones((rows3.shape[0], 1, L), bool),
         rows3[:, 1:] != rows3[:, :-1]], axis=1)
    start = jnp.where(changed, iota, jnp.int32(0))
    for shift in (1, 2, 4):
        shifted = jnp.concatenate(
            [jnp.zeros((start.shape[0], shift, L), jnp.int32),
             start[:, :-shift]], axis=1)
        start = jnp.maximum(start, shifted)
    # Segmented inclusive prefix sum (Hillis-Steele): add the value s back
    # whenever position j-s is still inside j's run.
    acc = cot4
    for shift in (1, 2, 4):
        in_run = (iota - shift) >= start
        shifted = jnp.concatenate(
            [jnp.zeros((acc.shape[0], shift, L, W), acc.dtype),
             acc[:, :-shift]], axis=1)
        acc = acc + jnp.where(in_run[..., None], shifted, 0.0)
    # Keep run ends (within-window): their prefix sum IS the run sum; runs
    # crossing window borders just don't merge across — still exact.
    is_end = jnp.concatenate(
        [rows3[:, 1:] != rows3[:, :-1],
         jnp.ones((rows3.shape[0], 1, L), bool)], axis=1)
    merged = jnp.where(is_end[..., None], acc, 0.0).astype(cot.dtype)
    rows_masked = jnp.where(is_end, rows3, -1)
    return merged.reshape(M, W), rows_masked.reshape(M)


def supports(n_levels: int, rows_per_level: int, width: int,
             m_rows: int) -> bool:
    """Shapes the kernel handles: per-level accumulator must fit VMEM and
    the row count must factor as points x levels."""
    acc_bytes = rows_per_level * width * 4
    return (
        acc_bytes <= 8 * 1024 * 1024
        and width in (128, 256)
        and rows_per_level % 8 == 0
        and m_rows % n_levels == 0
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "rows_per_level", "aligned", "chunk",
                     "interpret", "acc_dtype", "banks", "merge_runs",
                     "level0", "merge_consecutive"),
)
def scatter_add_table(
    cot: jnp.ndarray,
    flat_row: jnp.ndarray,
    n_levels: int,
    rows_per_level: int,
    aligned: bool = False,
    chunk: int = _CHUNK,
    interpret: bool = False,
    acc_dtype: str = "float32",
    banks: int = 1,
    merge_runs: bool = False,
    level0: int = 0,
    merge_consecutive: bool = False,
) -> jnp.ndarray:
    """``zeros([L*R, W]).at[flat_row - level0*R].add(cot)`` with VMEM
    accumulation.

    cot: ``[M, W]`` cotangent rows (f32/bf16), M = N * n_levels ordered
        level-minor (m = point * L + level — the _tile_coords layout).
    flat_row: ``[M]`` int32 global row ids; entry m must target level
        ``level0 + m % L``'s block, i.e. ``flat_row[m] // R == level0 +
        m % L`` (true by construction in blockhash._tile_coords, where
        the level id is baked into the row). Rows are accumulated per
        level. ``level0`` supports encodes over a CONTIGUOUS level
        subset [level0, level0 + L): the returned table covers only
        those levels; the caller pads it into the full-grid shape.
    Returns ``[L*R, W]`` float32.
    """
    if merge_consecutive:
        # Exact within-window run-length dedup (VERDICT r2 #1): merged
        # entries carry id -1 and zero value; the skiprow kernel drops
        # them with a predicate instead of an RMW.
        cot, flat_row = merge_consecutive_rows(cot, flat_row, n_levels)
    M, W = cot.shape
    L, R = n_levels, rows_per_level
    N = M // L
    assert N * L == M, (M, L)
    assert chunk % 128 == 0, chunk

    n_pad = pl.cdiv(N, chunk) * chunk
    # Level-major layouts (the transposes fuse into the caller's cotangent
    # formation / are tiny for the int32 indices). Padding targets row 0
    # with a zero cotangent: harmless.
    cotT = jnp.moveaxis(cot.reshape(N, L, W), 1, 0)  # [L, N, W]
    local = (
        flat_row.reshape(N, L)
        - (level0 + jnp.arange(L, dtype=flat_row.dtype))[None] * R
    ).T  # [L, N]
    if n_pad != N:
        cotT = jnp.pad(cotT, ((0, 0), (0, n_pad - N), (0, 0)))
        local = jnp.pad(local, ((0, 0), (0, n_pad - N)))
    idx3 = local.reshape(L, n_pad // 128, 128)

    adt = jnp.bfloat16 if acc_dtype == "bfloat16" else jnp.float32
    in_specs = [
        pl.BlockSpec((1, chunk // 128, 128),
                     lambda l, c: (l, c, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, chunk, W), lambda l, c: (l, c, 0),
                     memory_space=pltpu.VMEM),
    ]
    acc_spec = pl.BlockSpec((1, R, W), lambda l, c: (l, 0, 0),
                            memory_space=pltpu.VMEM)
    if banks == 2:
        out0, out1 = pl.pallas_call(
            _scatter_kernel_rowrmw2,
            grid=(L, n_pad // chunk),
            in_specs=in_specs,
            out_specs=(acc_spec, acc_spec),
            out_shape=(jax.ShapeDtypeStruct((L, R, W), adt),) * 2,
            interpret=interpret,
        )(idx3, cotT)
        out = out0.astype(jnp.float32) + out1.astype(jnp.float32)
        return out.reshape(L * R, W)
    if merge_consecutive:
        kernel = _scatter_kernel_skiprow
    elif merge_runs:
        kernel = _scatter_kernel_runmerge
    elif aligned:
        kernel = _scatter_kernel_aligned
    else:
        kernel = _scatter_kernel_rowrmw
    # Wide-row accumulators (W=256: the F=4 and 5^3-tile layouts at
    # R=8192) double-buffer past the default 16 MB scoped-VMEM limit
    # (measured: 17.04 MB requested). Raise the per-kernel cap to what the
    # buffers actually need — 2x acc + 2x cot chunk + slack; v5e VMEM is
    # 128 MB so ~20 MB is comfortably safe.
    vmem_need = (2 * R * W * (2 if adt == jnp.bfloat16 else 4)
                 + 2 * chunk * W * cotT.dtype.itemsize + (1 << 20))
    kwargs = {}
    if not interpret and vmem_need > 16 * 1024 * 1024:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_need)
    out = pl.pallas_call(
        kernel,
        grid=(L, n_pad // chunk),
        in_specs=in_specs,
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((L, R, W), adt),
        interpret=interpret,
        **kwargs,
    )(idx3, cotT)
    return out.reshape(L * R, W).astype(jnp.float32)


def scatter_add_table_xla(cot, flat_row, n_levels, rows_per_level):
    """The XLA scatter this kernel replaces (for diffing / fallback)."""
    shape = (n_levels * rows_per_level, cot.shape[1])
    return (
        jnp.zeros(shape, cot.dtype).at[flat_row].add(cot).astype(jnp.float32)
    )


@functools.partial(
    jax.jit,
    static_argnames=("level_rows", "rows_per_level", "chunk", "interpret",
                     "acc_dtype"),
)
def scatter_add_table_ragged(
    cot: jnp.ndarray,
    local_row: jnp.ndarray,
    level_rows: tuple,
    rows_per_level: int,
    chunk: int = _CHUNK,
    interpret: bool = False,
    acc_dtype: str = "float32",
) -> jnp.ndarray:
    """Ragged LEVEL-MAJOR scatter: per-level row counts may differ.

    One pallas_call covers all levels — built for the grouped encode
    backward, whose G-merged coarse levels have 1/G as many cotangent
    rows as the exact fine levels (class-split per-level calls measured
    ~5-8 ms of per-kernel overhead each, tpu_probe_grouped_*.json).

    cot: ``[sum(level_rows), W]`` level-major stream (level 0's rows,
        then level 1's, ...). Each ``level_rows[l]`` must be a multiple
        of ``chunk`` (callers pad with local_row 0 / zero cotangent).
    local_row: ``[sum(level_rows)]`` int32 LOCAL row ids (0..R-1).
    Returns ``[len(level_rows)*R, W]`` float32.

    Grid is one flat chunk axis; the output block index is the chunk's
    level, derived from static prefix sums (chunks of a level are
    consecutive, so Mosaic keeps the level's accumulator VMEM-resident
    across them and writes it back once per level).
    """
    L = len(level_rows)
    R = rows_per_level
    M, W = cot.shape
    assert M == sum(level_rows), (M, level_rows)
    assert all(n % chunk == 0 for n in level_rows), (level_rows, chunk)
    starts = []
    acc_chunks = 0
    for n in level_rows:
        starts.append(acc_chunks)
        acc_chunks += n // chunk
    tot_chunks = acc_chunks

    idx3 = local_row.reshape(tot_chunks, chunk // 128, 128)
    cot3 = cot.reshape(tot_chunks, chunk, W)

    def level_of(c):
        lv = jnp.int32(0)
        for s in starts[1:]:
            lv = lv + jnp.int32(c >= s)
        return lv

    def kernel(idx_ref, cot_ref, acc_ref):
        c = pl.program_id(0)
        is_first = jnp.int32(0)
        for s in starts:
            is_first = is_first + jnp.int32(c == s)

        @pl.when(is_first > 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(j, carry):
            j8 = pl.multiple_of(j * 8, 8)
            rows8 = cot_ref[0, pl.ds(j8, 8), :].astype(acc_ref.dtype)
            for k in range(8):
                i = j * 8 + k
                r = idx_ref[0, i // 128, i % 128]
                acc_ref[0, pl.ds(r, 1), :] += rows8[k : k + 1, :]
            return carry

        jax.lax.fori_loop(0, chunk // 8, body, 0, unroll=_UNROLL)

    adt = jnp.bfloat16 if acc_dtype == "bfloat16" else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(tot_chunks,),
        in_specs=[
            pl.BlockSpec((1, chunk // 128, 128), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, W), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W), lambda c: (level_of(c), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, R, W), adt),
        interpret=interpret,
    )(idx3, cot3)
    return out.reshape(L * R, W).astype(jnp.float32)
