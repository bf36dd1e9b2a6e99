"""Correctness tests for the Pallas VMEM-accumulation table scatter
(ops/pallas/table_scatter.py) in interpreter mode on CPU; the TPU
performance measurement lives in scripts/tpu_measurements.py +
BENCH_NOTES.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.ops.pallas.table_scatter import (
    scatter_add_table,
    scatter_add_table_xla,
    supports,
)


def _mk(rng, L, R, W, N, dtype):
    cot = jnp.asarray(rng.normal(size=(N * L, W)).astype(np.float32))
    if dtype == "bfloat16":
        cot = cot.astype(jnp.bfloat16)
    rows = rng.integers(0, R, size=(N, L))
    flat = jnp.asarray(
        (rows + np.arange(L)[None, :] * R).reshape(-1).astype(np.int32)
    )
    return cot, flat


@pytest.mark.parametrize("aligned", [False, True])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_scatter_matches_xla(rng, aligned, dtype):
    L, R, W, N = 4, 64, 128, 300  # N not a multiple of chunk: exercises pad
    cot, flat = _mk(rng, L, R, W, N, dtype)
    ref = scatter_add_table_xla(cot, flat, L, R).astype(jnp.float32)
    out = scatter_add_table(
        cot, flat, L, R, aligned=aligned, chunk=128, interpret=True
    )
    assert out.dtype == jnp.float32
    # f32 accumulation in the kernel vs dtype-accumulation in the XLA ref:
    # compare at input precision.
    tol = 1e-5 if dtype == "float32" else 0.15
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)


def test_scatter_collisions_accumulate(rng):
    """Many entries hitting the SAME row must all accumulate (the serial
    RMW path's read-after-write hazard)."""
    L, R, W, N = 2, 16, 128, 300
    cot = jnp.ones((N * L, W), jnp.float32)
    flat = jnp.asarray(
        (np.zeros((N, L), np.int64) + np.arange(L)[None, :] * R)
        .reshape(-1).astype(np.int32)
    )
    out = scatter_add_table(
        cot, flat, L, R, aligned=True, chunk=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.full(W, N), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[R]), np.full(W, N), rtol=1e-6)
    assert float(jnp.abs(out[1:R]).max()) == 0.0


def test_supports_gate():
    assert supports(16, 8192, 128, 16 * 4096)
    assert not supports(16, 8192, 64, 16 * 4096)   # odd width
    assert not supports(16, 1 << 17, 128, 16 * 4096)  # acc > VMEM budget
    assert not supports(16, 8192, 128, 100)  # M not divisible by L


def test_fused_backward_via_pallas_matches_xla(rng):
    """The integrated path: block_hash_encode's fused backward with the
    Pallas scatter (interpret mode) must produce the same table gradient
    as the XLA scatter path."""
    import dataclasses

    import indoor_nerf_tpu.ops.blockhash as bh

    cfg = bh.BlockHashConfig(
        bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0),
        n_levels=4, log2_rows=7, base_resolution=16, finest_resolution=64,
        block_size=3, gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    table = bh.init_block_table(jax.random.PRNGKey(0), cfg) * 1e4
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(200, 3)), jnp.float32)

    def loss(tbl):
        feats, _ = bh.block_hash_encode(pts, tbl, cfg)
        return jnp.sum(jnp.sin(feats))

    bh._FORCE_PALLAS_SCATTER_INTERPRET = True
    try:
        g_kernel = jax.grad(loss)(table)
    finally:
        bh._FORCE_PALLAS_SCATTER_INTERPRET = False
    old = bh.USE_PALLAS_SCATTER
    bh.USE_PALLAS_SCATTER = False
    try:
        g_xla = jax.grad(loss)(table)
    finally:
        bh.USE_PALLAS_SCATTER = old

    # Kernel accumulates in f32, the XLA bf16 path in bf16 — tolerance at
    # bf16 resolution of the accumulated values.
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_xla), atol=0.02, rtol=0.01
    )
    assert float(jnp.abs(g_kernel).max()) > 0.0


def test_scatter_dual_bank_matches(rng):
    """banks=2 (dual accumulator) is numerically identical to banks=1.
    Interpreter-mode only: the TPU compile of this variant wedged the v5e
    (see the kernel docstring) — correctness is pinned here so the variant
    can be re-tried safely on future Mosaic versions."""
    L, R, W, N = 4, 64, 128, 300
    cot, flat = _mk(rng, L, R, W, N, "float32")
    a = scatter_add_table(cot, flat, L, R, chunk=128, interpret=True)
    b = scatter_add_table(cot, flat, L, R, chunk=128, interpret=True,
                          banks=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("pattern", ["random", "runs", "allsame", "alternate"])
def test_scatter_runmerge_matches(rng, pattern):
    """merge_runs=True is exact for every run structure: random rows,
    ray-coherent runs, a single row everywhere (one giant run), and
    worst-case alternation (no merging at all)."""
    L, R, W, N = 3, 64, 128, 384
    cot = jnp.asarray(rng.normal(size=(N * L, W)).astype(np.float32))
    if pattern == "random":
        rows = rng.integers(0, R, size=(N, L))
    elif pattern == "runs":
        rows = np.repeat(rng.integers(0, R, size=(N // 16, L)), 16, axis=0)
    elif pattern == "allsame":
        rows = np.full((N, L), 7)
    else:
        rows = np.tile(np.array([3, 11]), N // 2)[:, None] + np.zeros(
            (N, L), np.int64)
    flat = jnp.asarray(
        (rows + np.arange(L)[None, :] * R).reshape(-1).astype(np.int32)
    )
    ref = scatter_add_table_xla(cot, flat, L, R)
    out = scatter_add_table(
        cot, flat, L, R, chunk=128, interpret=True, merge_runs=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_scatter_add_table_ragged_matches_xla():
    """Ragged level-major kernel (one pallas_call, per-level row counts
    differ) matches the XLA scatter in interpreter mode, including the
    chunk-boundary accumulator handoff within a level."""
    from indoor_nerf_tpu.ops.pallas.table_scatter import (
        scatter_add_table_ragged,
    )

    rng = np.random.default_rng(7)
    R, W, chunk = 64, 128, 128
    level_rows = (256, 256, 128, 512)  # ragged; multiples of chunk
    L = len(level_rows)
    cot = jnp.asarray(
        rng.normal(size=(sum(level_rows), W)).astype(np.float32))
    local = jnp.asarray(
        rng.integers(0, R, size=(sum(level_rows),)).astype(np.int32))

    got = scatter_add_table_ragged(
        cot, local, level_rows, R, chunk=chunk, interpret=True)

    want = np.zeros((L * R, W), np.float32)
    off = 0
    for l, n in enumerate(level_rows):
        np.add.at(want, l * R + np.asarray(local[off:off + n]),
                  np.asarray(cot[off:off + n]))
        off += n
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_merge_consecutive_exact(rng):
    """The within-window run-length dedup (merge_consecutive) is EXACT: the
    skiprow kernel over merged entries equals the XLA scatter over the raw
    stream, on run-structured ids including non-contiguous repeats."""
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.ops.pallas.table_scatter import (
        merge_consecutive_rows,
        scatter_add_table,
        scatter_add_table_xla,
    )

    L, R, W = 2, 64, 128
    n_pts = 256
    # Run-structured ids: runs of length 1..9 plus an A-B-A trap pattern.
    ids = []
    vals = rng.integers(0, R, size=n_pts * 2)
    i = 0
    while len(ids) < n_pts:
        run = int(rng.integers(1, 9))
        ids.extend([int(vals[i])] * run)
        i += 1
    ids = np.asarray(ids[:n_pts], np.int32)
    ids[5], ids[6], ids[7] = 7, 3, 7  # non-contiguous same-id (A B A)
    rows = np.stack([ids + l * R for l in range(L)], axis=1).reshape(-1)
    cot = rng.normal(size=(n_pts * L, W)).astype(np.float32)

    merged, masked = merge_consecutive_rows(
        jnp.asarray(cot), jnp.asarray(rows), L)
    # Dedup really removed entries, and total mass is conserved per row.
    assert int(np.sum(np.asarray(masked) >= 0)) < n_pts * L
    want = scatter_add_table_xla(jnp.asarray(cot), jnp.asarray(rows), L, R)
    got = scatter_add_table(
        jnp.asarray(cot), jnp.asarray(rows), L, R, interpret=True,
        chunk=128, merge_consecutive=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
