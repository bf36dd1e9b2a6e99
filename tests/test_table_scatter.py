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
