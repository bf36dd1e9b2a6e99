"""Tests for the Pallas tent-contraction kernel (ops/pallas/tent_contract).

Correctness is checked in interpreter mode on CPU against the plain jnp
tent-product expression (the same math the XLA encode path uses), both
standalone and integrated through the fused custom-VJP encode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import indoor_nerf_tpu.ops.blockhash as bh
from indoor_nerf_tpu.ops.blockhash import (
    BlockHashConfig,
    block_hash_encode,
    init_block_table,
)
from indoor_nerf_tpu.ops.pallas.tent_contract import tent_contract


def _ref_contract(rows, p, side, F):
    lpf = rows.shape[1] // F
    lane = np.arange(lpf)
    lx = (lane // (side * side)).astype(np.float32)
    ly = ((lane // side) % side).astype(np.float32)
    lz = (lane % side).astype(np.float32)
    tx = np.maximum(0.0, 1.0 - np.abs(lx[None] - p[:, 0:1]))
    ty = np.maximum(0.0, 1.0 - np.abs(ly[None] - p[:, 1:2]))
    tz = np.maximum(0.0, 1.0 - np.abs(lz[None] - p[:, 2:3]))
    w = tx * ty * tz
    r = np.asarray(rows, np.float32)
    return np.stack(
        [np.sum(r[:, f * lpf:(f + 1) * lpf] * w, axis=1) for f in range(F)],
        axis=1,
    )


@pytest.mark.parametrize("side,F,dtype", [
    (4, 4, jnp.bfloat16),   # flagship layout (block_size=3, W=256)
    (4, 2, jnp.float32),    # block_size=3, F=2 (W=128)
    (5, 2, jnp.float32),    # default 5^3 layout (lpf=128)
])
def test_tent_contract_matches_reference(side, F, dtype, rng):
    lpf = 128 if side ** 3 > 64 else 64
    M = 3000  # not a chunk multiple: exercises the pad path
    rows = rng.standard_normal((M, F * lpf)).astype(np.float32)
    p = rng.uniform(0.0, side - 1, size=(M, 3)).astype(np.float32)
    out = tent_contract(
        jnp.asarray(rows, dtype), jnp.asarray(p), side, F, interpret=True)
    want = _ref_contract(np.asarray(jnp.asarray(rows, dtype), np.float32),
                         p, side, F)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk,out_dtype,reduce", [
    (512, jnp.bfloat16, "vpu"),
    (512, jnp.float32, "mxu"),
    (2048, jnp.bfloat16, "mxu"),
])
def test_tent_contract_tuning_knobs_match(chunk, out_dtype, reduce, rng):
    """Chunk size, bf16 output, and the MXU segment reduction are all
    numerics-preserving to bf16 tolerance (the MXU path rounds the
    weighted product to bf16 once; the bf16 output rounds the result)."""
    side, F, lpf = 4, 4, 64
    M = 3000
    rows = rng.standard_normal((M, F * lpf)).astype(np.float32)
    p = rng.uniform(0.0, side - 1, size=(M, 3)).astype(np.float32)
    rows_bf = jnp.asarray(rows, jnp.bfloat16)
    out = tent_contract(rows_bf, jnp.asarray(p), side, F, interpret=True,
                        chunk=chunk, out_dtype=out_dtype, reduce=reduce)
    want = _ref_contract(np.asarray(rows_bf, np.float32), p, side, F)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=0.02, atol=0.02)


def _fused_encode_ab(rng, monkeypatch, knobs):
    """(features, grads) for the XLA path vs the tent-kernel path."""
    cfg = BlockHashConfig(
        bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0),
        n_levels=4, n_features_per_level=4, log2_rows=6,
        base_resolution=4, finest_resolution=32, block_size=3,
        gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    key = jax.random.PRNGKey(0)
    table = init_block_table(key, cfg)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(256, 3)), jnp.float32)

    def loss(t):
        f, _ = block_hash_encode(x, t, cfg)
        return jnp.sum(f ** 2), f

    monkeypatch.setattr(bh, "USE_TENT_KERNEL", False)
    (_, f0), g0 = jax.value_and_grad(loss, has_aux=True)(table)

    monkeypatch.setattr(bh, "USE_TENT_KERNEL", True)
    monkeypatch.setattr(bh, "_FORCE_TENT_KERNEL_INTERPRET", True)
    for k, v in knobs.items():
        monkeypatch.setattr(bh, k, v)
    (_, f1), g1 = jax.value_and_grad(loss, has_aux=True)(table)
    return f0, g0, f1, g1


def test_fused_encode_with_tent_kernel_matches_xla(rng, monkeypatch):
    """The fused custom-VJP encode through the exact (VPU, f32-out)
    kernel produces the same features AND table gradient as XLA."""
    f0, g0, f1, g1 = _fused_encode_ab(rng, monkeypatch, {
        "TENT_KERNEL_REDUCE": "vpu", "TENT_KERNEL_OUT": "float32",
        "TENT_KERNEL_CHUNK": 2048})
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-6)


def test_fused_encode_with_production_tent_defaults(rng, monkeypatch):
    """The shipped defaults (MXU reduce, bf16 out) stay within bf16
    rounding of the XLA path — same precision class as the bf16 row
    gather itself (BENCH_NOTES.md round-5 tent section)."""
    f0, g0, f1, g1 = _fused_encode_ab(rng, monkeypatch, {})
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=0.02, atol=0.02)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=0.02, atol=0.05)
