"""Probe: where does encode-forward's time go, and what makes it faster?

roofline_r4.json prices the flagship encode-forward (1.05M row fetches of
512 B bf16 + the tent-product trilinear contraction) at 12.17 ms against a
3.5 ms row wall (the ~300M rows/s microbenchmark rate). VERDICT round-4
item 2 asks whether the tent contraction is VPU-bound (fuse it in Pallas /
drop it to bf16) or whether the gather itself never ran at 300M rows/s at
these shapes. This measures every layer of that question on the real chip
at the exact flagship shapes.

HARNESS RULES (each violated by the first version of this probe, which
over-reported every variant ~6x):
- the scan carry perturbs a SMALL operand (the 33 MB table, or the [M, 3]
  positions) so the per-step work is the op under test, not a GB-scale
  carry materialization;
- the warm call is DRAINED with float(...) — over the axon tunnel an
  undrained warm call queues behind the timed call and inflates it;
- the output full-sum feeds the carry so XLA can neither hoist the
  loop-invariant gather out of the scan nor DCE it (CLAUDE.md).

Variants:
  gather_*     : the bare row fetch at several (dtype, width) layouts
  tent_only_*  : the tent contraction on resident rows (no gather);
                 the carry perturbs p, so tent weights recompute per step
  fused_*      : gather + tent as one XLA program (the training forward)
  *_pallas     : the ops/pallas/tent_contract.py streaming kernel

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/probe_encode_fwd.py \
        [--out tpu_probe_encode_fwd.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_points", type=int, default=131072)
    ap.add_argument("--n_steps", type=int, default=20)
    ap.add_argument("--skip_pallas", action="store_true",
                    help="XLA variants only (the Pallas kernel is the "
                         "chip-wedge-risky part; measure it isolated)")
    ap.add_argument("--out", default="tpu_probe_encode_fwd.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.ops.blockhash import (
        BlockHashConfig,
        _gather_interp,
        _tile_coords,
        _tent_weights,
        init_block_table,
    )

    # Flagship geometry (bench.py): 8 levels x 4 features, 4^3 tiles
    # (lpf=64, W=256), 2^13 rows/level, bf16 gather.
    bb = ((-1.5,) * 3, (1.5,) * 3)
    cfg = BlockHashConfig(
        bbox_min=bb[0], bbox_max=bb[1], n_levels=8, n_features_per_level=4,
        log2_rows=13, base_resolution=16, finest_resolution=512,
        block_size=3, gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    L, R = cfg.n_levels, cfg.rows_per_level
    F, lpf = cfg.n_features_per_level, cfg.lanes_per_feature
    W = F * lpf
    N = args.n_points
    M = N * L

    key = jax.random.PRNGKey(0)
    table = init_block_table(key, cfg)  # [L*R, W] f32
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.4, 1.4, size=(N, 3)), jnp.float32)
    flat_row, p, _ = jax.jit(
        functools.partial(_tile_coords, config=cfg))(pts)
    flat_row = jax.block_until_ready(flat_row)
    p = jax.block_until_ready(p)

    results = {"config": {"n_points": N, "rows": M, "W": W, "L": L, "R": R,
                          "n_steps": args.n_steps}}

    def timeit(name, fn, *operands):
        """n_steps-step scan; each step's output full-sum feeds the carry;
        fn(*operands, carry) must apply the carry to a SMALL operand."""

        @jax.jit
        def run(ops):
            def body(carry, _):
                out = fn(*ops, carry)
                return jnp.sum(out.astype(jnp.float32)) * 1e-30, None

            c, _ = jax.lax.scan(
                body, jnp.asarray(0.0, jnp.float32), None,
                length=args.n_steps)
            return c

        float(run(operands))  # compile + warm, fully drained
        t0 = time.perf_counter()
        val = float(run(operands))  # value transfer closes the window
        dt = (time.perf_counter() - t0) / args.n_steps * 1e3
        rate = M / (dt / 1e3) / 1e6
        results[name] = {"ms": round(dt, 3), "mrows_s": round(rate, 1)}
        print(f"{name:28s} {dt:8.3f} ms  {rate:7.1f} M rows/s", flush=True)
        return val

    def bump(t, c):
        """Carry-dependent table perturbation (one 33-66 MB pass)."""
        return t * (1.0 + c).astype(t.dtype)

    # --- bare gathers (carry perturbs the TABLE before the fetch) ----------
    tab_bf = jax.block_until_ready(table.astype(jnp.bfloat16))
    tab_i8 = jax.block_until_ready(
        jnp.round(table * 1e5).astype(jnp.int8))

    timeit("gather_f32_w256",
           lambda t, c: jnp.take(bump(t, c), flat_row, axis=0), table)
    timeit("gather_bf16_w256",
           lambda t, c: jnp.take(bump(t, c), flat_row, axis=0), tab_bf)
    timeit("gather_int8_w256",
           lambda t, c: jnp.take(
               (t + jnp.round(c * 1e-30).astype(t.dtype)), flat_row, axis=0),
           tab_i8)
    # Same bytes, half the width, double the rows: [2*L*R, 128].
    tab_bf_n = jax.block_until_ready(tab_bf.reshape(2 * L * R, 128))
    idx2 = jax.block_until_ready(
        jnp.stack([flat_row * 2, flat_row * 2 + 1], -1).reshape(-1))
    timeit("gather_bf16_w128_2x",
           lambda t, c: jnp.take(bump(t, c), idx2, axis=0), tab_bf_n)
    # Sorted row ids (locality ceiling; ignores the unsort cost).
    idx_sorted = jax.block_until_ready(jnp.sort(flat_row))
    timeit("gather_bf16_sorted",
           lambda t, c: jnp.take(bump(t, c), idx_sorted, axis=0), tab_bf)
    # Uniform random rows (the historical 300M rows/s microbenchmark law).
    idx_u = jax.block_until_ready(jnp.asarray(
        rng.integers(0, L * R, size=(M,)), jnp.int32))
    timeit("gather_bf16_uniform",
           lambda t, c: jnp.take(bump(t, c), idx_u, axis=0), tab_bf)

    # --- tent contraction on RESIDENT rows (carry perturbs p) --------------
    rows_res = jax.block_until_ready(
        jnp.take(tab_bf, flat_row, axis=0))  # [M, W] bf16

    def tent_slices(rows, pp, c):
        w = _tent_weights(pp + (1e-20 * c), cfg.side, lpf)
        r = rows.astype(jnp.float32)
        outs = [jnp.sum(r[:, f * lpf:(f + 1) * lpf] * w, axis=1,
                        keepdims=True) for f in range(F)]
        return jnp.concatenate(outs, axis=1)

    timeit("tent_only_resident", tent_slices, rows_res, p)

    def tent_bf16(rows, pp, c):
        w = _tent_weights(pp + (1e-20 * c), cfg.side, lpf).astype(
            jnp.bfloat16)
        outs = [jnp.sum((rows[:, f * lpf:(f + 1) * lpf] * w)
                        .astype(jnp.float32), axis=1, keepdims=True)
                for f in range(F)]
        return jnp.concatenate(outs, axis=1)

    timeit("tent_only_bf16", tent_bf16, rows_res, p)

    # Constant lane decode (no per-element integer division).
    lane_c = np.arange(lpf)
    lx_c = jnp.asarray((lane_c // (cfg.side * cfg.side)).astype(np.float32))
    ly_c = jnp.asarray(((lane_c // cfg.side) % cfg.side).astype(np.float32))
    lz_c = jnp.asarray((lane_c % cfg.side).astype(np.float32))

    def tent_const(rows, pp, c):
        pp = pp + (1e-20 * c)
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx_c[None, :] - pp[:, 0:1]))
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly_c[None, :] - pp[:, 1:2]))
        tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz_c[None, :] - pp[:, 2:3]))
        w = tx * ty * tz
        r = rows.astype(jnp.float32)
        outs = [jnp.sum(r[:, f * lpf:(f + 1) * lpf] * w, axis=1,
                        keepdims=True) for f in range(F)]
        return jnp.concatenate(outs, axis=1)

    timeit("tent_only_const_decode", tent_const, rows_res, p)

    # --- fused gather + tent (the real encode-forward) ---------------------
    timeit("fused_current",
           lambda t, c: _gather_interp(bump(t, c), flat_row, p, cfg),
           table)

    def fused_bf16_table(t, c):
        rows = jnp.take(bump(t, c), flat_row, axis=0).astype(jnp.float32)
        w = _tent_weights(p, cfg.side, lpf)
        outs = [jnp.sum(rows[:, f * lpf:(f + 1) * lpf] * w, axis=1,
                        keepdims=True) for f in range(F)]
        return jnp.concatenate(outs, axis=1)

    timeit("fused_precast_bf16", fused_bf16_table, tab_bf)

    def fused_const(t, c):
        rows = jnp.take(bump(t, c), flat_row, axis=0)
        return tent_const(rows, p, c * 0.0)

    timeit("fused_const_decode", fused_const, tab_bf)

    # --- Pallas streaming contraction kernel --------------------------------
    if not args.skip_pallas:
        from indoor_nerf_tpu.ops.pallas.tent_contract import tent_contract

        interp = jax.default_backend() != "tpu"  # CPU smoke: interpret

        def tent_pallas(rows, pp, c):
            return tent_contract(rows, pp + (1e-20 * c), cfg.side, F,
                                 interpret=interp)

        timeit("tent_only_pallas", tent_pallas, rows_res, p)

        def fused_pallas(t, c):
            rows = jnp.take(bump(t, c), flat_row, axis=0)
            return tent_contract(rows, p, cfg.side, F, interpret=interp)

        timeit("fused_pallas_bf16", fused_pallas, tab_bf)

    # Level-split: 8 separate gathers from per-level [R, W] tables —
    # tests whether table size (not total rows) sets the rate.
    tabs = jax.block_until_ready(tab_bf.reshape(L, R, W))
    rows_lvl = jax.block_until_ready(
        flat_row.reshape(N, L) - jnp.arange(L, dtype=jnp.int32)[None] * R)

    def fused_per_level(t, c):
        t = bump(t, c)
        outs = []
        for l in range(L):
            rows = jnp.take(t[l], rows_lvl[:, l], axis=0)
            pl_ = p.reshape(N, L, 3)[:, l]
            wl = _tent_weights(pl_, cfg.side, lpf)
            r = rows.astype(jnp.float32)
            outs += [jnp.sum(r[:, f * lpf:(f + 1) * lpf] * wl, axis=1,
                             keepdims=True) for f in range(F)]
        return jnp.concatenate(outs, axis=1)

    timeit("fused_per_level_split", fused_per_level, tabs)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "config"}))


if __name__ == "__main__":
    main()
