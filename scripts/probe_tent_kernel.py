"""Isolated timing of the Pallas tent-contraction kernel.

Kept separate from probe_encode_fwd.py because custom-kernel compiles are
the chip-wedge-risky step on the axon tunnel (CLAUDE.md): this probe runs
ONE short timing so a hang loses nothing else. Compares three programs at
the flagship encode shapes (M = n_points * 8 rows of [*, 256] bf16):

  xla_fused    : jnp gather + tent contraction (the production forward)
  kernel_only  : tent_contract on resident rows (no gather)
  kernel_fused : jnp gather -> tent_contract

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/probe_tent_kernel.py
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_points", type=int, default=131072)
    ap.add_argument("--n_steps", type=int, default=10)
    ap.add_argument("--out", default="tpu_probe_tent_kernel.json")
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
        init_block_table,
    )
    from indoor_nerf_tpu.ops.pallas.tent_contract import tent_contract

    bb = ((-1.5,) * 3, (1.5,) * 3)
    cfg = BlockHashConfig(
        bbox_min=bb[0], bbox_max=bb[1], n_levels=8, n_features_per_level=4,
        log2_rows=13, base_resolution=16, finest_resolution=512,
        block_size=3, gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    F = cfg.n_features_per_level
    N = args.n_points
    M = N * cfg.n_levels

    table = init_block_table(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.4, 1.4, size=(N, 3)), jnp.float32)
    flat_row, p, _ = jax.jit(
        functools.partial(_tile_coords, config=cfg))(pts)
    flat_row = jax.block_until_ready(flat_row)
    p = jax.block_until_ready(p)
    tab_bf = jax.block_until_ready(table.astype(jnp.bfloat16))
    rows_res = jax.block_until_ready(jnp.take(tab_bf, flat_row, axis=0))
    interp = jax.default_backend() != "tpu"

    results = {"config": {"n_points": N, "rows": M,
                          "n_steps": args.n_steps}}

    def timeit(name, fn, *ops):
        @jax.jit
        def run(ops):
            def body(c, _):
                out = fn(*ops, c)
                return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                                length=args.n_steps)
            return c
        float(run(ops))  # compile + drained warm call
        t0 = time.perf_counter()
        float(run(ops))
        dt = (time.perf_counter() - t0) / args.n_steps * 1e3
        results[name] = {"ms": round(dt, 3),
                         "mrows_s": round(M / (dt / 1e3) / 1e6, 1)}
        print(f"{name:16s} {dt:8.3f} ms  {results[name]['mrows_s']:7.1f} "
              f"M rows/s", flush=True)
        # Incremental dump: a Mosaic compile later in the sweep can wedge
        # the chip; completed variants must survive.
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    def bump(t, c):
        return t * (1.0 + c).astype(t.dtype)

    timeit("xla_fused",
           lambda t, c: _gather_interp(bump(t, c), flat_row, p, cfg), table)
    timeit("kernel_only",
           lambda r, pp, c: tent_contract(r, pp + 1e-20 * c, cfg.side, F,
                                          interpret=interp),
           rows_res, p)
    timeit("kernel_fused",
           lambda t, c: tent_contract(
               jnp.take(bump(t, c), flat_row, axis=0), p, cfg.side, F,
               interpret=interp),
           tab_bf)

    # Tuning grid (round 5): chunk size x bf16 output x gather input
    # fusion. Each is a separate Mosaic compile; keep the grid tight.
    for chunk, odt, fuse, red in [
        (2048, "bf16", False, "vpu"),
        (4096, "bf16", False, "vpu"),
        (8192, "bf16", False, "vpu"),
        (4096, "f32", False, "vpu"),
        (4096, "bf16", True, "vpu"),
        (2048, "bf16", False, "mxu"),
        (4096, "bf16", False, "mxu"),
        (4096, "bf16", True, "mxu"),
        (8192, "bf16", False, "mxu"),
    ]:
        od = jnp.bfloat16 if odt == "bf16" else jnp.float32
        timeit(f"k_c{chunk}_{odt}" + ("_fuse" if fuse else "")
               + ("_mxu" if red == "mxu" else ""),
               lambda t, c, chunk=chunk, od=od, fuse=fuse, red=red:
               tent_contract(
                   jnp.take(bump(t, c), flat_row, axis=0), p, cfg.side, F,
                   interpret=interp, chunk=chunk, out_dtype=od,
                   input_fusion=fuse, reduce=red),
               tab_bf)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "config"}))


if __name__ == "__main__":
    main()
