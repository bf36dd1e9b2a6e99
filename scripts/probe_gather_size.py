"""Gather row-rate vs TABLE SIZE on the real chip (serving pass-2 design).

BENCH_NOTES.md records two regimes: sub-100MB tables gather ~120-300M
rows/s, GB-scale tables ~34-50M rows/s. The serving pass-2 voxel-corner
table (256^3 x 256 B = 4.3 GB) sits in the slow regime; geo_resolution
(render/baked.py) can shrink it 8x per halving. This probe maps the
transition so the geo-table resolution choice is measured, not guessed.

Every arm gathers the SAME number of rows (one jit per table size) with
results fed back into a carry (XLA hoists/DCEs device work otherwise —
CLAUDE.md microbenchmark rule).

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/probe_gather_size.py \
    [--rows_m 2.56] [--iters 8] [--out tpu_gather_size.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows_m", type=float, default=2.56,
                    help="gathered rows per iteration, millions (2.56M = "
                         "one 800^2 frame's pass-2 at k_geo=4)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--sizes_mb", default="17,67,134,268,537,1074,2148,4295",
                    help="table sizes to probe, MB (537 = 128^3 corner "
                         "table bf16; 4295 = 256^3)")
    ap.add_argument("--out", default="tpu_gather_size.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    n_rows = int(args.rows_m * 1e6)
    lanes = args.lanes
    dt = jnp.dtype(args.dtype)
    bytes_per_row = lanes * dt.itemsize

    results = {}
    for mb in [float(v) for v in args.sizes_mb.split(",")]:
        table_rows = max(1024, int(mb * 1e6 / bytes_per_row))
        table = jnp.ones((table_rows, lanes), dt)
        key = jax.random.PRNGKey(0)
        idx = jax.random.randint(key, (n_rows,), 0, table_rows, jnp.int32)

        @jax.jit
        def step(carry, idx=idx, table=table):
            # Fold the carry into the indices so each iteration's gather
            # depends on the previous result (no hoisting), and fold the
            # gathered rows back into the carry (no DCE).
            i = (idx + carry.astype(jnp.int32)) % table.shape[0]
            rows = jnp.take(table, i, axis=0)
            return (rows.astype(jnp.float32).sum() * 0.0).astype(jnp.int32)

        carry = jnp.asarray(0, jnp.int32)
        carry = step(carry)  # compile
        jax.block_until_ready(carry)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry = step(carry)
        _ = int(carry)  # actual value transfer closes the timing window
        dt_s = time.perf_counter() - t0
        rate = n_rows * args.iters / dt_s / 1e6
        actual_mb = table_rows * bytes_per_row / 1e6
        results[f"{actual_mb:.0f}MB"] = {
            "table_rows": table_rows, "rows_per_s_m": round(rate, 1),
            "ns_per_row": round(dt_s / (n_rows * args.iters) * 1e9, 2),
            "gb_per_s": round(rate * 1e6 * bytes_per_row / 1e9, 1),
        }
        print(f"{actual_mb:7.0f} MB: {rate:7.1f}M rows/s "
              f"({results[f'{actual_mb:.0f}MB']['ns_per_row']} ns/row)",
              flush=True)
        del table

    with open(args.out, "w") as f:
        json.dump({"rows_per_iter": n_rows, "lanes": lanes,
                   "dtype": args.dtype, "results": results}, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
