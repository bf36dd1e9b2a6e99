"""Benchmark the Pallas VMEM-accumulation table scatter vs XLA scatter-add.

Reproduces the BENCH_NOTES.md round-2 scatter table at the flagship
backward shapes (4.19M bf16 cotangent rows into a [131072, 128] table):
pipelined-dispatch timing (N async calls closed by one value transfer
each — block_until_ready alone under-reports through the axon tunnel).

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/bench_table_scatter.py \
           [--points 262144] [--levels 16] [--log2_rows 13] [--reps 6]

WEDGE WARNINGS (measured 2026-08-17, see table_scatter.py docstrings):
do NOT pass --banks 2 on TPU, and keep table_scatter._UNROLL at 1.
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=262144)
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--log2_rows", type=int, default=13)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--chunks", type=str, default="2048,8192")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.ops.pallas.table_scatter import (
        scatter_add_table,
        scatter_add_table_xla,
    )

    L, R, W, N = (args.levels, 1 << args.log2_rows, args.width, args.points)
    M = N * L
    rng = np.random.default_rng(0)
    cot = jnp.asarray(
        rng.normal(size=(M, W)).astype(np.float32)
    ).astype(jnp.bfloat16)
    flat = jnp.asarray(
        (rng.integers(0, R, size=(N, L)) + np.arange(L)[None, :] * R)
        .reshape(-1).astype(np.int32)
    )

    def ptime(fn, name):
        out = fn(cot, flat)
        jax.block_until_ready(out)
        float(out.sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(cot, flat) for _ in range(args.reps)]
            _ = sum(float(o[0, 0]) for o in outs)
            ts.append((time.perf_counter() - t0) / args.reps)
        t = min(ts)
        print(f"{name:30s} {t*1e3:7.1f} ms  ({M/t/1e6:6.1f}M rows/s)",
              flush=True)

    ptime(lambda c, f: scatter_add_table_xla(c, f, L, R), "XLA scatter-add")
    for chunk in (int(v) for v in args.chunks.split(",")):
        ptime(
            lambda c, f, ch=chunk: scatter_add_table(c, f, L, R, chunk=ch),
            f"pallas rowrmw chunk={chunk}",
        )


if __name__ == "__main__":
    main()
