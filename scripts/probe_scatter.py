"""Careful scatter-add microprobe (wedge-averse: start SMALL, scale up).

Measures ms/iter of a [n_rows, width] scatter-add into a [table_rows, width]
table at a given dtype. Timing window closed with float() per the axon rule.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/probe_scatter.py \
           --rows 500000 --dtype bfloat16 [--width 256] [--iters 3]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--table_rows", type=int, default=65536)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, args.table_rows, size=(args.rows,)),
        jnp.int32,
    )
    cot = jnp.ones((args.rows, args.width), dt)

    @jax.jit
    def f(cot, idx):
        def body(carry, _):
            acc, c = carry
            g = jnp.zeros((args.table_rows, args.width), dt).at[idx].add(c)
            s = g.astype(jnp.float32).sum()
            # fold s back into the carried cotangent so the scan can't hoist
            return (acc + s, c + (s * 0).astype(dt)), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros(()), cot), None, length=args.iters
        )
        return acc

    t0 = time.perf_counter()
    out = f(cot, idx)
    v = float(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(f(cot, idx))
    dt_ms = (time.perf_counter() - t0) / args.iters * 1000.0
    gb = args.rows * args.width * (2 if args.dtype == "bfloat16" else 4) / 1e9
    print(
        f"rows={args.rows} width={args.width} dtype={args.dtype}: "
        f"{dt_ms:.1f} ms/iter ({gb / (dt_ms / 1e3):.1f} GB/s input), "
        f"compile {compile_s:.1f}s, check={v:.3g}"
    )


if __name__ == "__main__":
    main()
