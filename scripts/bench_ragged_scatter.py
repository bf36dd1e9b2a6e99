"""Grouped-backward scatter shoot-out: production single kernel (all rows)
vs the ragged level-major kernel (G-merged row counts), at the exact
flagship 48-sample shapes.

The class-split grouped backward lost to the ungrouped one despite 31%
fewer rows (tpu_probe_grouped_*.json — three per-class pallas_calls); the
ragged kernel does all levels in ONE call. This measures whether the
merged row stream actually buys kernel time. Pipelined-dispatch timing
(bench_table_scatter.py protocol).

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/bench_ragged_scatter.py \
    [--reps 6] [--groups 4,4,4,4,2,2,2,2,1,1,1,1,1,1,1,1]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=196608)
    ap.add_argument("--log2_rows", type=int, default=13)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--groups", type=str,
                    default="4,4,4,4,2,2,2,2,1,1,1,1,1,1,1,1")
    ap.add_argument("--out", type=str, default="tpu_ragged_scatter.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.ops.pallas.table_scatter import (
        scatter_add_table,
        scatter_add_table_ragged,
    )

    groups = tuple(int(v) for v in args.groups.split(","))
    L, R, W, N = len(groups), 1 << args.log2_rows, args.width, args.points
    rng = np.random.default_rng(0)
    results = {}

    def ptime(fn, ops, name, m_rows):
        out = fn(*ops)
        jax.block_until_ready(out)
        float(out.sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*ops) for _ in range(args.reps)]
            _ = sum(float(o[0, 0]) for o in outs)
            ts.append((time.perf_counter() - t0) / args.reps)
        t = min(ts)
        results[name] = round(t * 1e3, 2)
        print(f"{name:28s} {t*1e3:7.1f} ms  ({m_rows/t/1e6:6.1f}M rows/s)",
              flush=True)

    # Realistic run structure along rays: consecutive samples repeat rows
    # at coarse levels. Approximate with sorted-random runs per level.
    def level_rows_realistic(n_rows, lv):
        # mean run length shrinks with level (8/6/5/... -> 1)
        run = max(1, int(round(8 / (1.35 ** lv))))
        n_distinct = max(1, n_rows // run)
        base = rng.integers(0, R, size=(n_distinct,))
        return np.repeat(base, run)[:n_rows].astype(np.int32)

    # (a) production kernel: ALL 16 levels x N rows, level-minor layout.
    flat = np.empty((N, L), np.int32)
    for lv in range(L):
        flat[:, lv] = level_rows_realistic(N, lv) + lv * R
    flat_j = jnp.asarray(flat.reshape(-1))
    cot_full = jnp.asarray(
        rng.normal(size=(N * L, W)).astype(np.float32)).astype(jnp.bfloat16)
    ptime(
        lambda c, f: scatter_add_table(c, f, L, R),
        (cot_full, flat_j), "single_kernel_all_rows", N * L,
    )

    # (b) ragged kernel: level-major stream with N/G_l rows per level.
    lvl_counts = tuple(N // g for g in groups)
    streams, locals_ = [], []
    for lv, n_l in enumerate(lvl_counts):
        locals_.append(level_rows_realistic(n_l, lv))
        streams.append(
            rng.normal(size=(n_l, W)).astype(np.float32))
    cot_r = jnp.asarray(np.concatenate(streams, 0)).astype(jnp.bfloat16)
    loc_r = jnp.asarray(np.concatenate(locals_, 0))
    m_r = sum(lvl_counts)
    ptime(
        lambda c, f: scatter_add_table_ragged(c, f, lvl_counts, R),
        (cot_r, loc_r), "ragged_kernel_merged_rows", m_r,
    )

    results["_config"] = {
        "points": N, "levels": L, "groups": args.groups,
        "rows_full": N * L, "rows_merged": m_r,
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
