"""Probe: train-step throughput vs grid level geometry (L levels x F feats).

The encode is row-transaction bound in both directions (BENCH_NOTES.md):
rows scale with L, and row WIDTH is nearly free (gathers are row-rate bound
up to ~128+ lanes; the Pallas scatter's serial RMW is per-row). So fewer
levels x more features at EQUAL parameter budget and equal resolution span
attacks the fine-level distinct-row wall directly — the one number the
round-2 roofline left standing. This measures the bench.py protocol
(4096 rays x 32 transmittance-weighted occupancy samples) across (L, F)
arms at a constant float budget.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/probe_level_geometry.py \
    [--arms 16x2,8x4,8x2] [--out tpu_level_geometry.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=str, default="16x2,8x4,8x2,4x8")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", type=str, default="tpu_level_geometry.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    n_rand = 4096
    bbox = 1.5
    bb = ((-bbox,) * 3, (bbox,) * 3)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rand, 3))
    o = 4.0 * d / np.linalg.norm(d, axis=-1, keepdims=True)
    aim = rng.uniform(-bbox, bbox, size=(n_rand, 3))
    dirs = aim - o
    batch = {
        "rays_o": jnp.asarray(o, jnp.float32),
        "rays_d": jnp.asarray(
            dirs / np.linalg.norm(dirs, axis=-1, keepdims=True), jnp.float32
        ),
        "target": jnp.asarray(rng.uniform(size=(n_rand, 3)), jnp.float32),
    }

    results = {}
    for arm in args.arms.split(","):
        L, F = (int(v) for v in arm.strip().split("x"))
        # Equal float budget vs the 16x2/log2_rows-13 flagship:
        # floats = L * R * F * 64  =>  R scales by 32/(L*F).
        lf_shift = int(round(np.log2((L * F) / 32.0)))
        log2_rows = 13 - lf_shift
        block_grid = BlockHashConfig(
            bbox_min=bb[0], bbox_max=bb[1], n_levels=L,
            n_features_per_level=F, log2_rows=log2_rows,
            base_resolution=16, finest_resolution=512,
            block_size=3, gather_dtype="bfloat16", scatter_dtype="bfloat16",
        )
        occupancy = OccupancyConfig(
            bbox_min=bb[0], bbox_max=bb[1], resolution=64, warmup_steps=8,
            weighting="transmittance",
        )
        fc = FieldConfig(block_grid=block_grid, i_embed=3, n_importance=0)
        rc = RenderConfig(field=fc, n_samples=64, n_importance=0,
                          white_bkgd=True, occupancy=occupancy,
                          n_occ_samples=32)
        cfg = TrainConfig(render=rc, near=2.0, far=6.0, n_rand=n_rand)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        n_floats = int(np.prod(state["params"]["table"].shape))

        n_steps = args.steps

        @jax.jit
        def run_steps(state, batch, key, cfg=cfg):
            def body(carry, k):
                st, _ = carry
                st, metrics = train_step(st, batch, k, cfg)
                return (st, metrics["loss"]), None

            keys = jax.random.split(key, n_steps)
            (st, loss), _ = jax.lax.scan(body, (state, jnp.zeros(())), keys)
            return st, loss

        st, loss = run_steps(state, batch, jax.random.PRNGKey(1))
        float(loss)  # close the window with a real transfer (CLAUDE.md)
        t0 = time.perf_counter()
        st, loss = run_steps(state, batch, jax.random.PRNGKey(2))
        float(loss)
        dt = time.perf_counter() - t0
        step_ms = dt / n_steps * 1e3
        rays = n_rand * n_steps / dt
        results[arm] = {
            "n_levels": L, "feats": F, "log2_rows": log2_rows,
            "table_floats": n_floats, "step_ms": round(step_ms, 2),
            "rays_per_sec": round(rays, 1),
        }
        print(f"{arm}: log2_rows={log2_rows} table={n_floats/1e6:.1f}M "
              f"floats step={step_ms:.1f} ms {rays/1e3:.1f}k rays/s")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
