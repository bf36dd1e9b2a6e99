"""Benchmark: training-step ray throughput on the flagship TPU-native config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the full jitted train step (render -> loss -> RAdam update) at
chair-scale settings (16-level grid with a 2^19-entry/level parameter
budget, finest_res 512, 64 samples/ray, N_rand 4096) on rays that actually
traverse the scene bbox — gather loads are the TPU bottleneck and
out-of-bbox rays would flatter the number. The flagship configuration is
the TPU-native one: block-hash encoding (--i_embed 3) + occupancy-guided
sampling (--use_occupancy).

Baseline anchor (the denominator of ``vs_baseline``): the reference's
inherited HashNeRF claim — 5k iterations in ~10 min on a GTX 1050 Ti at
N_rand=1024 (reference: PocketNeRF/README.md:19) — i.e. ~8533 rays/s. The
reference publishes no other throughput number; every "NX baseline"
multiplier quoted in this repo is against this 1050-Ti anchor. A second,
same-chip yardstick: the faithful NGP-layout parity path (16x2 levels,
hierarchical 64+128 sampling) measures ~359 rays/s/chip on this v5e
(tpu_measurements.json train_exact_hier), so the round-3 flagship record
of 90.7k rays/s/chip (BENCH_r03.json) is ~253x the faithful port — the
XLA gather/scatter-rate wall the block-hash layout exists to beat.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 5000 * 1024 / 600.0  # ~8533 rays/s (GTX 1050 Ti claim)


def main():
    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.parallel.shard import (
        make_mesh,
        make_sharded_train_step,
        replicate_state,
    )
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import TrainConfig, init_train_state

    n_rand = 4096
    bbox = 1.5
    bb = ((-bbox,) * 3, (bbox,) * 3)
    # Flagship layout: 64-vertex (4^3 halo'd) tiles — one 1 KiB f32 row per
    # (point, level) — with bfloat16 table IO on both the row gather and the
    # fused scatter backward. Level geometry is 8 levels x 4 features: at an
    # EQUAL float budget to the 16x2 layout (2^24 floats either way), halving
    # the level count halves the scatter-transaction count per sample — the
    # measured backward wall (~59M rows/s regardless of row bytes,
    # tpu_probe_bwd.json) — while doubling the row width rides the same
    # gather/scatter transactions. Measured quality-NEUTRAL at convergence
    # over 5 paired seeds (mean held-out delta +0.08 dB, mixed sign, within
    # the +/-0.7 dB seed floor; tpu_level_geometry_seeds.json) and 1.29x
    # faster end-to-end (85.6k vs 69.6k rays/s in the convergence harness;
    # step-level probe 91.1k vs 66.5k, tpu_level_geometry.json).
    block_grid = BlockHashConfig(
        bbox_min=bb[0], bbox_max=bb[1], n_levels=8, n_features_per_level=4,
        log2_rows=13, base_resolution=16, finest_resolution=512,
        block_size=3, gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    occupancy = OccupancyConfig(
        bbox_min=bb[0], bbox_max=bb[1], resolution=64, warmup_steps=8,
        weighting="transmittance",
    )
    fc = FieldConfig(block_grid=block_grid, i_embed=3, n_importance=0)
    # 32 transmittance-weighted occupancy samples/ray: the VALIDATED
    # flagship protocol — candidate depths are weighted by T*alpha
    # compositing of the occupancy grid's densities (ops/occupancy.py)
    # instead of raw density, which concentrates the per-ray query budget
    # on the visible surface. The 1200-iter convergence regression at
    # exactly these settings BEATS the previous 48-sample/density-weighted
    # records on both axes (45.0 dB train / 25.76 dB held-out vs
    # 43.68/24.74 — convergence_tpu_transw32.json vs
    # convergence_tpu_stratu.json) at 1.47x the throughput. The
    # configs/*_tpu.txt presets ship the same settings.
    rc = RenderConfig(field=fc, n_samples=64, n_importance=0,
                      white_bkgd=True, occupancy=occupancy, n_occ_samples=32)
    cfg = TrainConfig(render=rc, near=2.0, far=6.0, n_rand=n_rand)

    # Rays that traverse the bbox: cameras on a radius-4 shell aimed at
    # random interior points.
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

    n_chips = len(jax.devices())
    mesh = make_mesh()
    state = replicate_state(init_train_state(jax.random.PRNGKey(0), cfg), mesh)

    # Time a DEVICE-SIDE scan of steps: per-call timing over the axon tunnel
    # under-reports (completion can be signaled before remote execution
    # drains), so the whole measured window is one compiled program.
    from indoor_nerf_tpu.train.step import train_step

    n_steps = 30

    @jax.jit
    def run_steps(state, batch, key):
        def body(carry, k):
            st, _ = carry
            st, metrics = train_step(st, batch, k, cfg)
            return (st, metrics["loss"]), None

        keys = jax.random.split(key, n_steps)
        (st, loss), _ = jax.lax.scan(body, (state, jnp.zeros(())), keys)
        return st, loss

    # NOTE: timings are closed by float(loss) — an actual value transfer —
    # because jax.block_until_ready can return early through the axon
    # remote-TPU tunnel and silently under-report.
    state, loss = run_steps(state, batch, jax.random.PRNGKey(1))  # compile
    float(loss)

    t0 = time.perf_counter()
    state, loss = run_steps(state, batch, jax.random.PRNGKey(2))
    float(loss)
    dt = time.perf_counter() - t0

    rays_per_sec_per_chip = n_rand * n_steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec_per_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(
                    rays_per_sec_per_chip / BASELINE_RAYS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
