"""Benchmark: training-step ray throughput on the flagship (chair) config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches the reference blender-chair run (configs/chair.txt +
create_nerf defaults): N_rand=1024 rays, 64 coarse + 128 importance samples,
16-level hash grid, 2^19 tables, finest_res 512, NeRFSmall, RAdam.

Baseline: the reference's inherited HashNeRF claim — 5k iterations in ~10min
on a GTX 1050 Ti at N_rand=1024 (reference: PocketNeRF/README.md:19) —
i.e. ~8.5k rays/s. The reference publishes no other throughput number
(BASELINE.md); the north star asks for >=10x reference rays/sec.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 5000 * 1024 / 600.0  # ~8533 rays/s (GTX 1050 Ti claim)


def main():
    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig
    from indoor_nerf_tpu.parallel.shard import (
        make_mesh,
        make_sharded_train_step,
        replicate_state,
    )
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import TrainConfig, init_train_state

    n_rand = 1024
    scene = make_synthetic_scene(n_views=8, H=64, W=64)
    grid = HashGridConfig(
        bbox_min=scene["bbox_min"],
        bbox_max=scene["bbox_max"],
        n_levels=16,
        log2_hashmap_size=19,
        base_resolution=16,
        finest_resolution=512,
    )
    fc = FieldConfig(grid=grid, n_importance=128)
    rc = RenderConfig(field=fc, n_samples=64, n_importance=128, white_bkgd=True)
    cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                      n_rand=n_rand, tv_loss_weight=1e-6)

    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], n_rand,
    )

    n_chips = len(jax.devices())
    mesh = make_mesh()
    state = replicate_state(init_train_state(jax.random.PRNGKey(0), cfg), mesh)
    step = make_sharded_train_step(cfg, mesh)

    batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
    key = jax.random.PRNGKey(1)

    # Warmup: compile + 3 steps.
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    jax.block_until_ready(metrics["loss"])

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = n_rand * n_steps / dt
    rays_per_sec_per_chip = rays_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec_per_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec_per_chip / BASELINE_RAYS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
