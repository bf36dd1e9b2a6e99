"""One-shot TPU measurement battery. Writes results to a JSON file.

Designed to run as a single background process that exits naturally (never
SIGKILL a process mid-device-work — it wedges the axon tunnel). Each section
is independently try/except'd so one failure doesn't lose the rest.

Usage: PYTHONPATH=. python scripts/tpu_measurements.py [out.json] [sections]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

RESULTS = {}


def section(name):
    def deco(fn):
        def run():
            print(f"=== {name}", flush=True)
            t0 = time.perf_counter()
            try:
                RESULTS[name] = fn()
                RESULTS[name]["_seconds"] = round(time.perf_counter() - t0, 1)
                print(f"    ok in {RESULTS[name]['_seconds']}s", flush=True)
            except Exception as e:
                RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
                traceback.print_exc()
        run.section_name = name
        return run
    return deco


def _timed(fn, *args, iters=4):
    import jax

    # Close timing with a real value transfer: block_until_ready can return
    # early over the axon tunnel (see CLAUDE.md).
    r = fn(*args)
    jax.device_get(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters * 1e3


@section("memory_layout_probe")
def probe_layout():
    """Does XLA physically pad narrow trailing dims on TPU HBM arrays?"""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.memory_stats() is None:
        return {"note": "memory_stats unavailable on this backend"}

    def live_mb():
        return dev.memory_stats()["bytes_in_use"] / 2**20

    out = {}
    base = live_mb()
    a = jax.device_put(jnp.zeros((1 << 23, 2), jnp.float32))  # 64MB logical
    jax.block_until_ready(a)
    out["narrow_8M_x2_mb"] = round(live_mb() - base, 1)
    del a
    b = jax.device_put(jnp.zeros((1 << 17, 128), jnp.float32))  # 64MB logical
    jax.block_until_ready(b)
    out["wide_128k_x128_mb"] = round(live_mb() - out["narrow_8M_x2_mb"] - base, 1)
    del b
    return out


@section("encode_block")
def encode_block():
    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.ops.blockhash import (
        BlockHashConfig, block_hash_encode, init_block_table,
    )

    cfg = BlockHashConfig(bbox_min=(-1.5,) * 3, bbox_max=(1.5,) * 3,
                          n_levels=16, log2_rows=12,
                          base_resolution=16, finest_resolution=512)
    table = init_block_table(jax.random.PRNGKey(1), cfg)
    N = 1024 * 192
    x = jax.random.uniform(jax.random.PRNGKey(3), (N, 3), minval=-1.45,
                           maxval=1.45)

    @jax.jit
    def fwd(x, acc):
        f = block_hash_encode(x, table, cfg)[0]
        s = f.sum()
        return x + 1e-18 * s, acc + s

    @jax.jit
    def bwd(t, x):
        g = jax.grad(lambda t: block_hash_encode(x, t, cfg)[0].sum())(t)
        return t + 1e-20 * g, x + 1e-18 * g.sum()

    fwd_ms = _timed(lambda: fwd(x, 0.0))
    bwd_ms = _timed(lambda: bwd(table, x))
    return {"n_points": N, "fwd_ms": round(fwd_ms, 2),
            "fwd_bwd_ms": round(bwd_ms, 2)}


@section("encode_exact")
def encode_exact():
    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.ops.encoding import (
        HashGridConfig, hash_encode, init_hash_table,
    )

    cfg = HashGridConfig(bbox_min=(-1.5,) * 3, bbox_max=(1.5,) * 3,
                         n_levels=16, log2_hashmap_size=19,
                         base_resolution=16, finest_resolution=512)
    table = init_hash_table(jax.random.PRNGKey(1), cfg)
    N = 1024 * 192
    x = jax.random.uniform(jax.random.PRNGKey(3), (N, 3), minval=-1.45,
                           maxval=1.45)

    @jax.jit
    def fwd(x, acc):
        f = hash_encode(x, table, cfg)[0]
        s = f.sum()
        return x + 1e-18 * s, acc + s

    @jax.jit
    def bwd(t, x):
        g = jax.grad(lambda t: hash_encode(x, t, cfg)[0].sum())(t)
        return t + 1e-20 * g, x + 1e-18 * g.sum()

    fwd_ms = _timed(lambda: fwd(x, 0.0), iters=3)
    bwd_ms = _timed(lambda: bwd(table, x), iters=3)
    return {"n_points": N, "fwd_ms": round(fwd_ms, 2),
            "fwd_bwd_ms": round(bwd_ms, 2)}


def _train_setup(i_embed, use_occ, n_rand=1024, bbox=1.5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import TrainConfig, init_train_state

    bb = ((-bbox,) * 3, (bbox,) * 3)
    grid = block_grid = None
    if i_embed == 1:
        grid = HashGridConfig(bbox_min=bb[0], bbox_max=bb[1], n_levels=16,
                              log2_hashmap_size=19, base_resolution=16,
                              finest_resolution=512)
    else:
        block_grid = BlockHashConfig(bbox_min=bb[0], bbox_max=bb[1],
                                     n_levels=16, log2_rows=12,
                                     base_resolution=16, finest_resolution=512)
    occupancy = None
    n_importance = 128
    if use_occ:
        occupancy = OccupancyConfig(bbox_min=bb[0], bbox_max=bb[1],
                                    resolution=64, warmup_steps=8)
        n_importance = 0
    fc = FieldConfig(grid=grid, block_grid=block_grid, i_embed=i_embed,
                     n_importance=n_importance)
    rc = RenderConfig(field=fc, n_samples=64, n_importance=n_importance,
                      white_bkgd=True, occupancy=occupancy, n_occ_samples=64)
    cfg = TrainConfig(render=rc, near=2.0, far=6.0, n_rand=n_rand)
    state = init_train_state(jax.random.PRNGKey(0), cfg)

    # Rays that actually traverse the scene bbox (honest gather load):
    # cameras at radius 4 aimed at random points inside the box.
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rand, 3))
    o = 4.0 * d / np.linalg.norm(d, axis=-1, keepdims=True)
    aim = rng.uniform(-bbox, bbox, size=(n_rand, 3))
    dirs = aim - o
    batch = {
        "rays_o": jnp.asarray(o, jnp.float32),
        "rays_d": jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1,
                                                    keepdims=True)),
        "target": jnp.asarray(rng.uniform(size=(n_rand, 3)), jnp.float32),
    }
    return cfg, state, batch


def _bench_train(i_embed, use_occ, n_rand=1024, iters=8):
    import functools

    import jax

    from indoor_nerf_tpu.train.step import train_step

    cfg, state, batch = _train_setup(i_embed, use_occ, n_rand)
    step = jax.jit(functools.partial(train_step, config=cfg))
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
    dt = None
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return {
        "n_rand": n_rand,
        "step_ms": round(dt * 1e3, 2),
        "rays_per_sec": round(n_rand / dt, 0),
        "loss_finite": bool(float(m["loss"]) == float(m["loss"])),
    }


@section("train_exact_hier")
def train_exact_hier():
    return _bench_train(1, False)


@section("train_exact_occ")
def train_exact_occ():
    return _bench_train(1, True)


@section("train_block_hier")
def train_block_hier():
    return _bench_train(3, False)


@section("train_block_occ")
def train_block_occ():
    return _bench_train(3, True)


@section("train_block_occ_4096")
def train_block_occ_4096():
    return _bench_train(3, True, n_rand=4096)


@section("train_exact_occ_4096")
def train_exact_occ_4096():
    return _bench_train(1, True, n_rand=4096)


@section("quality_compare")
def quality_compare():
    """400-step synthetic-scene training PSNR for each encoder/sampling mode."""
    import functools

    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import (
        TrainConfig, init_train_state, train_step,
    )

    scene = make_synthetic_scene(n_views=12, H=64, W=64)
    H, W, _ = scene["hwf"]
    out = {}
    for name, i_embed, use_occ in [
        ("exact_hier", 1, False), ("block_hier", 3, False),
        ("exact_occ", 1, True), ("block_occ", 3, True),
    ]:
        grid = block_grid = None
        if i_embed == 1:
            grid = HashGridConfig(bbox_min=scene["bbox_min"],
                                  bbox_max=scene["bbox_max"], n_levels=16,
                                  log2_hashmap_size=15, base_resolution=16,
                                  finest_resolution=256)
        else:
            block_grid = BlockHashConfig(bbox_min=scene["bbox_min"],
                                         bbox_max=scene["bbox_max"],
                                         n_levels=16, log2_rows=8,
                                         base_resolution=16,
                                         finest_resolution=256)
        occupancy = None
        n_importance = 64
        if use_occ:
            occupancy = OccupancyConfig(bbox_min=scene["bbox_min"],
                                        bbox_max=scene["bbox_max"],
                                        resolution=64, warmup_steps=64)
            n_importance = 0
        fc = FieldConfig(grid=grid, block_grid=block_grid, i_embed=i_embed,
                         n_importance=n_importance)
        rc = RenderConfig(field=fc, n_samples=64, n_importance=n_importance,
                          white_bkgd=True, occupancy=occupancy,
                          n_occ_samples=48)
        cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                          n_rand=1024)
        sampler = BatchedRaySampler(scene["images"], scene["poses"],
                                    scene["i_split"][0], H, W, scene["K"],
                                    cfg.n_rand)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(functools.partial(train_step, config=cfg))
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        psnr = None
        for i in range(400):
            key, sub = jax.random.split(key)
            batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
            state, m = step(state, batch, sub)
        psnr = float(m["psnr"])
        out[name] = {"psnr_400_steps": round(psnr, 2),
                     "wall_s": round(time.perf_counter() - t0, 1)}
        print(f"    {name}: {out[name]}", flush=True)
    return out


ALL = [probe_layout, encode_block, encode_exact, train_exact_hier,
       train_exact_occ, train_block_hier, train_block_occ,
       train_block_occ_4096, train_exact_occ_4096, quality_compare]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tpu_measurements.json"
    wanted = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for fn in ALL:
        if wanted and fn.section_name not in wanted:
            continue
        fn()
        with open(out_path, "w") as f:
            json.dump(RESULTS, f, indent=2)
    print(json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
