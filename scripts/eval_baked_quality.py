"""Deployment-scale quality evaluation of the baked/guided renderers.

Trains the flagship config on the synthetic scene (same protocol as
scripts/bench_convergence.py), bakes a snapshot, then renders HELD-OUT
test views three ways — online field, plain baked march, depth-guided
two-level march — and reports PSNR vs ground truth for each. This is the
serving-quality companion to the FPS numbers in BENCH_NOTES.md: the
guided renderer's speed is only meaningful if its quality matches the
plain baked march on a WELL-TRAINED scene (the unit test asserts it on a
briefly-trained one).

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/eval_baked_quality.py \
           [--iters 1200] [--baked_res 256] [--out baked_quality.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--n_rand", type=int, default=4096)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--baked_res", type=int, default=256)
    ap.add_argument("--baked_geo_res", type=int, default=0)
    ap.add_argument("--n_fine", type=int, default=24)
    ap.add_argument("--k_geo_sweep", type=int, nargs="+", default=[8],
                    help="pass-2 top-k values to evaluate (the guided\n"
                         "renderer fetches geo rows for only the k\n"
                         "highest-weight samples)")
    ap.add_argument("--n_coarse", type=int, default=96)
    ap.add_argument("--guided", type=int, default=4)
    ap.add_argument("--out", default="baked_quality.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.render.baked import (
        bake_field,
        make_baked_image_renderer,
    )
    from indoor_nerf_tpu.render.renderer import (
        RenderConfig,
        make_image_renderer,
    )
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )
    import functools

    scene = make_synthetic_scene(
        n_views=args.views, H=args.res, W=args.res)
    bg = BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=16, log2_rows=13, base_resolution=16,
        finest_resolution=512, block_size=3,
        gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    occ = OccupancyConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        resolution=64, warmup_steps=8, weighting="transmittance",
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=64, n_importance=0,
                      white_bkgd=True, occupancy=occ, n_occ_samples=32)
    cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                      n_rand=args.n_rand, lrate=0.01, tv_loss_weight=0.0)

    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, metrics = step_fn(state, batch, sub)
    train_psnr = float(metrics["psnr"])  # closes the timing window too
    train_s = time.perf_counter() - t0
    print(f"trained {args.iters} iters in {train_s:.1f}s, "
          f"train PSNR {train_psnr:.2f}")

    train_cams = {
        "poses": scene["poses"][scene["i_split"][0]],
        "K": scene["K"], "H": H, "W": W,
        "near": scene["near"], "far": scene["far"],
    }
    baked = bake_field(state["params"], fc, resolution=args.baked_res,
                       table_dtype="bfloat16", train_cameras=train_cams,
                       geo_resolution=args.baked_geo_res)
    float(baked["voxel_geo"].astype("float32").sum())

    online = make_image_renderer(rc.test_mode(), H, W, 4096)
    plain = make_baked_image_renderer(
        baked, H, W, tile_rays=4096, n_samples=128)
    guided_by_k = {
        k: make_baked_image_renderer(
            baked, H, W, tile_rays=4096, n_samples=args.n_fine,
            guided=args.guided, n_coarse=args.n_coarse, k_geo=k)
        for k in args.k_geo_sweep
    }
    guided = guided_by_k[args.k_geo_sweep[0]]

    def psnr(rgb, gt):
        return float(-10 * np.log10(np.mean((np.asarray(rgb) - gt) ** 2)))

    sums = {"online": [], "baked": [], "guided": []}
    for k in args.k_geo_sweep[1:]:
        sums[f"guided_k{k}"] = []
    for i_test in scene["i_split"][2]:
        gt = np.asarray(scene["images"][i_test])
        c2w = np.asarray(scene["poses"][i_test])[:3, :4]
        o = online(state["params"], c2w, scene["K"], scene["near"],
                   scene["far"])
        sums["online"].append(psnr(o["rgb_map"], gt))
        b = plain(c2w, scene["K"], scene["near"], scene["far"])
        sums["baked"].append(psnr(b["rgb_map"], gt))
        g = guided(c2w, scene["K"], scene["near"], scene["far"])
        sums["guided"].append(psnr(g["rgb_map"], gt))
        for k in args.k_geo_sweep[1:]:
            gk = guided_by_k[k](c2w, scene["K"], scene["near"], scene["far"])
            sums[f"guided_k{k}"].append(psnr(gk["rgb_map"], gt))
        print(f"view {i_test}: online {sums['online'][-1]:.2f} "
              f"baked {sums['baked'][-1]:.2f} "
              f"guided {sums['guided'][-1]:.2f}")

    result = {
        "config": {
            "iters": args.iters, "baked_res": args.baked_res,
            "guided": args.guided, "n_fine": args.n_fine,
            "n_coarse": args.n_coarse, "res": args.res,
            "k_geo_sweep": args.k_geo_sweep,
        },
        "train_psnr_db": round(train_psnr, 2),
        "test_psnr_db": {
            k: round(float(np.mean(v)), 2) for k, v in sums.items()
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
