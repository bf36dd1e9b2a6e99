"""A-CAQ quantization experiment on the flagship config.

The reference's second contribution (README.md:43) is Adversarial
Content-Aware Quantization: learned per-component bitwidths adjusted by a
heuristic controller toward a loss target, trading model size for
quality. This measures it end to end on the flagship TPU config: train
the synthetic scene with (a) no quantization, (b) fixed 8-bit
quantization, (c) A-CAQ with the controller, and report final train
PSNR, held-out test PSNR, average bitwidths, and the implied table size.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/acaq_experiment.py \
           [--iters 1200] [--out acaq_experiment.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--n_rand", type=int, default=4096)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--acaq_start", type=int, default=300)
    ap.add_argument("--mdl_tolerance", type=float, default=1.0,
                    help="MDL loss-inflation tolerance for the acaq arm "
                         "(reference hard-codes 1.2 = ~1 dB accepted cost)")
    ap.add_argument("--modes", default="fp,fixed8,acaq",
                    help="comma list of arms to run (training is same-seed "
                         "deterministic, so arms are reusable across runs)")
    ap.add_argument("--trace", type=int, default=0,
                    help="if >0, record avg bits + controller signals "
                         "every N iters (quantized arms)")
    ap.add_argument("--out", default="acaq_experiment.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.losses.quantization import QuantConfig
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.render.renderer import (
        RenderConfig,
        make_image_renderer,
    )
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    scene = make_synthetic_scene(n_views=args.views, H=args.res, W=args.res)
    H, W, _ = scene["hwf"]

    def run(mode: str):
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
        use_q = mode != "fp"
        fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0,
                         use_quantization=use_q,
                         quant=QuantConfig(warmup_steps=100,
                                           mdl_tolerance=args.mdl_tolerance))
        rc = RenderConfig(field=fc, n_samples=64, n_importance=0,
                          white_bkgd=True, occupancy=occ, n_occ_samples=32)
        cfg = TrainConfig(
            render=rc, near=scene["near"], far=scene["far"],
            n_rand=args.n_rand, lrate=0.01, tv_loss_weight=0.0,
            use_acaq=(mode == "acaq"),
            acaq_start_iter=args.acaq_start,
        )
        sampler = BatchedRaySampler(
            scene["images"], scene["poses"], scene["i_split"][0],
            H, W, scene["K"], cfg.n_rand,
        )
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        step_fn = jax.jit(functools.partial(train_step, config=cfg))
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        trace = []
        for i in range(args.iters):
            key, sub = jax.random.split(key)
            batch = {k: jnp.asarray(v)
                     for k, v in sampler.next().items()}
            state, metrics = step_fn(state, batch, sub)
            if args.trace and use_q and (i + 1) % args.trace == 0:
                sb = np.asarray(state["quant"]["embed"]["soft_bits"])
                row = {
                    "iter": i + 1,
                    "avg_bits": round(float(np.mean(sb)), 2),
                    "embed_bits_min": round(float(np.min(sb)), 2),
                    "embed_bits_max": round(float(np.max(sb)), 2),
                    "act_bits": round(float(np.mean(np.asarray(
                        state["quant"]["act"]["soft_bits"]))), 2),
                    "weight_bits": round(float(np.asarray(
                        state["quant"]["weight"]["soft_bits"])), 2),
                    "loss_ema": float(state["loss_ema"]),
                    "best_loss": float(state["best_loss"]),
                    "dev_ema": float(state.get(
                        "infl_ema", jnp.asarray(jnp.nan))),
                }
                row["trend"] = round(
                    row["loss_ema"] / max(float(state.get(
                        "loss_ema_slow", jnp.asarray(jnp.inf))), 1e-30), 4)
                trace.append(row)
                print(f"  it{i+1} bits {row['avg_bits']:.2f} "
                      f"dev {row['dev_ema']:.4f} trend {row['trend']:.4f}",
                      flush=True)
        train_psnr = float(metrics["psnr"])
        wall = time.perf_counter() - t0

        render = make_image_renderer(rc.test_mode(), H, W, 4096)
        psnrs = []
        for i_test in scene["i_split"][2]:
            gt = np.asarray(scene["images"][i_test])
            c2w = np.asarray(scene["poses"][i_test])[:3, :4]
            out = render(state["params"], c2w, scene["K"], scene["near"],
                         scene["far"], quant_state=state["quant"])
            psnrs.append(float(-10 * np.log10(
                np.mean((np.asarray(out["rgb_map"]) - gt) ** 2))))
        test_psnr = float(np.mean(psnrs))

        bits = None
        table_mb = None
        if use_q and state["quant"] is not None:
            sb = np.asarray(state["quant"]["embed"]["soft_bits"], np.float64)
            bits = float(np.mean(np.round(sb)))
            n_entries = bg.n_levels * bg.rows_per_level * 128
            table_mb = round(n_entries * bits / 8 / 1e6, 1)
        print(f"{mode}: train {train_psnr:.2f} test {test_psnr:.2f} "
              f"avg_bits {bits} table {table_mb} MB ({wall:.0f}s)",
              flush=True)
        out = {"train_psnr": round(train_psnr, 2),
               "test_psnr": round(test_psnr, 2),
               "avg_embed_bits": bits, "table_mb": table_mb,
               "wall_s": round(wall, 1)}
        if trace:
            out["trace"] = trace
        return out

    result = {"config": vars(args)}
    for mode in args.modes.split(","):
        result[mode] = run(mode)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
