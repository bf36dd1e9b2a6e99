"""Time-to-PSNR convergence benchmark (the north-star metric machinery).

Trains the built-in synthetic scene (or any --config scene) and reports the
reference's milestone metrics: time/iterations to {15,20,25,30,35} dB train
PSNR, steps/sec and rays/sec (BASELINE.md machinery; reference
run_nerf.py:1305-1327).

BOTH quality curves are emitted (VERDICT round-1 item 10): the train-PSNR
milestone track (what the reference tracks — an on-distribution fit
number that saturates into overfitting on small view sets) and a HELD-OUT
track evaluated every --eval_every steps on a fixed ray subset of the
test views. Headline numbers quoted from this harness must say which
curve they come from.

Usage:
  python scripts/bench_convergence.py [--iters 2000] [--i_embed 1|3]
      [--use_occupancy] [--n_rand 4096] [--eval_every 100]
      [--out metrics.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--n_rand", type=int, default=4096)
    ap.add_argument("--i_embed", type=int, default=1)
    ap.add_argument("--use_occupancy", action="store_true")
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--n_importance", type=int, default=128)
    ap.add_argument("--occ_samples", type=int, default=64)
    ap.add_argument("--occ_weighting", default="density",
                    choices=["density", "transmittance"])
    ap.add_argument("--occ_resolution", type=int, default=64)
    ap.add_argument("--occ_update_interval", type=int, default=16)
    ap.add_argument("--occ_candidates", type=int, default=128)
    ap.add_argument("--distortion_loss_weight", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0,
                    help="base PRNG seed (init = seed, train = seed + 1)")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="Polyak EMA of params; held-out eval then uses "
                         "the averaged weights (train/step.py extension)")
    ap.add_argument("--block_io", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--block_size", type=int, default=4, choices=[4, 3])
    ap.add_argument("--ray_strides", type=str, default=None,
                    help="per-level ray-axis strides, comma list "
                         "(e.g. 4,4,4,4,2,2,2,2,1,1,1,1,1,1,1,1)")
    ap.add_argument("--ray_groups", type=str, default=None,
                    help="per-level sample-group sizes, comma list — "
                         "shared-tile exact grouping (blockhash.py)")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--scene", default="sphere", choices=["sphere", "room"],
                    help="held-out protocol scene: the checker-sphere "
                         "orbit or the Manhattan room (diversifies the "
                         "quality protocol beyond one scene)")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--n_levels", type=int, default=16)
    ap.add_argument("--feats_per_level", type=int, default=2,
                    help="with --n_levels: level geometry at EQUAL float "
                         "budget (rows rescale by 32/(L*F) vs the 16x2 "
                         "reference geometry)")
    ap.add_argument("--eval_every", type=int, default=100,
                    help="held-out PSNR eval cadence (0 disables)")
    ap.add_argument("--eval_rays", type=int, default=8192,
                    help="fixed held-out ray subset size")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import (
        make_room_scene,
        make_synthetic_scene,
    )
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.parallel.shard import (
        make_mesh, make_sharded_train_step, replicate_state,
    )
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import TrainConfig, init_train_state

    if args.scene == "room":
        scene = make_room_scene(n_views=args.views, H=args.res, W=args.res)
    else:
        scene = make_synthetic_scene(n_views=args.views, H=args.res,
                                     W=args.res)
    grid = block_grid = None
    if args.i_embed == 1:
        grid = HashGridConfig(
            bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
            n_levels=16, log2_hashmap_size=19,
            base_resolution=16, finest_resolution=512,
        )
    else:
        lf_shift = int(round(np.log2(
            (args.n_levels * args.feats_per_level) / 32.0)))
        block_grid = BlockHashConfig(
            bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
            n_levels=args.n_levels,
            n_features_per_level=args.feats_per_level,
            log2_rows=(12 if args.block_size == 4 else 13) - lf_shift,
            base_resolution=16, finest_resolution=512,
            gather_dtype="bfloat16" if args.block_io == "bf16" else "float32",
            scatter_dtype="bfloat16" if args.block_io == "bf16" else "float32",
            block_size=args.block_size,
            ray_strides=(tuple(int(v) for v in args.ray_strides.split(","))
                         if args.ray_strides else None),
            ray_groups=(tuple(int(v) for v in args.ray_groups.split(","))
                        if args.ray_groups else None),
        )
    occupancy = None
    n_importance = args.n_importance
    if args.use_occupancy:
        occupancy = OccupancyConfig(
            bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
            resolution=args.occ_resolution,
            weighting=args.occ_weighting,
            update_interval=args.occ_update_interval,
            n_candidates=args.occ_candidates,
        )
        n_importance = 0
    fc = FieldConfig(grid=grid, block_grid=block_grid, i_embed=args.i_embed,
                     n_importance=n_importance)
    rc = RenderConfig(field=fc, n_samples=args.n_samples,
                      n_importance=n_importance, white_bkgd=True,
                      occupancy=occupancy, n_occ_samples=args.occ_samples)
    cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                      n_rand=args.n_rand, lrate=0.01,
                      distortion_loss_weight=args.distortion_loss_weight,
                      ema_decay=args.ema_decay)

    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], args.n_rand,
    )
    mesh = make_mesh()
    state = replicate_state(
        init_train_state(jax.random.PRNGKey(args.seed), cfg), mesh)
    step_fn = make_sharded_train_step(cfg, mesh)

    # Fixed held-out ray subset from the TEST views: an unbiased estimator
    # of held-out MSE at a fraction of a full-image render's cost.
    eval_fn = None
    if args.eval_every > 0 and len(scene["i_split"][2]) > 0:
        from indoor_nerf_tpu.ops.rays import get_rays_np
        from indoor_nerf_tpu.render.renderer import render_rays

        ev_rng = np.random.default_rng(0)
        ros, rds, tgts = [], [], []
        for vi in scene["i_split"][2]:
            ro, rd = get_rays_np(H, W, scene["K"],
                                 np.asarray(scene["poses"][vi][:3, :4]))
            ros.append(ro.reshape(-1, 3))
            rds.append(rd.reshape(-1, 3))
            tgts.append(np.asarray(scene["images"][vi]).reshape(-1, 3))
        ros, rds, tgts = (np.concatenate(x) for x in (ros, rds, tgts))
        sel = ev_rng.choice(len(ros), size=min(args.eval_rays, len(ros)),
                            replace=False)
        ev_ro = jnp.asarray(ros[sel])
        ev_rd = jnp.asarray(rds[sel])
        ev_tgt = jnp.asarray(tgts[sel])
        ev_vd = ev_rd / jnp.linalg.norm(ev_rd, axis=-1, keepdims=True)
        ev_near = jnp.full((ev_ro.shape[0], 1), scene["near"], jnp.float32)
        ev_far = jnp.full((ev_ro.shape[0], 1), scene["far"], jnp.float32)
        test_rc = rc.test_mode()

        @jax.jit
        def eval_fn(params, quant_state, occ_state):
            out, _ = render_rays(
                None, params, ev_ro, ev_rd,
                ev_vd if fc.use_viewdirs else None, ev_near, ev_far,
                test_rc, quant_state=quant_state, train=False, step=None,
                occ_state=occ_state,
            )
            mse = jnp.mean((out["rgb_map"] - ev_tgt) ** 2)
            return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    key = jax.random.PRNGKey(args.seed + 1)
    batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
    state, metrics = step_fn(state, batch, key)  # compile
    jax.block_until_ready(metrics["loss"])
    if eval_fn is not None:  # compile the eval outside the timed window
        float(eval_fn(state.get("ema") or state["params"], state.get("quant"), state.get("occ")))

    milestones = {}
    heldout_milestones = {}
    train_curve = []
    heldout_curve = []
    t0 = time.perf_counter()
    pending = None
    for i in range(1, args.iters + 1):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, metrics = step_fn(state, batch, sub)
        if pending is not None:
            pi, pm = pending
            psnr = float(pm["psnr"])
            train_curve.append(
                (pi, round(time.perf_counter() - t0, 3), round(psnr, 3)))
            for m in (15, 20, 25, 30, 35):
                if psnr >= m and m not in milestones:
                    milestones[m] = {
                        "iter": pi, "seconds": time.perf_counter() - t0,
                    }
        pending = (i, metrics)
        if eval_fn is not None and i % args.eval_every == 0:
            hp = float(
                eval_fn(state.get("ema") or state["params"],
                        state.get("quant"),
                        state.get("occ"))
            )
            heldout_curve.append(
                (i, round(time.perf_counter() - t0, 3), round(hp, 3)))
            for m in (15, 20, 25, 30, 35):
                if hp >= m and m not in heldout_milestones:
                    heldout_milestones[m] = {
                        "iter": i, "seconds": time.perf_counter() - t0,
                    }
    jax.block_until_ready(metrics["loss"])
    total = time.perf_counter() - t0
    final_psnr = float(metrics["psnr"])

    result = {
        "config": {
            "i_embed": args.i_embed, "use_occupancy": args.use_occupancy,
            "n_rand": args.n_rand, "n_samples": args.n_samples,
            "n_importance": n_importance, "iters": args.iters,
            "occ_samples": args.occ_samples,
            "occ_weighting": args.occ_weighting,
            "occ_resolution": args.occ_resolution,
        },
        "final_train_psnr_db": round(final_psnr, 2),
        "final_heldout_psnr_db": (
            round(heldout_curve[-1][2], 2) if heldout_curve else None
        ),
        "steps_per_sec": round(args.iters / total, 2),
        "rays_per_sec": round(args.iters * args.n_rand / total, 1),
        # TRAIN-psnr milestones (the reference's metric; saturates into
        # overfitting on small view sets — label accordingly when quoted).
        "train_milestones": {
            f"{m}db": {"iter": v["iter"], "seconds": round(v["seconds"], 2)}
            for m, v in milestones.items()
        },
        "heldout_milestones": {
            f"{m}db": {"iter": v["iter"], "seconds": round(v["seconds"], 2)}
            for m, v in heldout_milestones.items()
        },
        "train_curve": train_curve,
        "heldout_curve": heldout_curve,
        "total_seconds": round(total, 2),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
