"""Structural-priors few-shot experiment on the procedural room scene.

The reference's headline experiment (README.md:43, test_structural_v2.sh:
"expected improvement: train/test PSNR gap < 6 dB vs ~13 dB without
priors") needs an indoor few-shot dataset; this reproduces it with the
built-in Manhattan room (data/synthetic.py::make_room_scene) — dominant
axis-aligned planes, few training views — training the SAME config with
structural priors off vs on and reporting train PSNR, held-out test
PSNR, and the generalization gap for each.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/priors_experiment.py \
           [--iters 2000] [--n_train 8] [--out priors_experiment.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--n_views", type=int, default=14)
    ap.add_argument("--n_train", type=int, default=8)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--start_iter", type=int, default=500)
    ap.add_argument("--ramp_iters", type=int, default=500)
    ap.add_argument("--weight_scale", type=float, default=1.0,
                    help="multiply the default structural weights")
    ap.add_argument("--use_occupancy", action="store_true",
                    help="flagship sampler stack: occupancy-guided "
                         "transmittance sampling instead of the plain "
                         "96-sample stratified march")
    ap.add_argument("--occ_samples", type=int, default=32)
    ap.add_argument("--log2_rows", type=int, default=13,
                    help="block-table capacity (rows/level = 2^k); smaller "
                         "tables regularize few-shot training")
    ap.add_argument("--n_levels", type=int, default=16)
    ap.add_argument("--arms", default="priors",
                    help="which treatment arms to run against baseline: a "
                         "legacy group name (priors | distortion | anneal | "
                         "vanneal | appearance | combo | all) or a comma "
                         "list of atomic arms (appearance, "
                         "appearance+anneal, combo, combo+appearance, "
                         "priors_late, fullstack, ...) — see ARM_SPECS")
    ap.add_argument("--distortion_weights", type=float, nargs="+",
                    default=[0.01],
                    help="distortion-loss weights to sweep (extension arm)")
    ap.add_argument("--freq_anneal_iters", type=int, default=500,
                    help="anneal arm: FreeNeRF-style level ramp length")
    ap.add_argument("--view_anneal_iters", type=int, default=1000,
                    help="vanneal arm: view-dependence ramp length")
    ap.add_argument("--exposure_jitter", type=float, default=0.0,
                    help="per-train-view exposure gain jitter U(1-j,1+j) "
                         "(held-out views stay clean) — the real-capture "
                         "failure --use_appearance targets")
    ap.add_argument("--jitter_test", action="store_true",
                    help="jitter HELD-OUT views too (unknown test "
                         "exposure); appearance arms are then also scored "
                         "with the NeRF-W half-image protocol (fit latent "
                         "on left half, PSNR on right half)")
    ap.add_argument("--reg_views", type=int, default=4,
                    help="patches/step for the reg arms (unobserved-view "
                         "depth-TV regularizer)")
    ap.add_argument("--reg_weight", type=float, default=0.1,
                    help="depth-TV weight for the reg arms")
    ap.add_argument("--reg_mode", default="tv", choices=["tv", "planar"],
                    help="patch regularizer variant (see --help in "
                         "train/config.py)")
    ap.add_argument("--reg_start", type=int, default=0,
                    help="iteration the patch regularizer activates at")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="priors_experiment.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.data.pipeline import ImageRaySampler
    from indoor_nerf_tpu.data.synthetic import make_room_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.render.renderer import (
        RenderConfig,
        make_image_renderer,
    )
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    scene = make_room_scene(n_views=args.n_views, H=args.res, W=args.res,
                            n_train=args.n_train,
                            exposure_jitter=args.exposure_jitter,
                            jitter_test=args.jitter_test)
    H, W, _ = scene["hwf"]

    def run(use_priors: bool, distortion_weight: float = 0.0,
            freq_anneal_iters: int = 0, view_anneal_iters: int = 0,
            use_viewdirs: bool = True, use_appearance: bool = False,
            prior_start: int = None, reg_views: int = 0,
            reg_weight: float = None, reg_mode: str = None,
            reg_start: int = None, table_decay: float = 0.0,
            reg_pose: str = "novel"):
        bg = BlockHashConfig(
            bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
            n_levels=args.n_levels, log2_rows=args.log2_rows,
            base_resolution=16,
            finest_resolution=512, block_size=3,
            gather_dtype="bfloat16", scatter_dtype="bfloat16",
        )
        fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0,
                         predict_normals=use_priors,
                         freq_anneal_iters=freq_anneal_iters,
                         view_anneal_iters=view_anneal_iters,
                         use_viewdirs=use_viewdirs,
                         n_appearance=(len(scene["images"])
                                       if use_appearance else 0))
        occ = None
        if args.use_occupancy:
            from indoor_nerf_tpu.ops.occupancy import OccupancyConfig

            occ = OccupancyConfig(
                bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
                resolution=64, weighting="transmittance",
            )
        rc = RenderConfig(field=fc, n_samples=96, n_importance=0,
                          white_bkgd=False, occupancy=occ,
                          n_occ_samples=args.occ_samples)
        cfg = TrainConfig(
            render=rc, near=scene["near"], far=scene["far"],
            n_rand=args.n_rand, lrate=0.01,
            # Reference-default regularization in BOTH arms (TV until
            # iter 1000, entropy sparsity) — the reference's few-shot
            # runs keep these on (run_nerf.py:1022-1037).
            tv_loss_weight=1e-6, sparse_loss_weight=1e-10,
            use_structural_priors=use_priors,
            structural_loss_start_iter=(
                args.start_iter if prior_start is None else prior_start),
            structural_loss_ramp_iters=args.ramp_iters,
            distortion_loss_weight=distortion_weight,
            reg_depth_tv_weight=(
                (args.reg_weight if reg_weight is None else reg_weight)
                if reg_views else 0.0),
            reg_mode=(reg_mode or args.reg_mode),
            reg_start_iter=(args.reg_start if reg_start is None
                            else reg_start),
            table_decay_weight=table_decay,
        )
        # Few-shot: per-image sampling (the reference's no_batching mode
        # is what the priors pipeline expects — select_coords semantics).
        sampler = ImageRaySampler(
            scene["images"], scene["poses"], scene["i_split"][0],
            H, W, scene["K"], cfg.n_rand,
        )
        reg_sampler = None
        if reg_views:
            from indoor_nerf_tpu.data.pipeline import UnobservedPatchSampler

            reg_sampler = UnobservedPatchSampler(
                scene["poses"][scene["i_split"][0]], H, W, scene["K"],
                n_patches=reg_views, seed=args.seed + 13,
                pose_mode=reg_pose,
            )
        state = init_train_state(jax.random.PRNGKey(args.seed), cfg)
        from indoor_nerf_tpu.train.step import default_prior_weights

        pw = {k: jnp.asarray(v * args.weight_scale)
              for k, v in default_prior_weights().items()}
        step_fn = jax.jit(functools.partial(
            train_step, config=cfg, prior_weights=pw))
        key = jax.random.PRNGKey(args.seed + 1)
        t0 = time.perf_counter()
        for i in range(args.iters):
            key, sub = jax.random.split(key)
            batch_np = sampler.next(i)
            if reg_sampler is not None:
                batch_np.update(reg_sampler.next())
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            state, metrics = step_fn(state, batch, sub)
        train_psnr = float(metrics["psnr"])
        wall = time.perf_counter() - t0

        render = make_image_renderer(rc.test_mode(), H, W, 4096)
        psnrs = []
        half_zero, half_fit, half_aff = [], [], []
        for i_test in scene["i_split"][2]:
            gt = np.asarray(scene["images"][i_test])
            c2w = np.asarray(scene["poses"][i_test])[:3, :4]
            out = render(state["params"], c2w, scene["K"], scene["near"],
                         scene["far"])
            psnrs.append(float(-10 * np.log10(
                np.mean((np.asarray(out["rgb_map"]) - gt) ** 2))))
            if args.jitter_test:
                # Model-agnostic test-time exposure adaptation: the
                # closed-form per-view affine color fit (left half fits,
                # right half scores — render/appearance.py). Works on
                # EVERY arm, including anneal arms whose color net
                # ignores the latent direction (VERDICT round-4 weak #4).
                from indoor_nerf_tpu.render.appearance import (
                    eval_view_with_fitted_affine,
                )

                aff = eval_view_with_fitted_affine(
                    np.asarray(out["rgb_map"]), gt)
                half_aff.append(
                    (aff["psnr_right_zero"], aff["psnr_right_affine"]))
            if args.jitter_test and use_appearance:
                # Unknown test exposure: the NeRF-W half-image protocol
                # (render/appearance.py) — fit a latent on the left
                # half, score the right half.
                from indoor_nerf_tpu.render.appearance import (
                    eval_view_with_fitted_latent,
                )

                half = eval_view_with_fitted_latent(
                    render, state["params"],
                    np.asarray(scene["poses"][i_test]), scene["K"],
                    scene["near"], scene["far"], gt, rc,
                )
                half_zero.append(half["psnr_right_zero"])
                half_fit.append(half["psnr_right_fitted"])
        test_psnr = float(np.mean(psnrs))
        tag = "priors" if use_priors else "baseline"
        if distortion_weight:
            tag += f"+dist{distortion_weight:g}"
        if freq_anneal_iters:
            tag += f"+anneal{freq_anneal_iters}"
        if view_anneal_iters:
            tag += f"+vanneal{view_anneal_iters}"
        if not use_viewdirs:
            tag += "+viewoff"
        if use_appearance:
            tag += "+appearance"
        if reg_views:
            rm = reg_mode or args.reg_mode
            rw = args.reg_weight if reg_weight is None else reg_weight
            rs = args.reg_start if reg_start is None else reg_start
            tag += f"+reg{reg_views}({rm},w{rw:g}" + (
                f",s{rs}" if rs else "") + (
                ",train)" if reg_pose == "train" else ")")
        if table_decay:
            tag += f"+tdecay{table_decay:g}"
        if use_priors and prior_start is not None:
            tag += f"@{prior_start}"
        print(f"{tag}: train {train_psnr:.2f} test {test_psnr:.2f} "
              f"gap {train_psnr - test_psnr:.2f} ({wall:.0f}s)",
              flush=True)
        res = {"train_psnr": round(train_psnr, 2),
               "test_psnr": round(test_psnr, 2),
               "gap_db": round(train_psnr - test_psnr, 2),
               "per_view_test": [round(p, 2) for p in psnrs],
               "wall_s": round(wall, 1)}
        if half_fit:
            res["half_psnr_zero"] = round(float(np.mean(half_zero)), 2)
            res["half_psnr_fitted"] = round(float(np.mean(half_fit)), 2)
            print(f"  half-image: zero-latent {res['half_psnr_zero']:.2f} "
                  f"fitted {res['half_psnr_fitted']:.2f}", flush=True)
        if half_aff:
            z = float(np.mean([a[0] for a in half_aff]))
            f_ = float(np.mean([a[1] for a in half_aff]))
            res["half_psnr_affine_zero"] = round(z, 2)
            res["half_psnr_affine"] = round(f_, 2)
            print(f"  affine: zero {z:.2f} fitted {f_:.2f} "
                  f"(+{f_ - z:.2f})", flush=True)
        return res

    # --- atomic arm specs (comma-list mode) -------------------------------
    # The round-3 diagnosis localizes the residual few-shot gap at the
    # RADIANCE level (appearance latents) with a SCHEDULING bug in the
    # priors x anneal stack: priors starting mid-anneal train the normal
    # head on coarse (frequency-truncated) geometry. "late" arms delay the
    # prior start past the anneal end (VERDICT round-3 item 5).
    w0 = args.distortion_weights[0]
    A = args.freq_anneal_iters
    V = args.view_anneal_iters
    late = max(args.start_iter, A + 100)
    ARM_SPECS = {
        "priors": dict(use_priors=True),
        "anneal": dict(freq_anneal_iters=A),
        "vanneal": dict(view_anneal_iters=V),
        "distortion": dict(distortion_weight=w0),
        "appearance": dict(use_appearance=True),
        "appearance+anneal": dict(use_appearance=True,
                                  freq_anneal_iters=A),
        "appearance+anneal+distortion": dict(
            use_appearance=True, freq_anneal_iters=A, distortion_weight=w0),
        "combo": dict(distortion_weight=w0, freq_anneal_iters=A,
                      view_anneal_iters=V),
        "combo+appearance": dict(distortion_weight=w0, freq_anneal_iters=A,
                                 view_anneal_iters=V, use_appearance=True),
        "priors_late": dict(use_priors=True, prior_start=late),
        "priors_late+anneal": dict(use_priors=True, freq_anneal_iters=A,
                                   prior_start=late),
        # VERDICT round-3 item 5 verbatim: appearance + freq-anneal with
        # priors delayed past anneal end + distortion.
        "fullstack": dict(use_priors=True, use_appearance=True,
                          distortion_weight=w0, freq_anneal_iters=A,
                          prior_start=late),
        "fullstack+vanneal": dict(use_priors=True, use_appearance=True,
                                  distortion_weight=w0, freq_anneal_iters=A,
                                  view_anneal_iters=V, prior_start=late),
        # RegNeRF-style unobserved-view depth-TV arms (round-4 extension;
        # data/pipeline.py::UnobservedPatchSampler).
        "reg": dict(reg_views=args.reg_views),
        "reg+anneal": dict(reg_views=args.reg_views, freq_anneal_iters=A),
        "reg+anneal+appearance": dict(reg_views=args.reg_views,
                                      freq_anneal_iters=A,
                                      use_appearance=True),
        "fullstack+reg": dict(use_priors=True, use_appearance=True,
                              distortion_weight=w0, freq_anneal_iters=A,
                              prior_start=late, reg_views=args.reg_views),
        # Round-4 sweep arms: weight / mode / activation-delay variants
        # of reg+anneal (weight 0.1 from iter 0 measured -1.9 dB
        # held-out on s0 — over-smoothing during geometry formation).
        "regw01+anneal": dict(reg_views=args.reg_views,
                              freq_anneal_iters=A, reg_weight=0.01),
        "regw003+anneal": dict(reg_views=args.reg_views,
                               freq_anneal_iters=A, reg_weight=0.003),
        "regp+anneal": dict(reg_views=args.reg_views, freq_anneal_iters=A,
                            reg_mode="planar"),
        "regpw01+anneal": dict(reg_views=args.reg_views,
                               freq_anneal_iters=A, reg_mode="planar",
                               reg_weight=0.01),
        "reglate+anneal": dict(reg_views=args.reg_views,
                               freq_anneal_iters=A, reg_start=500),
        # Training-pose patch smoothing (round-5 follow-up to the
        # novel-pose refutation: photometric opposition restores an
        # equilibrium — data/pipeline.py pose_mode="train").
        "regtrain": dict(reg_views=args.reg_views, reg_pose="train"),
        "regtrain+anneal": dict(reg_views=args.reg_views,
                                freq_anneal_iters=A, reg_pose="train"),
        "regtrainw01+anneal": dict(reg_views=args.reg_views,
                                   freq_anneal_iters=A, reg_pose="train",
                                   reg_weight=0.01),
        "regplate+anneal": dict(reg_views=args.reg_views,
                                freq_anneal_iters=A, reg_mode="planar",
                                reg_start=500),
        # Fine-level grid amplitude decay (round-5 extension;
        # TrainConfig.table_decay_weight) — attacks few-shot
        # memorization at the CAPACITY level, one decade swept.
        "tdecay": dict(table_decay=1.0),
        "tdecay+anneal": dict(table_decay=1.0, freq_anneal_iters=A),
        "tdecayw01+anneal": dict(table_decay=0.1, freq_anneal_iters=A),
        "tdecayw10+anneal": dict(table_decay=10.0, freq_anneal_iters=A),
    }
    legacy = ("priors", "distortion", "anneal", "vanneal", "appearance",
              "combo", "all")
    if args.arms not in legacy:
        result = {"config": vars(args), "baseline": run(False)}
        for arm in args.arms.split(","):
            arm = arm.strip()
            if arm in ("", "baseline"):
                continue
            spec = dict(ARM_SPECS[arm])
            result[arm] = run(spec.pop("use_priors", False), **spec)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return

    result = {"config": vars(args), "baseline": run(False)}
    if args.arms in ("all", "priors"):
        result["priors"] = run(True)
    if args.arms in ("all", "anneal"):
        result["anneal"] = run(False,
                               freq_anneal_iters=args.freq_anneal_iters)
        result["priors+anneal"] = run(
            True, freq_anneal_iters=args.freq_anneal_iters)
        # Annealing stacked on the best round-2 anti-overfit lever
        # (distortion 0.01 held the smallest measured gap, ROUND2.md).
        result["distortion+anneal"] = run(
            False, distortion_weight=args.distortion_weights[0],
            freq_anneal_iters=args.freq_anneal_iters)
    if args.arms in ("all", "vanneal"):
        # View-dependence arms (round 3): the room GT is DIFFUSE, so any
        # learned view-dependence is pure few-shot overfitting. viewoff
        # is the diagnostic ceiling (no view branch at all); vanneal is
        # the deployable lever (diffuse-first ramp, full view-dependence
        # from view_anneal_iters on).
        result["viewoff"] = run(False, use_viewdirs=False)
        result["vanneal"] = run(
            False, view_anneal_iters=args.view_anneal_iters)
        result["distortion+vanneal"] = run(
            False, distortion_weight=args.distortion_weights[0],
            view_anneal_iters=args.view_anneal_iters)
    if args.arms in ("all", "combo"):
        # Every measured anti-overfit lever stacked (the reference's
        # thesis is a GAP claim, PocketNeRF/test_structural_v2.sh:26-27;
        # individual arms each moved it, so the honest upper bound on the
        # in-tree levers is their combination): distortion + frequency
        # annealing + view-dependence annealing, with and without the
        # structural priors.
        result["combo"] = run(
            False, distortion_weight=args.distortion_weights[0],
            freq_anneal_iters=args.freq_anneal_iters,
            view_anneal_iters=args.view_anneal_iters)
        result["combo+priors"] = run(
            True, distortion_weight=args.distortion_weights[0],
            freq_anneal_iters=args.freq_anneal_iters,
            view_anneal_iters=args.view_anneal_iters)
    if args.arms == "appearance":
        # Per-image latents on a constant-exposure synthetic protocol: the
        # latents are a licensed per-view radiance absorber, so this arm
        # measures their few-shot COST (the capability targets real
        # captures with exposure variation).
        result["appearance"] = run(False, use_appearance=True)
    if args.arms in ("all", "distortion"):
        for w in args.distortion_weights:
            result[f"distortion_{w:g}"] = run(False, distortion_weight=w)
        if args.arms == "all":
            result["priors+distortion"] = run(
                True, distortion_weight=args.distortion_weights[0]
            )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
