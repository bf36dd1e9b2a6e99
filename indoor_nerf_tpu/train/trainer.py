"""The training driver: reference train() semantics on the TPU-native core.

Equivalent of PocketNeRF/run_nerf.py:718-1483 — dataset dispatch, expname
mangling, logdir artifacts (args.txt/config.txt), metrics logging, periodic
checkpoints/videos/testsets, PSNR milestone + convergence tracking, the
host-side overfitting detector for structural priors, and render-only mode —
driving the single jitted, mesh-sharded train step.

Performance notes vs the reference loop:
- metric fetches are DEFERRED one step: the host processes step i-1's
  scalars while the device runs step i, so logging never stalls the chip
  (the reference blocks on .item() every iteration, run_nerf.py:1173-1179);
- all "adaptive" schedules live inside the jitted step; the only host->step
  feedback is the structural-prior weight dict (overfitting decay), passed
  as traced scalars (no recompilation).

Fixed reference bugs (documented divergences):
- the overfitting detector actually works here: the last test PSNR is
  recorded from i_testset renders; the reference never assigns
  args._last_test_psnr so its detector is dead code (run_nerf.py:1076);
- checkpoint save works with N_importance == 0 (the reference saves
  network_fine unconditionally and crashes, run_nerf.py:1351).
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.data.load import SceneData, load_dataset
from indoor_nerf_tpu.data.pipeline import BatchedRaySampler, ImageRaySampler
from indoor_nerf_tpu.losses.quantization import QuantConfig
from indoor_nerf_tpu.models.field import FieldConfig
from indoor_nerf_tpu.ops.encoding import HashGridConfig
from indoor_nerf_tpu.parallel.shard import (
    make_mesh,
    make_sharded_train_step,
    replicate_state,
)
from indoor_nerf_tpu.render.path import render_path, write_video
from indoor_nerf_tpu.render.renderer import RenderConfig
from indoor_nerf_tpu.train.step import TrainConfig, init_train_state
from indoor_nerf_tpu.utils.checkpoint import maybe_resume, save_checkpoint
from indoor_nerf_tpu.utils.evaluation import ComprehensiveEvaluator
from indoor_nerf_tpu.utils.metrics import MetricsLogger

MILESTONES = (15, 20, 25, 30, 35)


def mangle_expname(args) -> str:
    """Hyperparameter-encoding expname suffixes (reference: run_nerf.py:830-845)."""
    expname = args.expname
    if args.i_embed == 1:
        expname += "_hashXYZ"
    elif args.i_embed == 0:
        expname += "_posXYZ"
    if args.i_embed_views == 2:
        expname += "_sphereVIEW"
    elif args.i_embed_views == 0:
        expname += "_posVIEW"
    expname += "_fine" + str(args.finest_res) + "_log2T" + str(args.log2_hashmap_size)
    expname += "_lr" + str(args.lrate) + "_decay" + str(args.lrate_decay)
    expname += "_RAdam"
    if args.sparse_loss_weight > 0:
        expname += "_sparse" + str(args.sparse_loss_weight)
    expname += "_TV" + str(args.tv_loss_weight)
    return expname


def build_train_config(args, scene: SceneData) -> TrainConfig:
    """Assemble the static config pytree from CLI args + scene geometry
    (the static half of the reference's create_nerf, run_nerf.py:218-343)."""
    grid = None
    block_grid = None
    if args.i_embed in (1, 3):
        if scene.bounding_box is None:
            raise ValueError(
                f"dataset {args.dataset_type} provides no bounding box; "
                "grid encodings (--i_embed 1/3) need one — use --i_embed 0"
            )
    n_levels = getattr(args, "n_levels", 16)
    feats_per_level = getattr(args, "feats_per_level", 2)
    if args.i_embed == 1:
        grid = HashGridConfig(
            bbox_min=scene.bounding_box[0],
            bbox_max=scene.bounding_box[1],
            n_levels=n_levels,
            n_features_per_level=feats_per_level,
            log2_hashmap_size=args.log2_hashmap_size,
            base_resolution=16,
            finest_resolution=args.finest_res,
        )
    elif args.i_embed == 3:
        from indoor_nerf_tpu.ops.blockhash import BlockHashConfig

        # Match the reference parameter budget: 2^log2T entries ~= rows * 125.
        # Equal-budget scaling across (L, F): stored floats are
        # L * R * F * lanes, so rows shrink with L*F relative to the 16x2
        # reference geometry.
        lf_shift = int(np.round(np.log2(
            (n_levels * feats_per_level) / 32.0)))
        block_grid = BlockHashConfig(
            bbox_min=scene.bounding_box[0],
            bbox_max=scene.bounding_box[1],
            n_levels=n_levels,
            n_features_per_level=feats_per_level,
            # Capacity parity: rows * vertices-per-tile ~= 2^log2T entries.
            log2_rows=max(
                4, args.log2_hashmap_size
                - (7 if args.block_size == 4 else 6) - lf_shift
            ),
            base_resolution=16,
            finest_resolution=args.finest_res,
            gather_dtype={"f32": "float32", "bf16": "bfloat16",
                          "int8": "int8"}[args.block_io],
            scatter_dtype=("bfloat16" if args.block_io in ("bf16", "int8")
                           else "float32"),
            block_size=args.block_size,
            ray_strides=(
                tuple(int(v) for v in args.ray_strides.split(","))
                if getattr(args, "ray_strides", None) else None
            ),
            ray_groups=(
                tuple(int(v) for v in args.ray_groups.split(","))
                if getattr(args, "ray_groups", None) else None
            ),
        )
    quant = QuantConfig(
        init_bits=float(args.quantization_bits),
        bit_penalty=args.bit_penalty,
        target_metric=args.target_metric,
        mdl_tolerance=getattr(args, "mdl_tolerance", 1.0),
    )
    field = FieldConfig(
        grid=grid,
        block_grid=block_grid,
        i_embed=args.i_embed,
        i_embed_views=args.i_embed_views,
        multires=args.multires,
        multires_views=args.multires_views,
        use_viewdirs=args.use_viewdirs,
        predict_normals=args.predict_normals,
        n_importance=args.N_importance,
        netdepth=args.netdepth,
        netwidth=args.netwidth,
        netdepth_fine=args.netdepth_fine,
        netwidth_fine=args.netwidth_fine,
        use_quantization=args.use_quantization,
        quant=quant,
        compute_dtype="bfloat16" if args.precision == "bf16" else "float32",
        freq_anneal_iters=getattr(args, "freq_anneal_iters", 0),
        view_anneal_iters=getattr(args, "view_anneal_iters", 0),
        n_appearance=(int(np.asarray(scene.images).shape[0])
                      if getattr(args, "use_appearance", False)
                      and args.use_viewdirs else 0),
    )
    occupancy = None
    if getattr(args, "use_occupancy", False):
        if scene.bounding_box is None:
            raise ValueError("--use_occupancy needs a scene bounding box")
        from indoor_nerf_tpu.ops.occupancy import OccupancyConfig

        occupancy = OccupancyConfig(
            bbox_min=scene.bounding_box[0],
            bbox_max=scene.bounding_box[1],
            resolution=args.occ_resolution,
            update_interval=args.occ_update_interval,
            n_candidates=args.occ_candidates,
            weighting=getattr(args, "occ_weighting", "density"),
            occlusion_mix=getattr(args, "occ_mix", 0.15),
        )
    render = RenderConfig(
        field=field,
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        perturb=args.perturb,
        lindisp=args.lindisp,
        white_bkgd=args.white_bkgd,
        raw_noise_std=args.raw_noise_std,
        ndc=scene.ndc and not args.no_ndc,
        occupancy=occupancy,
        n_occ_samples=getattr(args, "occ_samples", 64),
    )
    return TrainConfig(
        render=render,
        near=scene.near,
        far=scene.far,
        ndc_hwf=(
            (int(scene.hwf[0]), int(scene.hwf[1]), float(scene.hwf[2]))
            if render.ndc else None
        ),
        n_rand=args.N_rand,
        lrate=args.lrate,
        lrate_decay=args.lrate_decay,
        sparse_loss_weight=args.sparse_loss_weight,
        tv_loss_weight=args.tv_loss_weight,
        distortion_loss_weight=getattr(args, "distortion_loss_weight", 0.0),
        table_decay_weight=getattr(args, "table_decay_weight", 0.0),
        reg_patch_size=getattr(args, "reg_patch_size", 8),
        reg_depth_tv_weight=(
            getattr(args, "reg_depth_tv_weight", 0.1)
            if getattr(args, "reg_views", 0) > 0 else 0.0
        ),
        reg_mode=getattr(args, "reg_mode", "tv"),
        reg_start_iter=getattr(args, "reg_start_iter", 0),
        ema_decay=getattr(args, "ema_decay", 0.0),
        use_structural_priors=args.use_structural_priors,
        structural_loss_start_iter=args.structural_loss_start_iter,
        structural_loss_ramp_iters=args.structural_loss_ramp_iters,
        use_acaq=args.use_acaq,
        acaq_start_iter=args.acaq_start_iter,
    )


def _quant_bits(state) -> Optional[Dict[str, np.ndarray]]:
    q = state.get("quant")
    if q is None:
        return None
    network = np.concatenate(
        [np.atleast_1d(np.asarray(q["act"]["soft_bits"])),
         np.atleast_1d(np.asarray(q["weight"]["soft_bits"]))]
    )
    return {"embed": np.asarray(q["embed"]["soft_bits"]), "network": network}


def train(args) -> Dict:
    """Full training run; returns the time_metrics summary dict."""
    # Multi-host (multi-controller) training: every host runs this same
    # program; jax.distributed wires the pod together so jax.devices() spans
    # all hosts and the pjit mesh/collectives ride ICI. Coordinator address
    # etc. come from the TPU environment (auto-detected on Cloud TPU).
    if getattr(args, "multihost", False):
        from jax import distributed as jax_distributed

        jax_distributed.initialize(
            coordinator_address=getattr(args, "coordinator_address", None),
            num_processes=getattr(args, "num_processes", None),
            process_id=getattr(args, "process_id", None),
        )
        # On a shared filesystem only one writer may own the logdir
        # artifacts; non-zero processes still compute (collectives need
        # every host) but skip checkpoint/figure writes.
        print(
            f"[multihost] process {jax.process_index()}/{jax.process_count()}"
            f" local_devices={len(jax.local_devices())}"
            f" global_devices={len(jax.devices())}"
        )

    # Auto-enable normal prediction for structural priors
    # (reference: run_nerf.py:723-728).
    if args.use_structural_priors and not args.predict_normals:
        print("🔧 AUTOMATICALLY ENABLING NORMAL PREDICTION for structural priors")
        args.predict_normals = True

    # Single-writer rule: on a shared-filesystem pod every host runs the
    # same program (render compute included — collectives need all of
    # them), but ONLY process 0 touches the filesystem. Everything below
    # that writes — checkpoints, videos, testset figures, pkl dumps,
    # MetricsLogger artifacts — is gated on is_main.
    is_main = jax.process_index() == 0

    scene = load_dataset(args)
    H, W, focal = scene.hwf
    K = scene.K

    basedir = args.basedir
    expname = mangle_expname(args)
    args.expname = expname
    logdir = os.path.join(basedir, expname)
    if is_main:
        os.makedirs(logdir, exist_ok=True)
        with open(os.path.join(logdir, "args.txt"), "w") as f:
            for arg in sorted(vars(args)):
                f.write(f"{arg} = {getattr(args, arg)}\n")
        if args.config is not None:
            with open(os.path.join(logdir, "config.txt"), "w") as f:
                f.write(open(args.config).read())

    metrics_logger = MetricsLogger(basedir, expname, args, write=is_main)
    evaluator = ComprehensiveEvaluator()

    cfg = build_train_config(args, scene)
    state = init_train_state(jax.random.PRNGKey(args.seed), cfg)
    state = maybe_resume(logdir, state, args.ft_path, args.no_reload)
    start = int(np.asarray(jax.device_get(state["step"])))

    test_config = cfg.render.test_mode()

    # Render-only short circuit (reference: run_nerf.py:876-894).
    if args.render_only:
        print("RENDER ONLY")
        if start == 0:
            print(
                "⚠️  render_only found NO checkpoint in "
                f"{logdir} — rendering from random init. The expname "
                "mangling encodes hyperparameters (lr/decay/res/...); pass "
                "the SAME flags as the training run, or use --ft_path."
            )
        gt = scene.images[scene.i_test] if args.render_test else None
        render_poses = scene.render_poses
        testsavedir = os.path.join(
            logdir,
            "renderonly_{}_{:06d}".format(
                "test" if args.render_test else "path", start
            ),
        )
        if is_main:
            os.makedirs(testsavedir, exist_ok=True)
        savedir = testsavedir if is_main else None
        print("test poses shape", render_poses.shape)
        if getattr(args, "render_fit_appearance", False) and args.render_test:
            # NeRF-W half-image protocol (render/appearance.py): fit a
            # per-view latent on the left half, score the right half —
            # held-out views with unknown exposure (real captures).
            from indoor_nerf_tpu.render.appearance import (
                eval_view_with_fitted_latent,
            )
            from indoor_nerf_tpu.render.renderer import make_image_renderer

            Hf, Wf, _ = scene.hwf
            fit_render = make_image_renderer(test_config, int(Hf), int(Wf))
            rows = []
            for vi, i_test in enumerate(np.asarray(scene.i_test)):
                res = eval_view_with_fitted_latent(
                    fit_render, state["params"],
                    np.asarray(scene.poses)[i_test], K, scene.near,
                    scene.far, np.asarray(scene.images[i_test]),
                    cfg.render,
                    occ_state=state.get("occ"),
                )
                rows.append(res)
                print(f"[fit-appearance] view {vi}: right-half PSNR "
                      f"zero {res['psnr_right_zero']:.2f} -> fitted "
                      f"{res['psnr_right_fitted']:.2f}")
            mean_fit = float(np.mean([r["psnr_right_fitted"] for r in rows]))
            mean_zero = float(np.mean([r["psnr_right_zero"] for r in rows]))
            print(f"[fit-appearance] mean right-half PSNR: zero "
                  f"{mean_zero:.2f} fitted {mean_fit:.2f}")
            if is_main:
                with open(os.path.join(testsavedir,
                                       "fit_appearance.json"), "w") as f:
                    json.dump({"views": rows, "mean_zero": mean_zero,
                               "mean_fitted": mean_fit}, f, indent=2)
        if getattr(args, "render_baked", False):
            # Bake once (with visibility culling from the train cameras),
            # then render every pose through the depth-guided baked
            # renderer — ~30x faster than the online field for
            # videos/testsets (docs/SERVING.md, BENCH_NOTES.md).
            from indoor_nerf_tpu.render.baked import (
                bake_field,
                make_baked_image_renderer,
            )

            Hb, Wb, focalb = scene.hwf
            if args.render_factor != 0:
                Hb //= args.render_factor
                Wb //= args.render_factor
            train_cams = {
                "poses": np.asarray(scene.poses)[scene.i_train][:, :3, :4],
                "K": K, "H": int(scene.hwf[0]), "W": int(scene.hwf[1]),
                "near": scene.near, "far": scene.far,
            }
            print(f"[baked] baking at {args.render_baked_res}^3 ...")
            baked = bake_field(
                state.get("ema") or state["params"], cfg.render.field,
                resolution=args.render_baked_res,
                train_cameras=train_cams,
                geo_resolution=args.render_baked_geo_res,
            )
            g = args.render_guided
            image_renderer = make_baked_image_renderer(
                baked, int(Hb), int(Wb),
                n_samples=(16 if g else 128), guided=g, n_coarse=64,
            )
            rgbs, _, _ = render_path(
                render_poses, scene.hwf, K, test_config,
                state.get("ema") or state["params"],
                scene.near, scene.far, gt_imgs=gt, savedir=savedir,
                render_factor=args.render_factor,
                image_renderer=image_renderer,
            )
        else:
            rgbs, _, _ = render_path(
                render_poses, scene.hwf, K, test_config,
                state.get("ema") or state["params"],
                scene.near, scene.far, gt_imgs=gt, savedir=savedir,
                render_factor=args.render_factor, quant_state=state["quant"],
                occ_state=state.get("occ"),
            )
        print("Done rendering", testsavedir)
        if is_main:
            write_video(os.path.join(testsavedir, "video.mp4"), rgbs)
        return {}

    # Opt-in Pallas tile-interp kernel for the block-hash path (measured
    # slower than the XLA form on v5e — kept for A/B on other hardware).
    if getattr(args, "use_pallas", False):
        import indoor_nerf_tpu.ops.blockhash as _bh

        _bh.USE_TILE_INTERP_KERNEL = True
        print("[pallas] tile_interp kernel enabled (see BENCH_NOTES.md)")

    # NaN debugging (TPU analogue of the reference's DEBUG NaN scan,
    # run_nerf.py:545-547, and torch detect_anomaly, SURVEY.md §5.2).
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
        print("[debug] jax_debug_nans enabled")

    # Mesh + sharded step. --mesh_shape like 'data:4,model:2'; default all
    # chips on the data axis.
    model_axis = None
    if getattr(args, "mesh_shape", None):
        axes = []
        sizes = []
        for part in args.mesh_shape.split(","):
            name, _, size = part.partition(":")
            axes.append(name.strip())
            sizes.append(int(size) if size else len(jax.devices()))
        mesh = make_mesh(axis_names=tuple(axes), axis_sizes=tuple(sizes))
        if "model" in axes and mesh.shape["model"] > 1:
            model_axis = "model"
    else:
        mesh = make_mesh(axis_names=("data",))
    print(f"Device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    if model_axis is not None:
        from indoor_nerf_tpu.parallel.shard import state_shardings

        state = jax.device_put(
            state, state_shardings(state, mesh, model_axis)
        )
    else:
        state = replicate_state(state, mesh)
    step_fn = make_sharded_train_step(
        cfg, mesh, model_axis=model_axis, state_template=state
    )
    # Eval renders shard the ray axis over the FULL mesh (render/path.py).
    # With a model-sharded (TP) table, the sharded renderer keeps the table
    # spec and all_gathers it once per dispatch (parallel/sp.py) — no more
    # single-device fallback.
    eval_mesh = mesh
    eval_model_axis = model_axis

    # Ray samplers (reference: run_nerf.py:899-1004). In batched mode the
    # hot path is served by the native C++ double-buffered batcher when the
    # toolchain allows, with the numpy sampler as fallback.
    use_batching = not args.no_batching
    # Per-host sampling: on a multi-host pod each host draws an independent
    # ray stream for its local devices (SURVEY.md §2 parallelism item 4) and
    # contributes N_rand / process_count rays of the global batch, assembled
    # into one globally-sharded array below (the multi-controller analogue
    # of the reference's single-GPU ray pool, run_nerf.py:899-920).
    n_proc = jax.process_count()
    if args.N_rand % n_proc != 0:
        raise ValueError(
            f"N_rand={args.N_rand} must divide evenly over "
            f"{n_proc} host processes"
        )
    local_n_rand = args.N_rand // n_proc
    host_seed = args.seed + 7919 * jax.process_index()
    if use_batching:
        sampler = BatchedRaySampler(
            scene.images, scene.poses, scene.i_train, H, W, K,
            local_n_rand, seed=host_seed,
        )
        try:
            from indoor_nerf_tpu.native.batcher import (
                NativeRayBatcher,
                native_available,
            )

            if native_available():
                native = NativeRayBatcher(
                    sampler.rays_rgb, local_n_rand, seed=host_seed,
                    # Appearance training needs per-ray image ids; they
                    # ride the pool as an extra float column.
                    img_ids=(sampler.img_ids
                             if getattr(args, "use_appearance", False)
                             else None),
                )
                sampler = native
                print("[data] native C++ ray batcher active")
        except Exception as e:  # pragma: no cover
            print(f"[data] native batcher unavailable ({e}); using numpy")
        sample = lambda i: sampler.next()
    else:
        sampler = ImageRaySampler(
            scene.images, scene.poses, scene.i_train, H, W, K, local_n_rand,
            precrop_iters=args.precrop_iters, precrop_frac=args.precrop_frac,
            seed=host_seed,
        )
        sample = sampler.next

    # Unobserved-view depth-smoothness patches (RegNeRF-style extension):
    # augment every batch with fixed-shape novel-view patch rays. On a
    # multi-host pod each host contributes reg_views/n_proc patches of the
    # global set, exactly like the ray batch.
    if getattr(args, "reg_views", 0) > 0:
        if args.reg_views % n_proc != 0:
            raise ValueError(
                f"--reg_views {args.reg_views} must divide evenly over "
                f"{n_proc} host processes"
            )
        from indoor_nerf_tpu.data.pipeline import UnobservedPatchSampler

        reg_sampler = UnobservedPatchSampler(
            scene.poses[scene.i_train], H, W, K,
            n_patches=args.reg_views // n_proc,
            patch=getattr(args, "reg_patch_size", 8),
            seed=host_seed + 13,
            pose_mode=getattr(args, "reg_pose_mode", "novel"),
        )
        base_sample = sample
        def sample(i, _base=base_sample, _reg=reg_sampler):
            b = _base(i)
            b.update(_reg.next())
            return b
        print(f"[reg] unobserved-view depth TV: {args.reg_views} "
              f"patch(es)/step of {getattr(args, 'reg_patch_size', 8)}^2 "
              f"rays, weight {getattr(args, 'reg_depth_tv_weight', 0.1)}")

    if n_proc > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        _batch_sh = NamedSharding(mesh, PartitionSpec("data"))

        def to_device(batch_np):
            return {
                k: jax.make_array_from_process_local_data(_batch_sh, v)
                for k, v in batch_np.items()
            }
    else:
        def to_device(batch_np):
            return {k: jnp.asarray(v) for k, v in batch_np.items()}

    n_iters = args.n_iters + 1
    print("Begin")
    print("TRAIN views are", scene.i_train)
    print("TEST views are", scene.i_test)
    print("VAL views are", scene.i_val)

    # Host-side runtime state (reference: run_nerf.py:930-959).
    prior_weights = {
        "depth_prior": args.depth_prior_weight,
        "planarity": args.planarity_weight,
        "manhattan": args.manhattan_weight,
        "normal_consistency": args.normal_consistency_weight,
    }
    last_test_psnr: Optional[float] = None
    best_test_psnr = -np.inf  # best-held-out snapshot tracker (best.ckpt)
    loss_list, psnr_list, time_list = [], [], []
    time_metrics = {
        "start_time": time.time(),
        "structural_priors_start_time": None,
        "milestones": {},
        "convergence_time": None,
        "iterations_per_second": [],
        "time_to_milestones": {},
        "baseline_comparison": {
            "time_to_20db": None, "time_to_25db": None, "time_to_30db": None,
        },
    }

    key = jax.random.PRNGKey(args.seed + 1)
    time0 = time.time()
    pending = None  # (iteration, device metrics) — deferred one step
    iteration_start_time = time.time()

    # Optional jax.profiler trace over the first ~200 post-compile steps
    # (SURVEY.md §5.1: the TPU upgrade of the reference's wall-clock-only
    # instrumentation).
    profile_stop_iter = None
    if getattr(args, "profile_dir", None):
        jax.profiler.start_trace(args.profile_dir)
        profile_stop_iter = start + 210
        print(f"[profile] tracing to {args.profile_dir}")

    def process_metrics(i: int, metrics, quant_bits):
        nonlocal last_test_psnr, iteration_start_time
        m = jax.device_get(metrics)
        loss = float(m["loss"])
        psnr = float(m["psnr"])
        lr = float(m["lr"])
        now = time.time()

        # NaN watchdog (SURVEY.md §5.3: the reference swallows failures; we
        # fail fast with context so auto-resume restarts from a good ckpt).
        if not np.isfinite(loss):
            path = (save_checkpoint(logdir, i, state)
                    if is_main else "<saved by process 0>")
            raise FloatingPointError(
                f"non-finite loss {loss} at iteration {i}; state saved to "
                f"{path}. Re-run with --debug_nans to locate the op."
            )

        metrics_logger.log_iteration(
            iteration=i, time_elapsed=now - time0, loss=loss, psnr=psnr,
            lr=lr, quantizer_bits=quant_bits,
        )

        # Structural-prior diagnostics, including the wall-direction cluster
        # angle (~90 deg in a well-formed Manhattan scene; the reference
        # computes the clusters and discards them, structural_priors.py:157-190).
        if (args.use_structural_priors and i % args.i_print == 0
                and i >= args.structural_loss_start_iter
                and "structural_manhattan" in m):
            angle = float(m.get("structural_wall_cluster_angle_deg", np.nan))
            print(f"[PRIOR] manhattan: {float(m['structural_manhattan']):.4g} "
                  f"planarity: {float(m['structural_planarity']):.4g} "
                  f"consistency: {float(m['structural_normal_consistency']):.4g} "
                  f"floor/wall px: {int(m['structural_semantic_floor_count'])}/"
                  f"{int(m['structural_semantic_wall_count'])} "
                  f"wall-angle: {angle:.1f} deg")

        dt = now - iteration_start_time
        time_metrics["iterations_per_second"].append(1.0 / dt if dt > 0 else 0)
        iteration_start_time = now

        # PSNR milestones (reference: run_nerf.py:1305-1327).
        for milestone in MILESTONES:
            mkey = f"{milestone}db"
            if psnr >= milestone and mkey not in time_metrics["milestones"]:
                mt = now - time_metrics["start_time"]
                time_metrics["milestones"][mkey] = {
                    "iteration": i, "time_seconds": mt, "time_minutes": mt / 60.0,
                }
                bc = time_metrics["baseline_comparison"]
                if f"time_to_{milestone}db" in bc:
                    bc[f"time_to_{milestone}db"] = mt / 60.0
                print(f"🎯 MILESTONE: Reached {milestone} dB PSNR at iteration "
                      f"{i} ({mt/60:.2f} min)")

        # Convergence detection (reference: run_nerf.py:1330-1340).
        if (i > 2000 and len(psnr_list) > 100
                and time_metrics["convergence_time"] is None):
            recent = psnr_list[-100:]
            if (np.std(recent) < 0.5 and abs(recent[-1] - recent[0]) < 0.5):
                ct = now - time_metrics["start_time"]
                time_metrics["convergence_time"] = ct / 60.0
                print(f"📊 CONVERGENCE DETECTED at iteration {i} "
                      f"({ct/60:.1f} min)")

        # Overfitting detector for structural priors (fixed version of
        # reference run_nerf.py:1073-1094 — last_test_psnr is real here).
        if (args.use_structural_priors
                and i > args.structural_loss_start_iter + 500
                and i % 500 == 0 and len(psnr_list) > 50
                and last_test_psnr is not None):
            recent_train = float(np.mean(psnr_list[-20:]))
            if recent_train - last_test_psnr > args.overfitting_threshold:
                print(f"\n⚠️  Overfitting detected at iteration {i}")
                print(f"   Train PSNR: {recent_train:.1f} dB, "
                      f"Last Test: {last_test_psnr:.1f} dB")
                for k in ("planarity", "manhattan", "normal_consistency",
                          "depth_prior"):
                    prior_weights[k] = max(
                        args.min_structural_weight, prior_weights[k] * 0.7
                    )
                print(f"   Reduced structural weights by 30%: {prior_weights}")

        return loss, psnr

    for i in range(start + 1, n_iters):
        batch_np = sample(i)
        batch = to_device(batch_np)
        key, sub = jax.random.split(key)
        pw = {k: jnp.asarray(v, jnp.float32) for k, v in prior_weights.items()}
        state, metrics = step_fn(state, batch, sub, pw)

        # Structural-prior activation banner (reference: run_nerf.py:1043-1066).
        if (args.use_structural_priors
                and i == args.structural_loss_start_iter):
            time_metrics["structural_priors_start_time"] = time.time()
            t_act = (time_metrics["structural_priors_start_time"]
                     - time_metrics["start_time"])
            print("\n" + "=" * 80)
            print(f"🏗️  ACTIVATING STRUCTURAL PRIORS AT ITERATION {i}")
            print(f"   weights={prior_weights}  ramp="
                  f"{args.structural_loss_ramp_iters} iters  "
                  f"time-to-activation={t_act/60:.1f} min")
            print("=" * 80 + "\n")

        if profile_stop_iter is not None and i >= profile_stop_iter:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            print(f"[profile] trace written to {args.profile_dir}")
            profile_stop_iter = None

        # Countdown to structural-prior activation
        # (reference: run_nerf.py:1150-1159).
        if (args.use_structural_priors
                and i < args.structural_loss_start_iter
                and i % args.i_print == 0
                and i > args.structural_loss_start_iter - 500):
            remaining = args.structural_loss_start_iter - i
            print(f"  📊 Structural priors activate in {remaining} iterations...")

        # Deferred metric processing: handle step i-1 while step i runs.
        if pending is not None:
            pi, pm = pending
            qb = _quant_bits(state) if args.use_quantization else None
            loss, psnr = process_metrics(pi, pm, qb)
        pending = (i, metrics)

        is_logging_iter = (
            i % args.i_weights == 0 or i % args.i_print == 0
            or (i % args.i_video == 0 and i > 0)
            or (i % args.i_testset == 0 and i > 0)
        )
        if is_logging_iter:
            # Flush the deferred metric so logs reflect THIS iteration.
            pi, pm = pending
            qb = _quant_bits(state) if args.use_quantization else None
            loss, psnr = process_metrics(pi, pm, qb)
            pending = None

        t = time.time() - time0

        if i % args.i_weights == 0 and is_main:
            path = save_checkpoint(logdir, i, state)
            print("Saved checkpoints at", path)
            metrics_logger.save_checkpoint(i)
            metrics_logger.plot_training_curves()
            if args.use_quantization:
                metrics_logger.calculate_model_complexity(
                    jax.device_get(state["params"]), _quant_bits(state)
                )
                metrics_logger.plot_quantization_analysis()

        if i % args.i_video == 0 and i > 0:
            rgbs, disps, _ = render_path(
                scene.render_poses, scene.hwf, K, test_config,
                state.get("ema") or state["params"], scene.near, scene.far,
                quant_state=state["quant"], occ_state=state.get("occ"),
                save_figures=False, mesh=eval_mesh, model_axis=eval_model_axis,
            )
            print("Done, saving", rgbs.shape, disps.shape)
            if is_main:
                moviebase = os.path.join(
                    logdir, "{}_spiral_{:06d}_".format(expname, i)
                )
                write_video(moviebase + "rgb.mp4", rgbs)
                write_video(
                    moviebase + "disp.mp4", disps / max(np.max(disps), 1e-8)
                )

        if i % args.i_testset == 0 and i > 0 and len(scene.i_test) > 0:
            testsavedir = os.path.join(logdir, "testset_{:06d}".format(i))
            if is_main:
                os.makedirs(testsavedir, exist_ok=True)
            print("test poses shape", scene.poses[scene.i_test].shape)
            rgbs, _, psnrs = render_path(
                scene.poses[scene.i_test], scene.hwf, K, test_config,
                state.get("ema") or state["params"], scene.near, scene.far,
                gt_imgs=scene.images[scene.i_test],
                savedir=testsavedir if is_main else None,
                quant_state=state["quant"], occ_state=state.get("occ"),
                mesh=eval_mesh, model_axis=eval_model_axis,
            )
            print("Saved test set")
            if psnrs:
                avg_test_psnr = sum(psnrs) / len(psnrs)
                last_test_psnr = avg_test_psnr
                evals = [
                    evaluator.evaluate_image(r, g)
                    for r, g in zip(rgbs, scene.images[scene.i_test])
                ]
                lpips_vals = [e["lpips"] for e in evals if "lpips" in e]
                metrics_logger.log_test_metrics(
                    i, avg_test_psnr,
                    ssim=float(np.mean([e["ssim"] for e in evals])),
                    lpips=(float(np.mean(lpips_vals)) if lpips_vals
                           else None),
                    lpips_proxy=float(
                        np.mean([e["lpips_proxy"] for e in evals])
                    ),
                )
                print(f"Logged test PSNR: {avg_test_psnr:.2f}")
                # Keep the best-held-out snapshot: the held-out curve
                # peaks mid-training then declines from overfitting
                # (BENCH_NOTES.md ceiling study) — keep-latest loses the
                # peak. Load it via --ft_path <logdir>/best.ckpt.
                if avg_test_psnr > best_test_psnr:
                    best_test_psnr = avg_test_psnr
                    if is_main:
                        from indoor_nerf_tpu.utils.checkpoint import (
                            save_best_checkpoint,
                        )

                        bp = save_best_checkpoint(logdir, state)
                        print(f"[best] new best held-out "
                              f"{avg_test_psnr:.2f} dB -> {bp}")

        if i % args.i_print == 0:
            print(f"[TRAIN] Iter: {i} Loss: {loss}  PSNR: {psnr}")
            if args.use_quantization and i > 0:
                qb = _quant_bits(state)
                all_bits = np.concatenate([qb["embed"], qb["network"]])
                print(f"[QUANT] Average bits: {np.mean(all_bits):.2f}, "
                      f"Num quantizers: {all_bits.size}")
            loss_list.append(loss)
            psnr_list.append(psnr)
            time_list.append(t)

            training_data = {
                "losses": loss_list,
                "psnr": psnr_list,
                "time": time_list,
                "time_metrics": time_metrics,
                "structural_priors_enabled": args.use_structural_priors,
                "config": {
                    "depth_prior_weight": prior_weights["depth_prior"],
                    "planarity_weight": prior_weights["planarity"],
                    "manhattan_weight": prior_weights["manhattan"],
                    "normal_consistency_weight":
                        prior_weights["normal_consistency"],
                    "structural_loss_start_iter":
                        args.structural_loss_start_iter,
                    "predict_normals": args.predict_normals,
                },
            }
            if is_main:
                with open(os.path.join(logdir, "training_metrics.pkl"),
                          "wb") as fp:
                    pickle.dump(training_data, fp)
                with open(os.path.join(logdir, "loss_vs_time.pkl"),
                          "wb") as fp:
                    pickle.dump(
                        {"losses": loss_list, "psnr": psnr_list,
                         "time": time_list},
                        fp,
                    )

            if i % 1000 == 0 and i > 0:
                elapsed = (time.time() - time_metrics["start_time"]) / 60.0
                ips = np.mean(time_metrics["iterations_per_second"][-100:])
                print(f"\n📊 Time Efficiency Summary @ {i} iterations:")
                print(f"   Total Time: {elapsed:.1f} minutes")
                print(f"   Average Speed: {ips:.2f} it/s")
                for mkey, data in time_metrics["milestones"].items():
                    print(f"     {mkey}: {data['time_minutes']:.2f} min "
                          f"(iter {data['iteration']})")
                print()

    # Final artifacts (reference: run_nerf.py:1476-1483).
    if pending is not None:
        qb = _quant_bits(state) if args.use_quantization else None
        process_metrics(pending[0], pending[1], qb)
    final_step = int(np.asarray(jax.device_get(state["step"])))
    if is_main:
        save_checkpoint(logdir, final_step, state)
    metrics_logger.save_checkpoint(final_step)
    metrics_logger.plot_training_curves()
    if args.use_quantization:
        metrics_logger.plot_quantization_analysis()
    summary_df = metrics_logger.generate_summary_table()
    print("\n=== Training Summary ===")
    print(summary_df)
    return time_metrics
