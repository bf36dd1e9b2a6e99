"""The jitted training step: render → loss assembly → RAdam update.

TPU-native equivalent of the reference hot loop body
(reference: PocketNeRF/run_nerf.py:1006-1293) as ONE pure function:

    (state, batch, key, prior_weights) -> (state', metrics)

Everything "adaptive" in the reference loop — LR decay, the TV-loss cutoff at
iter 1000, the structural-prior activation/ramp, the A-CAQ controller every
10 iters, quantizer calibration and warmup — is a pure function of the step
counter inside the jit (lax.cond / where), so the step compiles once and the
host never blocks on scalars. The only host-side knobs are the structural
prior base weights (the overfitting detector decays them between steps,
reference: run_nerf.py:1073-1094), passed in as traced scalars.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from indoor_nerf_tpu.losses.priors import PriorConfig, combine_structural_losses
from indoor_nerf_tpu.losses.quantization import (
    acaq_controller_update,
    init_quant_state,
)
from indoor_nerf_tpu.models.field import init_field_params, sigma_query
from indoor_nerf_tpu.ops.occupancy import init_occupancy, occupancy_update
from indoor_nerf_tpu.ops.tv import total_variation_loss
from indoor_nerf_tpu.render.renderer import RenderConfig, render_rays
from indoor_nerf_tpu.train.optim import (
    exp_decay_lr,
    init_radam_state,
    pocketnerf_hyper_fn,
    radam_update,
)

TrainState = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training configuration (reference flags: run_nerf.py:552-715)."""

    render: RenderConfig
    near: float = 2.0
    far: float = 6.0
    n_rand: int = 1024
    lrate: float = 0.01
    lrate_decay: int = 250  # in thousands of steps
    sparse_loss_weight: float = 1e-10
    tv_loss_weight: float = 1e-6
    tv_cutoff_iter: int = 1000  # TV hard-disabled after this (run_nerf.py:1036-1037)
    # Mip-NeRF 360 interval-distortion regularizer (losses/distortion.py) —
    # a TPU-framework extension against few-shot floaters, off by default.
    distortion_loss_weight: float = 0.0
    # Polyak EMA of the parameters for evaluation (extension, off at 0.0):
    # state["ema"] tracks ema*d + params*(1-d) each step; eval/checkpoint
    # consumers may render with the averaged weights. Initialized AT the
    # initial params, so early evals are init-biased for ~1/(1-d) steps.
    ema_decay: float = 0.0
    # Unobserved-view depth-smoothness regularizer (RegNeRF-style;
    # extension, DIVERGENCES.md): active when the weight is >0 AND the
    # batch carries 'reg_rays_o'/'reg_rays_d' patch rays (from
    # data/pipeline.py::UnobservedPatchSampler). The squared depth TV of
    # each patch (depth normalized by far-near) is added to the loss.
    reg_patch_size: int = 8
    reg_depth_tv_weight: float = 0.0
    # "tv" = RegNeRF squared first differences of normalized depth;
    # "planar" = squared second differences of normalized disparity
    # (planes cost zero at any slant — the indoor-targeted variant;
    # ops/tv.py::patch_depth_regularizer).
    reg_mode: str = "tv"
    # The loss contribution is gated to step >= reg_start_iter (in-jit;
    # 0 = from the start). Measured: weight 0.1 from iter 0 over-smooths
    # (-1.9 dB held-out on the s0 few-shot room arm).
    reg_start_iter: int = 0
    # Fine-level grid amplitude decay (few-shot extension, off at 0.0):
    # adds weight * sum_l 2^(l-(L-1)) * mean(table_l^2) to the loss —
    # an L2 penalty that bears exponentially harder on FINER grid levels,
    # whose capacity is what memorizes per-view detail in the few-shot
    # regime (the reference's few-shot thesis is the train/test gap,
    # test_structural_v2.sh:26-27; the nearest in-reference analogue is
    # the optimizer's uniform weight_decay=1e-6 on net params only,
    # run_nerf.py:281-285). One full-table pass per step. Applies to the
    # block-hash (i_embed 3) and NGP hash (i_embed 1) tables.
    table_decay_weight: float = 0.0
    use_structural_priors: bool = False
    structural_loss_start_iter: int = 2000
    structural_loss_ramp_iters: int = 1000
    use_acaq: bool = False
    acaq_start_iter: int = 1000
    acaq_interval: int = 10
    priors: PriorConfig = PriorConfig()
    # (H, W, focal) for the NDC projection of training ray batches; required
    # when render.ndc (LLFF forward-facing). The reference applies NDC inside
    # render() for BOTH training batches and eval images (run_nerf.py:129-131);
    # eval goes through renderer._prepare_rays, training through train_step.
    ndc_hwf: Optional[Tuple[int, int, float]] = None


def init_train_state(key: jax.Array, config: TrainConfig) -> TrainState:
    """Fresh train state: params + RAdam moments + quant state + counters."""
    params = init_field_params(key, config.render.field)
    state: TrainState = {
        "params": params,
        "opt": init_radam_state(params),
        "step": jnp.zeros((), jnp.int32),
        "best_loss": jnp.asarray(jnp.inf, jnp.float32),
        # EMA of the per-batch image loss (inf = uninitialized; the first
        # step adopts the batch loss) — the smoothed "current loss" the
        # A-CAQ controller thresholds (QuantConfig.loss_ema_decay).
        # best_loss (its running minimum) is kept for observability.
        "loss_ema": jnp.asarray(jnp.inf, jnp.float32),
        # Slow (~10x window) companion of loss_ema: the A-CAQ trajectory
        # guard reads the trend fast/slow (see train_step).
        "loss_ema_slow": jnp.asarray(jnp.inf, jnp.float32),
        # EMA of the PAIRED quantization-inflation ratio (quantized loss /
        # quant-bypassed loss of the SAME batch under the SAME params) —
        # the MDL anchor signal (updated only at controller intervals;
        # see acaq_controller_update for why unpaired anchors fail).
        "infl_ema": jnp.asarray(jnp.inf, jnp.float32),
    }
    fc = config.render.field
    if fc.use_quantization:
        # Quantizer counts follow the model geometry: one per hash level and
        # one per hidden sigma activation (reference: hash_encoding.py:45-51,
        # run_nerf_helpers.py:220-226).
        n_levels = fc.grid.n_levels if fc.grid is not None else fc.block_grid.n_levels
        qc = dataclasses.replace(
            fc.quant,
            n_embed_levels=n_levels,
            n_act_quantizers=fc.num_layers - 1,
        )
        state["quant"] = init_quant_state(qc)
    else:
        state["quant"] = None
    if config.render.occupancy is not None:
        state["occ"] = init_occupancy(config.render.occupancy)
    else:
        state["occ"] = None
    if config.ema_decay > 0.0:
        state["ema"] = jax.tree_util.tree_map(jnp.array, params)
    else:
        state["ema"] = None
    return state


def default_prior_weights(args_like=None) -> Dict[str, float]:
    """Reference CLI defaults (run_nerf.py:688-695). 'depth_prior' is carried
    for parity but — exactly like the reference — consumed by no loss term
    (combine_structural_losses_v2 only reads manhattan/planarity/
    normal_consistency, structural_priors.py:381-386,420-441)."""
    return {
        "depth_prior": 0.01,
        "planarity": 0.005,
        "manhattan": 0.002,
        "normal_consistency": 0.001,
    }


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    config: TrainConfig,
    prior_weights: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step over a ``[n_rand]`` ray batch.

    Args:
      batch: {'rays_o' [N,3], 'rays_d' [N,3], 'target' [N,3],
              optional 'spatial_coords' [N,2]} — the sampled pixel coords in
              no-batching mode feed the spatial consistency prior
              (reference: run_nerf.py:1113-1117).
      prior_weights: traced scalars for the 4 structural weights (base values
        after any host-side overfitting decay); ramping happens here.

    Returns (new_state, metrics{loss, img_loss, psnr, lr, ...}).
    """
    rc = config.render
    fc = rc.field
    step = state["step"]
    k_render, k_tv, k_priors, k_occ = jax.random.split(key, 4)
    # Derived by fold_in, NOT by widening the split above: adding the
    # regularizer must not perturb the RNG stream of existing protocols
    # (seeded convergence results are bit-reproducible, CLAUDE.md).
    k_reg = jax.random.fold_in(key, 17)

    rays_o = batch["rays_o"]
    rays_d = batch["rays_d"]
    target = batch["target"]
    spatial_coords = batch.get("spatial_coords")

    viewdirs = None
    if fc.use_viewdirs:
        # Viewdirs come from the PRE-NDC world rays (reference order:
        # run_nerf.py:119-131 normalizes dirs before the NDC transform).
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if rc.ndc:
        if config.ndc_hwf is None:
            raise ValueError(
                "render.ndc=True needs TrainConfig.ndc_hwf=(H, W, focal) "
                "to project training ray batches into NDC"
            )
        Hn, Wn, focal_n = config.ndc_hwf
        from indoor_nerf_tpu.ops.rays import ndc_rays

        rays_o, rays_d = ndc_rays(Hn, Wn, focal_n, 1.0, rays_o, rays_d)
    near = config.near * jnp.ones_like(rays_d[..., :1])
    far = config.far * jnp.ones_like(rays_d[..., :1])

    img_idx = batch.get("img_idx")

    def _view_bias(params):
        if (fc.n_appearance > 0 and fc.use_viewdirs
                and img_idx is not None):
            # Per-image appearance latent rows for this batch's rays
            # (FieldConfig.n_appearance; gradient flows to the rows of
            # the images actually sampled).
            return jnp.take(
                params["appearance"], img_idx.astype(jnp.int32), axis=0)
        return None

    def loss_fn(params, quant_state):
        view_bias = _view_bias(params)
        out, new_quant = render_rays(
            k_render, params, rays_o, rays_d, viewdirs, near, far, rc,
            quant_state=quant_state, train=True, step=step,
            occ_state=state["occ"], view_bias=view_bias,
        )
        img_loss = jnp.mean((out["rgb_map"] - target) ** 2)
        loss = img_loss
        if rc.n_importance > 0:
            img_loss0 = jnp.mean((out["rgb0"] - target) ** 2)
            loss = loss + img_loss0
        else:
            img_loss0 = jnp.zeros(())

        # Entropy sparsity loss (reference: run_nerf.py:1022-1023).
        sparsity = jnp.sum(out["sparsity_loss"])
        if rc.n_importance > 0:
            sparsity = sparsity + jnp.sum(out["sparsity_loss0"])
        loss = loss + config.sparse_loss_weight * sparsity

        # TV loss on the hash table, hard-disabled after tv_cutoff_iter
        # (reference: run_nerf.py:1026-1037).
        if fc.i_embed == 1 and config.tv_loss_weight > 0:
            tv = jax.lax.cond(
                step <= config.tv_cutoff_iter,
                lambda: total_variation_loss(k_tv, params["table"], fc.grid),
                lambda: jnp.zeros(()),
            )
            loss = loss + config.tv_loss_weight * tv
        elif fc.i_embed == 3 and config.tv_loss_weight > 0:
            from indoor_nerf_tpu.ops.blockhash import block_tv_loss

            tv = jax.lax.cond(
                step <= config.tv_cutoff_iter,
                lambda: block_tv_loss(k_tv, params["table"], fc.block_grid),
                lambda: jnp.zeros(()),
            )
            loss = loss + config.tv_loss_weight * tv

        # Distortion loss on the (fine-pass) weight distribution
        # (losses/distortion.py; extension, DIVERGENCES.md).
        if config.distortion_loss_weight > 0:
            from indoor_nerf_tpu.losses.distortion import distortion_loss

            dist = distortion_loss(out["weights"], out["z_vals"], near, far)
            loss = loss + config.distortion_loss_weight * dist

        # Fine-level grid amplitude decay (few-shot extension; see
        # TrainConfig.table_decay_weight). Per-level mean-square of the
        # fused table, weighted 2^(l-(L-1)) so the finest level bears
        # weight 1 and each coarser level half of the next — finer
        # levels are where few-shot memorization lives.
        if config.table_decay_weight > 0 and fc.i_embed in (1, 3):
            tbl = params["table"]
            if fc.i_embed == 3:
                L_g = fc.block_grid.n_levels
            else:
                L_g = fc.grid.n_levels
            lv_w = jnp.asarray(
                [2.0 ** (l - (L_g - 1)) for l in range(L_g)], jnp.float32)
            per_level = jnp.mean(
                tbl.reshape(L_g, -1).astype(jnp.float32) ** 2, axis=1)
            loss = loss + config.table_decay_weight * jnp.sum(
                lv_w * per_level)

        # Unobserved-view depth smoothness (RegNeRF-style; extension).
        # Renders fixed-shape novel-view patches with the SAME field and
        # penalizes squared depth TV there — geometry must stay
        # piecewise-smooth where no training ray looks. The patch render
        # rides the main gradient; its quantizer-observer updates are
        # discarded (ranges track the real ray distribution only).
        reg_tv = jnp.zeros(())
        reg_o = batch.get("reg_rays_o")
        if config.reg_depth_tv_weight > 0 and reg_o is not None:
            reg_d = batch["reg_rays_d"]
            reg_vd = None
            if fc.use_viewdirs:
                reg_vd = reg_d / jnp.linalg.norm(
                    reg_d, axis=-1, keepdims=True)
            ro_r, rd_r = reg_o, reg_d
            if rc.ndc:
                Hn, Wn, focal_n = config.ndc_hwf
                from indoor_nerf_tpu.ops.rays import ndc_rays

                ro_r, rd_r = ndc_rays(Hn, Wn, focal_n, 1.0, ro_r, rd_r)
            out_reg, _ = render_rays(
                k_reg, params, ro_r, rd_r, reg_vd,
                config.near * jnp.ones_like(rd_r[..., :1]),
                config.far * jnp.ones_like(rd_r[..., :1]),
                rc, quant_state=quant_state, train=True, step=step,
                occ_state=state["occ"],
            )
            from indoor_nerf_tpu.ops.tv import patch_depth_regularizer

            reg_tv = patch_depth_regularizer(
                out_reg["depth_map"], out_reg["acc_map"],
                config.reg_patch_size, config.near, config.far,
                mode=config.reg_mode,
            )
            gate = (step >= config.reg_start_iter).astype(jnp.float32)
            loss = loss + config.reg_depth_tv_weight * gate * reg_tv

        # Structural priors with activation + linear ramp
        # (reference: run_nerf.py:1043-1148).
        diag = {}
        if config.use_structural_priors and fc.predict_normals:
            start_it = config.structural_loss_start_iter
            ramp = jnp.clip(
                (step - start_it) / config.structural_loss_ramp_iters, 0.0, 1.0
            )
            ramp_factor = 0.1 + 0.9 * ramp
            pw = prior_weights or jax.tree_util.tree_map(
                jnp.asarray, default_prior_weights()
            )
            weights = {
                k: jnp.asarray(pw[k], jnp.float32) * ramp_factor
                for k in ("manhattan", "planarity", "normal_consistency")
            }

            def compute_priors():
                return combine_structural_losses(
                    k_priors, out["depth_map"], out["normal_map"],
                    spatial_coords, weights, config.priors,
                )

            def zero_priors():
                z = jnp.zeros(())
                return z, {
                    "manhattan": z, "planarity": z, "normal_consistency": z,
                    "semantic_floor_count": jnp.zeros((), jnp.int32),
                    "semantic_wall_count": jnp.zeros((), jnp.int32),
                    "wall_cluster_angle_deg": jnp.full((), jnp.nan,
                                                       jnp.float32),
                }

            structural, diag = jax.lax.cond(
                step >= start_it, compute_priors, zero_priors
            )
            loss = loss + structural
            diag = {f"structural_{k}": v for k, v in diag.items()}

        aux = {
            "img_loss": img_loss,
            "img_loss0": img_loss0,
            "reg_depth_tv": reg_tv,
            "quant": new_quant,
            **diag,
        }
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state["params"], state["quant"]
    )

    lr = exp_decay_lr(config.lrate, config.lrate_decay, state["opt"]["step"])
    new_params, new_opt = radam_update(
        grads, state["opt"], state["params"], lr, pocketnerf_hyper_fn
    )

    # Loss EMA + its running minimum: the smoothed "current" and "best"
    # the A-CAQ MDL controller compares (raw batch losses make best_loss an
    # extreme-value outlier and ratchet bits to max on long runs —
    # QuantConfig.loss_ema_decay, DIVERGENCES.md).
    d_ema = fc.quant.loss_ema_decay
    new_loss_ema = jnp.where(
        jnp.isinf(state["loss_ema"]),
        aux["img_loss"],
        d_ema * state["loss_ema"] + (1.0 - d_ema) * aux["img_loss"],
    )
    # Slow companion EMA (~10x window): the A-CAQ trajectory guard reads
    # the TREND fast/slow instead of fast/min — the running minimum is an
    # extreme-value statistic that late-training noise sits 1.2-1.7x
    # above permanently (measured, acaq_r4_hybrid_trace.json), while the
    # trend ratio is ~1 on any plateau and >1 only during genuine
    # degradation (e.g. a too-aggressive bit drop).
    d_slow = 1.0 - (1.0 - d_ema) / 10.0
    prev_slow = state.get("loss_ema_slow",
                          jnp.asarray(jnp.inf, jnp.float32))
    new_loss_slow = jnp.where(
        jnp.isinf(prev_slow),
        aux["img_loss"],
        d_slow * prev_slow + (1.0 - d_slow) * aux["img_loss"],
    )

    new_quant = aux["quant"]
    new_infl_ema = state.get("infl_ema", jnp.asarray(jnp.inf, jnp.float32))
    if config.use_acaq and fc.use_quantization:
        mdl_mode = fc.quant.target_metric is None

        def run_controller(q, infl_ema):
            if mdl_mode:
                # The MDL anchor: what this batch's loss would be WITHOUT
                # quantization (quant_state=None bypasses every fake-quant).
                # Runs only on controller steps (~1/interval of a forward),
                # pre-update params — the SAME rays, stratified key, and
                # params as aux["img_loss"], so the PAIRED ratio
                # quantized/bypassed is exactly the quantization-induced
                # inflation of this batch, with the convergence trend
                # cancelled per-sample. (Comparing the 100-step quantized
                # loss EMA against an fp loss EMA — two UNPAIRED
                # estimators — leaves trend-lag + variance residuals of
                # 5-20% that swamp the 5% controller bands: measured bits
                # parking at 12-21 for every tolerance <= 1.15,
                # acaq_r4_tol{10,11,115}.json.)
                out_fp, _ = render_rays(
                    k_render, state["params"], rays_o, rays_d, viewdirs,
                    near, far, rc, quant_state=None, train=True, step=step,
                    occ_state=state["occ"],
                    view_bias=_view_bias(state["params"]),
                )
                fp_loss = jnp.mean((out_fp["rgb_map"] - target) ** 2)
                ratio = aux["img_loss"] / jnp.maximum(fp_loss, 1e-30)
                # SYMMETRIC deviation: healthy quantization is a small
                # perturbation in EITHER direction. Under STE the weights
                # adapt to the quantizer, so at destructive bits the
                # quantized forward measures far BETTER than the bypassed
                # one (ratio 0.06-0.37 at 2-3 bits while training sits at
                # its 2-bit ceiling, acaq_r4_trend_tol10.json trace) — a
                # one-sided ratio reads that as "no inflation" and keeps
                # shrinking. |log ratio| large in either direction means
                # the fp and quantized functions have diverged, i.e. bits
                # are doing real damage.
                dev = jnp.maximum(ratio, 1.0 / jnp.maximum(ratio, 1e-30))
                d_fp = fc.quant.fp_ref_ema_decay
                infl_ema = jnp.where(
                    jnp.isinf(infl_ema), dev,
                    d_fp * infl_ema + (1.0 - d_fp) * dev,
                )
                # The paired ratio alone is blind to TRAJECTORY cost:
                # under STE the weights adapt to the quantizer — the
                # quantized forward measures BETTER than the bypassed one
                # (infl 0.4-0.9 throughout acaq_r4_hybrid_trace.json) —
                # so at destructively low bits it still reads clean while
                # absolute quality collapses (bits walk to min 2.0, train
                # 19 dB, acaq_r4_paired_tol10.json). Guard with the
                # TREND ratio fast-EMA / slow-EMA: ~1 on any plateau,
                # > 1 only while the loss is genuinely degrading (the
                # transient every too-aggressive bit drop causes). A
                # min-based guard (loss_ema / best) ratchets bits up on
                # the converged plateau instead — late-training noise
                # sits 1.2-1.7x above the stale minimum permanently
                # (acaq_r4_hybrid_trace.json, bits 7 -> 27.8 after
                # it2400). infl is clamped at 1: adaptation making the
                # quantized forward "better than fp" is not a mandate to
                # shrink faster. max(): grow if EITHER real quant noise
                # or degradation exceeds the band; shrink only when both
                # are clean.
                traj = new_loss_ema / jnp.maximum(new_loss_slow, 1e-30)
                current = jnp.maximum(
                    jnp.maximum(infl_ema, traj), 1.0
                )
                ref = jnp.asarray(1.0, jnp.float32)
            else:
                current, ref = new_loss_ema, jnp.asarray(1.0, jnp.float32)
            new_q, _ = acaq_controller_update(q, current, ref, fc.quant)
            return new_q, infl_ema

        active = (step >= config.acaq_start_iter) & (
            step % config.acaq_interval == 0
        )
        new_quant, new_infl_ema = jax.lax.cond(
            active, run_controller, lambda q, f: (q, f),
            new_quant, new_infl_ema,
        )

    # Occupancy-grid EMA refresh (reads the UPDATED field, no gradients).
    new_occ = state["occ"]
    if rc.occupancy is not None:
        oc = rc.occupancy
        mlp_name = "fine" if "fine" in new_params else "coarse"

        def refresh(occ):
            return occupancy_update(
                k_occ, occ,
                lambda pts: sigma_query(new_params, mlp_name, pts, fc),
                oc,
            )

        new_occ = jax.lax.cond(
            step % oc.update_interval == 0, refresh, lambda o: o, new_occ
        )

    new_ema = state.get("ema")
    if config.ema_decay > 0.0 and new_ema is not None:
        d = config.ema_decay
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
            new_ema, new_params,
        )

    new_state: TrainState = {
        "params": new_params,
        "opt": new_opt,
        "quant": new_quant,
        "occ": new_occ,
        "ema": new_ema,
        "step": step + 1,
        "best_loss": jnp.minimum(state["best_loss"], new_loss_ema),
        "loss_ema": new_loss_ema,
        "loss_ema_slow": new_loss_slow,
        "infl_ema": new_infl_ema,
    }

    psnr = -10.0 * jnp.log(aux["img_loss"]) / jnp.log(10.0)
    metrics = {
        "loss": loss,
        "img_loss": aux["img_loss"],
        "psnr": psnr,
        "lr": lr,
    }
    if config.reg_depth_tv_weight > 0:
        metrics["reg_depth_tv"] = aux["reg_depth_tv"]
    for k, v in aux.items():
        if k.startswith("structural_"):
            metrics[k] = v
    return new_state, metrics
