"""The radiance field: encoders + MLP + out-of-bbox masking, as one pure query.

Equivalent of the reference's ``run_network`` plumbing plus ``create_nerf``
model assembly (reference: PocketNeRF/run_nerf.py:53-68, 218-278), redesigned
so the whole encode→MLP→mask pipeline is a single fixed-shape jitted function
over ``[R, S, 3]`` sample grids — no python chunking (the reference's
``batchify``/``netchunk``, run_nerf.py:43-50, is replaced by XLA tiling and,
for full images, ``lax.map`` over ray tiles in the renderer).

Fixed reference bugs (documented divergences):
- sigma (channel 3) is zeroed for out-of-bbox points; the reference zeroes
  the LAST channel (run_nerf.py:66), which is a *normal component* when
  predict_normals is on.
- every encoder returns (features, keep_mask) uniformly; the reference's PE
  path returns a bare tensor and would crash in run_network.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from indoor_nerf_tpu.losses.quantization import (
    QuantConfig,
    QuantState,
    calibrate,
    learned_fake_quant,
)
from indoor_nerf_tpu.ops.blockhash import (
    BlockHashConfig,
    block_hash_encode,
    init_block_table,
)
from indoor_nerf_tpu.ops.encoding import (
    HashGridConfig,
    hash_grid_indices,
    init_hash_table,
    positional_encode,
    positional_encode_dim,
    sh_encode,
    trilinear_interp,
)
from indoor_nerf_tpu.models.mlp import (
    apply_nerf_big,
    apply_nerf_small,
    init_nerf_big,
    init_nerf_small,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static model configuration (mirrors create_nerf's choices,
    reference: run_nerf.py:218-278). i_embed extends the reference's
    {0: PE, 1: hash} with 3: the TPU-native block-hash grid
    (ops/blockhash.py) — same capability, wide-row memory layout."""

    grid: Optional[HashGridConfig] = None
    block_grid: Optional["BlockHashConfig"] = None
    i_embed: int = 1  # 1 = hash grid, 0 = positional encoding, 3 = block-hash
    i_embed_views: int = 2  # 2 = SH degree 4, 0 = positional encoding, -1 = none
    multires: int = 10
    multires_views: int = 4
    use_viewdirs: bool = True
    predict_normals: bool = False
    n_importance: int = 0
    # NeRFSmall (hash path; reference: run_nerf.py:240-247)
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    # big NeRF (PE path; reference: run_nerf.py:249-253)
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    # quantization
    use_quantization: bool = False
    quant: QuantConfig = QuantConfig()
    # FreeNeRF-style frequency annealing (Yang et al., CVPR 2023): ramp the
    # ACTIVE grid levels linearly over this many steps (0 = off). Extension
    # aimed at the few-shot radiance-ambiguity failure the reference's
    # geometric priors do not address (BENCH_NOTES.md few-shot study):
    # early training sees only coarse levels, so the field commits to
    # low-frequency structure before the fine hashed levels can memorize
    # per-view radiance. Applied to the grid encodings (i_embed 1/3) as a
    # per-level feature mask inside the jitted step; eval renders (step
    # None) always use every level.
    freq_anneal_iters: int = 0
    # View-dependence annealing (0 = off): scale the encoded view-direction
    # features by ``clip(step/iters, 0, 1)`` inside the jitted step, so the
    # first iterations fit a DIFFUSE field and view-dependent radiance can
    # only explain what geometry could not. This targets the few-shot
    # radiance-ambiguity failure directly at the appearance level (the
    # round-2 diagnosis: with 8 views the color net absorbs per-view
    # radiance through the view branch instead of fixing geometry —
    # BENCH_NOTES.md few-shot study; frequency annealing above attacks the
    # same failure from the capacity side and measured as a train-side
    # memorization suppressor only). Eval renders (step None) always see
    # full view-dependence.
    view_anneal_iters: int = 0
    # Per-image appearance latents (0 = off): a zero-init [n_appearance,
    # input_ch_views] table whose rows are ADDED to the encoded view
    # directions of that image's training rays (NeRF-W-style appearance
    # embedding, Martin-Brualla et al., CVPR 2021, applied in view-feature
    # space so MLP shapes are unchanged). Models per-image exposure /
    # white-balance residuals in real captures — the failure the iPhone
    # pipeline's EV normalization (PocketNeRF notebook cell 5) only
    # partially removes. Zero-init = exact no-op at start; eval renders
    # pass no image ids and see the unbiased view encoding (the NeRF-W
    # "mean embedding" eval convention for a zero-mean-init table).
    n_appearance: int = 0
    # MLP compute precision: "float32" or "bfloat16" (params stay f32
    # masters; matmuls cast inputs/weights with f32 accumulation)
    compute_dtype: str = "float32"

    @property
    def input_ch(self) -> int:
        if self.i_embed == 1:
            return self.grid.out_dim
        if self.i_embed == 3:
            return self.block_grid.out_dim
        return positional_encode_dim(self.multires)

    @property
    def uses_grid(self) -> bool:
        return self.i_embed in (1, 3)

    @property
    def input_ch_views(self) -> int:
        if not self.use_viewdirs:
            return 0
        if self.i_embed_views == 2:
            return 16  # SH degree 4
        return positional_encode_dim(self.multires_views)


def field_output_channels(config: FieldConfig) -> int:
    return 7 if config.predict_normals else 4


def init_field_params(key: jax.Array, config: FieldConfig) -> Params:
    """Init the full field: shared hash table + coarse (+fine) MLP.

    The hash table is SHARED between coarse and fine networks, exactly like
    the reference's single embed_fn used by both (run_nerf.py:275-278).
    """
    k_table, k_coarse, k_fine = jax.random.split(key, 3)
    params: Params = {}
    if config.uses_grid:
        if config.i_embed == 1:
            params["table"] = init_hash_table(k_table, config.grid)
        else:
            params["table"] = init_block_table(k_table, config.block_grid)
        params["coarse"] = init_nerf_small(
            k_coarse,
            input_ch=config.input_ch,
            input_ch_views=config.input_ch_views,
            num_layers=config.num_layers,
            hidden_dim=config.hidden_dim,
            geo_feat_dim=config.geo_feat_dim,
            num_layers_color=config.num_layers_color,
            hidden_dim_color=config.hidden_dim_color,
            predict_normals=config.predict_normals,
        )
        if config.n_importance > 0:
            params["fine"] = init_nerf_small(
                k_fine,
                input_ch=config.input_ch,
                input_ch_views=config.input_ch_views,
                num_layers=config.num_layers,
                hidden_dim=config.hidden_dim,
                geo_feat_dim=config.geo_feat_dim,
                num_layers_color=config.num_layers_color,
                hidden_dim_color=config.hidden_dim_color,
                predict_normals=config.predict_normals,
            )
    else:
        params["coarse"] = init_nerf_big(
            k_coarse,
            D=config.netdepth,
            W=config.netwidth,
            input_ch=config.input_ch,
            input_ch_views=config.input_ch_views,
            output_ch=5 if config.n_importance > 0 else 4,
            use_viewdirs=config.use_viewdirs,
        )
        if config.n_importance > 0:
            params["fine"] = init_nerf_big(
                k_fine,
                D=config.netdepth_fine,
                W=config.netwidth_fine,
                input_ch=config.input_ch,
                input_ch_views=config.input_ch_views,
                output_ch=5,
                use_viewdirs=config.use_viewdirs,
            )
    if config.n_appearance > 0 and config.use_viewdirs:
        # Zero-init: training starts bit-identical to the no-appearance
        # field; rows only move where a train image's rays demand it.
        params["appearance"] = jnp.zeros(
            (config.n_appearance, config.input_ch_views), jnp.float32
        )
    return params


def _quantize_corner_feats(
    corner_feats: jnp.ndarray,
    quant_state: QuantState,
    config: FieldConfig,
    train: bool,
    step: jnp.ndarray,
) -> Tuple[jnp.ndarray, QuantState]:
    """Per-level learned fake quantization of gathered corner features.

    Vectorized over all 16 levels at once (the reference loops python-side,
    hash_encoding.py:97-101). Gated by the warmup schedule
    (hash_encoding.py:25-26,98): inactive for step < warmup_steps.
    """
    qc = config.quant
    group = quant_state["embed"]
    if step is None:
        # Eval-time render (no traced step): the quantizer is active iff the
        # warmup passed during training, which is exactly when calibration
        # ran (reference keeps a persistent counter on the embedder,
        # hash_encoding.py:25-26). Per-level [L] -> [1, L, 1, 1].
        active = group["calibrated"][None, :, None, None]
    else:
        active = step >= qc.warmup_steps

    if train:
        # Running calibration: instant-expand / EMA-shrink while active
        # (per-level min/max over the [N, 8, F] axes) — see
        # losses/quantization.py::calibrate for why a frozen one-shot
        # range collapses training.
        m = 0.05
        lvl_min = jnp.min(corner_feats, axis=(0, 2, 3))
        lvl_max = jnp.max(corner_feats, axis=(0, 2, 3))
        done = group["calibrated"]
        ema_min = (1.0 - m) * group["running_min"] + m * lvl_min
        ema_max = (1.0 - m) * group["running_max"] + m * lvl_max
        new_min = jnp.where(done, jnp.minimum(ema_min, lvl_min), lvl_min)
        new_max = jnp.where(done, jnp.maximum(ema_max, lvl_max), lvl_max)
        act_l = jnp.broadcast_to(jnp.asarray(active).reshape(-1),
                                 done.shape)  # [L]
        new_group = dict(group)
        new_group["running_min"] = jnp.where(act_l, new_min,
                                             group["running_min"])
        new_group["running_max"] = jnp.where(act_l, new_max,
                                             group["running_max"])
        new_group["range_scale"] = jnp.where(
            act_l, new_max - new_min, group["range_scale"])
        new_group["v_max"] = jnp.where(act_l, new_max, group["v_max"])
        new_group["calibrated"] = group["calibrated"] | act_l
        group = new_group

    def bc(v):  # [L] -> [1, L, 1, 1]
        return v[None, :, None, None]

    bits = jnp.clip(group["soft_bits"], qc.min_bits, qc.max_bits)
    int_bits = jnp.round(bits)
    b = bits if train else int_bits
    # Same three fixes as losses/quantization.py::learned_fake_quant
    # (DIVERGENCES.md #37, #11): clip bounds follow the SAME bitwidth as
    # the scale (soft in training — the reference's int-bits bounds clamp
    # up to 29% of the range whenever soft > int, the bits-independent
    # distortion behind the A-CAQ ratchet), the scale guard is
    # MULTIPLICATIVE (the reference's `scale + 1e-8` dominates the true
    # step beyond ~26 bits and shrinks everything toward zero), and
    # >= 24 bits passes through exactly (a no-op for f32 data).
    qmin = jnp.zeros_like(b)
    qmax = jnp.exp2(b) - 1.0
    scale = jnp.clip(group["range_scale"], min=1e-8) / (jnp.exp2(b) - 1.0)
    safe_scale = jnp.maximum(scale, 1e-30)
    # Min-anchored zero point (see losses/quantization.py for the bug-fix
    # rationale vs the reference's v_max anchoring).
    zero_point = jnp.round(
        jnp.clip(-group["running_min"] / safe_scale, qmin, qmax))

    x_scaled = corner_feats / bc(safe_scale)
    x_quant = jnp.clip(jnp.round(x_scaled + bc(zero_point)), bc(qmin), bc(qmax))
    x_dequant = (x_quant - bc(zero_point)) * bc(safe_scale)
    x_dequant = jnp.where(bc(bits >= 24.0), corner_feats, x_dequant)
    if train:
        q = corner_feats + jax.lax.stop_gradient(x_dequant - corner_feats)
    else:
        q = x_dequant

    out = jnp.where(active, q, corner_feats)
    new_state = dict(quant_state)
    new_state["embed"] = group
    return out, new_state


def _quantize_block_table(
    table: jnp.ndarray,
    quant_state: QuantState,
    config: FieldConfig,
    train: bool,
    step: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, QuantState]:
    """Per-level learned fake quantization of the block-hash table.

    Same A-CAQ semantics as ``_quantize_corner_feats`` (warmup gate, one-shot
    per-level calibration, STE, soft bits in train / rounded in eval), but
    applied to the ``[L*R, F*128]`` TABLE before the row gather instead of to
    the gathered features after it. Because the gather is a linear selection,
    quantize-then-gather is mathematically identical to the reference's
    gather-then-quantize (hash_encoding.py:97-101) — and ~50x cheaper here,
    since one training batch gathers far more row elements than the table
    holds. Calibration min/max therefore ranges over the whole level table
    (a superset of any batch; dead padding lanes sit at their +-1e-4 init and
    never widen a trained level's range).
    """
    qc = config.quant
    group = quant_state["embed"]
    bg = config.block_grid
    L = bg.n_levels
    if step is None:
        active = group["calibrated"][:, None]  # [L, 1]
    else:
        active = jnp.asarray(step >= qc.warmup_steps)

    t = table.reshape(L, -1)  # [L, R * F * 128]

    # LIVE per-level range, recomputed every call. DIVERGENCE from the
    # reference's one-shot first-batch calibration (quantization.py:97-119,
    # a cost hack for batch-dependent features): the table keeps growing
    # for thousands of steps after any early calibration point, so a
    # frozen range clamps nearly all of it and training collapses
    # (measured 13.0 dB vs 41.8 fp on the flagship — acaq_experiment.json
    # pre-fix). The table is not batch-dependent, so the EXACT range is
    # one cheap [L, R*F*128] reduction per step; quantization stays a pure
    # function of the current table. State still records the values for
    # logging/inspection.
    lvl_min = jnp.min(t, axis=1)
    lvl_max = jnp.max(t, axis=1)
    if train:
        new_group = dict(group)
        new_group["running_min"] = lvl_min
        new_group["running_max"] = lvl_max
        new_group["range_scale"] = lvl_max - lvl_min
        new_group["v_max"] = lvl_max
        new_group["calibrated"] = group["calibrated"] | active
        group = new_group

    bits = jnp.clip(group["soft_bits"], qc.min_bits, qc.max_bits)
    int_bits = jnp.round(bits)
    b = bits if train else int_bits
    # Same three fixes as losses/quantization.py::learned_fake_quant
    # (DIVERGENCES.md #37, #11): soft-consistent clip bounds,
    # multiplicative scale guard, exact >= 24-bit passthrough. The
    # pre-fix additive `scale + 1e-8` was the it2400+ collapse in
    # acaq_r5_4000_fix.json: at 28+ table bits the epsilon is 5-40% of
    # the true step, so the WHOLE dequantized table shrank by that
    # factor every forward while STE gradients never saw it.
    qmin = jnp.zeros_like(b)
    qmax = jnp.exp2(b) - 1.0
    scale = jnp.clip(lvl_max - lvl_min, min=1e-8) / (jnp.exp2(b) - 1.0)
    safe_scale = jnp.maximum(scale, 1e-30)
    zero_point = jnp.round(jnp.clip(-lvl_min / safe_scale, qmin, qmax))

    def col(v):  # [L] -> [L, 1]
        return v[:, None]

    x_scaled = t / col(safe_scale)
    x_quant = jnp.clip(jnp.round(x_scaled + col(zero_point)), col(qmin), col(qmax))
    x_dequant = (x_quant - col(zero_point)) * col(safe_scale)
    x_dequant = jnp.where(col(bits >= 24.0), t, x_dequant)
    if train:
        q = t + jax.lax.stop_gradient(x_dequant - t)
    else:
        q = x_dequant

    out = jnp.where(active, q, t).reshape(table.shape)
    new_state = dict(quant_state)
    new_state["embed"] = group
    return out, new_state


def level_anneal_weights(step: jnp.ndarray, n_levels: int,
                         anneal_iters: int) -> jnp.ndarray:
    """Per-level feature weights for FreeNeRF-style frequency annealing.

    Level l's weight is ``clip(progress * (L-1) + 1 - l, 0, 1)`` with
    ``progress = step / anneal_iters`` — level 0 is always fully active, the
    frontier level fades in linearly, and all levels are active from
    ``anneal_iters`` on (the linear schedule of FreeNeRF eq. 3-4 applied to
    grid levels instead of PE bands)."""
    progress = jnp.clip(step / float(anneal_iters), 0.0, 1.0)
    l = jnp.arange(n_levels, dtype=jnp.float32)
    return jnp.clip(progress * (n_levels - 1) + 1.0 - l, 0.0, 1.0)


def _apply_level_anneal(feats: jnp.ndarray, config: FieldConfig,
                        step: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mask ``[N, L*F]`` grid features by the anneal schedule (no-op when
    annealing is off or no step is traced, i.e. eval renders)."""
    if config.freq_anneal_iters <= 0 or step is None:
        return feats
    grid_cfg = config.block_grid if config.i_embed == 3 else config.grid
    L = grid_cfg.n_levels
    F = grid_cfg.n_features_per_level
    w = level_anneal_weights(step, L, config.freq_anneal_iters)
    return (feats.reshape(-1, L, F) * w[None, :, None]).reshape(feats.shape)


def encode_position(
    x: jnp.ndarray,
    params: Params,
    config: FieldConfig,
    quant_state: Optional[QuantState] = None,
    train: bool = True,
    step: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[QuantState]]:
    """Encode flat ``[N, 3]`` positions. Returns (feats, keep_mask, quant_state)."""
    if config.i_embed == 1:
        flat_idx, weights, keep = hash_grid_indices(x, config.grid)
        corner_feats = jnp.take(params["table"], flat_idx, axis=0)  # [N, L, 8, F]
        if config.use_quantization and quant_state is not None:
            corner_feats, quant_state = _quantize_corner_feats(
                corner_feats, quant_state, config, train, step
            )
        feats = trilinear_interp(corner_feats, weights)
        feats = _apply_level_anneal(
            feats.reshape(x.shape[0], config.grid.out_dim), config, step)
        return feats, keep, quant_state
    if config.i_embed == 3:
        # TPU-native block-hash path: A-CAQ fake-quant applies to the table
        # itself (see _quantize_block_table — identical math, far cheaper).
        table = params["table"]
        if config.use_quantization and quant_state is not None:
            table, quant_state = _quantize_block_table(
                table, quant_state, config, train, step
            )
        from indoor_nerf_tpu.parallel.tp import current_block_tp

        tp = current_block_tp()
        if tp is not None:
            from indoor_nerf_tpu.parallel.tp import tp_block_encode

            feats, keep = tp_block_encode(x, table, config.block_grid, *tp)
        else:
            feats, keep = block_hash_encode(x, table, config.block_grid)
        return _apply_level_anneal(feats, config, step), keep, quant_state
    feats = positional_encode(x, config.multires)
    return feats, jnp.ones(x.shape[0], jnp.bool_), quant_state


def encode_views(dirs: jnp.ndarray, config: FieldConfig) -> jnp.ndarray:
    if config.i_embed_views == 2:
        return sh_encode(dirs, degree=4)
    return positional_encode(dirs, config.multires_views)


def sigma_query(
    params: Params,
    mlp_name: str,
    pts: jnp.ndarray,
    config: FieldConfig,
) -> jnp.ndarray:
    """Density-only field query for occupancy-grid refreshes.

    Runs encode + sigma net on ``[N, 3]`` points (no view branch, no color
    net, no quantizers) — the cheap query the occupancy grid needs.
    """
    feats, keep, _ = encode_position(pts, params, config, None, False, None)
    if config.uses_grid:
        h = feats
        sigma_net = params[mlp_name]["sigma_net"]
        for l, layer in enumerate(sigma_net):
            h = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32)
            if "b" in layer:
                h = h + layer["b"]
            if l != len(sigma_net) - 1:
                h = jax.nn.relu(h)
        sigma = h[..., 0]
    else:
        view_feats = (
            encode_views(jnp.zeros_like(pts), config)
            if config.use_viewdirs else None
        )
        raw = apply_nerf_big(
            params[mlp_name], feats, view_feats, use_viewdirs=config.use_viewdirs
        )
        sigma = raw[..., 3]
    return jnp.where(keep, sigma, 0.0)


def query_field(
    params: Params,
    mlp_name: str,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    config: FieldConfig,
    quant_state: Optional[QuantState] = None,
    train: bool = True,
    step: Optional[jnp.ndarray] = None,
    view_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[QuantState]]:
    """Query the radiance field on a ``[R, S, 3]`` sample grid.

    Args:
      mlp_name: "coarse" or "fine".
      viewdirs: ``[R, 3]`` unit view directions (broadcast over samples,
        reference: run_nerf.py:59-62) or None.
      view_bias: optional ``[R, D]`` additive bias on the encoded view
        directions (per-image appearance latents —
        FieldConfig.n_appearance); None for eval renders.

    Returns (raw ``[R, S, C]``, updated quant_state).
    """
    r, s, _ = pts.shape
    flat = pts.reshape(-1, 3)
    bg = config.block_grid
    if config.i_embed == 3 and bg is not None and (
            bg.ray_strides is not None or bg.ray_groups is not None):
        # Ray-structured encodes (ops/blockhash.py — the encode is row-
        # transaction bound both directions, so fewer rows = faster):
        # - ray_groups: one shared tile row per G consecutive samples at
        #   coarse levels, per-sample exact tent interp (the default
        #   fast path);
        # - ray_strides: knot decimation + lerp (legacy opt-in, lossy).
        from indoor_nerf_tpu.ops.blockhash import (
            block_hash_encode_grouped,
            block_hash_encode_strided,
        )

        assert not (bg.ray_strides is not None and bg.ray_groups is not None), \
            "ray_strides and ray_groups are mutually exclusive"
        table = params["table"]
        if config.use_quantization and quant_state is not None:
            table, quant_state = _quantize_block_table(
                table, quant_state, config, train, step
            )
        enc = (block_hash_encode_grouped if bg.ray_groups is not None
               else block_hash_encode_strided)
        feats3, keep2 = enc(pts, table, bg)
        feats = _apply_level_anneal(feats3.reshape(r * s, -1), config, step)
        keep = keep2.reshape(r * s)
    else:
        feats, keep, quant_state = encode_position(
            flat, params, config, quant_state, train, step
        )

    view_feats = None
    if config.use_viewdirs and viewdirs is not None:
        # SH/PE are pointwise in the direction and viewdirs are constant
        # along a ray: encode the R rays once and broadcast over samples
        # (S-fold less narrow-column stack work than per-sample encoding).
        vf = encode_views(viewdirs, config)  # [R, D]
        if config.view_anneal_iters > 0 and step is not None:
            # Diffuse-first ramp (see FieldConfig.view_anneal_iters).
            vf = vf * jnp.clip(
                step / float(config.view_anneal_iters), 0.0, 1.0)
        if view_bias is not None:
            # Per-image appearance latent (FieldConfig.n_appearance).
            vf = vf + view_bias
        view_feats = jnp.broadcast_to(
            vf[:, None, :], (r, s, vf.shape[-1])
        ).reshape(r * s, -1)

    if config.uses_grid:
        weight_quant = None
        act_quants = None
        if config.use_quantization and quant_state is not None:
            qc = config.quant
            if train:
                # Lazy calibration of MLP quantizers (first training batch).
                mlp = params[mlp_name]
                quant_state = dict(quant_state)
                quant_state["weight"] = calibrate(
                    quant_state["weight"], mlp["sigma_net"][0]["w"], symmetric=True
                )
            wq_state = quant_state

            def weight_quant(w):
                return learned_fake_quant(
                    w, wq_state["weight"], qc, symmetric=True, train=train
                )

            def make_act_quant(i):
                def act_quant(h):
                    st = wq_state["act"]
                    if train:
                        new = calibrate(
                            jax.tree_util.tree_map(lambda v: v[i], st),
                            h,
                            symmetric=False,
                        )
                        # fold per-call calibration back into the state
                        for k in new:
                            st[k] = st[k].at[i].set(new[k])
                    return learned_fake_quant(
                        h, st, qc, symmetric=False, train=train, idx=i
                    )

                return act_quant

            quant_state["act"] = dict(quant_state["act"])
            act_quants = [make_act_quant(i) for i in range(config.num_layers - 1)]

        raw = apply_nerf_small(
            params[mlp_name],
            feats,
            view_feats,
            predict_normals=config.predict_normals,
            weight_quant=weight_quant,
            act_quants=act_quants,
            compute_dtype=(
                jnp.bfloat16 if config.compute_dtype == "bfloat16" else None
            ),
        )
    else:
        raw = apply_nerf_big(
            params[mlp_name], feats, view_feats, use_viewdirs=config.use_viewdirs
        )

    # Zero sigma for out-of-bbox points (reference: run_nerf.py:66; fixed to
    # target the sigma channel, not the last channel).
    sigma = jnp.where(keep, raw[..., 3], 0.0)
    raw = jnp.concatenate([raw[..., :3], sigma[..., None], raw[..., 4:]], axis=-1)
    return raw.reshape(r, s, -1), quant_state
