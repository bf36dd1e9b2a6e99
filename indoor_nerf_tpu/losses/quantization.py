"""A-CAQ: learned-bitwidth fake quantization of hash tables and MLP tensors.

TPU-native redesign of PocketNeRF/quantization.py plus the A-CAQ heuristic
bitwidth controller embedded in the reference train loop
(reference: run_nerf.py:1182-1286).

Key observation carried over from the reference: the quantizer "parameters"
(``soft_bits``, ``range_scale``, ``v_max``) receive NO gradients — the
straight-through estimator ``x + (x_dq - x).detach()`` detaches every
scale-dependent term — so they are plain state, not trainable params. Here
they live in a ``quant_state`` pytree updated by (a) a one-shot running
min/max calibration on the first training batch
(reference: quantization.py:97-119) and (b) the every-10-iters heuristic
controller (reference: run_nerf.py:1226-1252). Both updates are pure
functions of the state and run inside the jitted train step under
``lax.cond`` — no host round-trips on the hot path.

Per-level hash quantizers are vectorized: one state pytree with ``[L]``
leaves instead of L modules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

QuantState = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Static quantization hyperparameters.

    (reference defaults: quantization.py:73, run_nerf.py:678-713,
    hash_encoding.py:25 for the warmup)
    """

    init_bits: float = 8.0
    min_bits: float = 2.0
    max_bits: float = 32.0
    n_embed_levels: int = 16
    n_act_quantizers: int = 1  # NeRFSmall num_layers - 1
    warmup_steps: int = 500  # hash-quant warmup, in optimizer steps
    bit_penalty: float = 1e-3
    target_metric: Optional[float] = None  # MGL target; None = MDL mode
    acaq_interval: int = 10
    # Per-step decay of the quantized-loss EMA (0.99 = ~100-step window;
    # used for best_loss observability and as MGL mode's smoothed
    # "current loss"). The MDL signal is separate: an EMA of the PAIRED
    # inflation ratio (this batch's quantized loss / the SAME batch's
    # quant-bypassed loss, train/step.py state["infl_ema"], updated every
    # controller interval with decay fp_ref_ema_decay) — see
    # acaq_controller_update for why self-tracking and unpaired anchors
    # both fail.
    loss_ema_decay: float = 0.99
    fp_ref_ema_decay: float = 0.9  # infl-ratio EMA decay, per interval
    # MDL loss-inflation tolerance: bits shrink while the quantized loss
    # stays under ``mdl_tolerance * ref_loss``. The controller's band
    # structure (shrink below 1.05x target, grow above) settles the
    # quantized loss at ~1.05 * mdl_tolerance * ref_loss, so the accepted
    # quality cost is ~10*log10(1.05 * mdl_tolerance) dB. The reference's
    # 1.2 (run_nerf.py:1216) therefore ACCEPTS ~1 dB of quantization cost
    # by construction — measured exactly that (-1.04 dB held-out vs
    # fixed-8 at 4000 iters, acaq_experiment_r4_4000.json). Default 1.0
    # targets ~0.2 dB; see DIVERGENCES.md #35 and the 4000-iter tolerance
    # sweep in BENCH_NOTES.md. Effective floor is 1.0: the MDL signal is
    # clamped to >= 1.0 (train/step.py — adaptation making the quantized
    # forward "better than fp" is not a mandate to shrink faster), so any
    # tolerance below ~1/1.05 would make the controller read permanent
    # inflation and ratchet bits to max_bits. Validated in __post_init__.
    mdl_tolerance: float = 1.0

    def __post_init__(self):
        if self.mdl_tolerance < 1.0:
            raise ValueError(
                f"mdl_tolerance={self.mdl_tolerance} < 1.0: the MDL "
                "controller signal is clamped to >= 1.0, so tolerances "
                "below 1.0 silently ratchet bits to max_bits (the loss "
                "ratio always exceeds the 1.05x grow band). Use >= 1.0."
            )


def _group(shape, init_bits: float, symmetric: bool) -> QuantState:
    """One vectorized quantizer group (reference: quantization.py:73-95)."""
    g = {
        "soft_bits": jnp.full(shape, init_bits, jnp.float32),
        "range_scale": jnp.full(shape, 0.0002, jnp.float32),
        "running_min": jnp.full(shape, jnp.inf, jnp.float32),
        "running_max": jnp.full(shape, -jnp.inf, jnp.float32),
        "calibrated": jnp.zeros(shape, jnp.bool_),
    }
    if not symmetric:
        g["v_max"] = jnp.full(shape, 0.0001, jnp.float32)
    return g


def init_quant_state(config: QuantConfig) -> QuantState:
    """Quantizer groups matching the reference layout: 16 asymmetric per-level
    embed quantizers (hash_encoding.py:45-51), ``num_layers-1`` asymmetric
    activation quantizers and 1 symmetric first-layer weight quantizer
    (run_nerf_helpers.py:220-233)."""
    return {
        "embed": _group((config.n_embed_levels,), config.init_bits, symmetric=False),
        "act": _group((config.n_act_quantizers,), config.init_bits, symmetric=False),
        "weight": _group((), config.init_bits, symmetric=True),
    }


def fake_quant_fixed(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    num_bits: int,
    symmetric: bool = True,
    train: bool = True,
) -> jnp.ndarray:
    """Fixed-bitwidth affine fake quantization with STE
    (reference: quantization.py:6-62)."""
    if symmetric:
        qmin, qmax = -(2 ** (num_bits - 1)), 2 ** (num_bits - 1) - 1
    else:
        qmin, qmax = 0, 2**num_bits - 1
    x_scaled = x / scale
    if not symmetric:
        x_scaled = x_scaled + zero_point
    x_quant = jnp.clip(jnp.round(x_scaled), qmin, qmax)
    x_dequant = (x_quant - zero_point) * scale
    if train:
        return x + jax.lax.stop_gradient(x_dequant - x)
    return x_dequant


def calibrate(group: QuantState, x: jnp.ndarray, symmetric: bool,
              momentum: float = 0.05) -> QuantState:
    """Running min/max calibration: instant-EXPAND, EMA-shrink.

    DIVERGENCE from the reference's one-shot first-batch calibration
    (quantization.py:97-119, frozen by the ``calibrated`` flag): NeRF
    weights/activations/tables GROW for thousands of steps after any
    early calibration point, so a frozen range clamps nearly everything
    that is learned afterwards — quantized training collapses (measured
    10 dB vs 24 dB fp at 150 steps; the reference's own quality note,
    debug.py:88, is for its PASSTHROUGH quantizer). Here the range tracks
    the content, as in standard QAT observers: it widens instantly to
    cover the current batch (never clamps new content) and shrinks with
    an EMA when values retreat. First call adopts the batch range
    exactly. ``calibrated`` now only gates eval-time quantization (it
    flips on at the first train call).
    """
    done = group["calibrated"]
    bmin = jnp.min(x)
    bmax = jnp.max(x)
    ema_min = (1.0 - momentum) * group["running_min"] + momentum * bmin
    ema_max = (1.0 - momentum) * group["running_max"] + momentum * bmax
    new_min = jnp.where(done, jnp.minimum(ema_min, bmin), bmin)
    new_max = jnp.where(done, jnp.maximum(ema_max, bmax), bmax)
    new = dict(group)
    new["running_min"] = new_min
    new["running_max"] = new_max
    if symmetric:
        max_abs = jnp.maximum(jnp.abs(new_min), jnp.abs(new_max))
        new["range_scale"] = 2.0 * max_abs
    else:
        new["range_scale"] = new_max - new_min
        new["v_max"] = new_max
    new["calibrated"] = jnp.ones_like(done)
    return new


def learned_fake_quant(
    x: jnp.ndarray,
    group: QuantState,
    config: QuantConfig,
    symmetric: bool,
    train: bool = True,
    idx=None,
) -> jnp.ndarray:
    """LearnedBitwidthQuantizer.forward (reference: quantization.py:144-187).

    Args:
      x: tensor to fake-quantize.
      group: quantizer group state; if ``idx`` is given, the group leaves are
        indexed (vectorized per-level quantizers).
      symmetric: weights use symmetric, embeddings/activations asymmetric.
      train: soft (float) bitwidth vs rounded integer bitwidth.
    """
    get = (lambda v: v if idx is None else v[idx])
    soft_bits = get(group["soft_bits"])
    range_scale = get(group["range_scale"])

    bits = jnp.clip(soft_bits, config.min_bits, config.max_bits)
    int_bits = jnp.round(bits)
    b = bits if train else int_bits
    # DIVERGENCE (bug fix, DIVERGENCES.md #37): the reference computes the
    # clip bounds from the *rounded* bitwidth while the scale uses the
    # *soft* bitwidth in training (quantization.py:131-142 vs :155-157).
    # Whenever soft > int (every controller GROW phase) the representable
    # range range_scale * (2^int - 1) / (2^soft - 1) covers only
    # ~2^(int-soft) of the calibrated range — up to 29% of the top of the
    # range is clamped to qmax. That distortion is INDEPENDENT of the bit
    # level, so the MDL controller's paired deviation signal never falls
    # as bits grow: deviation -> grow -> soft drifts above int -> more
    # clipping -> deviation. Measured ratchet to max_bits with dev_ema
    # pinned at 1.05-1.13 from 8 to 24 bits, then outright training
    # collapse as persistent top-range clipping accumulates
    # (acaq_r5_4000.json pre-fix trace). Fix: the clip bounds follow the
    # SAME bitwidth as the scale (soft in training, integer at eval), so
    # the quantizer always represents exactly the calibrated range.
    if symmetric:
        qmin = -jnp.exp2(b - 1.0)
        qmax = jnp.exp2(b - 1.0) - 1.0
    else:
        qmin = jnp.zeros_like(b)
        qmax = jnp.exp2(b) - 1.0
    if symmetric:
        scale = range_scale / jnp.exp2(b - 1.0)
        zero_point = jnp.zeros_like(scale)
    else:
        range_val = jnp.clip(range_scale, min=1e-8)
        scale = range_val / (jnp.exp2(b) - 1.0)
        # DIVERGENCE (bug fix): the reference anchors the zero point at
        # v_max/scale (quantization.py:169), which maps the top of the range
        # to ZERO after dequantization — for ReLU activations (min == 0)
        # every positive value collapses to ~0 and training dies (measured:
        # 9.75 dB vs 31.8 dB fp32). The standard min-anchored zero point
        # reproduces the reference's behavior exactly on symmetric-around-0
        # data (e.g. hash embeddings: both give zp = 2^(B-1)) and is correct
        # for one-sided data.
        running_min = get(group["running_min"])
        zero_point = jnp.round(jnp.clip(-running_min / scale, qmin, qmax))

    # Guard the division MULTIPLICATIVELY: the reference adds an absolute
    # epsilon (quantization.py:180 `scale + 1e-8`), which DOMINATES the true
    # scale once range/2^bits < 1e-8 (reached at ~24+ bits for trained
    # ranges, or ~13 bits for the 1e-4-scale init) — x is then scaled by
    # 1e8 but dequantized by the tiny real scale, collapsing every value
    # toward zero. Measured: the A-CAQ MDL controller ratchets bits up
    # after convergence (its loss can never beat best*1.2 once the fit
    # saturates) and training COLLAPSED from 49 dB to 24 dB as bits
    # crossed ~24 (BENCH_NOTES.md). Divergence documented in
    # DIVERGENCES.md.
    safe_scale = jnp.maximum(scale, 1e-30)
    x_scaled = x / safe_scale
    x_quant = jnp.clip(jnp.round(x_scaled + zero_point), qmin, qmax)
    x_dequant = (x_quant - zero_point) * safe_scale
    # High-bits bypass: beyond f32's 24-bit mantissa the rounding itself
    # is numerically meaningless (round(x/scale) with x/scale > 2^24 is
    # identity noise) and quantization at >= 24 bits is a mathematical
    # no-op for f32 data anyway — pass through exactly.
    x_dequant = jnp.where(bits >= 24.0, x, x_dequant)
    if train:
        return x + jax.lax.stop_gradient(x_dequant - x)
    return x_dequant


def passthrough_quant(x: jnp.ndarray) -> jnp.ndarray:
    """No-op quantizer for A/B debugging (reference: quantization.py:197-208,
    PassthroughQuantizer — bit_width reports 32)."""
    return x


PASSTHROUGH_BITS = 32.0


def _flat_bits(state: QuantState) -> jnp.ndarray:
    """All soft bitwidths concatenated in the reference's controller order:
    16 embed levels, then act quantizers, then the weight quantizer
    (reference: run_nerf.py:1184-1194)."""
    return jnp.concatenate(
        [
            state["embed"]["soft_bits"],
            state["act"]["soft_bits"],
            state["weight"]["soft_bits"][None],
        ]
    )


def average_bits(state: QuantState, config: QuantConfig) -> jnp.ndarray:
    """Mean clamped bitwidth over all quantizers (FQR,
    reference: quantization.py:211-224)."""
    return jnp.mean(
        jnp.clip(_flat_bits(state), config.min_bits, config.max_bits)
    )


def acaq_controller_update(
    state: QuantState,
    current_loss: jnp.ndarray,
    ref_loss: jnp.ndarray,
    config: QuantConfig,
) -> Tuple[QuantState, jnp.ndarray]:
    """One A-CAQ bitwidth-controller step (reference: run_nerf.py:1210-1252).

    Per quantizer i (in the reference's flat ordering):
      loss_ratio = loss / target        (target = MGL target, or MDL
                                         ref_loss * 1.2)
      delta = -0.3 | -0.1 | +0.2        by loss_ratio thresholds 0.95 / 1.05
      delta -= bit_penalty * bits / 8
      delta *= 1 + (i - n/2) * 0.02     (layer factor)
      soft_bits = clip(soft_bits + delta, min_bits, max_bits)

    In MDL mode the caller (train/step.py) passes ``current_loss`` =
    max(paired-inflation EMA, trajectory-degradation ratio) and
    ``ref_loss`` = 1.0, a hybrid signal reached through FOUR measured
    failures of simpler anchors (DIVERGENCES.md #33/#35, the committed
    acaq_* JSONs): (a) the reference's raw ``best_loss * 1.2``
    (run_nerf.py:1214-1222) ratchets to max_bits — the raw minimum is an
    extreme-value statistic (avg 32.0 bits at 4000 iters); (b) a
    smoothed SELF-anchor reads "better than target" while training
    improves — bits ratchet to min (avg 3.0, -1 dB vs fixed-8); (c) two
    UNPAIRED estimators (quantized-loss EMA vs fp-loss EMA) leave
    trend-lag + variance residuals of 5-20% that swamp the 5% bands —
    bits park at 12-21 for every tolerance <= 1.15; (d) the PAIRED
    per-batch ratio quantized/bypassed cancels the trend exactly but is
    blind to TRAJECTORY cost — under STE the weights adapt to the
    quantizer, so the ratio reads ~1 even at destructively low bits
    (bits walk to 2.0, training collapses). The hybrid covers both
    axes: the paired ratio catches instantaneous quant noise, the
    both-sides-EMA'd ``loss_ema / min-over-time(loss_ema)`` catches
    absolute degradation, and bits shrink only when BOTH are within
    tolerance. With tolerance t, bits equilibrate where the worse of
    the two costs ~ t (``config.mdl_tolerance``; the reference
    hard-codes 1.2, accepting ~1 dB by construction).

    Returns (new_state, target_metric). Pure: callers gate it on
    ``step % acaq_interval == 0`` with ``lax.cond``.
    """
    if config.target_metric is not None:
        target = jnp.asarray(config.target_metric, jnp.float32)
    else:
        target = ref_loss * config.mdl_tolerance

    bits = _flat_bits(state)
    n = bits.shape[0]
    loss_ratio = current_loss / target
    base_delta = jnp.where(
        loss_ratio < 0.95, -0.3, jnp.where(loss_ratio < 1.05, -0.1, 0.2)
    )
    delta = base_delta - config.bit_penalty * bits / 8.0
    layer_factor = 1.0 + (jnp.arange(n, dtype=jnp.float32) - n / 2.0) * 0.02
    delta = delta * layer_factor
    new_bits = jnp.clip(bits + delta, config.min_bits, config.max_bits)

    n_embed = state["embed"]["soft_bits"].shape[0]
    n_act = state["act"]["soft_bits"].shape[0]
    new_state = jax.tree_util.tree_map(lambda v: v, state)  # shallow copy
    new_state["embed"] = dict(state["embed"], soft_bits=new_bits[:n_embed])
    new_state["act"] = dict(
        state["act"], soft_bits=new_bits[n_embed : n_embed + n_act]
    )
    new_state["weight"] = dict(state["weight"], soft_bits=new_bits[-1])
    return new_state, target
