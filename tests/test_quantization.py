"""Property tests for A-CAQ quantization, mirroring the reference's manual
debug harness (reference: PocketNeRF/debug.py:6-142) as real assertions:
hash-embedding-scale inputs, unique-value counts vs 2^bits, error
magnitudes, calibration and controller dynamics."""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.losses.quantization import (
    QuantConfig,
    acaq_controller_update,
    average_bits,
    calibrate,
    fake_quant_fixed,
    init_quant_state,
    learned_fake_quant,
)

CFG = QuantConfig(n_embed_levels=4, n_act_quantizers=1)


def _calibrated_group(x, symmetric):
    state = init_quant_state(CFG)
    group = state["weight"] if symmetric else {
        k: v[0] for k, v in state["act"].items()
    }
    return calibrate(group, x, symmetric=symmetric)


def test_fixed_quant_roundtrip_and_ste(rng):
    x = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    scale = jnp.asarray(np.abs(np.asarray(x)).max() / 127.0)
    q = fake_quant_fixed(x, scale, jnp.zeros(()), num_bits=8, train=False)
    # error bounded by half a quantization step
    assert float(jnp.max(jnp.abs(q - x))) <= float(scale) * 0.51
    # STE: gradient of sum(quantized) wrt x is exactly 1
    g = jax.grad(lambda x: jnp.sum(
        fake_quant_fixed(x, scale, jnp.zeros(()), 8, train=True)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_learned_quant_small_scale_inputs(rng):
    """debug.py's core check: quantizing hash-embedding-scale (~1e-4) values
    must preserve them (small relative error), not zero them out."""
    x = jnp.asarray(rng.uniform(-1e-4, 1e-4, size=(4096,)).astype(np.float32))
    group = _calibrated_group(x, symmetric=False)
    q = learned_fake_quant(x, group, CFG, symmetric=False, train=False)
    err = float(jnp.max(jnp.abs(q - x)))
    # 8-bit quantization of a 2e-4 range: step ~ 7.8e-7
    assert err < 2e-6, err


def test_learned_quant_high_bits_is_identity(rng):
    """At >= 24 soft bits the quantizer must pass values through EXACTLY.
    Regression for the measured A-CAQ long-horizon collapse: the
    reference's absolute epsilon (quantization.py:180 `scale + 1e-8`)
    dominates the true step once range/2^bits < 1e-8, scaling x by 1e8 and
    dequantizing by the tiny real scale — every value collapses toward 0
    as the MDL controller ratchets bits upward after convergence
    (49 dB -> 24 dB measured between iters 2500 and 3500)."""
    x = jnp.asarray(rng.uniform(-0.5, 0.5, size=(4096,)).astype(np.float32))
    group = _calibrated_group(x, symmetric=False)
    for bits in (24.0, 28.0, 32.0):
        g = dict(group)
        g["soft_bits"] = jnp.full_like(group["soft_bits"], bits)
        for train in (True, False):
            q = learned_fake_quant(x, g, CFG, symmetric=False, train=train)
            np.testing.assert_array_equal(np.asarray(q), np.asarray(x))
    # and 20 bits (below the bypass) must still be a faithful fine-grained
    # quantization, not a collapse: relative error tiny, values preserved.
    g = dict(group)
    g["soft_bits"] = jnp.full_like(group["soft_bits"], 20.0)
    q = learned_fake_quant(x, g, CFG, symmetric=False, train=False)
    assert float(jnp.max(jnp.abs(q - x))) < 1e-5
    assert float(jnp.mean(jnp.abs(np.asarray(q)))) > 0.1  # not zeroed


def test_learned_quant_unique_values_bounded(rng):
    """Eval-mode quantization at B bits yields at most 2^B distinct values
    (debug.py:90-137 checks)."""
    x = jnp.asarray(rng.uniform(-1e-4, 1e-4, size=(8192,)).astype(np.float32))
    for bits in (2.0, 4.0, 8.0):
        group = _calibrated_group(x, symmetric=False)
        group = dict(group, soft_bits=jnp.asarray(bits))
        q = learned_fake_quant(x, group, CFG, symmetric=False, train=False)
        uniq = len(np.unique(np.asarray(q)))
        assert uniq <= 2**int(bits), (bits, uniq)
        assert uniq > 2 ** (int(bits) - 1) * 0.5  # actually uses the range


def test_learned_quant_ste_gradient(rng):
    x = jnp.asarray(rng.uniform(-1e-4, 1e-4, size=(512,)).astype(np.float32))
    group = _calibrated_group(x, symmetric=False)
    g = jax.grad(lambda x: jnp.sum(
        learned_fake_quant(x, group, CFG, symmetric=False, train=True)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_calibration_tracks_content():
    """Running calibration: first call adopts the batch range exactly;
    wider later content EXPANDS the range instantly (a frozen range
    clamps everything learned after step 0 — quantized training
    collapsed, see DIVERGENCES); shrinking content contracts slowly via
    the EMA."""
    state = init_quant_state(CFG)
    g1 = calibrate(state["weight"], jnp.asarray([-2.0, 3.0]), symmetric=True)
    assert float(g1["range_scale"]) == 6.0  # 2 * max_abs
    assert bool(g1["calibrated"])
    # Wider batch -> instant expansion (never clamp new content).
    g2 = calibrate(g1, jnp.asarray([-10.0, 10.0]), symmetric=True)
    assert float(g2["range_scale"]) == 20.0
    # Narrower batch -> slow EMA shrink, still covering recent content.
    g3 = calibrate(g2, jnp.asarray([-1.0, 1.0]), symmetric=True)
    assert 2.0 < float(g3["range_scale"]) < 20.0
    assert float(g3["running_max"]) >= 1.0


def test_acaq_controller_dynamics():
    state = init_quant_state(CFG)
    # Better than target -> bits decrease everywhere.
    new_state, target = acaq_controller_update(
        state, jnp.asarray(0.5), jnp.asarray(1.0), CFG
    )
    assert abs(float(target) - CFG.mdl_tolerance) < 1e-6  # MDL target
    assert float(average_bits(new_state, CFG)) < float(average_bits(state, CFG))
    # Much worse than target -> bits increase.
    worse, _ = acaq_controller_update(
        state, jnp.asarray(10.0), jnp.asarray(1.0),
        QuantConfig(n_embed_levels=4, n_act_quantizers=1, target_metric=1.0),
    )
    assert float(average_bits(worse, CFG)) > float(average_bits(state, CFG))
    # Bits always clamped to [min_bits, max_bits].
    s = state
    for _ in range(200):
        s, _ = acaq_controller_update(s, jnp.asarray(0.01), jnp.asarray(1.0), CFG)
    bits = np.asarray(s["embed"]["soft_bits"])
    assert bits.min() >= CFG.min_bits - 1e-6


def test_mdl_fp_anchor_equilibrates_and_is_content_aware(rng):
    """Closed-loop regression for THREE measured MDL anchor failures:
    self-tracking anchors ratchet to max_bits with raw batch statistics
    (avg 32.0, acaq_experiment_r2_4000.json) or to min_bits with a
    smoothed self-anchor (avg 3.0, held-out -1 dB vs fixed-8); UNPAIRED
    quantized-EMA-vs-fp-EMA comparison leaves trend-lag/variance residuals
    that park bits at 12-21 regardless of tolerance (acaq_r4_tol*.json).
    The shipped signal is the EMA of the PAIRED per-batch inflation ratio
    (quantized / bypassed, same batch, same params): the convergence trend
    cancels per-sample, and bits must settle where inflation ~ the MDL
    tolerance band (~0.95t-1.05t for tolerance t), at an equilibrium that
    MOVES with how quantization-sensitive the content is (content-aware)."""

    def closed_loop(sensitivity, steps=2000):
        # Loss model: quantized loss = fp_loss * (1 + sensitivity*2^-bits);
        # fp loss converges 0.1 -> 0.01 with 10% batch noise. The
        # controller signal is the shipped hybrid: max(paired-ratio EMA,
        # loss_ema / best_loss) — the paired ratio cancels the trend and
        # batch noise up to the quantization interaction (modeled as 5%
        # relative noise); the trajectory guard compares the quantized
        # loss EMA against its own running minimum.
        s = init_quant_state(CFG)
        infl_ema = ema = slow = None
        for i in range(steps):
            fp = 0.01 + 0.09 * np.exp(-i / 300.0)
            fp *= 1.0 + 0.1 * float(rng.standard_normal())
            bits = float(average_bits(s, CFG))
            q = fp * (1.0 + sensitivity * 2.0 ** (-bits))
            ema = q if ema is None else 0.99 * ema + 0.01 * q
            slow = q if slow is None else 0.999 * slow + 0.001 * q
            if i % 10 == 0:
                ratio = (1.0 + sensitivity * 2.0 ** (-bits)) * (
                    1.0 + 0.05 * float(rng.standard_normal())
                )
                infl_ema = (ratio if infl_ema is None
                            else 0.9 * infl_ema + 0.1 * ratio)
                s, _ = acaq_controller_update(
                    s, jnp.asarray(max(1.0, infl_ema, ema / slow)),
                    jnp.asarray(1.0), CFG)
        return float(average_bits(s, CFG))

    # Equilibrium where sensitivity*2^-b ~ 1.05*tolerance - 1 (~0.05 at
    # the default 1.0): b ~ log2(sensitivity/0.05).
    b_lo = closed_loop(3.0)    # ~log2(60) ~ 5.9 bits
    b_hi = closed_loop(100.0)  # ~log2(2000) ~ 11 bits
    assert CFG.min_bits + 0.5 < b_lo < 8.0, b_lo       # no min-bits crash
    assert 6.0 < b_hi < 14.0, b_hi                     # no max-bits ratchet
    assert b_hi > b_lo + 1.0, (b_lo, b_hi)             # content-aware


def test_train_state_tracks_loss_ema_min():
    """train/step.py maintains state['loss_ema'] (first step adopts the
    batch loss) and best_loss = running min of the EMA, not of raw batch
    losses."""
    import functools

    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig
    from indoor_nerf_tpu.train.step import (
        TrainConfig, init_train_state, train_step,
    )

    grid = HashGridConfig(bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3,
                          n_levels=2, log2_hashmap_size=8,
                          finest_resolution=32)
    fc = FieldConfig(grid=grid, i_embed=1, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=8, n_importance=0)
    cfg = TrainConfig(render=rc, near=0.5, far=2.0, n_rand=16,
                      tv_loss_weight=0.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert np.isinf(float(state["loss_ema"]))
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    key = jax.random.PRNGKey(1)
    batch = {
        "rays_o": jnp.zeros((16, 3)),
        "rays_d": jnp.concatenate(
            [jnp.zeros((16, 2)), jnp.ones((16, 1))], axis=-1),
        "target": jnp.full((16, 3), 0.25),
    }
    emas, bests = [], []
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        emas.append(float(state["loss_ema"]))
        bests.append(float(state["best_loss"]))
    assert np.isfinite(emas).all()
    # best_loss is the running min of the EMA sequence.
    np.testing.assert_allclose(bests, np.minimum.accumulate(emas), rtol=1e-6)


def test_layer_factor_varies_deltas():
    """The controller's layer factor makes per-quantizer deltas differ
    (reference: run_nerf.py:1244-1246)."""
    state = init_quant_state(CFG)
    new_state, _ = acaq_controller_update(
        state, jnp.asarray(0.5), jnp.asarray(1.0), CFG
    )
    deltas = np.asarray(new_state["embed"]["soft_bits"]) - 8.0
    assert len(np.unique(np.round(deltas, 6))) > 1


def test_train_clip_bounds_follow_soft_bits(rng):
    """Soft bits ABOVE the rounded integer must not clamp the top of the
    calibrated range (reference bug, DIVERGENCES.md #37: int-bits clip
    bounds + soft-bits scale chop up to 29% of the range whenever
    soft > int — the bits-independent distortion that made the MDL
    controller ratchet, acaq_r5_4000.json pre-fix trace)."""
    x = jnp.asarray(np.linspace(0.0, 1.0, 257, dtype=np.float32))
    for soft in (8.49, 12.3, 20.45, 23.4):
        g = _calibrated_group(x, symmetric=False)
        g = dict(g, soft_bits=jnp.asarray(soft, jnp.float32))
        q = learned_fake_quant(x, g, CFG, symmetric=False, train=True)
        scale = 1.0 / (2.0 ** soft - 1.0)  # range 1.0
        # Every value — including the top of the range — quantizes to
        # within one step; under the int-bits clip the top values sat
        # ~(1 - 2^(round(soft)-soft)) * range away.
        err = np.abs(np.asarray(q) - np.asarray(x))
        assert float(err.max()) <= scale + 1e-7, (soft, float(err.max()))


def test_train_soft_below_int_unchanged_semantics(rng):
    """Soft bits BELOW the integer keep the old behavior (the old int
    bounds never clipped there); eval path (integer bits) is untouched."""
    x = jnp.asarray(np.linspace(0.0, 1.0, 129, dtype=np.float32))
    g = _calibrated_group(x, symmetric=False)
    g = dict(g, soft_bits=jnp.asarray(7.6, jnp.float32))
    q_train = learned_fake_quant(x, g, CFG, symmetric=False, train=True)
    scale = 1.0 / (2.0 ** 7.6 - 1.0)
    assert float(np.abs(np.asarray(q_train) - np.asarray(x)).max()) \
        <= scale + 1e-7
    q_eval = learned_fake_quant(x, g, CFG, symmetric=False, train=False)
    scale8 = 1.0 / (2.0 ** 8.0 - 1.0)
    assert float(np.abs(np.asarray(q_eval) - np.asarray(x)).max()) \
        <= scale8 + 1e-7
