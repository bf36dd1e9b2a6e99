"""Checkpoint round-trip, forward-compat, and the EMA state extension."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import pytest
import numpy as np
from flax import serialization

import __graft_entry__ as ge
from indoor_nerf_tpu.train.step import train_step
from indoor_nerf_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


def _setup(**cfg_overrides):
    cfg, state, batch = ge._tiny_setup()
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
        from indoor_nerf_tpu.train.step import init_train_state

        state = init_train_state(jax.random.PRNGKey(0), cfg)
    return cfg, state, batch


def test_checkpoint_roundtrip(tmp_path):
    cfg, state, batch = _setup()
    state, _ = jax.jit(lambda s, b, k: train_step(s, b, k, cfg))(
        state, batch, jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path), 7, state)
    assert path.endswith("000007.ckpt")
    restored = restore_checkpoint(path, jax.device_get(state))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state)),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_old_checkpoint_missing_new_keys(tmp_path):
    """A checkpoint written before an optional state key existed (e.g.
    'ema') restores into a template that has it: the missing key keeps its
    template value, and an enabled EMA is seeded from the RESTORED
    params (utils/checkpoint.py)."""
    cfg, state, _ = _setup()
    old = {k: v for k, v in jax.device_get(state).items() if k != "ema"}
    # perturb params so restored != template
    old["params"] = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 1.0, old["params"])
    path = os.path.join(str(tmp_path), "000001.ckpt")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(old))

    # Template with EMA ENABLED: ema must come back seeded from the
    # restored (perturbed) params, not the fresh init.
    cfg_e, state_e, _ = _setup(ema_decay=0.9)
    restored = restore_checkpoint(path, jax.device_get(state_e))
    p_leaves = jax.tree_util.tree_leaves(restored["params"])
    e_leaves = jax.tree_util.tree_leaves(restored["ema"])
    for p, e in zip(p_leaves, e_leaves):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(e))

    # Template with EMA disabled (ema=None) restores cleanly too.
    cfg0, state0, _ = _setup()
    restored0 = restore_checkpoint(path, jax.device_get(state0))
    assert restored0["ema"] is None


def test_best_checkpoint_excluded_from_auto_resume(tmp_path):
    """best.ckpt (best-held-out snapshot) must never hijack
    auto-resume-NEWEST: list_checkpoints filters to step-numbered files,
    and save_best_checkpoint round-trips via --ft_path-style explicit
    load."""
    from indoor_nerf_tpu.utils.checkpoint import (
        list_checkpoints,
        maybe_resume,
        save_best_checkpoint,
    )

    cfg, state, batch = _setup()
    state, _ = jax.jit(lambda s, b, k: train_step(s, b, k, cfg))(
        state, batch, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), 5, state)
    best_path = save_best_checkpoint(str(tmp_path), state)
    assert best_path.endswith("best.ckpt")

    listed = list_checkpoints(str(tmp_path))
    assert [os.path.basename(p) for p in listed] == ["000005.ckpt"]

    # Auto-resume picks the numbered checkpoint, not best.ckpt.
    template = jax.device_get(state)
    resumed = maybe_resume(str(tmp_path), template)
    assert int(np.asarray(resumed["step"])) == int(np.asarray(state["step"]))

    # Explicit --ft_path load of best.ckpt works.
    resumed_best = maybe_resume(str(tmp_path), template, ft_path=best_path)
    np.testing.assert_array_equal(
        np.asarray(resumed_best["step"]), np.asarray(state["step"]))


@pytest.mark.slow
def test_ema_tracks_params():
    """state['ema'] moves toward the updated params at the configured
    decay and stays off (None) by default."""
    cfg, state, batch = _setup(ema_decay=0.5)
    assert state["ema"] is not None
    step = jax.jit(lambda s, b, k: train_step(s, b, k, cfg))
    s1, _ = step(state, batch, jax.random.PRNGKey(0))
    # ema_1 = 0.5 * params_0 + 0.5 * params_1 exactly
    for e, p0, p1 in zip(jax.tree_util.tree_leaves(s1["ema"]),
                         jax.tree_util.tree_leaves(state["params"]),
                         jax.tree_util.tree_leaves(s1["params"])):
        np.testing.assert_allclose(
            np.asarray(e), 0.5 * np.asarray(p0) + 0.5 * np.asarray(p1),
            rtol=1e-6, atol=1e-7)

    cfg0, state0, batch0 = _setup()
    assert state0["ema"] is None
    s, _ = jax.jit(lambda st, b, k: train_step(st, b, k, cfg0))(
        state0, batch0, jax.random.PRNGKey(0))
    assert s["ema"] is None
