"""Tests for the interval-distortion regularizer (losses/distortion.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.losses.distortion import distortion_loss


def _mk(weights):
    w = jnp.asarray(weights, jnp.float32)[None, :]
    s = w.shape[-1]
    z = jnp.linspace(2.0, 6.0, s)[None, :]
    near = jnp.full((1, 1), 2.0)
    far = jnp.full((1, 1), 6.0)
    return w, z, near, far


def test_zero_weights_zero_loss():
    w, z, near, far = _mk(np.zeros(16))
    assert float(distortion_loss(w, z, near, far)) == 0.0


def test_concentrated_beats_spread_and_bimodal():
    s = 32
    onehot = np.zeros(s)
    onehot[10] = 1.0
    uniform = np.full(s, 1.0 / s)
    bimodal = np.zeros(s)
    bimodal[4] = 0.5
    bimodal[28] = 0.5
    losses = {}
    for name, w in [("onehot", onehot), ("uniform", uniform),
                    ("bimodal", bimodal)]:
        wj, z, near, far = _mk(w)
        losses[name] = float(distortion_loss(wj, z, near, far))
    # A single spike has (near-)minimal distortion; equal-mass clusters far
    # apart are the worst case (large pairwise |s_i - s_j| at full weight).
    assert losses["onehot"] < losses["uniform"] < losses["bimodal"], losses


def test_gradient_merges_bimodal_mass():
    """Descent on the distortion alone moves weight mass toward one cluster
    (the floater-removal mechanism)."""
    s = 32
    logits = np.full(s, -4.0)
    logits[8] = 2.0    # main surface
    logits[24] = 1.0   # floater
    logits = jnp.asarray(logits)
    z = jnp.linspace(2.0, 6.0, s)[None, :]
    near = jnp.full((1, 1), 2.0)
    far = jnp.full((1, 1), 6.0)

    def loss_of(lg):
        w = jax.nn.softmax(lg)[None, :]
        return distortion_loss(w, z, near, far)

    g = jax.grad(loss_of)(logits)
    # The gradient pushes DOWN on the minority cluster relative to the
    # majority one: descending increases the gap.
    assert float(g[24]) > float(g[8]), (float(g[8]), float(g[24]))

    lg = logits
    for _ in range(200):
        lg = lg - 0.5 * jax.grad(loss_of)(lg)
    w_end = np.asarray(jax.nn.softmax(lg))
    w_start = np.asarray(jax.nn.softmax(logits))
    # floater mass shrinks, main-surface mass grows
    assert w_end[24] < 0.5 * w_start[24], (w_start[24], w_end[24])
    assert w_end[8] > w_start[8]


def test_scale_invariance_via_near_far_normalization():
    """Same weight shape on a 10x larger metric scene gives the same loss
    (depths are normalized by near/far)."""
    w = np.zeros(16)
    w[5] = 0.6
    w[6] = 0.4
    wj = jnp.asarray(w, jnp.float32)[None, :]
    z1 = jnp.linspace(2.0, 6.0, 16)[None, :]
    z2 = jnp.linspace(20.0, 60.0, 16)[None, :]
    l1 = float(distortion_loss(wj, z1, jnp.full((1, 1), 2.0),
                               jnp.full((1, 1), 6.0)))
    l2 = float(distortion_loss(wj, z2, jnp.full((1, 1), 20.0),
                               jnp.full((1, 1), 60.0)))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_train_step_accepts_distortion_weight():
    """The flag wires through TrainConfig into a finite jitted step."""
    import dataclasses

    import __graft_entry__ as ge

    cfg, state, batch = ge._tiny_setup()
    cfg = dataclasses.replace(cfg, distortion_loss_weight=1e-3)
    from indoor_nerf_tpu.train.step import train_step

    new_state, metrics = jax.jit(
        lambda s, b, k: train_step(s, b, k, cfg)
    )(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
