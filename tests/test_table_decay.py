"""Fine-level table amplitude decay (TrainConfig.table_decay_weight).

Round-5 few-shot extension: an L2 penalty on the grid tables weighted
2^(l-L+1) per level, so the finest level bears the full weight. Checks
the loss wiring and the level-weighting direction on the block-hash path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.models.field import FieldConfig
from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
from indoor_nerf_tpu.render.renderer import RenderConfig
from indoor_nerf_tpu.train.step import (
    TrainConfig,
    init_train_state,
    train_step,
)


def _cfg(decay):
    bg = BlockHashConfig(
        bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0),
        n_levels=4, n_features_per_level=2, log2_rows=6,
        base_resolution=4, finest_resolution=32, block_size=3,
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=8, n_importance=0)
    return TrainConfig(render=rc, near=0.5, far=3.0, n_rand=32,
                       tv_loss_weight=0.0, sparse_loss_weight=0.0,
                       table_decay_weight=decay)


def _batch(rng):
    o = np.zeros((32, 3), np.float32)
    o[:, 2] = -2.0
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(o),
        "rays_d": jnp.asarray(d),
        "target": jnp.asarray(rng.uniform(size=(32, 3)), np.float32),
    }


def test_decay_term_enters_loss_and_shrinks_fine_levels(rng):
    cfg0, cfg1 = _cfg(0.0), _cfg(1e4)
    batch = _batch(rng)
    key = jax.random.PRNGKey(3)

    s0 = init_train_state(jax.random.PRNGKey(0), cfg0)
    s1 = init_train_state(jax.random.PRNGKey(0), cfg1)
    # Inflate the table so the decay term is visible over the MSE.
    big = s0["params"]["table"] + 0.05
    s0["params"]["table"] = big
    s1["params"]["table"] = big

    _, m0 = jax.jit(lambda s, b, k: train_step(s, b, k, cfg0))(s0, batch, key)
    _, m1 = jax.jit(lambda s, b, k: train_step(s, b, k, cfg1))(s1, batch, key)
    assert float(m1["loss"]) > float(m0["loss"])  # decay term present

    # A few decayed steps shrink the FINEST level more than the coarsest
    # (relative to the undecayed run).
    for i in range(10):
        key, sub = jax.random.split(key)
        s0, _ = jax.jit(lambda s, b, k: train_step(s, b, k, cfg0))(
            s0, batch, sub)
        s1, _ = jax.jit(lambda s, b, k: train_step(s, b, k, cfg1))(
            s1, batch, sub)
    L, R = 4, 64
    t0 = np.asarray(s0["params"]["table"]).reshape(L, -1)
    t1 = np.asarray(s1["params"]["table"]).reshape(L, -1)
    ratio = (np.sqrt((t1 ** 2).mean(1)) + 1e-12) / (
        np.sqrt((t0 ** 2).mean(1)) + 1e-12)
    assert ratio[-1] < ratio[0]  # finest level shrank hardest
    assert ratio[-1] < 0.9
