"""Tensor-parallel (level-sharded) hash encode tests on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.ops.encoding import (
    HashGridConfig,
    hash_encode,
    init_hash_table,
)
from indoor_nerf_tpu.parallel.shard import make_mesh
from indoor_nerf_tpu.parallel.tp import table_sharding, tp_hash_encode

CFG = HashGridConfig(
    bbox_min=(-1.0, -1.0, -1.0),
    bbox_max=(1.0, 1.0, 1.0),
    n_levels=8,
    log2_hashmap_size=10,
    base_resolution=16,
    finest_resolution=128,
)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (1, 8)])
def test_tp_encode_matches_replicated(shape):
    mesh = make_mesh(jax.devices(), ("data", "model"), shape)
    table = init_hash_table(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)

    want, keep_want = hash_encode(x, table, CFG)

    table_sh = jax.device_put(table, table_sharding(mesh))
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    got, keep = jax.jit(
        lambda x, t: tp_hash_encode(x, t, CFG, mesh)
    )(x_sh, table_sh)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep_want))


def test_tp_block_encode_rejects_speed_arms_loudly():
    """ray_strides/ray_groups are deliberately unsupported under tensor
    parallelism (parallel/tp.py:189-192; strided TP would need
    per-level-class subprograms per shard — DIVERGENCES #27). The guard must
    fail LOUDLY at trace time, never fall back silently to an unstrided
    program."""
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.parallel.tp import tp_block_encode

    mesh = make_mesh(jax.devices(), ("data", "model"), (4, 2))
    x = jnp.zeros((8, 3))
    base = dict(bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0),
                n_levels=8, log2_rows=6)
    for arm in (
        {"ray_strides": (1, 1, 1, 1, 2, 2, 4, 4)},
        {"ray_groups": (1, 1, 1, 1, 2, 2, 2, 2)},
    ):
        cfg = BlockHashConfig(**base, **arm)
        table = jnp.zeros((cfg.n_levels * cfg.rows_per_level,
                           cfg.n_features_per_level * 128))
        with pytest.raises(NotImplementedError, match="tensor.*parallelism"):
            tp_block_encode(x, table, cfg, mesh)


def test_tp_encode_gradients_stay_local():
    """Gradient wrt the sharded table matches the replicated gradient."""
    mesh = make_mesh(jax.devices(), ("data", "model"), (4, 2))
    table = init_hash_table(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)

    def loss_repl(t):
        f, _ = hash_encode(x, t, CFG)
        return jnp.sum(f**2)

    want = jax.grad(loss_repl)(table)

    from jax.sharding import NamedSharding, PartitionSpec as P

    table_sh = jax.device_put(table, table_sharding(mesh))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    def loss_tp(t, x):
        f, _ = tp_hash_encode(x, t, CFG, mesh)
        return jnp.sum(f**2)

    got = jax.jit(jax.grad(loss_tp))(table_sh, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-8)
