"""Data-parallel training over a jax.sharding.Mesh.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed /
NCCL anywhere); this module adds the TPU-native scaling path the north star
demands: the ray batch is sharded across the mesh's 'data' axis, params and
optimizer state are replicated, and the loss mean / parameter gradients are
reduced by XLA-inserted collectives over ICI (the all-reduce of dense
hash-table gradients that NCCL would do on GPU is implicit in pjit).

One jitted global-view step == the single-device step numerically: losses are
global-batch means, so an N-chip run with N*n_rand rays is exactly the
reference semantics with a bigger batch.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from indoor_nerf_tpu.parallel.tp import block_tp_context
from indoor_nerf_tpu.train.step import TrainConfig, train_step


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    axis_sizes: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a device mesh. Default: all devices on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis_sizes {axis_sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Place a train-state pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def state_shardings(state: Any, mesh: Mesh,
                    model_axis: Optional[str] = None) -> Any:
    """Sharding pytree for the train state: everything replicated except —
    when a model axis is given — the hash table and its optimizer moments,
    which shard their leading (level-block) dimension over ``model_axis``
    (the tensor-parallel layout of parallel/tp.py)."""
    repl = NamedSharding(mesh, P())
    if model_axis is None:
        return jax.tree_util.tree_map(lambda _: repl, state)
    table_sh = NamedSharding(mesh, P(model_axis, None))

    def leaf_sharding(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "table" in keys:
            return table_sh
        return repl

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def make_sharded_train_step(
    config: TrainConfig,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    donate: bool = True,
    state_template: Any = None,
):
    """Jit the train step with mesh shardings.

    Batch arrays are sharded on their leading (ray) axis over ``data_axis``;
    state and rng are replicated, except the hash table (+ its RAdam
    moments), which shards over ``model_axis`` when given — XLA SPMD then
    keeps table gathers/scatter-adds distributed and inserts the activation
    collectives. The returned function has the train_step signature minus
    config: (state, batch, key[, prior_weights]) -> (state, metrics).
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(data_axis))
    if model_axis is None or state_template is None:
        state_sh: Any = repl
    else:
        state_sh = state_shardings(state_template, mesh, model_axis)

    def step(state, batch, key, prior_weights):
        return train_step(state, batch, key, config, prior_weights)

    jit_kwargs: Dict[str, Any] = dict(
        in_shardings=(state_sh, batch_sh, repl, repl),
        out_shardings=(state_sh, repl),
    )
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    jitted = jax.jit(step, **jit_kwargs)

    # Block-hash TP: with a model axis, route the step's encodes through the
    # shard_map'd level-sharded encode (parallel/tp.py::tp_block_encode) so
    # table gathers AND the backward scatter stay local to each level block —
    # only activations cross the model axis. The context is live on every
    # call so (re)traces inside jit see it; the compiled program caches it.
    tp_ctx = (model_axis is not None
              and config.render.field.i_embed == 3)

    def run(state, batch, key, prior_weights=None):
        if tp_ctx:
            with block_tp_context(mesh, data_axis, model_axis):
                return jitted(state, batch, key, prior_weights)
        return jitted(state, batch, key, prior_weights)

    return run
