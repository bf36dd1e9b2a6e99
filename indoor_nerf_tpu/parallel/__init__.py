"""Parallelism: device meshes, sharded train steps, level-sharded hash TP."""

from indoor_nerf_tpu.parallel.shard import (
    make_mesh,
    make_sharded_train_step,
    replicate_state,
)
