"""Training: optimizer, train state, jitted train step, trainer driver."""

from indoor_nerf_tpu.train.optim import (
    RAdamHyper,
    init_radam_state,
    radam_update,
    exp_decay_lr,
)
