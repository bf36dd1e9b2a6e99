"""Losses and regularizers: quantization (A-CAQ), structural priors."""

from indoor_nerf_tpu.losses.quantization import (
    QuantConfig,
    init_quant_state,
    fake_quant_fixed,
    learned_fake_quant,
    calibrate,
    acaq_controller_update,
    average_bits,
)
