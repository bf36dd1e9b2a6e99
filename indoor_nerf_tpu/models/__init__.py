"""Model families: hash-grid NeRFSmall, classic big NeRF, and the field API."""

from indoor_nerf_tpu.models.mlp import (
    init_linear,
    init_nerf_small,
    apply_nerf_small,
    init_nerf_big,
    apply_nerf_big,
)
from indoor_nerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    query_field,
    field_output_channels,
)
