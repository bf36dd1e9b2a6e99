"""Pure numeric ops: hashing, encodings, sampling, volume rendering, rays."""

from indoor_nerf_tpu.ops.hashing import spatial_hash, BOX_OFFSETS
from indoor_nerf_tpu.ops.encoding import (
    HashGridConfig,
    level_resolutions,
    init_hash_table,
    hash_encode,
    sh_encode,
    positional_encode,
    positional_encode_dim,
)
from indoor_nerf_tpu.ops.sampling import stratified_z_vals, sample_pdf
from indoor_nerf_tpu.ops.volume import raw2outputs
from indoor_nerf_tpu.ops.rays import get_rays, get_rays_np, ndc_rays
from indoor_nerf_tpu.ops.tv import total_variation_loss, sigma_sparsity_loss
