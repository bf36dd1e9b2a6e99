"""Input encodings: multiresolution hash grid, spherical harmonics, frequency PE.

TPU-first redesign of the reference encoders:

- ``HashEmbedder`` (reference: PocketNeRF/hash_encoding.py:11-107) iterates a
  Python loop over 16 levels, each doing its own embedding lookup. Here the
  16 tables live in ONE ``[L * T, F]`` array and the whole encode is a single
  batched gather: per-level integer voxel corners are computed by broadcasting
  over a static ``[L]`` resolution vector, hashed, offset by ``level * T`` and
  gathered at once — the shape XLA maps best onto TPU gather hardware.
- ``SHEncoder`` (reference: PocketNeRF/hash_encoding.py:110-191) becomes a
  stack of vectorized polynomial evaluations (pure VPU work).
- classic NeRF frequency encoding (reference: PocketNeRF/run_nerf_helpers.py:17-80).

All encode functions are pure and fixed-shape; the scene bounding box and
grid geometry are *static* Python config so XLA constant-folds the per-level
grid sizes.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.hashing import BOX_OFFSETS, spatial_hash


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static geometry of the multiresolution hash grid.

    Mirrors the reference HashEmbedder hyperparameters
    (reference: PocketNeRF/hash_encoding.py:12-28). ``bbox_min``/``bbox_max``
    are tuples (static) so they are baked into the compiled program.
    """

    bbox_min: Tuple[float, float, float]
    bbox_max: Tuple[float, float, float]
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 512

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level


def level_resolutions(config: HashGridConfig) -> np.ndarray:
    """Per-level grid resolutions, float32 ``[L]``.

    res_l = floor(base * b^l) with geometric growth factor
    b = exp((ln finest - ln base) / (L - 1)), computed in float32 to match
    the reference's torch-float32 math (reference: hash_encoding.py:28,89).
    """
    base = np.float32(config.base_resolution)
    finest = np.float32(config.finest_resolution)
    if config.n_levels > 1:
        b = np.exp(
            (np.log(finest) - np.log(base)) / np.float32(config.n_levels - 1)
        ).astype(np.float32)
    else:
        b = np.float32(1.0)
    levels = np.arange(config.n_levels, dtype=np.float32)
    return np.floor(base * b**levels).astype(np.float32)


def init_hash_table(key: jax.Array, config: HashGridConfig) -> jnp.ndarray:
    """Initialize the fused hash table ``[L * T, F]`` ~ U(-1e-4, 1e-4).

    (reference init: PocketNeRF/hash_encoding.py:30-34)
    """
    shape = (config.n_levels * config.table_size, config.n_features_per_level)
    return jax.random.uniform(key, shape, jnp.float32, minval=-1e-4, maxval=1e-4)


def hash_grid_indices(
    x: jnp.ndarray, config: HashGridConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Voxel-corner hash indices and trilinear weights for all levels at once.

    Args:
      x: ``[N, 3]`` sample positions.

    Returns:
      (flat_idx ``[N, L, 8]`` int32 indices into the fused ``[L*T, F]`` table,
       weights ``[N, L, 3]`` trilinear interpolation weights,
       keep_mask ``[N]`` bool — True where x lies inside the bounding box).

    Mirrors get_voxel_vertices (reference: PocketNeRF/utils.py:95-117): points
    outside the bbox are clamped and flagged via keep_mask (used by the caller
    to zero sigma, reference run_nerf.py:66).
    """
    box_min = jnp.asarray(config.bbox_min, jnp.float32)
    box_max = jnp.asarray(config.bbox_max, jnp.float32)
    res = jnp.asarray(level_resolutions(config))  # [L]

    keep_mask = jnp.all((x >= box_min) & (x <= box_max), axis=-1)  # [N]
    xc = jnp.clip(x, box_min, box_max)

    # [L, 3] per-level voxel edge lengths (static once jitted).
    grid_size = (box_max - box_min)[None, :] / res[:, None]

    # [N, L, 3]: fractional grid coordinates.
    rel = (xc[:, None, :] - box_min) / grid_size[None, :, :]
    bottom_left = jnp.floor(rel).astype(jnp.int32)  # [N, L, 3]
    # Trilinear weights relative to the voxel min corner; equals the
    # reference's (x - voxel_min) / (voxel_max - voxel_min)
    # (reference: hash_encoding.py:64).
    weights = rel - bottom_left.astype(jnp.float32)  # [N, L, 3] in [0, 1)

    # [N, L, 8, 3] corner integer coordinates.
    corners = bottom_left[:, :, None, :] + jnp.asarray(BOX_OFFSETS)[None, None, :, :]
    hashed = spatial_hash(corners, config.log2_hashmap_size)  # [N, L, 8] uint32

    level_offset = (
        jnp.arange(config.n_levels, dtype=jnp.uint32) * jnp.uint32(config.table_size)
    )
    flat_idx = (hashed + level_offset[None, :, None]).astype(jnp.int32)
    return flat_idx, weights, keep_mask


def trilinear_interp(
    corner_feats: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear interpolation of 8-corner features.

    Args:
      corner_feats: ``[..., 8, F]`` features at the 8 voxel corners (corner c
        has offset bits (c>>2&1, c>>1&1, c&1), see BOX_OFFSETS).
      weights: ``[..., 3]`` fractional position inside the voxel.

    Returns ``[..., F]``. Implemented as a weighted sum with product weights,
    algebraically identical to the reference's 3-step lerp
    (reference: PocketNeRF/hash_encoding.py:56-80) but exposed to XLA as one
    fused multiply-add chain.
    """
    w = weights[..., None, :]  # [..., 1, 3]
    bits = jnp.asarray(BOX_OFFSETS, corner_feats.dtype)  # [8, 3]
    # [..., 8]: product over axes of (bit ? w : 1 - w)
    cw = jnp.prod(bits * w + (1.0 - bits) * (1.0 - w), axis=-1)
    return jnp.sum(cw[..., None] * corner_feats, axis=-2)


def hash_encode(
    x: jnp.ndarray, table: jnp.ndarray, config: HashGridConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multiresolution hash encoding of 3D points.

    Args:
      x: ``[N, 3]`` positions.
      table: ``[L * T, F]`` fused hash table.

    Returns:
      (features ``[N, L * F]``, keep_mask ``[N]`` bool).

    One-gather equivalent of HashEmbedder.forward
    (reference: PocketNeRF/hash_encoding.py:82-107).
    """
    flat_idx, weights, keep_mask = hash_grid_indices(x, config)
    corner_feats = jnp.take(table, flat_idx, axis=0)  # [N, L, 8, F]
    feats = trilinear_interp(corner_feats, weights)  # [N, L, F]
    return feats.reshape(x.shape[0], config.out_dim), keep_mask


# --- Spherical harmonics -----------------------------------------------------

# Hard-coded real SH coefficients (reference: PocketNeRF/hash_encoding.py:123-151).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical harmonics encoding of unit directions, degree 1..5.

    Vectorized equivalent of SHEncoder.forward
    (reference: PocketNeRF/hash_encoding.py:153-191); returns ``[..., degree**2]``.
    """
    if not 1 <= degree <= 5:
        raise ValueError(f"degree must be in [1, 5], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ones = jnp.ones_like(x)
    comps = [_C0 * ones]
    if degree > 1:
        comps += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        comps += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    if degree > 4:
        comps += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3 * xx - yy),
            _C4[2] * xy * (7 * zz - 1),
            _C4[3] * yz * (7 * zz - 3),
            _C4[4] * (zz * (35 * zz - 30) + 3),
            _C4[5] * xz * (7 * zz - 3),
            _C4[6] * (xx - yy) * (7 * zz - 1),
            _C4[7] * xz * (xx - 3 * yy),
            _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)


# --- Frequency positional encoding -------------------------------------------


def positional_encode_dim(multires: int, input_dims: int = 3,
                          include_input: bool = True) -> int:
    """Output dimension of ``positional_encode``."""
    return input_dims * (2 * multires + (1 if include_input else 0))


def positional_encode(
    x: jnp.ndarray, multires: int, include_input: bool = True
) -> jnp.ndarray:
    """Classic NeRF sin/cos frequency encoding (log-sampled bands).

    Equivalent of Embedder with the i_embed==0 defaults
    (reference: PocketNeRF/run_nerf_helpers.py:17-65): frequency bands
    2^linspace(0, multires-1, multires), ordered [x, sin(f0 x), cos(f0 x),
    sin(f1 x), ...] matching the reference's per-frequency [sin, cos] order.
    """
    comps = [x] if include_input else []
    freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    for i in range(multires):
        comps.append(jnp.sin(x * freqs[i]))
        comps.append(jnp.cos(x * freqs[i]))
    return jnp.concatenate(comps, axis=-1)
