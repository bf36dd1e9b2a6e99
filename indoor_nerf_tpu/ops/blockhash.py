"""Block-hash grid: the TPU-native multiresolution feature-grid encoder.

A from-first-principles redesign of the Instant-NGP hash encoding around
what TPU memory actually does well. Measured on v5e:

- XLA's gather is RATE-limited: ~160M gathered elements/s for narrow rows,
  but ~300M ROWS/s regardless of row width up to 128+ floats (155+ GB/s).
  The classic NGP layout (8 independent corner gathers x 16 levels x 2
  floats) pays 128 narrow gathers per point — hopeless on TPU.
- Mosaic's lane-dim ``dynamic_gather`` selects within a fetched 128-lane row
  at ~27G elements/s (ops/pallas/lane_gather.py).

So this encoder stores the vertex grid in HALO'D BLOCKS: one table row holds
a 5x5x5 = 125-vertex tile (4^3 voxels plus +1 halos) x F features packed in
F x 128 lanes. Any voxel's 8 corners live in ONE row, so encoding costs ONE
wide-row gather per (point, level) — 8x fewer gathers and each moves useful
wide data. Interpolation then needs no dynamic corner select at all: the
trilinear weights are the product of per-axis tent functions, which vanish
everywhere except the 8 bracketing vertices, so interpolation over the WHOLE
tile — three tiny batched contractions XLA fuses with the gather — is
exactly trilinear. Net effect: the gather bottleneck drops ~order of
magnitude vs the faithful NGP layout (ops/encoding.py), the parity path.

Trade-off (documented): halo vertices are stored PER BLOCK (a vertex on a
block face has an independent parameter in each adjacent block), so the
field is C0-discontinuous across block faces within one level. Block
partitions are staggered by a per-level offset so the discontinuity faces of
the 16 levels never align, and the MLP smooths the rest — empirically this
trains to the same PSNR as the exact encoding on our scenes (see
tests/test_blockhash.py convergence check). Instant-NGP's own hash
collisions introduce comparable same-level noise at fine resolutions.

Capacity parity: rows_per_level=2^12 x 125 vertices ~= 2^19 entries — the
same parameter budget as the reference log2_hashmap_size=19 tables.

Two tile layouts (BlockHashConfig.block_size):
- 4 (default): 5^3 = 125-vertex tiles in 128 lanes, F x 128-lane rows.
- 3: 4^3 = 64-vertex tiles — with F=2 one row is EXACTLY one 128-lane f32
  vector (512 B), halving HBM bytes per (point, level) on both the forward
  gather and the backward cotangent scatter at ~21% more halo overhead
  (capacity parity wants log2_rows one larger).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.encoding import level_resolutions, HashGridConfig
from indoor_nerf_tpu.ops.hashing import BOX_OFFSETS

BLOCK = 4  # default voxels per block edge; 5^3 = 125 vertices <= 128 lanes
USE_TILE_INTERP_KERNEL = False  # Pallas tile_interp (measured slower; see note)
# Route the tent-product contraction of the encode FORWARD through the
# Pallas streaming kernel (ops/pallas/tent_contract.py) wherever the
# fused custom-VJP path is already active (so no new VJP boundary is
# introduced — the lesson of the retired tile_interp kernel). The XLA
# fused gather+tent runs at 3.5x the row-fetch wall (roofline_r4.json:
# 12.17 ms vs 3.5 ms); the kernel streams the gathered rows through VMEM
# once. DEFAULT ON since round 5: the MXU segment-reduction variant
# measures 9.78 ms vs XLA's 11.50 at the flagship shapes (-15%), +3.1%
# end-to-end (94.0k vs 91.2k rays/s same-session), quality-neutral on
# the paired same-seed convergence protocol (held-out -0.09 dB, within
# the numerics-trajectory floor; BENCH_NOTES.md round-5 tent section,
# tpu_probe_tent_sweep.json, convergence_r5_tent*.json).
# ``INDOOR_NERF_TENT_KERNEL=0/1`` overrides at import time so measurement
# scripts can A/B the kernel without editing source mid-campaign.
USE_TENT_KERNEL = bool(int(__import__("os").environ.get(
    "INDOOR_NERF_TENT_KERNEL", "1")))
# Kernel tuning knobs (probe sweep: scripts/probe_tent_kernel.py /
# tpu_probe_tent_sweep.json); env-overridable for the same reason.
# Defaults = the sweep's winner (c4096, bf16 out, MXU segment reduce;
# input fusion measured no-effect and stays off).
TENT_KERNEL_CHUNK = int(__import__("os").environ.get(
    "INDOOR_NERF_TENT_CHUNK", "4096"))
TENT_KERNEL_OUT = __import__("os").environ.get(
    "INDOOR_NERF_TENT_OUT", "bfloat16")  # float32 | bfloat16
TENT_KERNEL_REDUCE = __import__("os").environ.get(
    "INDOOR_NERF_TENT_REDUCE", "mxu")  # vpu | mxu
TENT_KERNEL_FUSE = bool(int(__import__("os").environ.get(
    "INDOOR_NERF_TENT_FUSE", "0")))
# Test hook: run the tent kernel in interpreter mode off-TPU.
_FORCE_TENT_KERNEL_INTERPRET = False
# Route the fused backward's table scatter through the Pallas VMEM-resident
# accumulation kernel (ops/pallas/table_scatter.py) when the shapes allow.
# The XLA scatter-add is transaction-bound (~59M rows/s, tpu_probe_bwd.json);
# the kernel accumulates into a per-level VMEM block instead. Applies to the
# full-level encode (levels=None) on TPU only; measured numbers in
# BENCH_NOTES.md.
USE_PALLAS_SCATTER = True
# Tuning knobs for the Pallas scatter (swept in BENCH_NOTES.md).
PALLAS_SCATTER_CHUNK = 2048
PALLAS_SCATTER_ACC = "float32"
# Exact within-window run-length dedup before the scatter (VERDICT r2 #1):
# segment-sums consecutive same-row cotangent entries on the VPU and skips
# the merged entries in the kernel. Measured result in BENCH_NOTES.md.
PALLAS_SCATTER_MERGE = False
# Test hook: run the Pallas scatter in interpreter mode off-TPU so the
# integrated backward path is exercised by the CPU test suite.
_FORCE_PALLAS_SCATTER_INTERPRET = False
SIDE = BLOCK + 1
LANES = 128


def _stagger(n_levels: int, block: int) -> np.ndarray:
    """Per-level block-partition stagger (vertex units); decorrelates the
    block faces across levels so single-level C0 seams never align."""
    return np.array(
        [[(3 * l) % block, (2 * l + 1) % block, (l + 2) % block]
         for l in range(n_levels)], dtype=np.int32)

_BLOCK_PRIMES = np.array(
    [2654435761, 805459861, 3674653429, 2097192037], dtype=np.uint32
)


@dataclasses.dataclass(frozen=True)
class BlockHashConfig:
    """Static geometry of the block-hash grid."""

    bbox_min: Tuple[float, float, float]
    bbox_max: Tuple[float, float, float]
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_rows: int = 12  # rows per level; 2^12 * 125 ~= 2^19 entries
    base_resolution: int = 16
    finest_resolution: int = 512
    # Gather precision: "bfloat16" halves the dominant HBM traffic (row
    # fetch + row-cotangent) by casting the f32 master table before the
    # gather; interpolation and the table scatter-add stay f32. "int8"
    # halves it again: the f32 master is symmetrically quantized per level
    # (scale = absmax/127, one cheap full-table pass per step) and rows
    # dequantize after the gather — straight-through semantics, i.e. the
    # backward ignores the quantizer exactly like the reference's STE
    # fake-quant (PocketNeRF/quantization.py:173-187), so "int8" requires
    # the fused custom-VJP backward (enabled automatically).
    gather_dtype: str = "float32"
    # Backward precision: "bfloat16" switches the encode to a fused custom
    # VJP that forms the tent-product cotangent rows directly in bfloat16
    # and scatter-accumulates them in bfloat16 before one cheap f32 cast of
    # the [L*R, F*128] gradient table. The table master (and the optimizer)
    # stay f32. Measured: the f32 backward is byte-bound on materializing +
    # re-reading ~4.3 GB of cotangent rows per 262k-point batch; bf16 halves
    # it. NOTE: in this mode the encode returns ZERO gradient w.r.t. the
    # input points — sound for every training path here (ray origins/dirs
    # are data and hierarchical z-samples are stop_gradient'ed,
    # render/renderer.py), asserted nowhere else.
    scatter_dtype: str = "float32"
    # Voxels per block edge. 4 -> 5^3 = 125-vertex tiles in 128 lanes (3
    # dead); 3 -> 4^3 = 64-vertex tiles, so one F=2 row is EXACTLY one
    # 128-lane f32 vector (512 B) — half the HBM bytes per (point, level)
    # of the 5^3 layout on both the forward row gather and the backward
    # cotangent scatter, at ~21% more halo-storage overhead per vertex
    # (capacity parity then wants log2_rows one larger).
    block_size: int = 4
    # Per-level ray-axis decimation (len == n_levels; None = off). Level l
    # with stride k > 1 is encoded only at every k-th sample along each
    # ray (plus the last) and linearly interpolated back over the sample
    # axis with a STATIC [S, K] matrix — so its backward is the transpose
    # matmul (MXU), not more scatter rows. Rationale: the encode backward
    # is scatter-TRANSACTION bound (~59M rows/s regardless of row bytes,
    # tpu_probe_bwd.json), so the only speed lever is fewer (point, level)
    # rows; coarse levels are band-limited far below the sample spacing,
    # so strided knots lose almost nothing (quality asserted in
    # tests/test_blockhash.py and the convergence suite). Applies to the
    # [R, S, 3] ray-structured query path (query_field); flat queries
    # (occupancy refresh) always use the full encode.
    ray_strides: Optional[Tuple[int, ...]] = None
    # Per-level sample-GROUP sizes (len == n_levels; None = off). Level l
    # with group size G > 1 merges each G consecutive samples' BACKWARD
    # cotangent rows into one row of the group's anchor tile (the
    # partition block of the group's middle sample) before the scatter —
    # G-fold fewer rows in the row-transaction-bound backward scatter.
    # The FORWARD is always the exact per-sample encode (grouping the
    # gather measured slower: consecutive same-row fetches are already
    # coalesced, tpu_probe_grouped_4422.json). Unlike ray_strides this
    # never changes the features: whenever the group's samples share the
    # anchor's partition block (the measured common case at coarse
    # levels — mean same-block runs of 8/6/5 samples, BENCH_NOTES.md)
    # the merged gradient rows are exactly the per-sample scatter;
    # otherwise the group's gradient mass lands in the anchor tile with
    # edge-clamped tent weights (an attribution approximation only).
    # Group sizes must be constant within a contiguous level run and
    # divide the sample count; classes that don't divide S fall back to
    # the ungrouped encode.
    ray_groups: Optional[Tuple[int, ...]] = None

    @property
    def rows_per_level(self) -> int:
        return 1 << self.log2_rows

    @property
    def side(self) -> int:
        return self.block_size + 1

    @property
    def lanes_per_feature(self) -> int:
        return 128 if self.side**3 > 64 else 64

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def as_hash_grid(self) -> HashGridConfig:
        """Geometry-equivalent HashGridConfig (for shared level math)."""
        return HashGridConfig(
            bbox_min=self.bbox_min,
            bbox_max=self.bbox_max,
            n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            base_resolution=self.base_resolution,
            finest_resolution=self.finest_resolution,
        )


def init_block_table(key: jax.Array, config: BlockHashConfig) -> jnp.ndarray:
    """Fused table ``[L * R, F * lanes_per_feature]`` ~ U(-1e-4, 1e-4),
    matching the reference embedding init scale (hash_encoding.py:33-34).
    Lanes >= side^3 within each feature group are dead padding."""
    shape = (
        config.n_levels * config.rows_per_level,
        config.n_features_per_level * config.lanes_per_feature,
    )
    return jax.random.uniform(key, shape, jnp.float32, minval=-1e-4, maxval=1e-4)


def _block_row_hash(block: jnp.ndarray, level: jnp.ndarray, log2_rows: int
                    ) -> jnp.ndarray:
    """XOR-of-primes hash of (block coords, level) -> row in [0, 2^log2_rows).

    The level participates in the hash so collision patterns decorrelate
    across levels (the reference achieves this with separate tables)."""
    b = block.astype(jnp.uint32)
    out = b[..., 0] * _BLOCK_PRIMES[0]
    out = out ^ (b[..., 1] * _BLOCK_PRIMES[1])
    out = out ^ (b[..., 2] * _BLOCK_PRIMES[2])
    out = out ^ (level.astype(jnp.uint32) * _BLOCK_PRIMES[3])
    return out & jnp.uint32((1 << log2_rows) - 1)


def block_tv_loss(
    key: jax.Array, table: jnp.ndarray, config: BlockHashConfig,
    rows_per_level: int = 256,
) -> jnp.ndarray:
    """Total-variation regularizer for the block-hash table.

    Equivalent role to the hash-table TV loss (reference: loss.py:11-43):
    penalizes squared differences between spatially adjacent vertices.
    Within a tile, the +z/+y/+x neighbors of lane l are lanes l+1 / l+side /
    l+side^2, so the diffs are lane-rolls with static validity masks — pure
    [rows, lanes] elementwise work (no gathers, no tiny-dim arrays). A random
    subset of rows per level is sampled each call, mirroring the
    reference's random-cube subsampling.
    """
    L = config.n_levels
    F = config.n_features_per_level
    R = config.rows_per_level
    side = config.side
    lpf = config.lanes_per_feature
    m = min(rows_per_level, R)

    lane = np.arange(lpf)
    lx, ly, lz = lane // (side * side), (lane // side) % side, lane % side
    live = lane < side**3
    mask_z = jnp.asarray(((lz < side - 1) & live).astype(np.float32))
    mask_y = jnp.asarray(((ly < side - 1) & live).astype(np.float32))
    mask_x = jnp.asarray(((lx < side - 1) & live).astype(np.float32))

    # ONE gather across all levels (a per-level python loop of jnp.take
    # transposes into L separate full-table-sized scatter-adds in the
    # backward — ~2 GB of extra HBM traffic per step while TV is active).
    levels = jnp.arange(L, dtype=jnp.int32)
    rows_idx = (
        jax.random.randint(key, (L, m), 0, R) + levels[:, None] * R
    ).reshape(-1)
    rows = jnp.take(table, rows_idx, axis=0)  # [L*m, F*lpf]
    x = rows.reshape(L * m * F, lpf)

    def shifted(x, k):
        return jnp.roll(x, -k, axis=1)

    tv = (
        jnp.sum(mask_z * (shifted(x, 1) - x) ** 2)
        + jnp.sum(mask_y * (shifted(x, side) - x) ** 2)
        + jnp.sum(mask_x * (shifted(x, side * side) - x) ** 2)
    )
    # Normalize like the reference's /cube_size (per sampled extent).
    return tv / m


def _tile_coords(
    x: jnp.ndarray, config: BlockHashConfig,
    levels: Optional[Tuple[int, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-(point, level) table row + in-tile position.

    Returns (flat_row ``[N*L]`` int32, p ``[N*L, 3]`` f32 position within the
    5^3 tile, keep_mask ``[N]`` bool). Same bbox clamp semantics as the
    reference (utils.py:95-117). ``levels`` (static) restricts the encode
    to a subset of grid levels; row indices stay GLOBAL (level id * R +
    hash), so subset encodes address the same fused table."""
    n = x.shape[0]
    lv = np.arange(config.n_levels, dtype=np.int32) if levels is None \
        else np.asarray(levels, np.int32)
    L = len(lv)
    R = config.rows_per_level

    box_min = jnp.asarray(config.bbox_min, jnp.float32)
    box_max = jnp.asarray(config.bbox_max, jnp.float32)
    res = jnp.asarray(
        np.asarray(level_resolutions(config.as_hash_grid()))[lv])  # [L]

    keep_mask = jnp.all((x >= box_min) & (x <= box_max), axis=-1)
    xc = jnp.clip(x, box_min, box_max)

    grid_size = (box_max - box_min)[None, :] / res[:, None]  # [L, 3]
    rel = (xc[:, None, :] - box_min) / grid_size[None, :, :]  # [N, L, 3]
    bl = jnp.floor(rel).astype(jnp.int32)  # bottom-left vertex [N, L, 3]
    w = rel - bl.astype(jnp.float32)  # trilinear weights [N, L, 3]

    # Staggered block partition (per-level shift of the vertex lattice).
    B = config.block_size
    stagger = jnp.asarray(_stagger(config.n_levels, B)[lv])  # [L, 3]
    v0 = bl + stagger[None, :, :]
    block = v0 // B  # [N, L, 3]
    local0 = v0 - block * B  # in [0, B)

    level_ids = jnp.asarray(lv)
    row = _block_row_hash(block, level_ids[None, :], config.log2_rows)
    flat_row = (level_ids[None, :] * R + row.astype(jnp.int32)).reshape(-1)
    p = (local0.astype(jnp.float32) + w).reshape(n * L, 3)  # position in tile
    return flat_row, p, keep_mask


def _gather_rows(
    table: jnp.ndarray, flat_row: jnp.ndarray, config: BlockHashConfig,
) -> jnp.ndarray:
    """Fetch table rows ``[M, F*lanes]`` f32, honoring gather_dtype."""
    if config.gather_dtype == "int8":
        # Per-level symmetric quantization of the master table (one
        # [L*R, F*lanes] pass, ~17M elements — negligible next to the GBs
        # of row traffic the int8 rows quarter). Rows dequantize with the
        # gathered level's scale right after the fetch.
        L, R = config.n_levels, config.rows_per_level
        t = table.reshape(L, R * table.shape[1])
        scale = jnp.maximum(jnp.max(jnp.abs(t), axis=1), 1e-12) / 127.0  # [L]
        q = jnp.round(table / jnp.repeat(scale, R)[:, None]).astype(jnp.int8)
        rows = jnp.take(q, flat_row, axis=0).astype(jnp.float32)
        return rows * scale[flat_row // R][:, None]
    src = table
    if config.gather_dtype == "bfloat16":
        src = table.astype(jnp.bfloat16)
    rows = jnp.take(src, flat_row, axis=0)
    if rows.dtype != jnp.float32:
        rows = rows.astype(jnp.float32)
    return rows


def _gather_interp(
    table: jnp.ndarray, flat_row: jnp.ndarray, p: jnp.ndarray,
    config: BlockHashConfig, allow_kernel: bool = False,
) -> jnp.ndarray:
    """ONE wide gather per (point, level) + tent-product interpolation.

    Trilinear interpolation as an exact TENT-PRODUCT CONTRACTION over the
    whole 5^3 tile: the per-axis hat function tent(t) = max(0, 1 - |t|)
    evaluated at every tile vertex is zero except at the two vertices
    bracketing the point, and their weights are exactly (1-w), w — so
      feat[f] = sum_{xyz} tile[f,x,y,z] * tx[x] * ty[y] * tz[z]
    IS trilinear interpolation, expressed as three tiny batched
    contractions (pure MXU/VPU work that XLA fuses with the row gather)
    instead of an 8-way dynamic corner select. Lanes >= 125 get zero tent
    weight (dead padding). Default is the pure-XLA form (measured FASTER
    end-to-end than the Pallas tile_interp kernel: the custom-VJP boundary
    blocks XLA from fusing the weight math into the gather/scatter — see
    BENCH_NOTES.md); flip USE_TILE_INTERP_KERNEL to re-evaluate on new
    hardware/compilers. Optionally move the rows (and, under XLA autodiff,
    their backward cotangent) in bfloat16 — the 33 MB table cast is
    negligible next to the GBs of row traffic it halves."""
    if allow_kernel and USE_TENT_KERNEL and config.gather_dtype != "int8":
        # Only reached from inside the fused custom-VJP encode (whose
        # backward never differentiates through this forward), so the
        # pallas_call needs no VJP of its own. The kernel operand is the
        # bare gathered rows in gather_dtype — for bf16 that halves the
        # materialized [M, W] intermediate the pallas_call boundary
        # forces (the f32 upcast happens lane-block-at-a-time in VMEM).
        from indoor_nerf_tpu.ops.pallas.lane_gather import _on_tpu
        from indoor_nerf_tpu.ops.pallas.tent_contract import tent_contract

        on_tpu = _on_tpu()
        if on_tpu or _FORCE_TENT_KERNEL_INTERPRET:
            src = table
            if config.gather_dtype == "bfloat16":
                src = table.astype(jnp.bfloat16)
            raw = jnp.take(src, flat_row, axis=0)
            out = tent_contract(
                raw, p, config.side, config.n_features_per_level,
                interpret=not on_tpu, chunk=TENT_KERNEL_CHUNK,
                out_dtype=(jnp.bfloat16 if TENT_KERNEL_OUT == "bfloat16"
                           else jnp.float32),
                input_fusion=TENT_KERNEL_FUSE,
                reduce=TENT_KERNEL_REDUCE)
            if out.dtype != jnp.float32:
                out = out.astype(jnp.float32)
            return out
    rows = _gather_rows(table, flat_row, config)

    if USE_TILE_INTERP_KERNEL and config.block_size == BLOCK:
        from indoor_nerf_tpu.ops.pallas.tile_interp import tile_interp

        return tile_interp(rows, p)  # [N*L, F]
    lpf = config.lanes_per_feature
    w = _tent_weights(p, config.side, lpf)
    outs = [
        jnp.sum(rows[:, f * lpf : (f + 1) * lpf] * w, axis=1, keepdims=True)
        for f in range(config.n_features_per_level)
    ]
    return jnp.concatenate(outs, axis=1)


def _tent_weights(p: jnp.ndarray, side: int, lanes: int) -> jnp.ndarray:
    """Tent-product weights ``[M, lanes]`` for in-tile positions ``[M, 3]``.

    Lane l decodes to tile vertex (l//side^2, (l//side)%side, l%side); pad
    lanes >= side^3 decode to x >= side and get zero tent weight naturally
    (p stays within [0, side-1])."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], lanes), 1)
    lx = (lane // (side * side)).astype(jnp.float32)
    ly = ((lane // side) % side).astype(jnp.float32)
    lz = (lane % side).astype(jnp.float32)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - p[:, 0:1]))
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly - p[:, 1:2]))
    tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - p[:, 2:3]))
    return tx * ty * tz


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _encode_fused(
    table: jnp.ndarray, x: jnp.ndarray, config: BlockHashConfig,
    levels: Optional[Tuple[int, ...]] = None,
) -> jnp.ndarray:
    """Encode with a hand-written low-precision backward (scatter_dtype).

    Forward is the SAME XLA program as the default path (full fusion
    preserved — custom_vjp only changes what the transpose does). Backward
    forms the cotangent rows cot[m, f*128+lane] = g[m, f] * tent(m, lane)
    directly in ``scatter_dtype`` and scatter-accumulates them into a
    ``scatter_dtype`` gradient table, casting to f32 once at the end
    ([L*R, F*128] ~ 32 MB — cheap). This halves the ~2x4.3 GB/step of
    cotangent HBM traffic that makes the f32 backward byte-bound.

    Gradient w.r.t. the input points is ZERO (documented in
    BlockHashConfig.scatter_dtype)."""
    flat_row, p, _ = _tile_coords(x, config, levels)
    return _gather_interp(table, flat_row, p, config, allow_kernel=True)


def _encode_fused_fwd(table, x, config, levels=None):
    flat_row, p, _ = _tile_coords(x, config, levels)
    out = _gather_interp(table, flat_row, p, config, allow_kernel=True)
    return out, (flat_row, p)


def _cot_rows(p: jnp.ndarray, g: jnp.ndarray,
              config: BlockHashConfig) -> jnp.ndarray:
    """Per-sample cotangent rows ``cot[m, f*lpf + v] = g[m, f] * tent(m, v)``.

    ONE lane-decoded elementwise expression over [M, F*lpf] (no
    per-feature slices + concat: the concat is a full extra copy of the
    ~GB cotangent that XLA cannot fuse into the scatter operand; this
    form fuses). Returns f32 — callers cast to scatter_dtype AFTER any
    group reduction."""
    m, F = g.shape
    lpf = config.lanes_per_feature
    side = config.side
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, F * lpf), 1)
    v = lane % lpf
    lx = (v // (side * side)).astype(jnp.float32)
    ly = ((v // side) % side).astype(jnp.float32)
    lz = (v % side).astype(jnp.float32)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - p[:, 0:1]))
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly - p[:, 1:2]))
    tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - p[:, 2:3]))
    feat = lane // lpf
    g_sel = jnp.zeros((m, F * lpf), jnp.float32)
    for f in range(F):
        g_sel = jnp.where(feat == f, g[:, f : f + 1], g_sel)
    return g_sel * tx * ty * tz


def _scatter_cot(cot: jnp.ndarray, flat_row: jnp.ndarray, n_levels: int,
                 level0: int, config: BlockHashConfig) -> jnp.ndarray:
    """Scatter-accumulate cotangent rows into the FULL-grid table gradient.

    cot ``[M, W]`` (already in scatter_dtype), flat_row ``[M]`` global row
    ids targeting the contiguous level window [level0, level0+n_levels).
    Uses the Pallas VMEM-accumulation kernel when supported (f32 VMEM
    accumulation — a precision upgrade over the bf16 accumulation of the
    XLA path at scatter_dtype=bfloat16; the cotangent rows still move in
    scatter_dtype); XLA scatter-add otherwise. Returns f32
    ``[config.n_levels * R, W]``."""
    R = config.rows_per_level
    W = cot.shape[1]
    use_kernel = False
    if USE_PALLAS_SCATTER:
        from indoor_nerf_tpu.ops.pallas.lane_gather import _on_tpu
        from indoor_nerf_tpu.ops.pallas.table_scatter import supports

        on_tpu = _on_tpu()
        use_kernel = (on_tpu or _FORCE_PALLAS_SCATTER_INTERPRET) and supports(
            n_levels, R, W, cot.shape[0])
    if use_kernel:
        from indoor_nerf_tpu.ops.pallas.table_scatter import (
            scatter_add_table,
        )

        # Scoped-VMEM budget (16 MB counts the double-buffered cot chunks
        # on top of the [R, W] f32 accumulator): wide rows (W=256, the
        # F=4 / 5^3-tile layouts) halve the chunk so acc 8 MB + 2x1 MB
        # chunks stay under the limit (measured OOM at chunk 2048, W=256,
        # R=8192: 18.04 MB requested).
        chunk = PALLAS_SCATTER_CHUNK if W <= 128 else PALLAS_SCATTER_CHUNK // 2
        sub = scatter_add_table(
            cot, flat_row, n_levels, R,
            interpret=not on_tpu,
            chunk=chunk,
            acc_dtype=PALLAS_SCATTER_ACC,
            level0=level0,
            merge_consecutive=PALLAS_SCATTER_MERGE,
        )
        if n_levels == config.n_levels:
            return sub
        return jnp.pad(
            sub,
            ((level0 * R, (config.n_levels - level0 - n_levels) * R),
             (0, 0)))
    shape = (config.n_levels * R, W)
    return jnp.zeros(shape, cot.dtype).at[flat_row].add(cot).astype(
        jnp.float32)


def _encode_fused_bwd(config, levels, res, g):
    flat_row, p = res
    dt = (jnp.bfloat16 if config.scatter_dtype == "bfloat16"
          else jnp.float32)
    cot = _cot_rows(p, g, config).astype(dt)  # [M, F*lpf]
    lv = (tuple(range(config.n_levels)) if levels is None
          else tuple(int(l) for l in levels))
    contiguous = all(lv[i + 1] == lv[i] + 1 for i in range(len(lv) - 1))
    if contiguous:
        grad_table = _scatter_cot(cot, flat_row, len(lv), lv[0], config)
    else:
        shape = (config.n_levels * config.rows_per_level, cot.shape[1])
        grad_table = (
            jnp.zeros(shape, dt).at[flat_row].add(cot).astype(jnp.float32)
        )
    n_lv = config.n_levels if levels is None else len(levels)
    dx = jnp.zeros((flat_row.shape[0] // n_lv, 3), jnp.float32)
    return grad_table, dx


_encode_fused.defvjp(_encode_fused_fwd, _encode_fused_bwd)


def block_hash_encode(
    x: jnp.ndarray, table: jnp.ndarray, config: BlockHashConfig,
    levels: Optional[Tuple[int, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode ``[N, 3]`` points -> (features ``[N, L*F]``, keep_mask ``[N]``).

    Drop-in equivalent of hash_encode (same bbox clamp semantics,
    reference utils.py:95-117) with the block-tile memory layout.
    ``levels`` (static tuple) restricts to a subset of grid levels.
    """
    n = x.shape[0]
    L = config.n_levels if levels is None else len(levels)
    F = config.n_features_per_level

    box_min = jnp.asarray(config.bbox_min, jnp.float32)
    box_max = jnp.asarray(config.bbox_max, jnp.float32)
    keep_mask = jnp.all((x >= box_min) & (x <= box_max), axis=-1)

    if config.scatter_dtype == "bfloat16" or config.gather_dtype == "int8":
        # int8 needs the custom VJP regardless of scatter precision: XLA
        # autodiff through jnp.round would zero the table gradient; the
        # fused backward implements the STE instead.
        out = _encode_fused(table, x, config, levels)
    else:
        flat_row, p, _ = _tile_coords(x, config, levels)
        out = _gather_interp(table, flat_row, p, config)
    return out.reshape(n, L * F), keep_mask


def _stride_knots(S: int, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static knot indices ``[K]`` and lerp matrix ``W [S, K]`` for
    decimating the sample axis by ``k``: sample s = sum_j W[s, j] * knot_j
    (index-space linear interpolation; two nonzeros per row)."""
    ks = list(range(0, S, k))
    if ks[-1] != S - 1:
        ks.append(S - 1)
    K = len(ks)
    if K == 1:
        # S == 1 degenerate case: a single knot reproduces the single
        # sample exactly. (Without this, j = min(0, K-2) = -1 below wraps
        # W[0, -1] to column 0 and the w=0 overwrite zeroes the row.)
        return np.asarray(ks, np.int32), np.ones((S, 1), np.float32)
    W = np.zeros((S, K), np.float32)
    for s in range(S):
        j = min(s // k, K - 2)
        lo, hi = ks[j], ks[j + 1]
        w = 0.0 if hi == lo else (s - lo) / (hi - lo)
        W[s, j] = 1.0 - w
        W[s, j + 1] = w
    return np.asarray(ks, np.int32), W


def block_hash_encode_strided(
    pts: jnp.ndarray, table: jnp.ndarray, config: BlockHashConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray-structured encode ``[R, S, 3] -> ([R, S, L*F], keep [R, S])``
    honoring ``config.ray_strides``.

    CONTRACT: samples of each ray are colinear and SORTED along the ray
    (what every caller passes — both sampling paths emit sorted z).

    Levels with stride k > 1 are encoded only at the K ~ S/k knot samples
    of each ray and linearly interpolated back over the sample axis with
    Z-AWARE weights: knots are parametrized by per-ray ARC LENGTH, so
    interior samples interpolate at their true fractional position even
    when depths are irregular (the importance-sampled regime — the
    original static index-space matrix misplaced samples there, measured
    -0.9 dB held-out at the transmittance flagship). The batched einsum's
    transpose IS the backward, so decimated levels contribute K instead
    of S scatter rows; the encode backward is scatter-transaction bound
    (tpu_probe_bwd.json: ~59M rows/s regardless of row bytes), making row
    count the only lever. Coarse levels vary over >= bbox/res_l >> the
    sample spacing, so lerp between adjacent sampled knots is a
    second-order approximation there; exactness on linear segments with
    irregular spacing is asserted in tests/test_blockhash.py.
    """
    Rn, S, _ = pts.shape
    strides = config.ray_strides
    assert strides is not None and len(strides) == config.n_levels

    box_min = jnp.asarray(config.bbox_min, jnp.float32)
    box_max = jnp.asarray(config.bbox_max, jnp.float32)
    keep = jnp.all((pts >= box_min) & (pts <= box_max), axis=-1)  # [R, S]

    groups = []  # consecutive equal-stride level runs, in level order
    for l, k in enumerate(strides):
        if groups and groups[-1][0] == k:
            groups[-1][1].append(l)
        else:
            groups.append([int(k), [l]])

    # Arc-length parameter along each (sorted) ray: importance-sampled z
    # is IRREGULAR, so index-space lerp misplaces samples between knots
    # (measured -0.9 dB at the transmittance flagship, stride-magnitude
    # invariant — convergence_tpu_transw32_strided{,2}.json). t is the
    # distance from the ray's first sample; knot brackets are found with
    # the same comparison-matrix searchsorted as ops/sampling.py.
    t = jnp.linalg.norm(pts - pts[:, :1, :], axis=-1)  # [R, S], monotone

    outs = []
    for k, lv in groups:
        lv_t = tuple(lv)
        if k <= 1:
            f, _ = block_hash_encode(
                pts.reshape(-1, 3), table, config, levels=lv_t)
            outs.append(f.reshape(Rn, S, -1))
        else:
            knots, _ = _stride_knots(S, k)
            K = len(knots)
            xk = pts[:, knots, :].reshape(-1, 3)
            fk, _ = block_hash_encode(xk, table, config, levels=lv_t)
            fk = fk.reshape(Rn, K, -1)
            if K == 1:
                outs.append(jnp.broadcast_to(fk, (Rn, S, fk.shape[-1])))
                continue
            tk = t[:, knots]  # [R, K]
            # bracket index per sample: count of knot t's <= t_s, in [1, K-1]
            inds = jnp.sum(
                (tk[:, None, :] <= t[:, :, None]).astype(jnp.int32), axis=-1
            )
            j = jnp.clip(inds - 1, 0, K - 2)  # [R, S]
            iota = jnp.arange(K)
            oh_lo = (iota == j[..., None]).astype(jnp.float32)  # [R, S, K]
            oh_hi = (iota == (j + 1)[..., None]).astype(jnp.float32)
            t_lo = jnp.sum(oh_lo * tk[:, None, :], axis=-1)
            t_hi = jnp.sum(oh_hi * tk[:, None, :], axis=-1)
            w = jnp.clip(
                (t - t_lo) / jnp.maximum(t_hi - t_lo, 1e-10), 0.0, 1.0
            )  # [R, S]
            Wr = oh_lo * (1.0 - w)[..., None] + oh_hi * w[..., None]
            outs.append(
                jnp.einsum("rkf,rsk->rsf", fk, Wr,
                           preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=-1), keep


# ---------------------------------------------------------------------------
# Grouped encode: one tile row per G consecutive samples at coarse levels.
#
# The encode is row-TRANSACTION bound in both directions (forward gather
# ~90M rows/s, backward scatter ~70M rows/s — tpu_ablate_b3_bf16_occ48.json)
# so the only lever left is FEWER (point, level) rows. At coarse levels,
# consecutive samples along a ray stay inside the same halo'd tile for runs
# of 8/6/5 samples (BENCH_NOTES.md run-structure measurement), so a group of
# G consecutive samples can share ONE gathered row — the partition block of
# the group's middle sample — and still interpolate each sample EXACTLY
# (the tent contraction uses the sample's own in-tile position; trilinear
# interpolation from any tile containing the sample's bracketing vertices
# is identical). Samples whose bracketing vertices fall outside the anchor
# block clamp to the tile edge: a boundary extrapolation at those samples
# only, at levels whose feature scale >> the sample spacing. The backward
# group-sums per-sample cotangent rows (a static VPU reshape-reduce) before
# the scatter, cutting scatter rows by the same factor.
#
# Reference anchor: this replaces the per-sample `nn.Embedding` lookups of
# PocketNeRF/hash_encoding.py:88-104 with a ray-structured shared-row
# fetch; no reference equivalent exists (CUDA gathers are latency-hidden).
# ---------------------------------------------------------------------------


def _grouped_coords(
    x3: jnp.ndarray, config: BlockHashConfig,
    levels: Tuple[int, ...], G: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-GROUP table row + per-sample in-tile position.

    x3: ``[Rn, S, 3]`` ray-structured samples (sorted along the ray —
    ops/occupancy.py:134 / ops/sampling.py both emit sorted z).
    Returns (flat_row ``[Rn*(S//G)*L]`` int32 global row ids of each
    group's anchor tile, p ``[Rn, S//G, G, L, 3]`` f32 in-tile positions
    clamped to the tile's tent support [0, block_size])."""
    Rn, S, _ = x3.shape
    lv = np.asarray(levels, np.int32)
    L = len(lv)
    R = config.rows_per_level

    box_min = jnp.asarray(config.bbox_min, jnp.float32)
    box_max = jnp.asarray(config.bbox_max, jnp.float32)
    res = jnp.asarray(
        np.asarray(level_resolutions(config.as_hash_grid()))[lv])  # [L]

    x = x3.reshape(-1, 3)
    xc = jnp.clip(x, box_min, box_max)
    grid_size = (box_max - box_min)[None, :] / res[:, None]  # [L, 3]
    rel = (xc[:, None, :] - box_min) / grid_size[None, :, :]  # [N, L, 3]
    bl = jnp.floor(rel).astype(jnp.int32)
    w = rel - bl.astype(jnp.float32)

    B = config.block_size
    stagger = jnp.asarray(_stagger(config.n_levels, B)[lv])  # [L, 3]
    v0 = (bl + stagger[None, :, :]).reshape(Rn, S // G, G, L, 3)
    anchor = v0[:, :, G // 2]  # [Rn, S//G, L, 3] — middle sample's vertex
    block = anchor // B  # partition-aligned block of the anchor
    level_ids = jnp.asarray(lv)
    row = _block_row_hash(
        block, level_ids[None, None, :], config.log2_rows)  # [Rn, S//G, L]
    flat_row = (
        level_ids[None, None, :] * R + row.astype(jnp.int32)
    ).reshape(-1)
    local = v0 - block[:, :, None, :, :] * B  # int, may exit [0, B)
    p = jnp.clip(
        local.astype(jnp.float32) + w.reshape(Rn, S // G, G, L, 3),
        0.0, float(B),
    )
    return flat_row, p


def _grouped_classes(
    config: BlockHashConfig, S: int,
) -> Tuple[Tuple[int, Tuple[int, ...]], ...]:
    """Partition levels into contiguous runs of equal backward group size.

    Returns ``((G, (levels...)), ...)`` in level order. Group sizes that
    do not divide the sample count S demote to 1 (exact per-sample
    scatter for those levels)."""
    groups_cfg = config.ray_groups
    assert groups_cfg is not None and len(groups_cfg) == config.n_levels
    classes = []
    for l, gsz in enumerate(groups_cfg):
        g = int(gsz) if (gsz > 1 and S % int(gsz) == 0) else 1
        if classes and classes[-1][0] == g:
            classes[-1][1].append(l)
        else:
            classes.append([g, [l]])
    return tuple((g, tuple(lv)) for g, lv in classes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _encode_grouped_fused(
    table: jnp.ndarray, x3: jnp.ndarray, config: BlockHashConfig,
    classes: Tuple[Tuple[int, Tuple[int, ...]], ...],
) -> jnp.ndarray:
    """Exact full-grid forward + GROUP-MERGED backward scatters.

    Forward is ONE plain exact per-sample encode over ALL levels — the
    identical XLA program to block_hash_encode (grouping never changes
    the features, and splitting the forward into per-class encodes
    measured 2.4x slower: 52.3 vs 21.9 ms, tpu_probe_grouped_hybrid.json
    — narrow per-class outputs force relayouts and the single wide
    gather is already coalescing coarse-level repeat fetches). Backward
    walks the level classes: a G>1 class forms per-sample cotangent rows
    in the GROUP ANCHOR tile's coordinates, group-sums them (a static
    reshape-reduce — free VPU work), and scatter-accumulates 1/G as many
    rows via the Pallas VMEM kernel's `level0` window; a G==1 class
    scatters per-sample rows exactly. When every sample of a group lands
    in the anchor's partition block (the measured common case at coarse
    levels) the merged rows equal the exact per-sample scatter;
    otherwise the group's gradient mass is attributed to the anchor tile
    with edge-clamped tent weights — an approximation in WHERE the
    gradient lands, never in the features. Rationale: the backward
    scatter is purely row-transaction bound (time tracks row count at
    fixed bytes, tpu_probe_grouped_4422.json) while the forward gather
    is NOT, so grouping applies only where rows are the wall. Gradient
    w.r.t. the points is ZERO (BlockHashConfig.scatter_dtype note)."""
    Rn, S, _ = x3.shape
    flat_row, p, _ = _tile_coords(x3.reshape(-1, 3), config, None)
    out = _gather_interp(table, flat_row, p, config, allow_kernel=True)
    return out.reshape(Rn, S, config.n_levels * config.n_features_per_level)


def _encode_grouped_fused_fwd(table, x3, config, classes):
    # Residual is just the points: per-class coords are recomputed in the
    # backward (cheap VPU math from 2.4 MB of x3 vs storing ~50 MB of
    # per-class row ids + in-tile positions).
    return _encode_grouped_fused(table, x3, config, classes), x3


def _encode_grouped_fused_bwd(config, classes, x3, g):
    Rn, S, _ = x3.shape
    F = config.n_features_per_level
    R = config.rows_per_level
    dt = (jnp.bfloat16 if config.scatter_dtype == "bfloat16"
          else jnp.float32)

    # Per-class merged cotangent rows + row ids, kept apart so either
    # scatter strategy below can consume them.
    pieces = []  # (cot [N_c*Lc, W] level-minor, flat_row [N_c*Lc], Lc, c0)
    for G, lv in classes:
        Lc = len(lv)
        c0 = lv[0]
        g_c = g[..., c0 * F:(c0 + Lc) * F]  # [Rn, S, Lc*F] level-major
        if G == 1:
            flat_row, p, _ = _tile_coords(x3.reshape(-1, 3), config, lv)
            cot = _cot_rows(
                p, g_c.reshape(-1, Lc, F).reshape(-1, F), config
            ).astype(dt)
        else:
            flat_row, p = _grouped_coords(x3, config, lv, G)
            SG = S // G
            # Per-sample cotangent rows in ANCHOR-tile coordinates (f32),
            # then the group-sum — the reduce happens BEFORE the
            # precision cast so G-member sums keep f32. Transpose the
            # NARROW inputs to (ray, group, level, member) first so group
            # members are CONTIGUOUS rows of the wide [*, W] cotangent
            # and the reduce is a dense segmented sum, not a stride-L
            # sublane gather over a 1.6 GB intermediate.
            pt = p.transpose(0, 1, 3, 2, 4)  # [Rn, SG, Lc, G, 3]
            gt_ = g_c.reshape(Rn, SG, G, Lc, F).transpose(0, 1, 3, 2, 4)
            cot_s = _cot_rows(
                pt.reshape(-1, 3), gt_.reshape(-1, F), config)
            W = cot_s.shape[1]
            cot = (cot_s.reshape(Rn * SG * Lc, G, W).sum(axis=1)
                   .astype(dt))
        pieces.append((cot, flat_row, Lc, c0))

    # Preferred: ONE ragged level-major kernel call across all classes —
    # per-class pallas_calls measured ~5-8 ms of overhead each, and the
    # merged stream beats the all-rows single kernel 50.7 vs 63.1 ms at
    # flagship shapes (tpu_ragged_scatter.json).
    use_ragged = False
    if USE_PALLAS_SCATTER and len(pieces) > 1:
        from indoor_nerf_tpu.ops.pallas.lane_gather import _on_tpu
        from indoor_nerf_tpu.ops.pallas.table_scatter import supports

        on_tpu = _on_tpu()
        W = pieces[0][0].shape[1]
        use_ragged = (
            (on_tpu or _FORCE_PALLAS_SCATTER_INTERPRET)
            and supports(config.n_levels, R, W, config.n_levels)
            and sum(lc for _, _, lc, _ in pieces) == config.n_levels
        )
    if use_ragged:
        from indoor_nerf_tpu.ops.pallas.table_scatter import (
            scatter_add_table_ragged,
        )

        chunk = PALLAS_SCATTER_CHUNK
        segs, locs, level_rows = [], [], []
        for cot, flat_row, Lc, c0 in pieces:
            N_c = cot.shape[0] // Lc
            W = cot.shape[1]
            # Level-minor -> level-major segments; pad each level's rows
            # to a chunk multiple (pad rows hit local row 0 with a zero
            # cotangent: harmless).
            n_pad = -(-N_c // chunk) * chunk
            cotT = jnp.moveaxis(cot.reshape(N_c, Lc, W), 1, 0)
            loc = (
                flat_row.reshape(N_c, Lc)
                - (c0 + jnp.arange(Lc, dtype=flat_row.dtype))[None] * R
            ).T
            if n_pad != N_c:
                cotT = jnp.pad(cotT, ((0, 0), (0, n_pad - N_c), (0, 0)))
                loc = jnp.pad(loc, ((0, 0), (0, n_pad - N_c)))
            segs.append(cotT.reshape(Lc * n_pad, W))
            locs.append(loc.reshape(-1))
            level_rows += [n_pad] * Lc
        grad_table = scatter_add_table_ragged(
            jnp.concatenate(segs, 0), jnp.concatenate(locs, 0),
            tuple(level_rows), R,
            chunk=chunk,
            interpret=not on_tpu,
            acc_dtype=PALLAS_SCATTER_ACC,
        )
    else:
        grad_table = None
        for cot, flat_row, Lc, c0 in pieces:
            g_cls = _scatter_cot(cot, flat_row, Lc, c0, config)
            grad_table = (g_cls if grad_table is None
                          else grad_table + g_cls)
    dx = jnp.zeros((Rn, S, 3), jnp.float32)
    return grad_table, dx


_encode_grouped_fused.defvjp(_encode_grouped_fused_fwd,
                             _encode_grouped_fused_bwd)


def block_hash_encode_grouped(
    pts: jnp.ndarray, table: jnp.ndarray, config: BlockHashConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray-structured encode ``[Rn, S, 3] -> ([Rn, S, L*F], keep [Rn, S])``
    honoring ``config.ray_groups``.

    Features are ALWAYS the exact per-sample encode (one full-grid
    program — identical to block_hash_encode); grouping only merges each
    group of G consecutive samples' backward cotangent rows into one
    anchor-tile row before the transaction-bound scatter (exact while
    the group stays inside the anchor's partition block — the measured
    common case at coarse levels; anchor-attributed with edge-clamped
    weights otherwise). Group sizes that do not divide S demote to exact
    per-sample scatters for those levels.
    """
    Rn, S, _ = pts.shape
    box_min = jnp.asarray(config.bbox_min, jnp.float32)
    box_max = jnp.asarray(config.bbox_max, jnp.float32)
    keep = jnp.all((pts >= box_min) & (pts <= box_max), axis=-1)  # [Rn, S]

    classes = _grouped_classes(config, S)
    if all(g == 1 for g, _ in classes):
        f, _ = block_hash_encode(pts.reshape(-1, 3), table, config)
        return f.reshape(Rn, S, -1), keep
    return _encode_grouped_fused(table, pts, config, classes), keep
