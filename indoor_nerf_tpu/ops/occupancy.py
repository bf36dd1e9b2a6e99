"""Occupancy-grid guided sampling: spend network queries only where matter.

The reference samples 64 coarse + 128 fine points per ray and runs the MLP
on all of them (reference: run_nerf.py:466-523). On TPU the encode gather is
the bottleneck, so query count is the single biggest lever. This module adds
the NerfAcc-style alternative (PAPERS.md: "NerfAcc: Efficient Sampling
Accelerates NeRFs"): a dense low-res occupancy grid over the scene bbox is
maintained as an EMA of the field's density and used as a FREE coarse pass —
candidate depths are importance-resampled through the occupancy CDF, and the
network only ever sees ``n_samples`` points concentrated on occupied space.

Fully jit-compatible: the grid lives in the train state; its periodic update
is a pure function gated on the step inside the compiled train step.
Flag-gated (--use_occupancy); the reference's hierarchical coarse+fine path
remains the default parity behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

OccState = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    bbox_min: Tuple[float, float, float]
    bbox_max: Tuple[float, float, float]
    resolution: int = 64  # grid cells per axis
    decay: float = 0.95  # EMA decay per update round
    update_interval: int = 16  # train steps between updates
    update_fraction: float = 0.25  # fraction of cells refreshed per round
    n_candidates: int = 128  # free candidate depths per ray
    floor: float = 1e-2  # min candidate weight (keeps exploration alive)
    warmup_steps: int = 256  # uniform sampling until the grid has signal
    # Candidate weighting:
    #   "density"       — raw grid density (NerfAcc-style occupied-space
    #                     sampling; every dense cell gets weight, including
    #                     occluded interiors behind the first surface).
    #   "transmittance" — alpha-composite the grid densities along the
    #                     candidate ladder (the same T*alpha law as
    #                     ops/volume.py raw2outputs) so weight lands where
    #                     the RENDERING weight lands: the visible surface.
    #                     Self-correcting for floaters: any density the grid
    #                     registers earns sampling weight until gradients
    #                     remove it, then its cells decay away.
    weighting: str = "density"
    # Mixture for "transmittance": the final candidate distribution is
    #   (1 - occlusion_mix) * normalize(T*alpha) + occlusion_mix * normalize(alpha)
    # i.e. exactly occlusion_mix of the per-ray budget stays density-style
    # pressure on dense space regardless of occlusion or thickness. Pure
    # T*alpha (occlusion_mix=0) has a measured lock-in failure when the
    # field goes foggy early (e.g. a mis-set background): samples pile onto
    # the first fog, occluded density never receives carving gradient, and
    # training monotonically DEGRADES (BENCH_NOTES.md round-2 soak
    # diagnosis). The normalized blend restores density weighting's
    # recovery mechanism at a bounded budget share.
    occlusion_mix: float = 0.15

    @property
    def n_cells(self) -> int:
        return self.resolution**3


def init_occupancy(config: OccupancyConfig) -> OccState:
    """Start fully occupied so early sampling is uniform (nothing pruned)."""
    return {"density": jnp.ones((config.n_cells,), jnp.float32)}


def _cell_index(pts: jnp.ndarray, config: OccupancyConfig) -> jnp.ndarray:
    g = config.resolution
    bmin = jnp.asarray(config.bbox_min, jnp.float32)
    bmax = jnp.asarray(config.bbox_max, jnp.float32)
    rel = (pts - bmin) / (bmax - bmin)
    ijk = jnp.clip((rel * g).astype(jnp.int32), 0, g - 1)
    return (ijk[..., 0] * g + ijk[..., 1]) * g + ijk[..., 2]


def occupancy_lookup(
    pts: jnp.ndarray, occ: OccState, config: OccupancyConfig
) -> jnp.ndarray:
    """Nearest-cell density estimate for ``[..., 3]`` points."""
    return jnp.take(occ["density"], _cell_index(pts, config), axis=0)


def occupancy_update(
    key: jax.Array, occ: OccState, sigma_fn, config: OccupancyConfig
) -> OccState:
    """One EMA refresh round.

    A random subset of cells is re-evaluated at a jittered position with the
    CURRENT field density; refreshed cells take max(decayed, fresh) so
    emptied space decays away while new geometry registers immediately.
    ``sigma_fn(pts [M, 3]) -> sigma [M]`` is the field's density query.
    """
    g = config.resolution
    m = int(config.n_cells * config.update_fraction)
    k_cell, k_jit = jax.random.split(key)
    cells = jax.random.randint(k_cell, (m,), 0, config.n_cells, jnp.int32)

    ijk = jnp.stack(
        [(cells // (g * g)) % g, (cells // g) % g, cells % g], axis=-1
    ).astype(jnp.float32)
    jitter = jax.random.uniform(k_jit, (m, 3))
    bmin = jnp.asarray(config.bbox_min, jnp.float32)
    bmax = jnp.asarray(config.bbox_max, jnp.float32)
    pts = bmin + (ijk + jitter) / g * (bmax - bmin)

    sigma = jax.nn.relu(sigma_fn(pts))

    decayed = occ["density"] * config.decay
    refreshed = jnp.maximum(decayed[cells], sigma)
    return {"density": decayed.at[cells].set(refreshed)}


def occupancy_z_vals(
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    occ: OccState,
    config: OccupancyConfig,
    n_samples: int,
    step: jnp.ndarray,
    perturb: float = 1.0,
) -> jnp.ndarray:
    """Importance-resampled sample depths concentrated on occupied space.

    A stratified ladder of ``n_candidates`` free depths is weighted by the
    occupancy grid and inverted through its CDF (the same inverse-CDF core
    as the hierarchical sampler, ops/sampling.py) to yield ``n_samples``
    network-query depths. During grid warmup the candidates' weights are
    uniform, which reduces exactly to stratified sampling.
    """
    from indoor_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals

    k_cand, k_pdf = jax.random.split(key)
    z_cand = stratified_z_vals(
        k_cand, near, far, config.n_candidates, perturb=perturb
    )  # [N, M]
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_cand[..., :, None]
    w = occupancy_lookup(pts, occ, config)  # [N, M]

    if config.weighting == "transmittance":
        # Alpha-composite the grid densities along the ladder (the T*alpha
        # law of ops/volume.py raw2outputs, computed for free from the grid)
        # so candidate weight matches expected RENDERING weight instead of
        # raw density — occluded interiors stop stealing samples from the
        # visible surface. Pure VPU (one cumsum), no new gathers.
        dists = z_cand[..., 1:] - z_cand[..., :-1]  # [N, M-1]
        dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        tau = w[..., :-1] * dists * dnorm  # optical depth per interval
        alpha = 1.0 - jnp.exp(-tau)
        # Exclusive transmittance via cumsum of optical depth (exact, and
        # cheaper than a cumprod of (1 - alpha) terms).
        trans = jnp.exp(-jnp.concatenate(
            [jnp.zeros_like(tau[..., :1]), jnp.cumsum(tau[..., :-1], -1)], -1
        ))
        wt_vis = trans * alpha  # [N, M-1], sums to <= 1
        # Normalized blend (see OccupancyConfig.occlusion_mix): a bounded
        # per-ray budget share of density-style carving pressure.
        mix = config.occlusion_mix
        vis_sum = jnp.sum(wt_vis, axis=-1, keepdims=True)
        occ_sum = jnp.sum(alpha, axis=-1, keepdims=True)
        wt = (1.0 - mix) * wt_vis / jnp.maximum(vis_sum, 1e-10) \
            + mix * alpha / jnp.maximum(occ_sum, 1e-10)
        # Exploration floor scaled to the uniform bin probability, and
        # uniform during warmup.
        wt = wt + config.floor / wt.shape[-1]
        wt = jnp.where(step < config.warmup_steps, jnp.ones_like(wt), wt)
        # Natural bin pairing: intervals between candidates are the bins.
        return sample_pdf(
            k_pdf, z_cand, wt, n_samples, det=(perturb == 0.0)
        )

    # Clip to a floor so empty-but-unexplored space keeps some probability;
    # force uniform during warmup.
    w = jnp.maximum(w, config.floor)
    w = jnp.where(step < config.warmup_steps, jnp.ones_like(w), w)

    z_mid = 0.5 * (z_cand[..., 1:] + z_cand[..., :-1])
    # Sorted by construction: sample_pdf draws sorted (stratified) u and
    # the inverse CDF is monotone — no lane sort needed.
    return sample_pdf(
        k_pdf, z_mid, w[..., 1:-1], n_samples, det=(perturb == 0.0)
    )
