"""Ray sampling: stratified coarse samples and hierarchical inverse-CDF resampling.

TPU-native equivalents of the reference's z-value generation
(reference: PocketNeRF/run_nerf.py:466-488) and ``sample_pdf``
(reference: PocketNeRF/run_nerf_helpers.py:354-397). RNG is explicit
(``jax.random`` keys) instead of global torch RNG; the inverse-CDF
``searchsorted`` is implemented as a comparison-matrix reduction, which maps
to pure VPU work instead of a gather-heavy binary search.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key: Optional[jax.Array],
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    perturb: float = 0.0,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Coarse sample depths along rays.

    Args:
      key: PRNG key for the stratified jitter (may be None when perturb == 0).
      near/far: ``[N, 1]`` per-ray bounds.
      n_samples: number of coarse samples.
      perturb: 0 for the deterministic linspace, nonzero for stratified jitter.
      lindisp: sample linearly in inverse depth instead of depth.

    Returns ``[N, n_samples]`` z values.
    (reference: PocketNeRF/run_nerf.py:466-488)
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    n_rays = near.shape[0]
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))

    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling of fine z values from coarse weights.

    Args:
      key: PRNG key (may be None when det=True).
      bins: ``[N, B]`` bin edges (coarse z midpoints).
      weights: ``[N, B - 1]`` unnormalized per-bin weights.
      n_samples: number of fine samples per ray.
      det: deterministic (linspace) u values instead of uniform draws.

    Returns ``[N, n_samples]`` sampled z values.
    (reference: PocketNeRF/run_nerf_helpers.py:354-397)
    """
    weights = weights + 1e-5  # prevent nans
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, B]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        # Stratified-jittered draws u_i = (i + xi_i) / S with iid xi:
        # uniform marginals (variance-reduced vs the reference's plain
        # torch.rand — DIVERGENCES.md) and SORTED by construction, so the
        # monotone inverse-CDF output needs no [N, S] lane sort in the
        # callers (the sort was part of the measured 13.4 ms
        # occupancy-sampling cost, tpu_fwd_attrib.json).
        u = (
            jnp.arange(n_samples, dtype=jnp.float32)
            + jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))
        ) / n_samples

    # searchsorted(cdf, u, side='right') as a comparison reduction: the count
    # of cdf entries <= u. [N, S, B] is small (e.g. 1024 x 128 x 64) and runs
    # entirely on the VPU — no per-element binary-search gathers.
    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )  # [N, S]
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    # Bracket-value selection as ONE-HOT mask reductions over the bin axis
    # instead of four take_along_axis gathers: the lane-dim width-1 gathers
    # measured ~6 ms/step at flagship shapes (tpu_fwd_attrib.json); the
    # [N, S, B] masked sums stay on the VPU and fuse with the comparison
    # matrix above.
    iota = jnp.arange(cdf.shape[-1])
    onehot_b = (iota == below[..., None]).astype(cdf.dtype)  # [N, S, B]
    onehot_a = (iota == above[..., None]).astype(cdf.dtype)
    cdf_below = jnp.sum(onehot_b * cdf[..., None, :], axis=-1)
    cdf_above = jnp.sum(onehot_a * cdf[..., None, :], axis=-1)
    bins_below = jnp.sum(onehot_b * bins[..., None, :], axis=-1)
    bins_above = jnp.sum(onehot_a * bins[..., None, :], axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
