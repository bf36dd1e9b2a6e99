"""Distortion loss: compact, non-overlapping per-ray weight distributions.

The Mip-NeRF 360 interval-distortion regularizer (Barron et al., CVPR 2022,
eq. 15), implemented for point samples:

    L_dist = sum_ij w_i w_j |s_i - s_j|  +  (1/3) sum_i w_i^2 delta_i

with s the ray distances normalized to [0, 1] by (near, far) so the weight
is scene-scale free. It penalizes rendering weight that is spread out or
split into multiple clusters along a ray — the "floater / background
collapse" failure mode of few-shot NeRF, which is the dominant failure of
the reference's few-shot indoor protocol (see BENCH_NOTES.md structural
priors experiment). The reference has no analogue (its only geometric
regularizers are the TV and entropy sparsity losses, PocketNeRF/loss.py);
this is a flag-gated TPU-framework extension (DIVERGENCES.md), off by
default.

At training sample counts (S <= 64) the O(S^2) pairwise term is a tiny
[N, S, S] VPU reduction that XLA fuses with the compositing math — no
gathers, no sorts (samples arrive sorted from both sampling paths).
"""

from __future__ import annotations

import jax.numpy as jnp


def distortion_loss(
    weights: jnp.ndarray,
    z_vals: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
) -> jnp.ndarray:
    """Mean per-ray distortion of the compositing weight distribution.

    Args:
      weights: ``[N, S]`` compositing weights (raw2outputs ``weights``).
      z_vals: ``[N, S]`` sorted sample depths.
      near/far: ``[N, 1]`` per-ray bounds used to normalize depths.

    Returns a scalar: mean over rays of the distortion integral.
    """
    s = (z_vals - near) / jnp.maximum(far - near, 1e-10)  # [N, S] in [0,1]

    # Pairwise term: sum_ij w_i w_j |s_i - s_j|.
    ds = jnp.abs(s[..., :, None] - s[..., None, :])  # [N, S, S]
    pair = jnp.sum(
        weights[..., :, None] * weights[..., None, :] * ds, axis=(-2, -1)
    )

    # Self term: (1/3) sum_i w_i^2 delta_i with delta the interval width
    # around each sample (midpoint-to-midpoint; edge samples take the half
    # interval, matching the point-sample limit of the interval form).
    mids = 0.5 * (s[..., 1:] + s[..., :-1])
    upper = jnp.concatenate([mids, s[..., -1:]], axis=-1)
    lower = jnp.concatenate([s[..., :1], mids], axis=-1)
    delta = upper - lower  # [N, S]
    self_term = jnp.sum(weights**2 * delta, axis=-1) / 3.0

    return jnp.mean(pair + self_term)
