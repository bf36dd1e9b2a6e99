"""Test-time appearance-latent fitting (the NeRF-W half-image protocol).

A model trained with per-image appearance latents
(``FieldConfig.n_appearance``) has no latent for a held-out view, and on
real captures the held-out view carries its OWN unknown exposure /
white-balance. NeRF-W's evaluation protocol (Martin-Brualla et al.,
CVPR 2021, sec. 5 — referenced by PocketNeRF's iPhone few-shot setting,
reference: notebooks/iphone_raw_preprocessing.ipynb EV-normalization
cell) resolves this without leaking the scored pixels: fit a fresh
latent on the LEFT half of the test image, score PSNR on the RIGHT
half.

TPU shape of the fitter: the whole optimization is ONE jitted program —
``lax.scan`` over Adam steps on the ``[D]`` latent — so a fit costs one
dispatch through the tunnel instead of ``n_steps`` round trips. The field
parameters AND the per-view ray batch enter as jit ARGUMENTS (a zero-arg
closure would fold the tables into the program as MLIR constants and
retrace for every view's ray subset — the bake-path defect fixed in
render/baked.py, same mechanism); the compiled program is reused across
all evaluated views. Only the latent is optimized; gradients never reach
the field, so the protocol cannot train on test pixels.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.ops.rays import get_rays_np
from indoor_nerf_tpu.render.renderer import RenderConfig, render_rays


def _left_half_rays(
    gt: np.ndarray,
    c2w: np.ndarray,
    K: np.ndarray,
    n_rays: int,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A fixed random subset of rays from the left half of the image.

    Host-side numpy (the subset is part of the eval protocol, not the
    jitted program). Returns (rays_o [N,3], rays_d [N,3], target [N,3]).
    """
    H, W = gt.shape[:2]
    rays_o, rays_d = get_rays_np(H, W, K, c2w)
    rng = np.random.default_rng(seed)
    n_rays = min(n_rays, H * (W // 2))
    ys = rng.integers(0, H, size=n_rays)
    xs = rng.integers(0, W // 2, size=n_rays)
    return (
        rays_o[ys, xs].astype(np.float32),
        rays_d[ys, xs].astype(np.float32),
        np.asarray(gt, np.float32)[ys, xs],
    )


_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8


@functools.partial(jax.jit, static_argnames=("tcfg", "d", "n_steps"))
def _fit_latent(params, batch, occ_state, lrate, tcfg, d, n_steps):
    """The one compiled fitter program, shared across every evaluated view.

    ``params`` and the per-view ``batch`` (ro, rd, vd, near_a, far_a, tgt)
    are jit arguments — nothing view-specific is baked into the executable,
    so repeated per-view fits reuse this compile (same ray-subset shapes).
    """
    ro, rd, vd, near_a, far_a, tgt = batch

    def loss_fn(z, p):
        vb = jnp.broadcast_to(z[None, :], (ro.shape[0], d))
        out, _ = render_rays(
            None, p, ro, rd, vd, near_a, far_a, tcfg,
            train=False, occ_state=occ_state, view_bias=vb,
        )
        return jnp.mean((out["rgb_map"] - tgt) ** 2)

    def body(carry, t):
        z, m, v = carry
        loss, g = jax.value_and_grad(loss_fn)(z, params)
        m = _ADAM_B1 * m + (1.0 - _ADAM_B1) * g
        v = _ADAM_B2 * v + (1.0 - _ADAM_B2) * g * g
        mhat = m / (1.0 - _ADAM_B1 ** (t + 1.0))
        vhat = v / (1.0 - _ADAM_B2 ** (t + 1.0))
        z = z - lrate * mhat / (jnp.sqrt(vhat) + _ADAM_EPS)
        return (z, m, v), loss

    zeros = jnp.zeros((d,), jnp.float32)
    (z, _, _), _losses = jax.lax.scan(
        body, (zeros, zeros, zeros), jnp.arange(n_steps, dtype=jnp.float32)
    )
    return z, loss_fn(z, params)


def fit_view_latent(
    params: Dict[str, Any],
    c2w: np.ndarray,
    K: np.ndarray,
    near: float,
    far: float,
    gt: np.ndarray,
    config: RenderConfig,
    occ_state: Optional[Dict[str, jnp.ndarray]] = None,
    n_steps: int = 100,
    n_rays: int = 2048,
    lrate: float = 0.05,
    seed: int = 0,
) -> Tuple[jnp.ndarray, float]:
    """Fit a single ``[D]`` appearance latent to a view's LEFT half.

    Full-batch Adam over a fixed ``n_rays`` left-half subset, run as one
    ``lax.scan`` inside one jit. ``params`` and the ray batch are passed as
    jit arguments (only the latent is optimized; gradients never reach the
    field), so per-view calls share one compiled program. Returns
    (latent ``[D]`` float32, final MSE).
    """
    fc = config.field
    assert fc.use_viewdirs, "appearance latents ride the view encoding"
    d = fc.input_ch_views
    ro_np, rd_np, tgt_np = _left_half_rays(gt, np.asarray(c2w), np.asarray(K),
                                           n_rays, seed)
    ro = jnp.asarray(ro_np)
    rd = jnp.asarray(rd_np)
    tgt = jnp.asarray(tgt_np)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near_a = jnp.full((ro.shape[0], 1), near, jnp.float32)
    far_a = jnp.full((ro.shape[0], 1), far, jnp.float32)
    batch = (ro, rd, vd, near_a, far_a, tgt)

    z, final = _fit_latent(params, batch, occ_state, jnp.float32(lrate),
                           config.test_mode(), d, n_steps)
    return z, float(final)


def right_half_psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    """PSNR restricted to the right half of the image (the scored half)."""
    W = gt.shape[1]
    mse = float(np.mean(
        (np.asarray(pred, np.float32)[:, W // 2:]
         - np.asarray(gt, np.float32)[:, W // 2:]) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def eval_view_with_fitted_latent(
    render_fn,
    params: Dict[str, Any],
    c2w: np.ndarray,
    K: np.ndarray,
    near: float,
    far: float,
    gt: np.ndarray,
    config: RenderConfig,
    occ_state: Optional[Dict[str, jnp.ndarray]] = None,
    **fit_kwargs,
) -> Dict[str, float]:
    """Half-image evaluation of one held-out view.

    ``render_fn`` is a ``make_image_renderer`` product (it accepts
    ``view_bias=``). Returns right-half PSNR with the zero latent and
    with the fitted latent, plus the fit's final left-half MSE.
    """
    z, fit_mse = fit_view_latent(
        params, c2w, K, near, far, gt, config, occ_state=occ_state,
        **fit_kwargs,
    )
    out0 = render_fn(params, c2w[:3, :4], K, near, far, None, occ_state)
    outz = render_fn(params, c2w[:3, :4], K, near, far, None, occ_state,
                     view_bias=z)
    return {
        "psnr_right_zero": right_half_psnr(np.asarray(out0["rgb_map"]), gt),
        "psnr_right_fitted": right_half_psnr(np.asarray(outz["rgb_map"]), gt),
        "fit_mse_left": fit_mse,
    }


def fit_affine_color(pred: np.ndarray, gt: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form per-channel affine color fit ``gt ~ a * pred + b``.

    Exposure / white-balance is an AFFINE property of the capture (gain x
    linear radiance + black-level offset — the model the reference's
    EV-normalization inverts offline,
    reference: notebooks/iphone_raw_preprocessing.ipynb EV-normalization
    cell), so the per-view unknown is 6 numbers, not a field latent.
    Ordinary least squares per channel over the given pixels:
    ``a = cov(pred, gt) / var(pred)``, ``b = mean(gt) - a * mean(pred)``.
    Near-constant predictions (var ~ 0) degrade to identity gain. Returns
    (a ``[3]``, b ``[3]``) float32.
    """
    p = np.asarray(pred, np.float32).reshape(-1, 3)
    g = np.asarray(gt, np.float32).reshape(-1, 3)
    pm, gm = p.mean(axis=0), g.mean(axis=0)
    var = ((p - pm) ** 2).mean(axis=0)
    cov = ((p - pm) * (g - gm)).mean(axis=0)
    a = np.where(var > 1e-8, cov / np.maximum(var, 1e-8), 1.0)
    b = gm - a * pm
    return a.astype(np.float32), b.astype(np.float32)


def eval_view_with_fitted_affine(pred: np.ndarray, gt: np.ndarray
                                 ) -> Dict[str, float]:
    """Half-image affine protocol on an ALREADY-RENDERED view.

    Model-agnostic test-time exposure adaptation (VERDICT round-4 weak
    #4: anneal-trained arms fit the zero appearance latent exactly — the
    color net learns to ignore the latent direction — so the latent
    fitter cannot recover an unknown test exposure on exactly the arms
    with the best generalization gap). This fits the 6-parameter affine
    transform on the LEFT half of the view (closed form, no gradient
    loop, no model requirements) and scores the RIGHT half — same
    no-leak split as the NeRF-W latent protocol above, and the two are
    directly comparable per view.
    """
    pred = np.asarray(pred, np.float32)
    W = gt.shape[1]
    a, b = fit_affine_color(pred[:, : W // 2], np.asarray(gt)[:, : W // 2])
    adj = np.clip(pred * a[None, None] + b[None, None], 0.0, 1.0)
    return {
        "psnr_right_zero": right_half_psnr(pred, gt),
        "psnr_right_affine": right_half_psnr(adj, gt),
        "gain": [float(v) for v in a],
        "bias": [float(v) for v in b],
    }
