"""Volumetric rendering pipeline.

TPU-native equivalent of the reference render stack
(reference: PocketNeRF/run_nerf.py:71-151 render/batchify_rays and
run_nerf.py:414-549 render_rays):

- ``render_rays`` is ONE pure fixed-shape function: stratified coarse
  sampling → field query → compositing → hierarchical resample → fine query
  → compositing. No python chunking inside — the training batch is a static
  shape, jitted once.
- full-image rendering tiles the (H*W) ray set with ``lax.map`` over
  fixed-size tiles instead of the reference's 32k-ray python loop
  (run_nerf.py:71-83), so a whole 800x800 render is a single device program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.models.field import FieldConfig, query_field
from indoor_nerf_tpu.ops.occupancy import OccupancyConfig, occupancy_z_vals
from indoor_nerf_tpu.ops.rays import get_rays, ndc_rays
from indoor_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals
from indoor_nerf_tpu.ops.volume import raw2outputs


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (the static parts of the reference's
    render_kwargs_train/test dicts, run_nerf.py:320-343)."""

    field: FieldConfig
    n_samples: int = 64
    n_importance: int = 0
    perturb: float = 1.0
    lindisp: bool = False
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    ndc: bool = False
    # Occupancy-guided sampling (ops/occupancy.py): when set, replaces the
    # coarse+fine hierarchy with one n_occ_samples pass over occupied space.
    occupancy: Optional[OccupancyConfig] = None
    n_occ_samples: int = 64

    def test_mode(self) -> "RenderConfig":
        """Test-time variant: no jitter, no sigma noise
        (reference: run_nerf.py:340-342)."""
        return dataclasses.replace(self, perturb=0.0, raw_noise_std=0.0)


def render_rays(
    key: Optional[jax.Array],
    params: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    near: jnp.ndarray,
    far: jnp.ndarray,
    config: RenderConfig,
    quant_state: Optional[Dict[str, Any]] = None,
    train: bool = True,
    step: Optional[jnp.ndarray] = None,
    retraw: bool = False,
    occ_state: Optional[Dict[str, jnp.ndarray]] = None,
    view_bias: Optional[jnp.ndarray] = None,
) -> Tuple[Dict[str, jnp.ndarray], Optional[Dict[str, Any]]]:
    """Render a fixed-size batch of rays (reference: run_nerf.py:414-549).

    Args:
      key: PRNG key (may be None when perturb == 0 and raw_noise_std == 0).
      rays_o/rays_d: ``[N, 3]``; viewdirs ``[N, 3]`` unit directions or None.
      near/far: ``[N, 1]``.
      quant_state: A-CAQ state threaded through field queries.
      train: training mode (affects quantizers only).
      step: global step (for the hash-quant warmup gate).

    Returns (outputs dict, updated quant_state). Output keys mirror the
    reference ret dict: rgb_map/depth_map/acc_map/sparsity_loss, pts, rays_d,
    coarse '0' variants, z_std, optional normal_map/raw.
    """
    fc = config.field
    if key is not None:
        k_strat, k_pdf, k_noise0, k_noise1 = jax.random.split(key, 4)
    else:
        k_strat = k_pdf = k_noise0 = k_noise1 = None

    if config.occupancy is not None and occ_state is not None:
        # Occupancy-guided single pass: the grid CDF is the free coarse pass.
        occ_step = step if step is not None else jnp.asarray(1 << 30, jnp.int32)
        occ_key = k_strat if k_strat is not None else jax.random.PRNGKey(0)
        z_vals = occupancy_z_vals(
            occ_key, rays_o, rays_d, near, far, occ_state, config.occupancy,
            config.n_occ_samples, occ_step, perturb=config.perturb,
        )
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
        mlp_name = "fine" if "fine" in params else "coarse"
        raw, quant_state = query_field(
            params, mlp_name, pts, viewdirs, fc, quant_state, train, step,
            view_bias=view_bias,
        )
        out = raw2outputs(
            raw, z_vals, rays_d,
            raw_noise_std=config.raw_noise_std,
            white_bkgd=config.white_bkgd,
            noise_key=k_noise0,
            predict_normals=fc.predict_normals,
        )
        ret = {
            "rgb_map": out["rgb_map"],
            "depth_map": out["depth_map"],
            "acc_map": out["acc_map"],
            "disp_map": out["disp_map"],
            "sparsity_loss": out["sparsity_loss"],
            "pts": pts,
            "rays_d": rays_d,
        }
        if fc.predict_normals:
            ret["normal_map"] = out["normal_map"]
        if train:
            # Per-sample compositing weights + depths for the distortion
            # loss (losses/distortion.py); training batches only — eval
            # tiles skip them to keep full-image render memory unchanged.
            ret["weights"] = out["weights"]
            ret["z_vals"] = z_vals
        if retraw:
            ret["raw"] = raw
        return ret, quant_state

    z_vals = stratified_z_vals(
        k_strat, near, far, config.n_samples,
        perturb=config.perturb, lindisp=config.lindisp,
    )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]

    raw, quant_state = query_field(
        params, "coarse", pts, viewdirs, fc, quant_state, train, step,
        view_bias=view_bias,
    )
    out = raw2outputs(
        raw, z_vals, rays_d,
        raw_noise_std=config.raw_noise_std,
        white_bkgd=config.white_bkgd,
        noise_key=k_noise0,
        predict_normals=fc.predict_normals,
    )

    ret: Dict[str, jnp.ndarray] = {}
    if config.n_importance > 0:
        # Stash coarse maps (reference: run_nerf.py:502-506).
        ret["rgb0"] = out["rgb_map"]
        ret["depth0"] = out["depth_map"]
        ret["acc0"] = out["acc_map"]
        ret["sparsity_loss0"] = out["sparsity_loss"]
        if fc.predict_normals:
            ret["normal0"] = out["normal_map"]

        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            k_pdf, z_mid, out["weights"][..., 1:-1], config.n_importance,
            det=(config.perturb == 0.0),
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]

        fine_name = "fine" if "fine" in params else "coarse"
        raw, quant_state = query_field(
            params, fine_name, pts, viewdirs, fc, quant_state, train, step,
            view_bias=view_bias,
        )
        out = raw2outputs(
            raw, z_vals, rays_d,
            raw_noise_std=config.raw_noise_std,
            white_bkgd=config.white_bkgd,
            noise_key=k_noise1,
            predict_normals=fc.predict_normals,
        )
        ret["z_std"] = jnp.std(z_samples, axis=-1)

    ret["rgb_map"] = out["rgb_map"]
    ret["depth_map"] = out["depth_map"]
    ret["acc_map"] = out["acc_map"]
    ret["disp_map"] = out["disp_map"]
    ret["sparsity_loss"] = out["sparsity_loss"]
    # Always returned for the structural priors (reference: run_nerf.py:528-529).
    ret["pts"] = pts
    ret["rays_d"] = rays_d
    if fc.predict_normals:
        ret["normal_map"] = out["normal_map"]
    if train:
        # Fine-pass weights/depths for the distortion loss (see above).
        ret["weights"] = out["weights"]
        ret["z_vals"] = z_vals
    if retraw:
        ret["raw"] = raw
    return ret, quant_state


def _prepare_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    H: int,
    W: int,
    focal: float,
    near: float,
    far: float,
    config: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Viewdirs normalization + NDC projection + per-ray bounds
    (reference: run_nerf.py:119-140)."""
    viewdirs = None
    if config.field.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)
    if config.ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    near_a = near * jnp.ones_like(rays_d[..., :1])
    far_a = far * jnp.ones_like(rays_d[..., :1])
    return rays_o, rays_d, viewdirs, near_a, far_a


def _render_image_jit(
    params: Dict[str, Any],
    c2w: jnp.ndarray,
    K: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    config: RenderConfig,
    H: int,
    W: int,
    tile_rays: int,
    quant_state: Optional[Dict[str, Any]] = None,
    occ_state: Optional[Dict[str, jnp.ndarray]] = None,
    c2w_staticcam: Optional[jnp.ndarray] = None,
    view_bias: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Single-pose render: the B=1 case of _render_pose_block_jit."""
    out = _render_pose_block_jit(
        params, c2w[None], K, near, far, config, H, W, tile_rays,
        quant_state, occ_state,
        None if c2w_staticcam is None else c2w_staticcam[None],
        view_bias,
    )
    return {k: v[0] for k, v in out.items()}


@functools.partial(
    jax.jit, static_argnames=("config", "H", "W", "tile_rays")
)
def _render_pose_block_jit(
    params: Dict[str, Any],
    c2ws: jnp.ndarray,  # [B, 3, 4]
    K: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    config: RenderConfig,
    H: int,
    W: int,
    tile_rays: int,
    quant_state: Optional[Dict[str, Any]] = None,
    occ_state: Optional[Dict[str, jnp.ndarray]] = None,
    c2ws_staticcam: Optional[jnp.ndarray] = None,
    view_bias: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a BLOCK of poses in one device dispatch.

    The ray pool spans B poses so videos/testsets pay the host->device
    dispatch latency once per block instead of once per frame (measured
    ~30-40 ms per dispatch through the axon tunnel; BENCH_NOTES.md render
    decomposition). The reference renders pose-at-a-time
    (run_nerf.py:154-215). ``c2ws_staticcam`` visualizes the
    view-direction effect: directions from ``c2ws``, geometry rays from
    the static cameras (reference: run_nerf.py:122-124). ``view_bias``
    is an optional shared ``[D]`` appearance latent added to every ray's
    encoded view direction (render "with the appearance of image k" /
    with a test-time fitted latent — render/appearance.py)."""
    B = c2ws.shape[0]
    rays_o, rays_d = jax.vmap(lambda p: get_rays(H, W, K, p))(c2ws)
    vd_src = None
    if c2ws_staticcam is not None:
        vd_src = rays_d
        rays_o, rays_d = jax.vmap(
            lambda p: get_rays(H, W, K, p))(c2ws_staticcam)
    focal = K[0][0]
    rays_o, rays_d, viewdirs, near_a, far_a = _prepare_rays(
        rays_o, rays_d, H, W, focal, near, far, config
    )
    if vd_src is not None and viewdirs is not None:
        viewdirs = (
            vd_src / jnp.linalg.norm(vd_src, axis=-1, keepdims=True)
        ).reshape(-1, 3)

    n = B * H * W
    n_pad = ((n + tile_rays - 1) // tile_rays) * tile_rays
    pad = n_pad - n

    def padded(x):
        return jnp.pad(x, ((0, pad), (0, 0))).reshape(-1, tile_rays, x.shape[-1])

    tiles = (
        padded(rays_o),
        padded(rays_d),
        padded(viewdirs) if viewdirs is not None else None,
        padded(near_a),
        padded(far_a),
    )

    def tile_fn(args):
        ro, rd, vd, nr, fr = args
        vb = (None if view_bias is None else jnp.broadcast_to(
            view_bias[None, :], (ro.shape[0], view_bias.shape[-1])))
        out, _ = render_rays(
            None, params, ro, rd, vd, nr, fr,
            config.test_mode(), quant_state=quant_state, train=False,
            step=None, occ_state=occ_state, view_bias=vb,
        )
        return {
            "rgb_map": out["rgb_map"],
            "depth_map": out["depth_map"],
            "acc_map": out["acc_map"],
            "disp_map": out["disp_map"],
        }

    out = jax.lax.map(tile_fn, tiles)
    flat = {k: v.reshape(n_pad, *v.shape[2:])[:n] for k, v in out.items()}
    return {
        "rgb_map": flat["rgb_map"].reshape(B, H, W, 3),
        "depth_map": flat["depth_map"].reshape(B, H, W),
        "acc_map": flat["acc_map"].reshape(B, H, W),
        "disp_map": flat["disp_map"].reshape(B, H, W),
    }


def make_pose_block_renderer(
    config: RenderConfig, H: int, W: int, pose_block: int,
    tile_rays: int = 16384,
):
    """A jitted B-poses-per-dispatch renderer: (params, c2ws [B,3,4], K,
    near, far[, quant_state, occ_state]) -> maps dict with leading B axis.
    Callers pad the final partial block to B (one compilation total)."""

    def render_fn(params, c2ws, K, near, far, quant_state=None,
                  occ_state=None):
        assert c2ws.shape[0] == pose_block, (c2ws.shape, pose_block)
        return _render_pose_block_jit(
            params,
            jnp.asarray(c2ws, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(near, jnp.float32),
            jnp.asarray(far, jnp.float32),
            config, H, W, tile_rays, quant_state, occ_state,
        )

    return render_fn


def make_image_renderer(config: RenderConfig, H: int, W: int, tile_rays: int = 16384):
    """A jitted full-image renderer: (params, c2w, K, near, far[, quant_state,
    occ_state]) -> maps dict. Equivalent of render(c2w=...) + batchify_rays
    (reference: run_nerf.py:86-151) with lax.map tiling."""

    def render_fn(params, c2w, K, near, far, quant_state=None, occ_state=None,
                  c2w_staticcam=None, view_bias=None):
        return _render_image_jit(
            params,
            jnp.asarray(c2w, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(near, jnp.float32),
            jnp.asarray(far, jnp.float32),
            config,
            H,
            W,
            tile_rays,
            quant_state,
            occ_state,
            None if c2w_staticcam is None
            else jnp.asarray(c2w_staticcam, jnp.float32),
            None if view_bias is None
            else jnp.asarray(view_bias, jnp.float32),
        )

    return render_fn


def render_image(
    params: Dict[str, Any],
    H: int,
    W: int,
    K: np.ndarray,
    c2w: np.ndarray,
    near: float,
    far: float,
    config: RenderConfig,
    quant_state: Optional[Dict[str, Any]] = None,
    tile_rays: int = 16384,
    occ_state: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Convenience single-image render; see make_image_renderer."""
    out = make_image_renderer(config, H, W, tile_rays)(
        params, c2w, K, near, far, quant_state, occ_state
    )
    return {k: np.asarray(v) for k, v in out.items()}
