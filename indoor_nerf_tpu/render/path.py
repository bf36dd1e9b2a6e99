"""Eval/video rendering over a pose path, with the reference's artifacts.

Equivalent of render_path (reference: PocketNeRF/run_nerf.py:154-215): per
view a matplotlib side-by-side rgb + plasma-depth PNG, per-image PSNR vs GT,
and a ``test_psnrs_avg{XX.XX}.pkl`` dump. The per-image render itself is the
lax.map-tiled jitted full-image renderer (renderer.py) — compiled once for
the whole path, not re-chunked in python per 32k rays.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from indoor_nerf_tpu.render.renderer import RenderConfig, make_image_renderer


def to8b(x: np.ndarray) -> np.ndarray:
    """(reference: run_nerf_helpers.py:13)"""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def render_path(
    render_poses: np.ndarray,
    hwf,
    K: np.ndarray,
    config: RenderConfig,
    params,
    near: float,
    far: float,
    gt_imgs: Optional[np.ndarray] = None,
    savedir: Optional[str] = None,
    render_factor: int = 0,
    quant_state=None,
    occ_state=None,
    tile_rays: int = 16384,
    save_figures: bool = True,
    mesh=None,
    model_axis=None,
    image_renderer=None,
    pose_block: int = 4,
) -> Tuple[np.ndarray, np.ndarray, List[float]]:
    """Render every pose; returns (rgbs, depths_normalized, psnrs).

    When ``mesh`` (a multi-device jax.sharding.Mesh with a leading data axis)
    is given, the ray axis is sharded over it. Without it, a plain jit render
    of state already committed to an N-device mesh executes the FULL image
    replicated on every device — N× the work and transient memory for one
    image (measured: a 64×64 occupancy render that takes ~1 min sharded ran
    >9 min replicated on an 8-device host mesh).

    ``pose_block`` > 1 renders that many poses PER DEVICE DISPATCH on the
    single-device path (renderer.make_pose_block_renderer), amortizing the
    fixed per-dispatch latency (~0.17 s through the axon tunnel,
    BENCH_NOTES.md) that otherwise dominates small/medium frames. The
    reference renders pose-at-a-time (run_nerf.py:154-215). Baked image
    renderers advertising ``pose_block`` support are used the same way.
    """
    H, W, focal = hwf
    if render_factor != 0:
        H = H // render_factor
        W = W // render_factor
        focal = focal / render_factor
        K = np.array(
            [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float64
        )

    n_poses = len(render_poses)
    block = max(1, min(pose_block, n_poses))

    def _wrap_single(single):
        """Adapt a single-pose renderer to the [B=1] block contract."""
        def render_block(params, c2ws, K, near, far, quant_state, occ_state):
            out = single(params, c2ws[0], K, near, far, quant_state,
                         occ_state)
            return {k: v[None] for k, v in out.items()}
        return render_block

    if image_renderer is not None:
        # Pre-built whole-image renderer, e.g. the baked deferred-shading
        # one (render/baked.py) for ~30x faster videos/testsets; must have
        # been built for THIS (possibly render_factor-scaled) H, W. If it
        # advertises pose-block support it gets [B,3,4] blocks directly.
        ib = getattr(image_renderer, "pose_block", 1)
        block = max(1, min(ib, n_poses))
        if ib > 1:
            def render_block(params, c2ws, K, near, far, quant_state,
                             occ_state):
                return image_renderer(c2ws, K, near, far)
        else:
            render_block = _wrap_single(
                lambda params, c2w, K, nr, fr, qs, os_:
                image_renderer(c2w, K, nr, fr))

    elif mesh is not None and mesh.devices.size > 1:
        from indoor_nerf_tpu.parallel.sp import make_sharded_image_renderer

        n_dev = mesh.devices.size
        per_dev = -(-int(H) * int(W) // n_dev)  # ceil
        tile = min(tile_rays, -(-per_dev // 128) * 128)
        single = make_sharded_image_renderer(
            config, int(H), int(W), mesh,
            data_axis=mesh.axis_names[0], tile_rays=tile,
            model_axis=model_axis,
        )
        block = 1
        render_block = _wrap_single(single)

    else:
        from indoor_nerf_tpu.render.renderer import make_pose_block_renderer

        if block > 1:
            render_block = make_pose_block_renderer(
                config, int(H), int(W), block, tile_rays
            )
        else:
            render_block = _wrap_single(
                make_image_renderer(config, int(H), int(W), tile_rays))

    rgbs, depths, psnrs = [], [], []
    t = time.time()
    for start in range(0, n_poses, block):
        idxs = list(range(start, min(start + block, n_poses)))
        c2ws = np.stack(
            [np.asarray(render_poses[j][:3, :4]) for j in idxs]
            + [np.asarray(render_poses[idxs[-1]][:3, :4])]
            * (block - len(idxs)),  # pad the final partial block
            0,
        )
        out = render_block(params, c2ws, K, near, far, quant_state, occ_state)
        for bi, i in enumerate(idxs):
            print(i, time.time() - t)
            t = time.time()
            rgb = np.asarray(out["rgb_map"][bi])
            depth = (np.asarray(out["depth_map"][bi]) - near) / (far - near)
            rgbs.append(rgb)
            depths.append(depth)

            if gt_imgs is not None and render_factor == 0:
                gt = np.asarray(gt_imgs[i])
                p = -10.0 * np.log10(np.mean(np.square(rgb - gt)))
                print(p)
                psnrs.append(float(p))

            if savedir is not None and save_figures:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                fig = plt.figure(figsize=(25, 15))
                ax = fig.add_subplot(1, 2, 1)
                ax.imshow(to8b(rgb))
                ax.axis("off")
                ax = fig.add_subplot(1, 2, 2)
                ax.imshow(depth, cmap="plasma", vmin=0, vmax=1)
                ax.axis("off")
                filename = os.path.join(savedir, "{:03d}.png".format(i))
                plt.savefig(filename, bbox_inches="tight", pad_inches=0)
                plt.close(fig)

    rgbs = np.stack(rgbs, 0)
    depths = np.stack(depths, 0)

    if gt_imgs is not None and render_factor == 0 and psnrs and savedir:
        avg_psnr = sum(psnrs) / len(psnrs)
        print("Avg PSNR over Test set: ", avg_psnr)
        with open(
            os.path.join(savedir, "test_psnrs_avg{:0.2f}.pkl".format(avg_psnr)),
            "wb",
        ) as fp:
            pickle.dump(psnrs, fp)

    return rgbs, depths, psnrs


def write_video(path: str, frames: np.ndarray, fps: int = 30, quality: int = 8):
    """mp4 writer (reference: run_nerf.py:1376-1377) with a GIF fallback when
    no ffmpeg backend is installed (the artifact still lands next to where
    the reference's mp4 would)."""
    import imageio

    try:
        imageio.mimwrite(path, to8b(frames), fps=fps, quality=quality)
    except Exception as e:  # no ffmpeg/pyav backend
        gif_path = os.path.splitext(path)[0] + ".gif"
        print(f"[video] mp4 backend unavailable ({e}); writing {gif_path}")
        imageio.mimwrite(gif_path, to8b(frames), duration=1000.0 / fps, loop=0)
