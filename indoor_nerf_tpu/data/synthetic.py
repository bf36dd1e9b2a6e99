"""Procedural multi-view scene for tests and benchmarks.

The reference relies on the Blender synthetic download for any runnable
example; this module generates an analytic stand-in — a normal-colored,
checker-modulated sphere on a white background, viewed from cameras on an
orbit — so end-to-end convergence tests and throughput benchmarks run with
zero external data. Geometry conventions (camera orbit radius 4, near/far
2/6, NeRF-style c2w with camera -z toward the origin) match the Blender
loader's (reference: PocketNeRF/load_blender.py:30-35, run_nerf.py:768-769).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from indoor_nerf_tpu.ops.rays import get_rays_np


def _look_at_pose(position: np.ndarray) -> np.ndarray:
    """NeRF-convention c2w [3,4]: camera -z points at the origin."""
    z = position / np.linalg.norm(position)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, position], axis=-1).astype(np.float32)


def _render_analytic(rays_o: np.ndarray, rays_d: np.ndarray) -> np.ndarray:
    """Ray-trace a unit sphere at the origin with a checker-normal albedo."""
    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    o = rays_o
    b = np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - 1.0
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = o + t[..., None] * d
    n = p  # unit sphere: normal == position
    checker = ((np.floor(2.5 * p[..., 0]) + np.floor(2.5 * p[..., 1])
                + np.floor(2.5 * p[..., 2])) % 2).astype(np.float32)
    albedo = 0.5 + 0.5 * n
    albedo = albedo * (0.6 + 0.4 * checker[..., None])
    light = np.clip(np.sum(n * np.array([0.0, 0.0, 1.0]), axis=-1), 0.2, 1.0)
    rgb = albedo * light[..., None]
    out = np.ones_like(rgb)  # white background
    out[hit] = np.clip(rgb[hit], 0.0, 1.0)
    return out.astype(np.float32)


def make_synthetic_scene(
    n_views: int = 12, H: int = 64, W: int = 64, seed: int = 0,
    radius: float = 4.0,
) -> Dict[str, np.ndarray]:
    """Build a small multi-view-consistent scene.

    Returns a dict with images [N,H,W,3], poses [N,3,4], hwf, K, near, far,
    bbox (min, max), and i_split (train/val/test index arrays).
    """
    rng = np.random.default_rng(seed)
    focal = 0.9 * W
    K = np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32
    )

    thetas = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    phis = rng.uniform(-0.9, -0.2, size=n_views)  # above the equator
    poses, images = [], []
    for theta, phi in zip(thetas, phis):
        pos = radius * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), -np.sin(phi)]
        )
        c2w = _look_at_pose(pos)
        rays_o, rays_d = get_rays_np(H, W, K, c2w)
        images.append(_render_analytic(rays_o.reshape(-1, 3),
                                       rays_d.reshape(-1, 3)).reshape(H, W, 3))
        poses.append(c2w)

    n_train = max(1, int(0.8 * n_views))
    idx = np.arange(n_views)
    return {
        "images": np.stack(images),
        "poses": np.stack(poses),
        "hwf": [H, W, focal],
        "K": K,
        "near": 2.0,
        "far": 6.0,
        "bbox_min": (-1.5, -1.5, -1.5),
        "bbox_max": (1.5, 1.5, 1.5),
        "i_split": (idx[:n_train], idx[n_train:], idx[n_train:]),
    }
