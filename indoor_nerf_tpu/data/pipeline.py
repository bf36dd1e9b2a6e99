"""Host-side ray sampling pipelines feeding the device step.

Numpy equivalents of the reference's two ray-batch modes:
- batched mode: precompute+shuffle ALL train rays once, then slice, with an
  epoch reshuffle (reference: PocketNeRF/run_nerf.py:899-920, 962-973);
- per-image mode: one random image per step, optional central precrop,
  choice-without-replacement over pixels (reference: run_nerf.py:975-1004).

Sampling stays on host (cheap, overlaps with device compute); the device
only ever sees fixed-shape [n_rand] batches. On a multi-host pod each host
runs its own pipeline over its ray shard (SURVEY.md §2 parallelism item 4).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from indoor_nerf_tpu.ops.rays import get_rays_np


class BatchedRaySampler:
    """Shuffled global ray pool (use_batching mode)."""

    def __init__(
        self,
        images: np.ndarray,
        poses: np.ndarray,
        i_train: np.ndarray,
        H: int,
        W: int,
        K: np.ndarray,
        n_rand: int,
        seed: int = 0,
    ):
        rays = np.stack(
            [np.stack(get_rays_np(H, W, K, p[:3, :4]), 0) for p in poses], 0
        )  # [N, 2(ro+rd), H, W, 3]
        rays_rgb = np.concatenate([rays, images[:, None]], 1)  # [N, 3, H, W, 3]
        rays_rgb = np.transpose(rays_rgb, [0, 2, 3, 1, 4])  # [N, H, W, 3, 3]
        rays_rgb = np.stack([rays_rgb[i] for i in i_train], 0)
        # Absolute source-image id per ray (appearance embeddings index
        # the global image table; see FieldConfig.n_appearance).
        img_ids = np.repeat(
            np.asarray(i_train, np.int32), H * W
        )
        rays_rgb = rays_rgb.reshape(-1, 3, 3).astype(np.float32)
        self._rng = np.random.default_rng(seed)
        perm = self._rng.permutation(rays_rgb.shape[0])
        self.rays_rgb = rays_rgb[perm]
        self.img_ids = img_ids[perm]
        self.n_rand = n_rand
        self.i_batch = 0

    def next(self) -> Dict[str, np.ndarray]:
        batch = self.rays_rgb[self.i_batch : self.i_batch + self.n_rand]
        ids = self.img_ids[self.i_batch : self.i_batch + self.n_rand]
        self.i_batch += self.n_rand
        if self.i_batch >= self.rays_rgb.shape[0]:
            # Epoch reshuffle (reference: run_nerf.py:969-973).
            perm = self._rng.permutation(self.rays_rgb.shape[0])
            self.rays_rgb = self.rays_rgb[perm]
            self.img_ids = self.img_ids[perm]
            self.i_batch = 0
        if batch.shape[0] < self.n_rand:  # wrap the tail to keep shapes fixed
            extra = self.rays_rgb[: self.n_rand - batch.shape[0]]
            batch = np.concatenate([batch, extra], 0)
            ids = np.concatenate(
                [ids, self.img_ids[: self.n_rand - ids.shape[0]]], 0)
        return {
            "rays_o": batch[:, 0],
            "rays_d": batch[:, 1],
            "target": batch[:, 2],
            "img_idx": ids,
        }


class ImageRaySampler:
    """Random-pixels-from-one-image sampler (no_batching mode)."""

    def __init__(
        self,
        images: np.ndarray,
        poses: np.ndarray,
        i_train: np.ndarray,
        H: int,
        W: int,
        K: np.ndarray,
        n_rand: int,
        precrop_iters: int = 0,
        precrop_frac: float = 0.5,
        seed: int = 0,
    ):
        self.images = images
        self.poses = poses
        self.i_train = np.asarray(i_train)
        self.H, self.W, self.K = H, W, K
        self.n_rand = n_rand
        self.precrop_iters = precrop_iters
        self.precrop_frac = precrop_frac
        self._rng = np.random.default_rng(seed)
        # Precompute per-pose ray grids once; the reference regenerates them
        # every iteration on device (run_nerf.py:983).
        self._ray_cache: Dict[int, tuple] = {}

    def _rays_for(self, img_i: int):
        if img_i not in self._ray_cache:
            self._ray_cache[img_i] = get_rays_np(
                self.H, self.W, self.K, self.poses[img_i][:3, :4]
            )
        return self._ray_cache[img_i]

    def next(self, step: int) -> Dict[str, np.ndarray]:
        img_i = int(self._rng.choice(self.i_train))
        target = self.images[img_i]
        rays_o, rays_d = self._rays_for(img_i)

        H, W = self.H, self.W
        if step < self.precrop_iters:
            dH = int(H // 2 * self.precrop_frac)
            dW = int(W // 2 * self.precrop_frac)
            ys = np.arange(H // 2 - dH, H // 2 + dH)
            xs = np.arange(W // 2 - dW, W // 2 + dW)
        else:
            ys = np.arange(H)
            xs = np.arange(W)
        coords = np.stack(np.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
        select = self._rng.choice(
            coords.shape[0], size=self.n_rand, replace=False
        )
        sc = coords[select]  # [n_rand, 2] (row, col)
        return {
            "rays_o": rays_o[sc[:, 0], sc[:, 1]].astype(np.float32),
            "rays_d": rays_d[sc[:, 0], sc[:, 1]].astype(np.float32),
            "target": target[sc[:, 0], sc[:, 1]].astype(np.float32),
            "spatial_coords": sc.astype(np.float32),
            "img_idx": np.full(self.n_rand, img_i, np.int32),
        }
