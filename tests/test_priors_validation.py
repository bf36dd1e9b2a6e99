"""Falsifiable validation that each structural prior CAN correct its
targeted defect (VERDICT round-1 item 5).

The round-1 few-shot room experiment recorded an honest negative: priors
did not improve held-out PSNR on that protocol (BENCH_NOTES.md). That
leaves open whether the implementations merely *run* or actually *work*.
These tests close the gap with per-loss defect-injection: for each loss
(manhattan / planarity / normal consistency) we synthesize geometry with
its targeted defect present vs absent and assert the loss is

1. DISCRIMINATIVE — higher on defective geometry than on clean geometry,
2. CORRECTIVE — plain gradient descent on the loss alone measurably
   reduces an independent defect metric (angular deviation / depth
   roughness), i.e. the gradient points the right way,
3. CALIBRATED — (near-)zero on clean geometry, so it cannot degrade an
   already-correct solution.

Reference behavior being validated: structural_priors.py:194-256 (floor /
wall / general Manhattan alignment), :259-318 (region planarity),
:321-371 (spatial normal consistency). The reference itself ships only
shell-script comments as expected improvements (test_structural_v2.sh:
26-27); this is the quantitative version.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indoor_nerf_tpu.losses.priors import (
    PriorConfig,
    manhattan_sdf_loss,
    spatial_normal_consistency_loss,
    structured_planarity_loss,
)

CFG = PriorConfig()


def _semantic(floor_mask, wall_mask):
    return {
        "floor_mask": floor_mask,
        "wall_mask": wall_mask,
        "n_floor": jnp.sum(floor_mask),
        "n_wall": jnp.sum(wall_mask),
    }


def _tilt(normals, axis, angle, rng):
    """Rotate each normal by `angle` radians about a random axis (defect)."""
    out = []
    for n in np.asarray(normals):
        a = rng.normal(size=3)
        a -= a.dot(n) * n
        a /= np.linalg.norm(a)
        out.append(np.cos(angle) * n + np.sin(angle) * a)
    return jnp.asarray(np.stack(out), jnp.float32)


def _angdev(normals, axes):
    """Mean angular deviation (rad) of each normal from its best frame axis."""
    n = np.asarray(normals)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    cos = np.abs(n @ np.asarray(axes))
    return float(np.mean(np.arccos(np.clip(cos.max(-1), -1, 1))))


class TestManhattanLoss:
    def _setup(self, angle):
        rng = np.random.default_rng(0)
        n = 200
        frame = jnp.eye(3)
        floor = jnp.asarray([[0.0, 0.0, 1.0]] * (n // 2))
        wall = jnp.asarray([[1.0, 0.0, 0.0]] * (n - n // 2))
        normals = jnp.concatenate([floor, wall])
        if angle > 0:
            normals = _tilt(normals, None, angle, rng)
        floor_mask = jnp.arange(n) < n // 2
        return normals, frame, _semantic(floor_mask, ~floor_mask)

    def test_discriminative_and_calibrated(self):
        clean, frame, sem = self._setup(0.0)
        bad, _, _ = self._setup(0.35)
        w = jnp.float32(1.0)
        l_clean = float(manhattan_sdf_loss(clean, frame, sem, w))
        l_bad = float(manhattan_sdf_loss(bad, frame, sem, w))
        assert l_clean < 1e-6, l_clean
        assert l_bad > 10 * max(l_clean, 1e-8), (l_clean, l_bad)

    def test_gradient_corrects_tilt(self):
        normals, frame, sem = self._setup(0.25)
        dev0 = _angdev(normals, np.eye(3))
        loss_fn = lambda nrm: manhattan_sdf_loss(nrm, frame, sem, 1.0)
        g = jax.jit(jax.grad(loss_fn))
        for _ in range(200):
            normals = normals - 2.0 * g(normals)
        dev1 = _angdev(normals, np.eye(3))
        assert dev1 < 0.5 * dev0, (dev0, dev1)


class TestPlanarityLoss:
    def _depths(self, rough):
        rng = np.random.default_rng(1)
        n = 512
        base = np.full(n, 3.0)
        if rough > 0:
            base = base + rough * rng.normal(size=n)
        floor_mask = jnp.arange(n) < n // 2
        return (jnp.asarray(base, jnp.float32),
                _semantic(floor_mask, ~floor_mask))

    def test_discriminative_and_calibrated(self):
        key = jax.random.PRNGKey(0)
        d_clean, sem = self._depths(0.0)
        d_bad, _ = self._depths(0.2)
        l_clean = float(structured_planarity_loss(key, d_clean, sem, 1.0, CFG))
        l_bad = float(structured_planarity_loss(key, d_bad, sem, 1.0, CFG))
        assert l_clean < 1e-6, l_clean
        assert l_bad > 0.05, l_bad

    def test_gradient_flattens_regions(self):
        d, sem = self._depths(0.2)
        rough0 = float(jnp.std(d))
        loss_fn = lambda key, dd: structured_planarity_loss(
            key, dd, sem, 1.0, CFG)
        g = jax.jit(jax.grad(loss_fn, argnums=1))
        key = jax.random.PRNGKey(2)
        for _ in range(300):
            key, k = jax.random.split(key)
            d = d - 0.5 * g(k, d)
        rough1 = float(jnp.std(d))
        assert rough1 < 0.5 * rough0, (rough0, rough1)
        # Mean depth must be preserved (the loss flattens, not collapses).
        assert abs(float(jnp.mean(d)) - 3.0) < 0.05


class TestNormalConsistencyLoss:
    def _setup(self, noise):
        rng = np.random.default_rng(3)
        side = 16
        n = side * side
        coords = jnp.asarray(
            np.stack(np.meshgrid(np.arange(side), np.arange(side)),
                     -1).reshape(-1, 2).astype(np.float32)
        )
        base = np.tile(np.array([0.0, 0.0, 1.0]), (n, 1))
        if noise > 0:
            base = base + noise * rng.normal(size=(n, 3))
        base /= np.linalg.norm(base, axis=-1, keepdims=True)
        depth = jnp.full((n,), 3.0)
        return jnp.asarray(base, jnp.float32), depth, coords

    def _neighbor_dev(self, normals, side=16):
        n = np.asarray(normals).reshape(side, side, 3)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        cos = np.sum(n[:, 1:] * n[:, :-1], -1)
        return float(np.mean(1.0 - cos))

    def test_discriminative_and_calibrated(self):
        key = jax.random.PRNGKey(0)
        for noise, lo, hi in ((0.0, 0.0, 1e-6), (0.5, 0.01, 10.0)):
            normals, depth, coords = self._setup(noise)
            l = float(spatial_normal_consistency_loss(
                key, normals, depth, coords, 1.0, CFG))
            assert lo <= l < hi, (noise, l)

    def test_gradient_smooths_normals(self):
        normals, depth, coords = self._setup(0.5)
        dev0 = self._neighbor_dev(normals)
        loss_fn = lambda key, nrm: spatial_normal_consistency_loss(
            key, nrm, depth, coords, 1.0, CFG)
        g = jax.jit(jax.grad(loss_fn, argnums=1))
        key = jax.random.PRNGKey(4)
        for _ in range(300):
            key, k = jax.random.split(key)
            normals = normals - 1.0 * g(k, normals)
        dev1 = self._neighbor_dev(normals)
        assert dev1 < 0.5 * dev0, (dev0, dev1)
