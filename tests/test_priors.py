"""Unit tests for the Manhattan structural priors on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.losses.priors import (
    PriorConfig,
    combine_structural_losses,
    detect_planes,
    estimate_manhattan_frame,
    manhattan_sdf_loss,
    spatial_normal_consistency_loss,
    structured_planarity_loss,
)

CFG = PriorConfig()


def _manhattan_normals(rng, n_per_axis=60, noise=0.02):
    """Noisy normals clustered on a rotated Manhattan frame's axes."""
    theta = 0.4
    rot = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1]], np.float32
    )
    axes = rot @ np.eye(3)
    normals = []
    for k in range(3):
        base = axes[:, k]
        pts = base[None] + noise * rng.normal(size=(n_per_axis, 3))
        normals.append(pts * rng.choice([-1, 1], size=(n_per_axis, 1)))
    normals = np.concatenate(normals).astype(np.float32)
    return normals / np.linalg.norm(normals, axis=-1, keepdims=True), rot


def test_frame_estimation_recovers_rotation(rng):
    normals, rot = _manhattan_normals(rng)
    conf = jnp.ones(normals.shape[0])
    frame = np.asarray(
        estimate_manhattan_frame(jax.random.PRNGKey(0), jnp.asarray(normals),
                                 conf, CFG)
    )
    # The frame is orthonormal...
    np.testing.assert_allclose(frame.T @ frame, np.eye(3), atol=1e-5)
    # ...and each true axis aligns with SOME frame column (up to sign).
    # The estimator is the reference's: 3-cluster k-means over SIGNED
    # normals (6 modes), so recovery is approximate by construction.
    align = np.abs(rot.T @ frame)  # [true_axis, frame_col]
    assert (align.max(axis=1) > 0.9).all(), align


def test_frame_estimation_identity_fallbacks(rng):
    # Too few normals -> identity.
    few = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    frame = estimate_manhattan_frame(
        jax.random.PRNGKey(0), few, jnp.ones(10), CFG
    )
    np.testing.assert_allclose(np.asarray(frame), np.eye(3))
    # Too few confident normals -> identity.
    many = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    frame = estimate_manhattan_frame(
        jax.random.PRNGKey(0), many, jnp.zeros(100), CFG
    )
    np.testing.assert_allclose(np.asarray(frame), np.eye(3))


def test_detect_planes_floor_and_wall():
    n = 200
    normals = np.zeros((n, 3), np.float32)
    normals[:80] = [0, 0, 1]  # floor (up)
    normals[80:150] = [1, 0, 0]  # wall
    normals[150:] = 0.01  # unstable (magnitude < 0.1)
    depth = jnp.ones(n)
    sem = detect_planes(depth, jnp.asarray(normals), CFG)
    assert int(sem["n_floor"]) == 80
    assert int(sem["n_wall"]) == 70
    assert not bool(sem["floor_mask"][150])  # unstable filtered


def test_manhattan_loss_zero_for_aligned_normals():
    n = 200
    normals = np.zeros((n, 3), np.float32)
    normals[:100] = [0, 0, 1]
    normals[100:] = [1, 0, 0]
    sem = detect_planes(jnp.ones(n), jnp.asarray(normals), CFG)
    loss = manhattan_sdf_loss(
        jnp.asarray(normals), jnp.eye(3), sem, jnp.asarray(1.0)
    )
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)

    # Misaligned normals -> positive loss, clamped at 0.1 * weight.
    theta = np.pi / 4
    rot_normals = normals.copy()
    rot_normals[:100] = [0, np.sin(theta), np.cos(theta)]
    sem2 = detect_planes(jnp.ones(n), jnp.asarray(rot_normals), CFG)
    loss2 = manhattan_sdf_loss(
        jnp.asarray(rot_normals), jnp.eye(3), sem2, jnp.asarray(1.0)
    )
    assert 0.0 < float(loss2) <= 0.1 + 1e-6


def test_planarity_loss_prefers_flat_depth(rng):
    n = 400
    normals = np.tile([0, 0, 1.0], (n, 1)).astype(np.float32)
    sem = detect_planes(jnp.ones(n), jnp.asarray(normals), CFG)
    flat = jnp.ones(n)
    bumpy = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    key = jax.random.PRNGKey(0)
    l_flat = float(structured_planarity_loss(key, flat, sem, jnp.asarray(1.0), CFG))
    l_bumpy = float(structured_planarity_loss(key, bumpy, sem, jnp.asarray(1.0), CFG))
    assert l_flat < 1e-6
    assert l_bumpy > l_flat


def test_consistency_loss_zero_for_identical_normals(rng):
    n = 500
    normals = jnp.asarray(np.tile([0, 0, 1.0], (n, 1)), jnp.float32)
    depth = jnp.ones(n)
    coords = jnp.asarray(rng.uniform(0, 32, size=(n, 2)), jnp.float32)
    loss = spatial_normal_consistency_loss(
        jax.random.PRNGKey(0), normals, depth, coords, jnp.asarray(1.0), CFG
    )
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_combiner_never_fails_on_degenerate_normals(rng):
    # All-zero normals: every mask empty -> exact zero contributions.
    n = 64
    normals = jnp.zeros((n, 3))
    depth = jnp.ones(n)
    weights = {k: jnp.asarray(1.0) for k in
               ("manhattan", "planarity", "normal_consistency")}
    total, diag = combine_structural_losses(
        jax.random.PRNGKey(0), depth, normals, None, weights, CFG
    )
    assert np.isfinite(float(total))
    assert int(diag["semantic_floor_count"]) == 0

    # And gradients through the combiner are finite.
    def loss_fn(normals):
        t, _ = combine_structural_losses(
            jax.random.PRNGKey(0), depth, normals, None, weights, CFG
        )
        return t

    g = jax.grad(loss_fn)(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_wall_cluster_angle_diagnostic(rng):
    """cluster_wall_normals is wired into the combiner diagnostics: two
    orthogonal wall families read ~90 deg; parallel walls read ~0 deg."""
    from indoor_nerf_tpu.losses.priors import cluster_wall_normals

    def walls(dirs, n=80):
        m = []
        for d in dirs:
            v = np.tile(np.array(d + (0.0,), np.float32), (n, 1))
            m.append(v + 0.02 * rng.normal(size=(n, 3)).astype(np.float32))
        nm = np.concatenate(m)
        return nm / np.linalg.norm(nm, axis=-1, keepdims=True)

    ortho = walls([(1.0, 0.0), (0.0, 1.0)])
    mask = jnp.ones(ortho.shape[0], bool)
    c = cluster_wall_normals(jnp.asarray(ortho[:, :2]), mask)
    a = np.degrees(np.arccos(abs(float(
        np.dot(c["wall_1"] / np.linalg.norm(c["wall_1"]),
               c["wall_2"] / np.linalg.norm(c["wall_2"]))))))
    assert a > 80.0, a

    key = jax.random.PRNGKey(0)
    depth = jnp.ones(ortho.shape[0])
    w = {k: jnp.asarray(1.0) for k in
         ("manhattan", "planarity", "normal_consistency")}
    _, diag = combine_structural_losses(key, depth, jnp.asarray(ortho),
                                        None, w, CFG)
    assert "wall_cluster_angle_deg" in diag
    assert float(diag["wall_cluster_angle_deg"]) > 80.0

    para = walls([(1.0, 0.0), (-1.0, 0.0)])
    _, diag_p = combine_structural_losses(key, depth, jnp.asarray(para),
                                          None, w, CFG)
    assert float(diag_p["wall_cluster_angle_deg"]) < 20.0
