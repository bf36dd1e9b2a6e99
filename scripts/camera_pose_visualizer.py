"""3D camera-frustum plot for a set of poses.

Equivalent of the reference's camera_pose_visualizer.py: draws each camera
as a pyramid frustum in world space, colored by index, for sanity-checking
dataset poses.

Usage:
  python scripts/camera_pose_visualizer.py --dataset blender --datadir ...
  python scripts/camera_pose_visualizer.py --npy poses.npy
"""

from __future__ import annotations

import argparse

import numpy as np


def plot_poses(poses: np.ndarray, focal_scale: float = 0.3, out: str = "poses.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    n = len(poses)
    colors = cm.viridis(np.linspace(0, 1, n))

    # Frustum corners in camera space (NeRF convention: looks along -z).
    s = focal_scale
    corners = np.array(
        [[-s, -s, -2 * s], [s, -s, -2 * s], [s, s, -2 * s], [-s, s, -2 * s]]
    )
    for i, pose in enumerate(poses):
        r, t = pose[:3, :3], pose[:3, 3]
        pts = corners @ r.T + t
        for j in range(4):
            ax.plot(*zip(t, pts[j]), color=colors[i], linewidth=0.8)
            ax.plot(*zip(pts[j], pts[(j + 1) % 4]), color=colors[i],
                    linewidth=0.8)
        ax.scatter(*t, color=colors[i], s=10)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.set_title(f"{n} camera poses")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npy", default=None, help="poses .npy [N,3|4,4]")
    ap.add_argument("--dataset", default=None,
                    help="dataset type (blender/llff/scannet/synthetic)")
    ap.add_argument("--datadir", default=None)
    ap.add_argument("--out", default="poses.png")
    args = ap.parse_args()

    if args.npy:
        poses = np.load(args.npy)
    elif args.dataset == "synthetic":
        from indoor_nerf_tpu.data.synthetic import make_synthetic_scene

        poses = make_synthetic_scene()["poses"]
    elif args.dataset == "blender":
        from indoor_nerf_tpu.data.blender import load_blender_data

        _, poses, *_ = load_blender_data(args.datadir, True, 8)
    elif args.dataset == "llff":
        from indoor_nerf_tpu.data.llff import load_llff_data

        _, poses, *_ = load_llff_data(args.datadir)
        poses = poses[:, :3, :4]
    else:
        raise SystemExit("provide --npy or --dataset/--datadir")
    plot_poses(np.asarray(poses), out=args.out)


if __name__ == "__main__":
    main()
