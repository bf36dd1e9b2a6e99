"""Convergence GIF/video across renderonly_path_* snapshots.

Equivalent of the reference's scripts/make_gif.py: collects the i-th frame
from every ``renderonly_path_<step>`` directory under a log dir (each is a
render of the same pose path at a different training step) and animates them
to show convergence over training.

Usage: python scripts/make_gif.py <logdir> [--frame 0] [--fps 4]
"""

from __future__ import annotations

import argparse
import glob
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--frame", type=int, default=0,
                    help="which pose-path frame to track across checkpoints")
    ap.add_argument("--fps", type=float, default=4.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    dirs = glob.glob(os.path.join(args.logdir, "renderonly_*_*"))

    def step_of(d):
        m = re.search(r"_(\d+)$", d)
        return int(m.group(1)) if m else -1

    dirs = sorted((d for d in dirs if step_of(d) >= 0), key=step_of)
    if not dirs:
        raise SystemExit(f"no renderonly_* dirs under {args.logdir}")

    import imageio.v2 as imageio

    frames = []
    for d in dirs:
        path = os.path.join(d, f"{args.frame:03d}.png")
        if os.path.exists(path):
            frames.append(imageio.imread(path))
    if not frames:
        raise SystemExit("no frames found")

    out = args.out or os.path.join(args.logdir, "convergence.gif")
    imageio.mimwrite(out, frames, duration=1000.0 / args.fps, loop=0)
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
