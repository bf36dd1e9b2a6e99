"""PSNR-vs-time curve from loss_vs_time.pkl (+ CSV export).

Equivalent of the reference's scripts/plot_losses.py: reads the
``loss_vs_time.pkl`` a training run writes every i_print iterations
(trainer.py; reference run_nerf.py:1449-1456), plots PSNR against wall-clock
seconds up to a horizon, and dumps the series as CSV.

Usage: python scripts/plot_losses.py <logdir> [--horizon 10000] [--out X.png]
"""

from __future__ import annotations

import argparse
import os
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir", help="experiment log dir containing loss_vs_time.pkl")
    ap.add_argument("--horizon", type=float, default=10000.0,
                    help="max seconds to plot")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    with open(os.path.join(args.logdir, "loss_vs_time.pkl"), "rb") as f:
        data = pickle.load(f)
    times = data["time"]
    psnrs = data["psnr"]
    losses = data["losses"]

    keep = [i for i, t in enumerate(times) if t <= args.horizon]
    times = [times[i] for i in keep]
    psnrs = [psnrs[i] for i in keep]
    losses = [losses[i] for i in keep]

    import csv

    csv_path = os.path.join(args.logdir, "loss_vs_time.csv")
    with open(csv_path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["time_s", "psnr_db", "loss"])
        wr.writerows(zip(times, psnrs, losses))
    print("wrote", csv_path)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(times, psnrs, "b-", linewidth=2)
    ax.set_xlabel("Training time (s)")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title(os.path.basename(os.path.normpath(args.logdir)))
    ax.grid(True, alpha=0.3)
    out = args.out or os.path.join(args.logdir, "psnr_vs_time.png")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
