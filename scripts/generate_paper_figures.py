"""Publication figure/summary generation across experiments.

Equivalent of the reference's generate_paper_figures.py: walks a logs/
directory, loads each experiment's metrics (metrics/metrics_iter_*.pkl and
training_metrics.pkl), and emits
- a metrics-overview PDF (PSNR-vs-time, loss curves, milestone table), and
- an experiment summary CSV.

Usage: python scripts/generate_paper_figures.py <logs_root> [--out figures/]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np


def load_experiment(logdir):
    out = {"name": os.path.basename(os.path.normpath(logdir))}
    tm_path = os.path.join(logdir, "training_metrics.pkl")
    if os.path.exists(tm_path):
        with open(tm_path, "rb") as f:
            out["training"] = pickle.load(f)
    pkls = sorted(glob.glob(os.path.join(logdir, "metrics", "metrics_iter_*.pkl")))
    if pkls:
        with open(pkls[-1], "rb") as f:
            out["metrics"] = pickle.load(f)
    return out if ("training" in out or "metrics" in out) else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs_root")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    outdir = args.out or os.path.join(args.logs_root, "figures")
    os.makedirs(outdir, exist_ok=True)

    exps = []
    for d in sorted(glob.glob(os.path.join(args.logs_root, "*"))):
        if os.path.isdir(d):
            e = load_experiment(d)
            if e:
                exps.append(e)
    if not exps:
        raise SystemExit(f"no experiments with metrics under {args.logs_root}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    pdf_path = os.path.join(outdir, "metrics_overview.pdf")
    rows = []
    with PdfPages(pdf_path) as pdf:
        # Page 1: PSNR vs time for all experiments.
        fig, ax = plt.subplots(figsize=(9, 6))
        for e in exps:
            tr = e.get("training")
            if tr and tr.get("time"):
                ax.plot(tr["time"], tr["psnr"], label=e["name"][:48], alpha=0.8)
        ax.set_xlabel("Training time (s)")
        ax.set_ylabel("PSNR (dB)")
        ax.set_title("PSNR vs wall-clock time")
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=6)
        pdf.savefig(fig)
        plt.close(fig)

        # Page 2: loss curves (log scale).
        fig, ax = plt.subplots(figsize=(9, 6))
        for e in exps:
            tr = e.get("training")
            if tr and tr.get("losses"):
                ax.semilogy(tr["losses"], label=e["name"][:48], alpha=0.8)
        ax.set_xlabel("Logged iteration")
        ax.set_ylabel("Loss (MSE)")
        ax.set_title("Training loss")
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=6)
        pdf.savefig(fig)
        plt.close(fig)

    for e in exps:
        tr = e.get("training", {})
        tm = tr.get("time_metrics", {})
        milestones = tm.get("milestones", {})
        row = {
            "experiment": e["name"],
            "final_psnr": tr["psnr"][-1] if tr.get("psnr") else None,
            "iterations_logged": len(tr.get("psnr", [])),
            "convergence_min": tm.get("convergence_time"),
        }
        for m in (15, 20, 25, 30, 35):
            d = milestones.get(f"{m}db")
            row[f"time_to_{m}db_min"] = d["time_minutes"] if d else None
        rows.append(row)

    import pandas as pd

    df = pd.DataFrame(rows)
    csv_path = os.path.join(outdir, "experiment_summary.csv")
    df.to_csv(csv_path, index=False)
    print("wrote", pdf_path)
    print("wrote", csv_path)
    print(df)


if __name__ == "__main__":
    main()
