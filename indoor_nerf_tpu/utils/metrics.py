"""Experiment metrics logging with the reference's artifact layout.

Equivalent of MetricsLogger (reference: PocketNeRF/metric_logger.py:12-352):
same directory (`<logdir>/<exp>/metrics/`), same artifact names
(config.json, metrics_iter_N.pkl, main_metrics_N.csv, quant_metrics_N.csv,
training_curves.png, quantization_analysis.png, summary_table.{csv,tex}),
same series. Quantizer bitwidths arrive as plain arrays pulled from the
quant_state pytree (the pure-state redesign of the reference's module
attributes). Fixed divergence: generate_summary_table indexes psnr[1000]
only when that sample exists (the reference hard-indexes and can crash,
metric_logger.py:328).
"""

from __future__ import annotations

import json
import os
import pickle
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, experiment_name: str, config,
                 write: bool = True):
        """``write=False`` keeps all in-memory series live but turns every
        filesystem write (config.json, pkl/CSV checkpoints, PNGs, summary
        tables) into a no-op — used by non-zero processes in multihost runs
        so hosts sharing a filesystem never race on the same artifacts."""
        self.log_dir = log_dir
        self.experiment_name = experiment_name
        self.config = config
        self.write = write
        self.metrics_dir = os.path.join(log_dir, experiment_name, "metrics")
        if write:
            os.makedirs(self.metrics_dir, exist_ok=True)

        self.metrics: Dict[str, list] = {
            "iteration": [], "time": [], "loss": [], "psnr": [],
            "learning_rate": [], "avg_bitwidth": [], "bitwidth_distribution": [],
            "component_bitwidths": defaultdict(list), "memory_usage": [],
            "inference_time": [], "test_psnr": [], "test_ssim": [],
            "test_lpips": [], "test_lpips_proxy": [],
        }
        self.quant_metrics: Dict[str, list] = {
            "embed_bits": [], "mlp_bits": [], "activation_bits": [],
            "weight_bits": [], "quantization_error": [], "bit_operations": [],
            "model_size": [],
        }
        self.acaq_metrics: Dict[str, list] = {
            "target_metric": [], "loss_ratio": [], "bit_adjustments": [],
            "layer_sensitivity": defaultdict(list),
        }
        self.save_config()

    def save_config(self):
        """config.json for reproducibility (reference: metric_logger.py:66-70)."""
        if not self.write:
            return
        path = os.path.join(self.metrics_dir, "config.json")
        cfg = self.config if isinstance(self.config, dict) else vars(self.config)
        with open(path, "w") as f:
            json.dump(cfg, f, indent=4, default=str)

    def log_iteration(self, iteration, time_elapsed, loss, psnr, lr,
                      quantizer_bits: Optional[Dict[str, np.ndarray]] = None):
        """Per-iteration series (reference: metric_logger.py:72-82).

        quantizer_bits: {'embed': [L] soft bits, 'network': [n_act] soft bits}
        pulled from the quant_state pytree.
        """
        self.metrics["iteration"].append(iteration)
        self.metrics["time"].append(time_elapsed)
        self.metrics["loss"].append(float(loss))
        self.metrics["psnr"].append(float(psnr))
        self.metrics["learning_rate"].append(float(lr))
        if quantizer_bits:
            self._log_quant(quantizer_bits)

    def _log_quant(self, quantizer_bits: Dict[str, np.ndarray]):
        """(reference: metric_logger.py:84-120)"""
        all_bits, embed_bits, mlp_bits = [], [], []
        for name, arr in quantizer_bits.items():
            if arr is None:
                continue
            vals = np.atleast_1d(np.asarray(arr, np.float64))
            for idx, b in enumerate(vals):
                all_bits.append(float(b))
                bucket = embed_bits if "embed" in name else mlp_bits
                bucket.append(float(b))
                self.metrics["component_bitwidths"][f"{name}_{idx}"].append(float(b))
        if all_bits:
            self.metrics["avg_bitwidth"].append(float(np.mean(all_bits)))
            self.metrics["bitwidth_distribution"].append(list(all_bits))
            self.quant_metrics["embed_bits"].append(
                float(np.mean(embed_bits)) if embed_bits else None
            )
            self.quant_metrics["mlp_bits"].append(
                float(np.mean(mlp_bits)) if mlp_bits else None
            )
            for k in ("activation_bits", "weight_bits", "quantization_error",
                      "bit_operations", "model_size"):
                self.quant_metrics[k].append(None)

    def log_test_metrics(self, iteration, psnr, ssim=None, lpips=None,
                         lpips_proxy=None):
        """(reference: metric_logger.py:122-128). ``lpips_proxy`` is the
        weights-free GMSD perceptual metric (utils/evaluation.py::gmsd),
        reported whenever real LPIPS weights are unavailable."""
        self.metrics["test_psnr"].append((iteration, float(psnr)))
        if ssim is not None:
            self.metrics["test_ssim"].append((iteration, float(ssim)))
        if lpips is not None:
            self.metrics["test_lpips"].append((iteration, float(lpips)))
        if lpips_proxy is not None:
            self.metrics["test_lpips_proxy"].append(
                (iteration, float(lpips_proxy))
            )

    def log_acaq_update(self, target_metric, loss_ratio, bit_adjustments):
        """(reference: metric_logger.py:130-134)"""
        self.acaq_metrics["target_metric"].append(float(target_metric))
        self.acaq_metrics["loss_ratio"].append(float(loss_ratio))
        self.acaq_metrics["bit_adjustments"].append(
            [float(b) for b in np.atleast_1d(bit_adjustments)]
        )

    def calculate_model_complexity(self, params, quantizer_bits=None):
        """BitOps + compressed model size over the param pytree
        (reference: metric_logger.py:136-163). Hash-table params use the
        embed quantizers' mean bits; MLP params use the network mean bits;
        everything else counts as 32-bit."""
        import jax

        embed_mean = mlp_mean = 32.0
        if quantizer_bits:
            e = quantizer_bits.get("embed")
            m = quantizer_bits.get("network")
            if e is not None:
                embed_mean = float(np.mean(np.asarray(e)))
            if m is not None:
                mlp_mean = float(np.mean(np.asarray(m)))

        total_bits = 0.0
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
            bits = embed_mean if keys and keys[0] == "table" else mlp_mean
            total_bits += bits * int(np.prod(np.shape(leaf)))
        model_size_mb = total_bits / (8 * 1024 * 1024)
        self.quant_metrics["bit_operations"].append(total_bits)
        self.quant_metrics["model_size"].append(model_size_mb)
        return total_bits, model_size_mb

    def save_checkpoint(self, iteration):
        """metrics_iter_N.pkl + CSVs (reference: metric_logger.py:165-177)."""
        if not self.write:
            return
        path = os.path.join(self.metrics_dir, f"metrics_iter_{iteration}.pkl")
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "metrics": {**self.metrics,
                                "component_bitwidths":
                                    dict(self.metrics["component_bitwidths"])},
                    "quant_metrics": self.quant_metrics,
                    "acaq_metrics": {**self.acaq_metrics,
                                     "layer_sensitivity":
                                         dict(self.acaq_metrics["layer_sensitivity"])},
                },
                f,
            )
        self.export_to_csv(iteration)

    def export_to_csv(self, iteration):
        """(reference: metric_logger.py:179-205)"""
        if not self.write:
            return
        import pandas as pd

        n = len(self.metrics["iteration"])
        avg_bw = self.metrics["avg_bitwidth"]
        df_main = pd.DataFrame(
            {
                "iteration": self.metrics["iteration"],
                "time": self.metrics["time"],
                "loss": self.metrics["loss"],
                "psnr": self.metrics["psnr"],
                "avg_bitwidth": (avg_bw + [None] * (n - len(avg_bw)))[:n]
                if avg_bw else [None] * n,
            }
        )
        df_main.to_csv(
            os.path.join(self.metrics_dir, f"main_metrics_{iteration}.csv"),
            index=False,
        )

        if any(self.quant_metrics[k] for k in self.quant_metrics):
            max_len = max(len(v) for v in self.quant_metrics.values() if v)
            padded = {
                k: (v + [None] * (max_len - len(v))) if v else [None] * max_len
                for k, v in self.quant_metrics.items()
            }
            pd.DataFrame(padded).to_csv(
                os.path.join(self.metrics_dir, f"quant_metrics_{iteration}.csv"),
                index=False,
            )

    # ---- figure generation -------------------------------------------------
    #
    # The two diagnostic PNGs keep the reference's ARTIFACT layout (a 2x2
    # panel grid per figure with the same panel semantics and file names,
    # reference: metric_logger.py:207-313) but are generated from a
    # declarative panel spec rather than per-panel plotting code: each panel
    # is a dict of data series + a `kind`, and `_draw_panel_grid` is the one
    # place that touches matplotlib. DIVERGENCES.md #28.

    def _draw_panel_grid(self, save_path, panels):
        """Render up to 4 panel specs into a 2x2 grid PNG.

        Panel spec keys: kind ('line'|'scatter'|'hist'), series (list of
        (x, y, label) — for hist a single (values, None, None)), title,
        xlabel, ylabel, and optional logy / ylim / legend / small_legend.
        Panels whose series are empty are skipped (their grid cell stays
        blank, matching the reference's conditional panels).
        """
        if not self.write:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(12, 10))
        for ax, spec in zip(axes.flat, panels):
            if spec is None or not spec.get("series"):
                ax.set_axis_off()
                continue
            for x, y, label in spec["series"]:
                if spec["kind"] == "hist":
                    ax.hist(x, bins=20, edgecolor="black", alpha=0.7)
                elif spec["kind"] == "scatter":
                    ax.scatter(x, y, alpha=0.6, label=label)
                else:
                    draw = ax.semilogy if spec.get("logy") else ax.plot
                    draw(x, y, alpha=0.8, label=label)
            ax.set_title(spec["title"])
            ax.set_xlabel(spec["xlabel"])
            ax.set_ylabel(spec["ylabel"])
            ax.grid(True, alpha=0.3)
            if spec.get("ylim"):
                ax.set_ylim(*spec["ylim"])
            if spec.get("small_legend"):
                ax.legend(bbox_to_anchor=(1.05, 1), loc="upper left",
                          fontsize=6)
            elif spec.get("legend"):
                ax.legend()
        fig.tight_layout()
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)

    def _training_curve_panels(self):
        m = self.metrics
        iters, avg_bw = m["iteration"], m["avg_bitwidth"]
        component_series = [
            (list(range(len(hist))), hist, name.replace("_", " ").title())
            for name, hist in m["component_bitwidths"].items() if hist
        ]
        return [
            {"kind": "line", "title": "PSNR vs Training Time",
             "xlabel": "Time (seconds)", "ylabel": "PSNR (dB)",
             "series": [(m["time"], m["psnr"], None)] if m["psnr"] else []},
            {"kind": "line", "logy": True, "title": "Training Loss",
             "xlabel": "Iteration", "ylabel": "Loss (MSE)",
             "series": [(iters, m["loss"], None)] if m["loss"] else []},
            {"kind": "line", "title": "Bitwidth Evolution",
             "xlabel": "Iteration", "ylabel": "Average Bitwidth",
             "ylim": (0, max(avg_bw) + 1) if avg_bw else None,
             "series": [(iters[: len(avg_bw)], avg_bw, None)] if avg_bw else []},
            {"kind": "line", "title": "Component-wise Bitwidth Evolution",
             "xlabel": "Iteration", "ylabel": "Bitwidth",
             "small_legend": True, "series": component_series},
        ]

    def _quantization_panels(self):
        m, q = self.metrics, self.quant_metrics
        avg_bw = m["avg_bitwidth"]
        sizes = [s for s in q["model_size"] if s is not None]
        eb = [b for b in q["embed_bits"] if b is not None]
        mb = [b for b in q["mlp_bits"] if b is not None]
        psnr_vs_bits = (
            [(avg_bw, m["psnr"][: len(avg_bw)], None)]
            if avg_bw and len(m["psnr"]) >= len(avg_bw) else []
        )
        return [
            {"kind": "hist", "title": "Final Bitwidth Distribution",
             "xlabel": "Bitwidth", "ylabel": "Count",
             "series": [(m["bitwidth_distribution"][-1], None, None)]
             if m["bitwidth_distribution"] else []},
            {"kind": "scatter", "title": "PSNR vs Bitwidth Trade-off",
             "xlabel": "Average Bitwidth", "ylabel": "PSNR (dB)",
             "series": psnr_vs_bits},
            {"kind": "line", "title": "Model Compression Over Time",
             "xlabel": "Iteration", "ylabel": "Model Size (MB)",
             "series": [(list(range(len(sizes))), sizes, None)] if sizes else []},
            {"kind": "line", "title": "Component-wise Compression",
             "xlabel": "Iteration", "ylabel": "Average Bitwidth", "legend": True,
             "series": [
                 (list(range(len(eb))), eb, "Embeddings"),
                 (list(range(len(mb))), mb, "MLP"),
             ] if (eb and mb) else []},
        ]

    def plot_training_curves(self, save_path=None):
        """4-panel PNG: PSNR-vs-time, log loss, bitwidth evolution,
        per-component bitwidths (artifact parity with metric_logger.py:207-260;
        generated from the declarative panel spec above)."""
        if save_path is None:
            save_path = os.path.join(self.metrics_dir, "training_curves.png")
        self._draw_panel_grid(save_path, self._training_curve_panels())

    def plot_quantization_analysis(self, save_path=None):
        """4-panel PNG: bit histogram, PSNR-vs-bits, model size, embed-vs-MLP
        (artifact parity with metric_logger.py:262-313; declarative spec)."""
        if save_path is None:
            save_path = os.path.join(self.metrics_dir,
                                     "quantization_analysis.png")
        self._draw_panel_grid(save_path, self._quantization_panels())

    def generate_summary_table(self):
        """summary_table.{csv,tex} (reference: metric_logger.py:315-352)."""
        import pandas as pd

        summary: Dict[str, List] = {
            "Metric": [], "Baseline": [], "Quantized (8-bit)": [], "A-CAQ": []
        }
        quantized_run = bool(self.metrics["avg_bitwidth"])
        if self.metrics["psnr"]:
            summary["Metric"].append("Final PSNR (dB)")
            if quantized_run:
                summary["Baseline"].append("N/A")
                summary["Quantized (8-bit)"].append(
                    f"{self.metrics['psnr'][1000]:.2f}"
                    if len(self.metrics["psnr"]) > 1000 else "N/A"
                )
                summary["A-CAQ"].append(f"{self.metrics['psnr'][-1]:.2f}")
            else:
                # Divergence from the reference (metric_logger.py:324-331):
                # its table reports an fp run's final PSNR under "A-CAQ" and
                # the iter-1000 PSNR under "Quantized (8-bit)" even when no
                # quantizer ran. Report honestly under Baseline instead.
                summary["Baseline"].append(f"{self.metrics['psnr'][-1]:.2f}")
                summary["Quantized (8-bit)"].append("N/A")
                summary["A-CAQ"].append("N/A")
        if self.metrics["avg_bitwidth"]:
            summary["Metric"].append("Average Bitwidth")
            summary["Baseline"].append("32.0")
            summary["Quantized (8-bit)"].append("8.0")
            summary["A-CAQ"].append(f"{self.metrics['avg_bitwidth'][-1]:.2f}")
        sizes = [s for s in self.quant_metrics["model_size"] if s is not None]
        if sizes:
            summary["Metric"].append("Model Size (MB)")
            summary["Baseline"].append("N/A")
            summary["Quantized (8-bit)"].append("N/A")
            summary["A-CAQ"].append(f"{sizes[-1]:.2f}")

        df = pd.DataFrame(summary)
        if self.write:
            df.to_csv(os.path.join(self.metrics_dir, "summary_table.csv"),
                      index=False)
            with open(os.path.join(self.metrics_dir, "summary_table.tex"),
                      "w") as f:
                f.write(df.to_latex(index=False))
        return df
