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

    def plot_training_curves(self, save_path=None):
        """4-panel PNG: PSNR-vs-time, log loss, bitwidth evolution,
        per-component bitwidths (reference: metric_logger.py:207-260)."""
        if not self.write:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if save_path is None:
            save_path = os.path.join(self.metrics_dir, "training_curves.png")
        fig, axes = plt.subplots(2, 2, figsize=(12, 10))

        ax = axes[0, 0]
        ax.plot(self.metrics["time"], self.metrics["psnr"], "b-", linewidth=2)
        ax.set_xlabel("Time (seconds)")
        ax.set_ylabel("PSNR (dB)")
        ax.set_title("PSNR vs Training Time")
        ax.grid(True, alpha=0.3)

        ax = axes[0, 1]
        ax.semilogy(self.metrics["iteration"], self.metrics["loss"], "r-",
                    linewidth=2)
        ax.set_xlabel("Iteration")
        ax.set_ylabel("Loss (MSE)")
        ax.set_title("Training Loss")
        ax.grid(True, alpha=0.3)

        if self.metrics["avg_bitwidth"]:
            ax = axes[1, 0]
            n = len(self.metrics["avg_bitwidth"])
            ax.plot(self.metrics["iteration"][:n], self.metrics["avg_bitwidth"],
                    "g-", linewidth=2)
            ax.set_xlabel("Iteration")
            ax.set_ylabel("Average Bitwidth")
            ax.set_title("Bitwidth Evolution")
            ax.grid(True, alpha=0.3)
            ax.set_ylim(0, max(self.metrics["avg_bitwidth"]) + 1)

        if self.metrics["component_bitwidths"]:
            ax = axes[1, 1]
            for name, hist in self.metrics["component_bitwidths"].items():
                if hist:
                    style = "--" if "embed" in name.lower() else "-"
                    ax.plot(range(len(hist)), hist, style, alpha=0.7,
                            label=name.replace("_", " ").title())
            ax.set_xlabel("Iteration")
            ax.set_ylabel("Bitwidth")
            ax.set_title("Component-wise Bitwidth Evolution")
            ax.grid(True, alpha=0.3)
            ax.legend(bbox_to_anchor=(1.05, 1), loc="upper left", fontsize=6)

        plt.tight_layout()
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)

    def plot_quantization_analysis(self, save_path=None):
        """4-panel PNG: bit histogram, PSNR-vs-bits, model size, embed-vs-MLP
        (reference: metric_logger.py:262-313)."""
        if not self.write:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if save_path is None:
            save_path = os.path.join(self.metrics_dir, "quantization_analysis.png")
        fig, axes = plt.subplots(2, 2, figsize=(12, 10))

        if self.metrics["bitwidth_distribution"]:
            ax = axes[0, 0]
            ax.hist(self.metrics["bitwidth_distribution"][-1], bins=20,
                    edgecolor="black", alpha=0.7)
            ax.set_xlabel("Bitwidth")
            ax.set_ylabel("Count")
            ax.set_title("Final Bitwidth Distribution")
            ax.grid(True, alpha=0.3)

        if self.metrics["avg_bitwidth"] and len(self.metrics["psnr"]) >= len(
            self.metrics["avg_bitwidth"]
        ):
            ax = axes[0, 1]
            n = len(self.metrics["avg_bitwidth"])
            ax.scatter(self.metrics["avg_bitwidth"], self.metrics["psnr"][:n],
                       alpha=0.6)
            ax.set_xlabel("Average Bitwidth")
            ax.set_ylabel("PSNR (dB)")
            ax.set_title("PSNR vs Bitwidth Trade-off")
            ax.grid(True, alpha=0.3)

        sizes = [s for s in self.quant_metrics["model_size"] if s is not None]
        if sizes:
            ax = axes[1, 0]
            ax.plot(range(len(sizes)), sizes, "purple", linewidth=2)
            ax.set_xlabel("Iteration")
            ax.set_ylabel("Model Size (MB)")
            ax.set_title("Model Compression Over Time")
            ax.grid(True, alpha=0.3)

        eb = [b for b in self.quant_metrics["embed_bits"] if b is not None]
        mb = [b for b in self.quant_metrics["mlp_bits"] if b is not None]
        if eb and mb:
            ax = axes[1, 1]
            ax.plot(range(len(eb)), eb, "b-", label="Embeddings", linewidth=2)
            ax.plot(range(len(mb)), mb, "r-", label="MLP", linewidth=2)
            ax.set_xlabel("Iteration")
            ax.set_ylabel("Average Bitwidth")
            ax.set_title("Component-wise Compression")
            ax.legend()
            ax.grid(True, alpha=0.3)

        plt.tight_layout()
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)

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
