"""Tests for MetricsLogger artifacts (utils/metrics.py)."""

import argparse
import os

import numpy as np

from indoor_nerf_tpu.utils.metrics import MetricsLogger


def _logger(tmp_path):
    cfg = argparse.Namespace(expname="t", lrate=0.01)
    return MetricsLogger(str(tmp_path), "t", cfg)


def test_summary_table_fp_run_reports_baseline(tmp_path):
    """An unquantized run's final PSNR lands under Baseline — the reference
    puts it under 'A-CAQ' even when no quantizer ran
    (PocketNeRF/metric_logger.py:324-331; DIVERGENCES.md)."""
    lg = _logger(tmp_path)
    for i in range(5):
        lg.log_iteration(i, 0.1 * i, 0.01, 20.0 + i, 0.01)
    df = lg.generate_summary_table()
    row = df[df["Metric"] == "Final PSNR (dB)"].iloc[0]
    assert row["Baseline"] == "24.00"
    assert row["Quantized (8-bit)"] == "N/A"
    assert row["A-CAQ"] == "N/A"
    assert os.path.exists(os.path.join(lg.metrics_dir, "summary_table.csv"))


def test_plot_artifacts_written(tmp_path):
    """Both diagnostic PNGs render from the declarative panel spec for a
    quantized run (all panels populated) and for an fp run (bitwidth panels
    blank), with the reference's artifact names (DIVERGENCES.md #28)."""
    lg = _logger(tmp_path)
    for i in range(5):
        lg.log_iteration(
            i, 0.1 * i, 0.01 / (i + 1), 20.0 + i, 0.01,
            quantizer_bits={"embed_bits": np.array([8.0, 6.0]),
                            "mlp_bits": np.array([8.0])},
        )
    lg.calculate_model_complexity({"table": np.zeros((4, 2))},
                                  {"embed": np.array([8.0, 6.0]),
                                   "network": np.array([8.0])})
    lg.plot_training_curves()
    lg.plot_quantization_analysis()
    assert os.path.exists(os.path.join(lg.metrics_dir, "training_curves.png"))
    assert os.path.exists(
        os.path.join(lg.metrics_dir, "quantization_analysis.png"))

    fp = MetricsLogger(str(tmp_path), "fp", argparse.Namespace(expname="fp"))
    for i in range(3):
        fp.log_iteration(i, 0.1 * i, 0.01, 20.0 + i, 0.01)
    fp.plot_training_curves()
    fp.plot_quantization_analysis()
    assert os.path.exists(os.path.join(fp.metrics_dir, "training_curves.png"))


def test_plots_noop_without_write(tmp_path):
    cfg = argparse.Namespace(expname="t")
    lg = MetricsLogger(str(tmp_path), "nw", cfg, write=False)
    lg.log_iteration(0, 0.0, 0.01, 20.0, 0.01)
    lg.plot_training_curves()
    lg.plot_quantization_analysis()
    assert not os.path.exists(os.path.join(tmp_path, "nw"))


def test_summary_table_quantized_run_keeps_reference_layout(tmp_path):
    lg = _logger(tmp_path)
    for i in range(5):
        lg.log_iteration(
            i, 0.1 * i, 0.01, 20.0 + i, 0.01,
            quantizer_bits={"embed_bits": np.array([8.0]),
                            "mlp_bits": np.array([8.0])},
        )
    df = lg.generate_summary_table()
    row = df[df["Metric"] == "Final PSNR (dB)"].iloc[0]
    assert row["A-CAQ"] == "24.00"
    assert row["Baseline"] == "N/A"
    bits = df[df["Metric"] == "Average Bitwidth"].iloc[0]
    assert bits["A-CAQ"] == "8.00"
