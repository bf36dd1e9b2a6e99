"""Step-time roofline for the flagship train step: what fraction of each
hardware wall does the measured 4096-ray step consume, and what is the
next lever worth?

The reference ships per-run milestone machinery but no hardware
accounting (PocketNeRF/run_nerf.py:1305-1327,1459-1473). This assembles
one: it runs scripts/ablate_step.py at the EXACT flagship configuration
(8 levels x 4 features, block_size 3, bf16 table IO, 32
transmittance-weighted occupancy samples — the bench.py program) in this
session, then reconciles the measured component times against the three
measured/known hardware walls of this chip:

- scatter transactions: ~59M random rows/s into the table REGARDLESS of
  row bytes (tpu_probe_bwd.json; transaction-bound serial RMW);
- gather rows: ~300M rows/s for rows >= 2 lanes wide (BENCH_NOTES.md
  gather laws), byte wall ~819 GB/s HBM (v5e datasheet figure);
- MXU: 197 bf16 TFLOP/s per v5e chip (f32 matmuls run below this; the
  MLP is f32 by default, so "MFU" here is an upper bound on how much of
  the chip the MLP could ever need).

Output (roofline_r4.json + stdout table):
- a non-overlapping partition of the full step that must sum to the
  measured full_train_step within ~10% (it is measured as sums of
  separately compiled programs, so fusion across the cut lines is the
  expected residual);
- per-component predicted wall time from analytic row/byte/flop counts,
  next to the measurement;
- the implied step time and rays/s/chip if the scatter wall were fully
  hidden (the "is the next lever worth 1.1x or 2x" number).

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/roofline.py \
    [--ablation tpu_ablate_flagship_r4.json] [--reuse] [--out roofline_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

N_RAND = 4096
N_OCC = 32
N_LEVELS = 8
N_FEATURES = 4
BLOCK_SIZE = 3          # halo'd tile side 4 -> 64 vertices/row
LOG2_ROWS = 13
TABLE_BYTES_PER_ELEM = 2  # bfloat16 gather/scatter IO

SCATTER_ROWS_PER_S = 59e6   # measured random-row RMW wall (tpu_probe_bwd.json)
GATHER_ROWS_PER_S = 300e6   # measured wide-row gather law (BENCH_NOTES.md)
HBM_BYTES_PER_S = 819e9     # v5e HBM bandwidth (datasheet)
MXU_FLOPS = 197e12          # v5e bf16 peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablation", default="tpu_ablate_flagship_r4.json")
    ap.add_argument("--reuse", action="store_true",
                    help="skip re-running the ablation if the JSON exists "
                         "(NOT same-session; only for table re-assembly)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="roofline_r4.json")
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)

    if not (args.reuse and os.path.exists(args.ablation)):
        cmd = [sys.executable, os.path.join(here, "ablate_step.py"),
               "--bf16", "--block_size", str(BLOCK_SIZE),
               "--n_levels", str(N_LEVELS), "--n_features", str(N_FEATURES),
               "--occ_weighting", "transmittance",
               "--occ_samples", str(N_OCC),
               "--steps", str(args.steps), "--out", args.ablation]
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
        subprocess.run(cmd, check=True, env=env)
    with open(args.ablation) as f:
        m = json.load(f)

    # --- analytic counts at the flagship shapes ---------------------------
    n_points = N_RAND * N_OCC                      # 131,072 samples/step
    rows = n_points * N_LEVELS                     # rows touched per pass
    lanes = N_FEATURES * (BLOCK_SIZE + 1) ** 3     # 256 lanes/row
    row_bytes = lanes * TABLE_BYTES_PER_ELEM       # 512 B (bf16)
    gather_bytes = rows * row_bytes

    # MLP matmul flops per point (NeRFSmall: sigma 32->64->16 bias-free,
    # color [16+geo_feat]->64->64->3; models/mlp.py): 2*m*n per point per
    # layer, x3 for fwd + bwd (dL/dx and dL/dW matmuls).
    in_dim = N_LEVELS * N_FEATURES
    sh_dim = 16  # SH degree-4 view encoding (ops/encoding.py::sh_encode)
    geo = 15
    sigma_net = [(in_dim, 64), (64, 1 + geo)]
    color_net = [(sh_dim + geo, 64), (64, 64), (64, 3)]
    flops_pp = 2 * sum(a * b for a, b in sigma_net + color_net)
    mlp_fwd_flops = n_points * flops_pp
    mlp_step_flops = 3 * mlp_fwd_flops

    # --- measured partition (separately compiled programs) ----------------
    full = m["full_train_step"]
    occ_sampling = m["occ_zvals_only"]
    enc_fwd = m["encode_fwd"]
    fwd_rest = m["render_fwd_only"] - occ_sampling - enc_fwd
    bwd_total = m["render_loss_fwd_bwd"] - m["render_fwd_only"]
    enc_bwd = m["encode_fwd_bwd"] - m["encode_fwd"]
    bwd_rest = bwd_total - enc_bwd
    radam = m["radam_update_only"]
    occ_refresh = m["occupancy_refresh_only"] / 16  # update_interval=16
    step_glue = full - (m["render_loss_fwd_bwd"] + radam + occ_refresh)

    parts = {
        "occupancy_sampling": occ_sampling,
        "encode_forward (row gather + tent contraction)": enc_fwd,
        "mlp+compositing forward": fwd_rest,
        "encode backward (cotangent + row scatter)": enc_bwd,
        "mlp+compositing+sampling backward": bwd_rest,
        "radam_update": radam,
        "occupancy_refresh (amortized /16)": occ_refresh,
        "step glue / fusion residual": step_glue,
    }
    parts_sum = sum(parts.values())

    # --- walls -------------------------------------------------------------
    scatter_wall_ms = rows / SCATTER_ROWS_PER_S * 1e3
    gather_row_wall_ms = rows / GATHER_ROWS_PER_S * 1e3
    gather_byte_wall_ms = gather_bytes / HBM_BYTES_PER_S * 1e3
    mlp_wall_ms = mlp_fwd_flops / MXU_FLOPS * 1e3

    # Ceiling if the scatter wall were fully hidden (overlapped or removed):
    # the step keeps everything but the encode-backward's scatter share.
    # cot formation alone measured ~12 ms at 16-level shapes scales ~rows;
    # bound it by the measured enc_bwd minus the analytic scatter wall.
    scatter_share = min(enc_bwd, scatter_wall_ms)
    ceil_ms = full - scatter_share
    rays_now = N_RAND / (full / 1e3)
    rays_ceiling = N_RAND / (ceil_ms / 1e3)

    out = {
        "config": {
            "n_rand": N_RAND, "n_occ_samples": N_OCC,
            "n_levels": N_LEVELS, "n_features": N_FEATURES,
            "row_lanes": lanes, "row_bytes_bf16": row_bytes,
            "points_per_step": n_points, "rows_per_pass": rows,
        },
        "measured_ms": m,
        "partition_ms": {k: round(v, 2) for k, v in parts.items()},
        "partition_sum_ms": round(parts_sum, 2),
        "full_step_ms": round(full, 2),
        "partition_over_full": round(parts_sum / full, 3),
        "walls": {
            "scatter_transactions_ms": round(scatter_wall_ms, 2),
            "scatter_measured_ms": round(enc_bwd, 2),
            "gather_row_wall_ms": round(gather_row_wall_ms, 2),
            "gather_byte_wall_ms": round(gather_byte_wall_ms, 2),
            "gather_measured_ms": round(enc_fwd, 2),
            "mlp_mxu_wall_ms": round(mlp_wall_ms, 4),
            "mlp_measured_ms": round(m["mlp_fwd_only"], 2),
            "mlp_fwd_gflops": round(mlp_fwd_flops / 1e9, 2),
            "step_mxu_flops_fraction": round(
                mlp_step_flops / (MXU_FLOPS * full / 1e3), 5),
            "gather_bytes_mb": round(gather_bytes / 1e6, 1),
        },
        "rays_per_sec_now": round(rays_now, 1),
        "ceiling_if_scatter_hidden": {
            "step_ms": round(ceil_ms, 2),
            "rays_per_sec": round(rays_ceiling, 1),
            "speedup": round(full / ceil_ms, 3),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)

    print(f"\nfull step {full:.1f} ms ({rays_now/1e3:.1f}k rays/s); "
          f"partition sums to {parts_sum:.1f} ms "
          f"({100*parts_sum/full:.0f}% of full)")
    for k, v in parts.items():
        print(f"  {k:48s} {v:7.2f} ms")
    print(f"walls: scatter {scatter_wall_ms:.1f} ms (measured "
          f"{enc_bwd:.1f}), gather rows {gather_row_wall_ms:.1f} / bytes "
          f"{gather_byte_wall_ms:.2f} ms (measured {enc_fwd:.1f}), "
          f"MLP MXU {mlp_wall_ms*1e3:.0f} us (measured "
          f"{m['mlp_fwd_only']:.2f} ms)")
    print(f"scatter hidden -> {ceil_ms:.1f} ms = "
          f"{rays_ceiling/1e3:.1f}k rays/s ({full/ceil_ms:.2f}x)")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
