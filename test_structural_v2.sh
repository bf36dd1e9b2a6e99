#!/usr/bin/env bash
# Structural-priors validation run (equivalent of the reference's
# test_structural_v2.sh): launches a few-shot training run with the V2
# structural priors enabled and tells you what to look for.
#
# Expected observations (reference test_structural_v2.sh:23-52):
#  - "ACTIVATING STRUCTURAL PRIORS" banner at --structural_loss_start_iter
#  - semantic detection lines with non-zero floor/wall counts
#  - non-zero manhattan/planarity losses in metrics
#  - a SMALLER train/test PSNR gap than the same run without
#    --use_structural_priors (aspirationally < 6 dB vs ~13 dB)
set -euo pipefail

CONFIG="${1:-configs/fewshot_norcliffe_common_room.txt}"

python run_nerf.py --config "$CONFIG" \
  --use_structural_priors \
  --structural_loss_start_iter 2000 \
  --structural_loss_ramp_iters 1000 \
  "${@:2}"

echo ""
echo "Check the run's logs/<exp>/training_metrics.pkl for structural loss"
echo "series and testset_* dirs for the train/test PSNR gap."
