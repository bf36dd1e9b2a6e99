#!/usr/bin/env bash
# Single-run launcher (equivalent of the reference's run.sh, minus
# CUDA_VISIBLE_DEVICES — device selection is JAX's).
set -euo pipefail
CONFIG="${1:-configs/chair.txt}"
shift || true
python run_nerf.py --config "$CONFIG" "$@"
