#!/usr/bin/env bash
# Launch a sweep of independent training runs (the reference's train.sh runs
# 4 single-GPU hyperparameter variants; here each run uses the whole TPU
# mesh, so the sweep is sequential by default).
set -euo pipefail

CONFIGS=(${CONFIGS:-configs/chair.txt})

for cfg in "${CONFIGS[@]}"; do
  echo "=== training $cfg"
  python run_nerf.py --config "$cfg" "$@"
done
