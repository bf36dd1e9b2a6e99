#!/usr/bin/env bash
# Render the pose path from every checkpoint of an experiment
# (equivalent of the reference's scripts/run_all_checkpoints.sh):
# produces renderonly_path_<step> dirs that scripts/make_gif.py animates.
#
# Usage: scripts/run_all_checkpoints.sh <config.txt> <logdir>
set -euo pipefail

CONFIG="$1"
LOGDIR="$2"

for ckpt in "$LOGDIR"/*.ckpt; do
  echo "=== rendering from $ckpt"
  python run_nerf.py --config "$CONFIG" --render_only --ft_path "$ckpt"
done
