#!/usr/bin/env bash
# Ablation runner (reference `run_ablation.sh:20-100`): trains the baseline,
# each innovation alone, and the all-innovations config, then evaluates all.
#
# Usage: scripts/run_ablation.sh <source_path> <output_root> [extra train flags...]
set -euo pipefail

SRC="${1:?source_path}"
OUT="${2:?output_root}"
shift 2
EXTRA=("$@")
PY=${PYTHON:-python}
HERE="$(cd "$(dirname "$0")" && pwd)"

declare -A CONFIGS=(
  [baseline]=""
  [innov1_region]="--use_region_adaptive_loss"
  [innov2_smartdens]="--use_smart_densification"
  [innov3_progressive]="--use_progressive_resolution"
  [innov4_colorcal]="--use_color_calibration"
  [innov5_contrastive]="--use_contrastive_reg"
  [all_innovations]="--all_innovations"
)

for name in baseline innov1_region innov2_smartdens innov3_progressive \
            innov4_colorcal innov5_contrastive all_innovations; do
  flags=${CONFIGS[$name]}
  model="$OUT/$name"
  echo "=== training $name ==="
  # shellcheck disable=SC2086
  "$PY" "$HERE/train.py" -s "$SRC" -m "$model" --bind_to_mesh --eval \
      $flags ${EXTRA[@]+"${EXTRA[@]}"}
  echo "=== rendering $name ==="
  "$PY" "$HERE/render.py" -m "$model" --skip_train --quiet
  echo "=== metrics $name ==="
  "$PY" "$HERE/metrics.py" -m "$model"
done

echo "=== summary ==="
for name in "${!CONFIGS[@]}"; do
  f="$OUT/$name/results.json"
  [ -f "$f" ] && echo "$name: $(cat "$f")"
done
