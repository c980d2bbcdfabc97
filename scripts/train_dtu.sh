#!/bin/bash
# Train + eval the 15 DTU evaluation scans (reference: ssh/train_dtu.sh)
set -e
DATA_ROOT=${1:-./datasets/DTU}
OUT=${2:-./results/dtu}
for scan in 24 37 40 55 63 65 69 83 97 105 106 110 114 118 122; do
  python run.py --mode train --config dtu \
    --dataset_path "$DATA_ROOT/scan$scan" --expname "scan$scan" \
    --output_dir "$OUT" --scene "$scan"
  python run.py --mode eval --config dtu \
    --dataset_path "$DATA_ROOT/scan$scan" --expname "scan$scan" \
    --output_dir "$OUT" --scene "$scan"
done
