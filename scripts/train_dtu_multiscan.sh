#!/bin/bash
# Multi-scan DTU batch sharded across hosts/slices (BASELINE.json config #5;
# SURVEY.md §2.9: multi-scene batches are trivially parallel across slices).
# Run the same command on every host with HOST_ID/NUM_HOSTS set; each host
# trains its residue class of scans on its own chips.
set -e
DATA_ROOT=${1:-./datasets/DTU}
OUT=${2:-./results/dtu}
HOST_ID=${HOST_ID:-0}
NUM_HOSTS=${NUM_HOSTS:-1}
SCANS=(24 37 40 55 63 65 69 83 97 105 106 110 114 118 122)
for i in "${!SCANS[@]}"; do
  if (( i % NUM_HOSTS == HOST_ID )); then
    scan=${SCANS[$i]}
    echo "[host $HOST_ID] scan$scan"
    python run.py --mode train --config dtu \
      --dataset_path "$DATA_ROOT/scan$scan" --expname "scan$scan" \
      --output_dir "$OUT" --scene "$scan"
    python run.py --mode eval --config dtu \
      --dataset_path "$DATA_ROOT/scan$scan" --expname "scan$scan" \
      --output_dir "$OUT" --scene "$scan"
  fi
done
