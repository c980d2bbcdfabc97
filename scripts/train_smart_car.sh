#!/bin/bash
set -e
DATA_ROOT=${1:-./datasets/smart_car}
OUT=${2:-./results/smart_car}
python run.py --mode train --config smart_car \
  --dataset_path "$DATA_ROOT" --expname smart_car --output_dir "$OUT"
python run.py --mode eval --config smart_car \
  --dataset_path "$DATA_ROOT" --expname smart_car --output_dir "$OUT"
