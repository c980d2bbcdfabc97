#!/bin/bash
# Train + eval every shiny-blender scene (reference: ssh/train_shiny_blender.sh)
set -e
DATA_ROOT=${1:-./datasets/shiny_blender}
OUT=${2:-./results/shiny_blender}
for scene in car toaster ball coffee helmet teapot; do
  python run.py --mode train --config shiny_blender \
    --dataset_path "$DATA_ROOT/$scene" --expname "$scene" --output_dir "$OUT"
  python run.py --mode eval --config shiny_blender \
    --dataset_path "$DATA_ROOT/$scene" --expname "$scene" --output_dir "$OUT"
done
