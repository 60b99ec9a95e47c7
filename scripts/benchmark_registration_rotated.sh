#!/bin/bash
# Rotated-benchmark RMSE-recall sweep (reference evaluate_registration_c2f_rotated.py)
SRC=${1:?usage: $0 <dump_dir> [benchmark]}
BM=${2:-3DLoMatch}
for n in 250 500 1000 2500 5000; do
  python -m roitr_tpu.eval.registration --source_path "$SRC" --benchmark $BM --n_points $n --rotated
done
