#!/bin/bash
# Correspondence-count sweep on 3DMatch (reference scripts/benchmark_registration_3dmatch_c2f.sh)
SRC=${1:-snapshot/tdmatch_roitr_tpu_test/3DMatch}
for n in 250 500 1000 2500 5000; do
  python -m roitr_tpu.eval.registration --source_path "$SRC" --benchmark 3DMatch --n_points $n
done
