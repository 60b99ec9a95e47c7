#!/bin/bash
SRC=${1:-snapshot/tdlomatch_roitr_tpu_test/3DLoMatch}
for n in 250 500 1000 2500 5000; do
  python -m roitr_tpu.eval.registration --source_path "$SRC" --benchmark 3DLoMatch --n_points $n
done
