#!/bin/bash
# Non-rigid NFMR/IR eval (reference scripts for 4DMatch)
SRC=${1:-snapshot/fdmatch_roitr_tpu_test/4DMatch}
python -m roitr_tpu.eval.fdmatch_eval --source_path "$SRC"
