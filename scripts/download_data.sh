#!/usr/bin/env bash
# Fetch the benchmark data into ./data/ (same sources the reference uses).
#
# 3DMatch/3DLoMatch: the Predator-packaged indoor fragments
# (reference scripts/download_data.sh). Produces data/indoor/... which is
# what configs/{train,test}/td*.yaml `root: data/indoor` expects; the
# train_info.pkl/val-split metadata ships inside the archive, and the test
# splits (configs/tdmatch/{3DMatch,3DLoMatch}.pkl) are vendored in this
# repo already.
#
# 4DMatch/4DLoMatch: prepared per Lepard (github.com/rabbityl/lepard,
# reference README.md:118) — .npz pairs + split/ lists under data/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p data
wget --no-check-certificate --show-progress -O data/indoor.zip \
    https://share.phys.ethz.ch/~gsg/Predator/data.zip
unzip -o data/indoor.zip "*/indoor/*" -d data/.tmp_indoor
# the archive nests <something>/indoor/; normalize to data/indoor
src=$(find data/.tmp_indoor -maxdepth 2 -type d -name indoor | head -1)
mv "$src" data/indoor
rm -rf data/.tmp_indoor data/indoor.zip
echo "3DMatch data ready under data/indoor"
echo "For 4DMatch, prepare per https://github.com/rabbityl/lepard and place under data/"
