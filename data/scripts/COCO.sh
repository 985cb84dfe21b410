#!/usr/bin/env bash
# Download COCO 2014+2017 train/val images and annotations into data/coco.
# Equivalent of the reference data/scripts/COCO.sh.
set -e
ROOT=${1:-data/coco}
mkdir -p "$ROOT/images" "$ROOT/annotations"
cd "$ROOT"
for f in train2017 val2017; do
  if [ ! -f "images/.${f}_done" ]; then
    curl -LO "http://images.cocodataset.org/zips/${f}.zip"
    unzip -q "${f}.zip" && rm "${f}.zip"
    mv "$f"/* images/ && rmdir "$f"
    touch "images/.${f}_done"
  fi
done
if [ ! -f annotations/instances_val2017.json ]; then
  curl -LO "http://images.cocodataset.org/annotations/annotations_trainval2017.zip"
  unzip -q annotations_trainval2017.zip && rm annotations_trainval2017.zip
fi
echo "COCO ready under $ROOT"
