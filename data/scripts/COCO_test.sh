#!/usr/bin/env bash
# Download COCO test2017 images + test-dev info (reference data/scripts/COCO_test.sh).
set -e
ROOT=${1:-data/coco}
mkdir -p "$ROOT/images" "$ROOT/annotations"
cd "$ROOT"
if [ ! -f "images/.test2017_done" ]; then
  curl -LO "http://images.cocodataset.org/zips/test2017.zip"
  unzip -q test2017.zip && rm test2017.zip
  mv test2017/* images/ && rmdir test2017
  touch "images/.test2017_done"
fi
if [ ! -f annotations/image_info_test-dev2017.json ]; then
  curl -LO "http://images.cocodataset.org/annotations/image_info_test2017.zip"
  unzip -q image_info_test2017.zip && rm image_info_test2017.zip
fi
echo "COCO test ready under $ROOT"
