#!/bin/bash
# Build pipeline.zip for spark-submit --py-files (north_rule launch mode).
set -e
cd "$(dirname "$0")/.."
rm -f pipeline.zip
zip -qr pipeline.zip geonames_rdf_spark -x '*__pycache__*'
echo "built pipeline.zip ($(du -h pipeline.zip | cut -f1))"
