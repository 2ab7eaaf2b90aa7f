#!/usr/bin/env bash
# Package the engine for spark-submit --py-files: one zip, no wheel
# build step, nothing but the package itself (tests/tools excluded —
# executors need the operators, not the harness).
set -euo pipefail
cd "$(dirname "$0")/../.."
mkdir -p dist
rm -f dist/mapreducewordoccurences_spark.zip
zip -qr dist/mapreducewordoccurences_spark.zip mapreducewordoccurences_spark \
    -x 'mapreducewordoccurences_spark/**/__pycache__/*' \
    -x 'mapreducewordoccurences_spark/__pycache__/*'
echo "dist/mapreducewordoccurences_spark.zip ($(du -h dist/mapreducewordoccurences_spark.zip | cut -f1))"
