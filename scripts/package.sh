#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dmp_crawler_spark.zip
zip -qr dist/dmp_crawler_spark.zip dmp_crawler_spark -x '*__pycache__*'
echo "built dist/dmp_crawler_spark.zip"
