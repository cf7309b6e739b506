#!/bin/sh
# Build the native ingest runtime (libaiis_ingest.so).
# Usage: sh anime_illust_image_searcher_tpu/runtime/build.sh
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    ingest.cpp -o libaiis_ingest.so \
    -ljpeg -lpng -lpthread
echo "built $(pwd)/libaiis_ingest.so"
