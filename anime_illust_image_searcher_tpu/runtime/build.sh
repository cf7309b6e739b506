#!/bin/sh
# Build the native ingest runtime (libaiis_ingest.so).
# Usage: sh anime_illust_image_searcher_tpu/runtime/build.sh
set -e
cd "$(dirname "$0")"
# Build to a temp name, then rename over the target: the rename gives the .so a
# fresh inode, so an in-process ABI-mismatch rebuild re-dlopens the NEW library
# (dlopen caches by inode; the stale mapping is never dlclosed), and truncating
# a currently-mapped .so in place (SIGBUS risk) can't happen. rename(2) is also
# atomic for concurrent builders.
TMP="libaiis_ingest.so.tmp.$$"
trap 'rm -f "$TMP"' EXIT
# libdeflate powers the fast PNG path when present (ingest.cpp degrades to
# the plain libpng path via __has_include when it isn't). The probe must
# match ingest.cpp's gate: compile AND link a program that actually includes
# the header and calls the library — a header-only or lib-only install would
# otherwise produce an unlinkable fast path (undefined symbols → no native
# ingest at all). When the probe fails, -DAIIS_FORCE_NO_LIBDEFLATE overrides
# the __has_include gate so the header-present/lib-absent case still builds.
EXTRA="-DAIIS_FORCE_NO_LIBDEFLATE"
if printf '#include <libdeflate.h>\nint main(){return libdeflate_crc32(0,0,0)!=0;}' \
    | g++ -x c++ - -ldeflate -o /dev/null 2>/dev/null; then
  EXTRA="-ldeflate"
fi
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    ingest.cpp -o "$TMP" \
    -ljpeg -lpng $EXTRA -lpthread
mv -f "$TMP" libaiis_ingest.so
echo "built $(pwd)/libaiis_ingest.so"
