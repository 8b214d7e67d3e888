#!/bin/bash
# Build the native host library (yaha_tpu/native/libyaha_host.so).
#
#   TSAN=1 tools/build_native.sh   # ThreadSanitizer build (SURVEY.md §5:
#                                  # race checking for the host C++ path;
#                                  # pair with deterministic-output diffs)
#   ASAN=1 tools/build_native.sh   # AddressSanitizer build
set -e
cd "$(dirname "$0")/.."
FLAGS="-O3 -march=native -funroll-loops"
if [ -n "$TSAN" ]; then FLAGS="-O1 -g -fsanitize=thread"; fi
if [ -n "$ASAN" ]; then FLAGS="-O1 -g -fsanitize=address"; fi
# Compile to a temp file and rename: the rename is atomic, so processes
# dlopen-ing mid-build (parallel tests, fuzz soaks) never see a partial
# .so (NOTES.md rebuild-race gotcha).
TMP=$(mktemp yaha_tpu/native/.libyaha_host.XXXXXX.so)
trap 'rm -f "$TMP"' EXIT
g++ $FLAGS -Wall -shared -fPIC -pthread -o "$TMP" \
    yaha_tpu/native/yaha_host.cpp yaha_tpu/native/yaha_pipe.cpp yaha_tpu/native/yaha_index.cpp
mv -f "$TMP" yaha_tpu/native/libyaha_host.so
echo "built yaha_tpu/native/libyaha_host.so ($FLAGS)"
