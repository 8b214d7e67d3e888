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
g++ $FLAGS -Wall -shared -fPIC -pthread -o yaha_tpu/native/libyaha_host.so \
    yaha_tpu/native/yaha_host.cpp yaha_tpu/native/yaha_pipe.cpp yaha_tpu/native/yaha_index.cpp
echo "built yaha_tpu/native/libyaha_host.so ($FLAGS)"
