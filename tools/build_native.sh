#!/bin/bash
# Build the native host library (yaha_tpu/native/libyaha_host.so).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -Wall -shared -fPIC -o yaha_tpu/native/libyaha_host.so \
    yaha_tpu/native/yaha_host.cpp
echo "built yaha_tpu/native/libyaha_host.so"
