#!/usr/bin/env bash
# Build libmvdecoder.so (FFmpeg motion-vector decoder, C ABI for ctypes).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 mv_decoder.cc \
    -o libmvdecoder.so \
    $(pkg-config --cflags --libs libavformat libavcodec libavutil libswscale)
echo "built $(pwd)/libmvdecoder.so"
