#!/bin/sh
# Build the native data-loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    wavio.cc -o libt2x_wavio.so
echo "built native/libt2x_wavio.so"
