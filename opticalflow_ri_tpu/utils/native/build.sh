#!/bin/sh
# Build the native IO runtime. Run from anywhere; output lands next to the source.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -pthread -o libofri_io.so ofri_io.cpp
echo "built $(pwd)/libofri_io.so"
