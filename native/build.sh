#!/bin/sh
# Build the native TSP oracle shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o libtsp_oracle.so tsp_oracle.cc
echo "built $(pwd)/libtsp_oracle.so"
