#!/bin/sh
# Build the graphkit native library. Invoked by setup.py / first import.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libgraphkit.so graphkit.cpp
echo "built $(pwd)/libgraphkit.so"
