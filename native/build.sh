#!/bin/sh
# Build the graphkit native library. Invoked by setup.py / first import.
# Compiles to a temp file and renames into place so a rebuild never
# truncates a libgraphkit.so that a running process has mapped.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread -o libgraphkit.so.tmp.$$ graphkit.cpp
mv -f libgraphkit.so.tmp.$$ libgraphkit.so
echo "built $(pwd)/libgraphkit.so"
