#!/bin/sh
# Build the native data-plane shared library.
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -shared -fPIC -std=c++17 -pthread \
  -o libvit2spn_dataplane.so dataplane.cpp
echo "built $(pwd)/libvit2spn_dataplane.so"
