#!/bin/sh
# Build libsmelter_native.so next to this script. Requires g++ (baked in).
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread smelter_native.cpp -o libsmelter_native.so
