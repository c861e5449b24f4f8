#!/bin/sh
# Build libvloam_host.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -o libvloam_host.so vloam_host.cpp -lpng -lpthread
echo "built $(pwd)/libvloam_host.so"
