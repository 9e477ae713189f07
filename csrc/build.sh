#!/bin/sh
# Build the native components into traversability_estimation_tpu/_native/.
set -e
cd "$(dirname "$0")"
OUT=../traversability_estimation_tpu/_native
mkdir -p "$OUT"
g++ -O3 -march=native -fPIC -shared -std=c++17 reference_baseline.cpp -o "$OUT/libte_baseline.so"
g++ -O3 -march=native -fPIC -shared -std=c++17 rosbag_reader.cpp -o "$OUT/libte_rosbag.so" 2>/dev/null || true
echo "built: $(ls "$OUT")"
