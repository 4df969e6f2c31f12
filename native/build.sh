#!/bin/sh
# Build the native data-pipeline library. Called automatically by
# diffusion_models_collection_tpu/datasets/native.py on first use.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libdmc_native.so dmc_native.cpp -lpthread
echo "built $(pwd)/libdmc_native.so"
