#!/bin/sh
# Build the native data-pipeline library. Called automatically by
# diffusion_models_collection_tpu/datasets/native.py on first use.
# Links libjpeg when available (GIL-free JPEG decode); falls back to a
# build without it (decode entry points return "unsupported" and Python
# uses PIL).
set -e
cd "$(dirname "$0")"
if g++ -O3 -fPIC -shared -std=c++17 -DDMC_HAVE_JPEG \
    -o libdmc_native.so dmc_native.cpp -lpthread -ljpeg 2>/dev/null; then
    echo "built $(pwd)/libdmc_native.so (with libjpeg)"
else
    g++ -O3 -fPIC -shared -std=c++17 -o libdmc_native.so dmc_native.cpp \
        -lpthread
    echo "built $(pwd)/libdmc_native.so (no libjpeg)"
fi
