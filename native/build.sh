#!/bin/sh
# Build the native host modules into grok_tpu/_native/.
# The reference builds its core as C++20 via CMake (SURVEY.md §2.1); our
# native surface is small enough for a direct g++ invocation.
set -e
cd "$(dirname "$0")"
mkdir -p ../grok_tpu/_native
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    -o ../grok_tpu/_native/libgrk_t1.so t1.cc ht.cc
echo "built grok_tpu/_native/libgrk_t1.so"
