#!/bin/sh
# Build the native host modules into grok_tpu/_native/.
# The reference builds its core as C++20 via CMake (SURVEY.md §2.1); our
# native surface is small enough for a direct g++ invocation.
#
# Profile-guided optimization: train.cc exercises the production branch
# mix (MQ/HT, both directions, bypass, density sweep); the final library
# is rebuilt with the collected profile.  Falls back to a plain -O3
# build if any PGO stage fails.
set -e
cd "$(dirname "$0")"
mkdir -p ../grok_tpu/_native
FLAGS="-O3 -march=native -std=c++17 -fPIC -pthread -funroll-loops -flto"
PGODIR=$(mktemp -d)
if g++ $FLAGS -fprofile-generate="$PGODIR" -o "$PGODIR/train" train.cc dwt.cc \
       2>/dev/null \
   && "$PGODIR/train" \
   && g++ $FLAGS -fprofile-use="$PGODIR" -fprofile-correction -shared \
          -o ../grok_tpu/_native/libgrk_t1.so t1.cc ht.cc dwt.cc t2.cc \
          2>/dev/null; then
    echo "built grok_tpu/_native/libgrk_t1.so (PGO)"
else
    g++ $FLAGS -shared -o ../grok_tpu/_native/libgrk_t1.so t1.cc ht.cc dwt.cc t2.cc
    echo "built grok_tpu/_native/libgrk_t1.so (no PGO)"
fi
rm -rf "$PGODIR"
