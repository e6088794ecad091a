#!/bin/sh
# Build the native host modules into grok_tpu/_native/.
# The reference builds its core as C++20 via CMake (SURVEY.md §2.1); our
# native surface is small enough for a direct g++ invocation.
#
# Profile-guided optimization: amalgam.cc (one translation unit holding
# t1/ht/dwt/t2) is compiled twice to the SAME object path — once with
# -DGRK_TRAIN_MAIN + -fprofile-generate to run train.cc's production
# branch mix, once with -fprofile-use — so the .gcda actually matches
# the library objects (gcc keys profiles per object file).
# -fprofile-partial-training keeps functions the trainer misses at full
# -O3 instead of gcc's cold-size treatment (measured 3.5-5x on the
# untrained DWT kernels).  Falls back to a plain -O3 build if any PGO
# stage fails.
#
# The output library is written to a temp name and moved into place so
# concurrent importers never dlopen a half-written file.
set -e
cd "$(dirname "$0")"
mkdir -p ../grok_tpu/_native
LIB=../grok_tpu/_native/libgrk_t1.so
TMP="$LIB.tmp.$$"
# -ffp-contract=off: the float paths (9/7 DWT, fused MCT) must round
# after every multiply/add exactly like numpy ufuncs — no FMA fusion.
FLAGS="-O3 -march=native -std=c++17 -fPIC -pthread -funroll-loops -flto -ffp-contract=off"
PGODIR=$(mktemp -d)
if g++ $FLAGS -DGRK_TRAIN_MAIN -fprofile-generate="$PGODIR" \
       -c amalgam.cc -o "$PGODIR/amalgam.o" 2>/dev/null \
   && g++ $FLAGS -fprofile-generate="$PGODIR" "$PGODIR/amalgam.o" \
          -o "$PGODIR/train" 2>/dev/null \
   && "$PGODIR/train" \
   && g++ $FLAGS -fprofile-use="$PGODIR" -fprofile-correction \
          -fprofile-partial-training \
          -c amalgam.cc -o "$PGODIR/amalgam.o" 2>/dev/null \
   && g++ $FLAGS -shared "$PGODIR/amalgam.o" -o "$TMP" 2>/dev/null; then
    mv -f "$TMP" "$LIB"
    echo "built grok_tpu/_native/libgrk_t1.so (PGO)"
else
    g++ $FLAGS -shared -o "$TMP" amalgam.cc
    mv -f "$TMP" "$LIB"
    echo "built grok_tpu/_native/libgrk_t1.so (no PGO)"
fi
rm -rf "$PGODIR"
