#!/bin/sh
# ASan+UBSan harness for the native coders (SURVEY.md §4 family 4: the
# reference runs ASan/UBSan CI jobs).  Builds an instrumented
# libgrk_t1.so, then runs the native differential tests and a decoder
# fuzz pass against it (GROK_TPU_NATIVE_LIB overrides the library path;
# libasan must be preloaded because python itself is uninstrumented).
set -e
cd "$(dirname "$0")"
SAN_DIR=$(mktemp -d)
trap 'rm -rf "$SAN_DIR"' EXIT
SAN_LIB="$SAN_DIR/libgrk_t1_asan.so"
g++ -O1 -g -march=native -std=c++17 -fPIC -pthread -shared \
    -ffp-contract=off \
    -fsanitize=address,undefined -fno-sanitize-recover=undefined \
    amalgam.cc -o "$SAN_LIB"
echo "built $SAN_LIB"
ASAN_SO=$(g++ -print-file-name=libasan.so)
if [ ! -f "$ASAN_SO" ]; then
    echo "error: libasan.so not found (g++ returned '$ASAN_SO')" >&2
    exit 1
fi
cd ..
# deep fuzz under the instrumented library (VERDICT r3 #9): >= 5000
# mutations, seed rotated per round via the commit count (reproducible
# for a given checkout, fresh coverage every round)
FUZZ_SEED=$(git rev-list --count HEAD 2>/dev/null || echo 61474)
env GROK_TPU_NATIVE_LIB="$SAN_LIB" LD_PRELOAD="$ASAN_SO" \
    ASAN_OPTIONS=detect_leaks=0 \
    GROK_TPU_FUZZ_TRIALS=5000 GROK_TPU_FUZZ_BUDGET=900 \
    GROK_TPU_FUZZ_SEED="$FUZZ_SEED" \
    python -m pytest tests/test_native_t1.py tests/test_native_t2.py \
    tests/test_ht.py tests/test_fuzz_decoder.py -q -x "$@"
