// Shared helpers for the native modules (all compiled as one TU via
// amalgam.cc; static inline keeps standalone builds working too).
#pragma once
#include <cstring>

// memcpy with a NULL source/destination is UB even for n == 0 (numpy
// hands the C ABI a null data pointer for empty arrays) — every copy
// that can see an empty buffer goes through this.
static inline void grk_copy_bytes(void* dst, const void* src, size_t n) {
  if (n) std::memcpy(dst, src, n);
}
