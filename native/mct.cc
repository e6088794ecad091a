// Fused multi-component transform + DC level shift stages.
//
// Parity: MCT + post-decode conversion (SURVEY.md §2.1 "MCT",
// src/lib/core/transform/mct.* [P]; ISO/IEC 15444-1 Annex G).  The
// numpy implementations in grok_tpu/transform/mct.py are the oracle;
// these fuse what numpy runs as 8-12 full-plane passes (per-plane
// astype + transform + rint + DC shift + clip) into ONE pass per
// plane triple, which matters on a machine whose decode tail is
// memory-bandwidth-bound (PERF_NOTES: post-DWT conversion ~27% of the
// lossy decode wall).
//
// Bit-exactness notes (differential-tested against the oracle):
//  - numpy ufuncs round after every multiply/add (no FMA contraction);
//    build.sh compiles with -ffp-contract=off and the float paths use
//    the same left-to-right association as the Python expressions.
//  - np.rint(f32).astype(np.int32) on x86 saturates NaN/inf AND any
//    out-of-int32-range finite value to INT32_MIN (cvttss2si
//    "integer indefinite") — rint_i32 reproduces that exactly, which
//    matters for corrupt lossy streams.
//  - numpy int32 arithmetic wraps; the DC add and the int64->int32
//    astype in the RCT are emulated with explicit modulo casts.
//
// The Python side gates these to prec <= 24 (both of mct.py's int32
// fast paths); deeper precisions keep the numpy int64 route.

#include <cmath>
#include <cstdint>

#ifdef __SSE2__
#include <immintrin.h>
#endif

#include "util.h"

namespace {

// ICT inverse matrix entries (ISO 15444-1 G.3), rounded to float32 the
// same way numpy's ICT_INV.astype(np.float32) rounds them.
constexpr float M02 = 1.402f;
constexpr float M11 = -0.344136f;
constexpr float M12 = -0.714136f;
constexpr float M21 = 1.772f;
// forward (G.2)
constexpr float F00 = 0.299f, F01 = 0.587f, F02 = 0.114f;
constexpr float F10 = -0.168736f, F11 = -0.331264f, F12 = 0.5f;
constexpr float F20 = 0.5f, F21 = -0.418688f, F22 = -0.081312f;

// np.rint(f32).astype(np.int32): half-to-even (per MXCSR FE_TONEAREST),
// with the x86 conversion's INT32_MIN result for NaN/inf/out-of-range.
// cvtss2si IS that exact operation (and numpy's own backend on x86);
// the libm form is the portable fallback — llrintf is a per-element
// call and GCC cannot autovectorize it.
#ifdef __SSE2__
static inline int32_t rint_i32(float v) {
  return _mm_cvtss_si32(_mm_set_ss(v));
}
#else
static inline int32_t rint_i32(float v) {
  long long r = llrintf(v);
  if (!(v == v) || r < (long long)INT32_MIN || r > (long long)INT32_MAX)
    return INT32_MIN;
  return (int32_t)r;
}
#endif

// numpy int64 -> int32 astype (modulo wrap)
static inline int32_t wrap32(int64_t v) {
  return (int32_t)(uint32_t)(uint64_t)v;
}

// dc_shift_inverse fast path (prec <= 24): wrapping int32 DC add, then
// clip to the component range.
struct Shift {
  int32_t dc, lo, hi;
  Shift(int prec, int sgnd) {
    if (sgnd) {
      dc = 0;
      lo = -(1 << (prec - 1));
      hi = (1 << (prec - 1)) - 1;
    } else {
      dc = 1 << (prec - 1);
      lo = 0;
      hi = (1 << prec) - 1;
    }
  }
  inline int32_t apply(int32_t v) const {
    int32_t t = (int32_t)((uint32_t)v + (uint32_t)dc);
    return t < lo ? lo : (t > hi ? hi : t);
  }
};

#ifdef __AVX512F__
// 16-lane rint + DC shift + clip.  vcvtps2dq rounds per MXCSR
// (nearest-even) and yields the 0x80000000 indefinite for NaN/inf/
// out-of-range — bit-identical to rint_i32 per lane.  Intrinsics keep
// UBSan quiet on corrupt-stream NaNs (a float->int C cast would trap).
struct ShiftV {
  __m512i dc, lo, hi;
  explicit ShiftV(const Shift& s)
      : dc(_mm512_set1_epi32(s.dc)),
        lo(_mm512_set1_epi32(s.lo)),
        hi(_mm512_set1_epi32(s.hi)) {}
  inline __m512i apply(__m512 v) const {
    __m512i t = _mm512_add_epi32(_mm512_cvtps_epi32(v), dc);
    return _mm512_min_epi32(_mm512_max_epi32(t, lo), hi);
  }
};
#endif

}  // namespace

extern "C" {

// inverse ICT + rint + DC unshift + clip: three float planes -> three
// int32 planes in one pass (oracle: mct.ict_inverse -> round_to_int ->
// dc_shift_inverse).
void grk_ict_inv_shift(const float* y, const float* cb, const float* cr,
                       int64_t n, int prec0, int sgnd0, int prec1,
                       int sgnd1, int prec2, int sgnd2, int32_t* r,
                       int32_t* g, int32_t* b) {
  Shift s0(prec0, sgnd0), s1(prec1, sgnd1), s2(prec2, sgnd2);
  int64_t i = 0;
#ifdef __AVX512F__
  // Separate mul/add intrinsics: no FMA contraction, same association
  // order as the scalar expressions (and the numpy oracle).
  ShiftV v0(s0), v1(s1), v2(s2);
  const __m512 m02 = _mm512_set1_ps(M02), m11 = _mm512_set1_ps(M11);
  const __m512 m12 = _mm512_set1_ps(M12), m21 = _mm512_set1_ps(M21);
  for (; i + 16 <= n; i += 16) {
    __m512 yy = _mm512_loadu_ps(y + i);
    __m512 u = _mm512_loadu_ps(cb + i);
    __m512 v = _mm512_loadu_ps(cr + i);
    __m512 fr = _mm512_add_ps(yy, _mm512_mul_ps(m02, v));
    __m512 fg = _mm512_add_ps(_mm512_add_ps(yy, _mm512_mul_ps(m11, u)),
                              _mm512_mul_ps(m12, v));
    __m512 fb = _mm512_add_ps(yy, _mm512_mul_ps(m21, u));
    _mm512_storeu_si512(r + i, v0.apply(fr));
    _mm512_storeu_si512(g + i, v1.apply(fg));
    _mm512_storeu_si512(b + i, v2.apply(fb));
  }
#endif
  for (; i < n; i++) {
    float yy = y[i], u = cb[i], v = cr[i];
    float fr = yy + M02 * v;
    float fg = (yy + M11 * u) + M12 * v;
    float fb = yy + M21 * u;
    r[i] = s0.apply(rint_i32(fr));
    g[i] = s1.apply(rint_i32(fg));
    b[i] = s2.apply(rint_i32(fb));
  }
}

// inverse RCT + DC unshift + clip (reversible path; oracle:
// mct.rct_inverse -> dc_shift_inverse).  int64 accumulation with the
// numpy astype's wrap-to-int32 at the boundary.
void grk_rct_inv_shift(const int32_t* y, const int32_t* cb,
                       const int32_t* cr, int64_t n, int prec0, int sgnd0,
                       int prec1, int sgnd1, int prec2, int sgnd2,
                       int32_t* r, int32_t* g, int32_t* b) {
  Shift s0(prec0, sgnd0), s1(prec1, sgnd1), s2(prec2, sgnd2);
  for (int64_t i = 0; i < n; i++) {
    int64_t u = cb[i], v = cr[i];
    int64_t gg = (int64_t)y[i] - ((u + v) >> 2);
    r[i] = s0.apply(wrap32(v + gg));
    g[i] = s1.apply(wrap32(gg));
    b[i] = s2.apply(wrap32(u + gg));
  }
}

// DC shift + forward ICT: three int32 planes -> three float planes
// (oracle: dc_shift_forward -> ict_forward; same association order).
void grk_ict_fwd_shift(const int32_t* r, const int32_t* g,
                       const int32_t* b, int64_t n, int32_t dc0,
                       int32_t dc1, int32_t dc2, float* y, float* cb,
                       float* cr) {
  for (int64_t i = 0; i < n; i++) {
    float fr = (float)(int32_t)((uint32_t)r[i] - (uint32_t)dc0);
    float fg = (float)(int32_t)((uint32_t)g[i] - (uint32_t)dc1);
    float fb = (float)(int32_t)((uint32_t)b[i] - (uint32_t)dc2);
    y[i] = (F00 * fr + F01 * fg) + F02 * fb;
    cb[i] = (F10 * fr + F11 * fg) + F12 * fb;
    cr[i] = (F20 * fr + F21 * fg) + F22 * fb;
  }
}

// DC shift + forward RCT (oracle: dc_shift_forward -> rct_forward).
void grk_rct_fwd_shift(const int32_t* r, const int32_t* g,
                       const int32_t* b, int64_t n, int32_t dc0,
                       int32_t dc1, int32_t dc2, int32_t* y, int32_t* cb,
                       int32_t* cr) {
  for (int64_t i = 0; i < n; i++) {
    int64_t rr = (int32_t)((uint32_t)r[i] - (uint32_t)dc0);
    int64_t gg = (int32_t)((uint32_t)g[i] - (uint32_t)dc1);
    int64_t bb = (int32_t)((uint32_t)b[i] - (uint32_t)dc2);
    y[i] = wrap32((rr + 2 * gg + bb) >> 2);
    cb[i] = wrap32(bb - gg);
    cr[i] = wrap32(rr - gg);
  }
}

// Single-plane conversions for the no-MCT / extra-component paths.

// float synthesis output -> rint + DC unshift + clip (oracle:
// round_to_int -> dc_shift_inverse).
void grk_f32_shift_i32(const float* x, int64_t n, int prec, int sgnd,
                       int32_t* out) {
  Shift s(prec, sgnd);
  int64_t i = 0;
#ifdef __AVX512F__
  ShiftV sv(s);
  for (; i + 16 <= n; i += 16)
    _mm512_storeu_si512(out + i, sv.apply(_mm512_loadu_ps(x + i)));
#endif
  for (; i < n; i++) out[i] = s.apply(rint_i32(x[i]));
}

// int synthesis output -> DC unshift + clip (oracle: dc_shift_inverse).
void grk_i32_shift_i32(const int32_t* x, int64_t n, int prec, int sgnd,
                       int32_t* out) {
  Shift s(prec, sgnd);
  for (int64_t i = 0; i < n; i++) out[i] = s.apply(x[i]);
}

// DC shift + int->float (oracle: dc_shift_forward -> astype(float32)):
// the ingest pass for irreversible components outside an MCT triple.
void grk_i32_shift_f32(const int32_t* x, int64_t n, int32_t dc,
                       float* out) {
  for (int64_t i = 0; i < n; i++)
    out[i] = (float)(int32_t)((uint32_t)x[i] - (uint32_t)dc);
}

}  // extern "C"
