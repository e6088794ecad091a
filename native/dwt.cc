// Native reversible 5/3 DWT, both directions (ISO/IEC 15444-1 Annex F).
//
// Parity: WaveletFwd / WaveletReverse (SURVEY.md §2.1 "Wavelet") — the
// host-side production path for even-parity tile-components (tiles at
// even canvas origins; odd-parity rects keep the numpy reference).
// Row-major int32 planes.  Vertical lifting runs row-at-a-time so the
// compiler vectorizes across the width (AVX2/AVX-512 via -march=native);
// horizontal lifting works in the PLANAR (deinterleaved even/odd)
// domain — one vectorized split, lifting as contiguous affine loops
// with the symmetric-extension edges peeled off, then a vectorized
// interleave on the inverse — so every inner loop is branch-free and
// SIMD.  Band rows are written directly (no staging copies).
// Bit-identical to grok_tpu/transform/dwt.py (differential-tested).

#include <cstdint>
#include <cstring>
#include <vector>

#include "util.h"

namespace {

// thread-local planar scratch shared by the row passes (grown on demand)
template <typename T>
static T* row_scratch(int n) {
  thread_local std::vector<T> buf;
  if ((int)buf.size() < n) buf.resize(n);
  return buf.data();
}

// Vertical (column) lifting over a (h x w) plane with row stride `w`.
// Even-parity origin: lows at even rows.  Streams d then s with lag 1
// (s[j] needs d[j-1], d[j]) so x and the detail rows stay cache-hot.
// Output layout: ceil(h/2) low rows then floor(h/2) high rows, width w.
static void fwd53_vertical(const int32_t* x, int h, int w, int32_t* out) {
  int ne = (h + 1) / 2, no = h / 2;
  if (h == 0) return;
  int32_t* lo = out;
  int32_t* hi = out + (size_t)ne * w;
  if (h == 1) {
    grk_copy_bytes(lo, x, sizeof(int32_t) * w);
    return;
  }
  // d[j] = x[2j+1] - ((x[2j] + x[2j+2]) >> 1), mirror at the bottom;
  // s[j] = x[2j] + ((d[j-1] + d[j] + 2) >> 2), mirrors at both ends
  for (int j = 0; j < no; j++) {
    const int32_t* a = x + (size_t)(2 * j) * w;
    const int32_t* b = a + w;
    const int32_t* c = (2 * j + 2 < h) ? b + w : a;
    int32_t* d = hi + (size_t)j * w;
    for (int i = 0; i < w; i++) d[i] = b[i] - ((a[i] + c[i]) >> 1);
    const int32_t* dl = (j > 0) ? d - w : d;
    int32_t* s = lo + (size_t)j * w;
    for (int i = 0; i < w; i++) s[i] = a[i] + ((dl[i] + d[i] + 2) >> 2);
  }
  if (ne > no) {  // odd h: last low row mirrors the final detail row
    const int32_t* a = x + (size_t)(2 * (ne - 1)) * w;
    const int32_t* d = hi + (size_t)(no - 1) * w;
    int32_t* s = lo + (size_t)(ne - 1) * w;
    for (int i = 0; i < w; i++) s[i] = a[i] + ((2 * d[i] + 2) >> 2);
  }
}

static void inv53_vertical(const int32_t* lo, const int32_t* hi, int h,
                           int w, int32_t* out) {
  int ne = (h + 1) / 2, no = h / 2;
  if (h == 0) return;
  if (h == 1) {
    grk_copy_bytes(out, lo, sizeof(int32_t) * w);
    return;
  }
  // x[2j] = s[j] - ((d[j-1] + d[j] + 2) >> 2), then
  // x[2j+1] = d[j] + ((x[2j] + x[2j+2]) >> 1): stream evens one row
  // ahead of the odd that consumes them
  {
    const int32_t* s = lo;
    int32_t* e = out;
    for (int i = 0; i < w; i++) e[i] = s[i] - ((2 * hi[i] + 2) >> 2);
  }
  for (int j = 1; j < ne; j++) {
    const int32_t* s = lo + (size_t)j * w;
    const int32_t* dl = hi + (size_t)(j - 1) * w;
    const int32_t* dr = (j < no) ? dl + w : dl;
    int32_t* e = out + (size_t)(2 * j) * w;
    for (int i = 0; i < w; i++) e[i] = s[i] - ((dl[i] + dr[i] + 2) >> 2);
    const int32_t* d = hi + (size_t)(j - 1) * w;
    const int32_t* a = e - 2 * (size_t)w;
    int32_t* o = out + (size_t)(2 * j - 1) * w;
    for (int i = 0; i < w; i++) o[i] = d[i] + ((a[i] + e[i]) >> 1);
  }
  if (2 * no == h) {  // even h: trailing odd row mirrors upward
    const int32_t* d = hi + (size_t)(no - 1) * w;
    const int32_t* a = out + (size_t)(h - 2) * w;
    int32_t* o = out + (size_t)(h - 1) * w;
    for (int i = 0; i < w; i++) o[i] = d[i] + ((a[i] + a[i]) >> 1);
  }
}

// Horizontal lifting of one row into planar lo[ne] / hi[no] outputs.
// ev/od are caller scratch (>= ne ints each).
static inline void fwd53_row(const int32_t* x, int n, int32_t* lo,
                             int32_t* hi, int32_t* ev, int32_t* od) {
  int ne = (n + 1) / 2, no = n / 2;
  if (n == 0) return;
  if (n == 1) {
    lo[0] = x[0];
    return;
  }
  for (int j = 0; j < no; j++) {
    ev[j] = x[2 * j];
    od[j] = x[2 * j + 1];
  }
  if (n & 1) ev[ne - 1] = x[n - 1];
  for (int j = 0; j < no - 1; j++)
    hi[j] = od[j] - ((ev[j] + ev[j + 1]) >> 1);
  {
    int j = no - 1;
    int32_t c = (2 * j + 2 < n) ? ev[j + 1] : ev[j];
    hi[j] = od[j] - ((ev[j] + c) >> 1);
  }
  lo[0] = ev[0] + ((hi[0] + hi[0] + 2) >> 2);
  int jm = (ne < no) ? ne : no;  // hi[j] valid for the main body
  for (int j = 1; j < jm; j++)
    lo[j] = ev[j] + ((hi[j - 1] + hi[j] + 2) >> 2);
  for (int j = jm; j < ne; j++) {  // at most one tail element
    int32_t dl = hi[j - 1];
    int32_t dr = hi[(j < no) ? j : no - 1];
    lo[j] = ev[j] + ((dl + dr + 2) >> 2);
  }
}

// T1 decoders emit DOUBLED-domain values (sign * (2q+1)); fusing the
// value = (v - (v >> 31)) >> 1 halving into the band loads here removes a
// full-plane numpy pass per band on the lossless decode path.
template <bool HLO, bool HHI>
static inline int32_t load_lo(const int32_t* p, int j) {
  int32_t v = p[j];
  return HLO ? (v - (v >> 31)) >> 1 : v;
}
template <bool HLO, bool HHI>
static inline int32_t load_hi(const int32_t* p, int j) {
  int32_t v = p[j];
  return HHI ? (v - (v >> 31)) >> 1 : v;
}

template <bool HLO, bool HHI>
static inline void inv53_row_t(const int32_t* lo, const int32_t* hi, int n,
                               int32_t* out, int32_t* ev, int32_t* od) {
  int ne = (n + 1) / 2, no = n / 2;
  if (n == 0) return;
  if (n == 1) {
    out[0] = load_lo<HLO, HHI>(lo, 0);
    return;
  }
  ev[0] = load_lo<HLO, HHI>(lo, 0) -
          ((2 * load_hi<HLO, HHI>(hi, 0) + 2) >> 2);
  int jm = (ne < no) ? ne : no;
  for (int j = 1; j < jm; j++)
    ev[j] = load_lo<HLO, HHI>(lo, j) -
            ((load_hi<HLO, HHI>(hi, j - 1) + load_hi<HLO, HHI>(hi, j) + 2)
             >> 2);
  for (int j = jm; j < ne; j++) {
    int32_t dl = load_hi<HLO, HHI>(hi, j - 1);
    int32_t dr = load_hi<HLO, HHI>(hi, (j < no) ? j : no - 1);
    ev[j] = load_lo<HLO, HHI>(lo, j) - ((dl + dr + 2) >> 2);
  }
  for (int j = 0; j < no - 1; j++)
    od[j] = load_hi<HLO, HHI>(hi, j) + ((ev[j] + ev[j + 1]) >> 1);
  {
    int j = no - 1;
    int32_t c = (2 * j + 2 < n) ? ev[j + 1] : ev[j];
    od[j] = load_hi<HLO, HHI>(hi, j) + ((ev[j] + c) >> 1);
  }
  for (int j = 0; j < no; j++) {
    out[2 * j] = ev[j];
    out[2 * j + 1] = od[j];
  }
  if (n & 1) out[n - 1] = ev[ne - 1];
}

static inline void inv53_row(const int32_t* lo, const int32_t* hi, int n,
                             int32_t* out, int32_t* ev, int32_t* od) {
  inv53_row_t<false, false>(lo, hi, n, out, ev, od);
}

}  // namespace

extern "C" {

// One forward 5/3 level of an even-origin (h x w) plane `x` (contiguous).
// Writes ll/hl/lh/hh as contiguous arrays (caller-sized: ll (eh x ew),
// hl (eh x ow), lh (oh x ew), hh (oh x ow) with eh=ceil(h/2) etc).
// Vertical pass first, then horizontal — matches transform/dwt.py.
void grk_fwd53_level(const int32_t* x, int h, int w, int32_t* ll,
                     int32_t* hl, int32_t* lh, int32_t* hh,
                     int32_t* scratch) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  fwd53_vertical(x, h, w, scratch);  // scratch: lo rows then hi rows
  int32_t* ev = row_scratch<int32_t>(2 * (ew + 1));
  int32_t* od = ev + ew + 1;
  for (int y = 0; y < eh; y++)
    fwd53_row(scratch + (size_t)y * w, w, ll + (size_t)y * ew,
              hl + (size_t)y * ow, ev, od);
  for (int y = 0; y < oh; y++)
    fwd53_row(scratch + (size_t)(eh + y) * w, w, lh + (size_t)y * ew,
              hh + (size_t)y * ow, ev, od);
}

// One inverse 5/3 level -> (h x w) plane `out`.  `halve` fuses the T1
// doubled-domain -> value conversion into the band loads: bit0 halves
// ll, bit1 halves hl/lh/hh (level 1 of a decode passes 3 — every input
// is a coded band; deeper levels pass 2 — ll is the previous level's
// value-domain output).
void grk_inv53_level_h(const int32_t* ll, const int32_t* hl,
                       const int32_t* lh, const int32_t* hh, int h, int w,
                       int32_t* out, int32_t* scratch, int halve) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  int32_t* ev = row_scratch<int32_t>(2 * (ew + 1));
  int32_t* od = ev + ew + 1;
  void (*row_lo)(const int32_t*, const int32_t*, int, int32_t*, int32_t*,
                 int32_t*) =
      (halve & 1) ? ((halve & 2) ? inv53_row_t<true, true>
                                 : inv53_row_t<true, false>)
                  : ((halve & 2) ? inv53_row_t<false, true>
                                 : inv53_row_t<false, false>);
  void (*row_hi)(const int32_t*, const int32_t*, int, int32_t*, int32_t*,
                 int32_t*) =
      (halve & 2) ? inv53_row_t<true, true> : inv53_row_t<false, false>;
  // horizontal inverses into the (lo rows | hi rows) scratch layout
  for (int y = 0; y < eh; y++)
    row_lo(ll + (size_t)y * ew, hl + (size_t)y * ow, w,
           scratch + (size_t)y * w, ev, od);
  for (int y = 0; y < oh; y++)
    row_hi(lh + (size_t)y * ew, hh + (size_t)y * ow, w,
           scratch + (size_t)(eh + y) * w, ev, od);
  inv53_vertical(scratch, scratch + (size_t)eh * w, h, w, out);
}

}  // extern "C"

// ------------------------------------------------------------ 9/7 (float)
// Irreversible lifting mirroring transform/dwt.py::_fwd_97_even /
// _inv_97_even: same step order and float32 arithmetic (per-element
// expressions unchanged so the compiler's contraction choices match the
// scalar build), even-parity origins (odd-parity rects keep numpy).

namespace {

constexpr float ALPHA = -1.586134342059924f;
constexpr float BETA = -0.052980118572961f;
constexpr float GAMMA = 0.882911075530934f;
constexpr float DELTA = 0.443506852043971f;
constexpr float KK = 1.230174104914001f;

// lift od[j] += c * (ev[j] + ev[j+1]) with the bottom mirror, row arrays
static inline void lift_odd_v(float* od, const float* ev, int ne, int no,
                              int w, float cf) {
  for (int j = 0; j < no; j++) {
    const float* a = ev + (size_t)j * w;
    const float* b = (j + 1 < ne) ? a + w : a;  // mirror when ne == no
    float* d = od + (size_t)j * w;
    for (int i = 0; i < w; i++) d[i] += cf * (a[i] + b[i]);
  }
}

// lift ev[j] += c * (od[j-1] + od[j]) with edge mirrors
static inline void lift_even_v(float* ev, const float* od, int ne, int no,
                               int w, float cf) {
  for (int j = 0; j < ne; j++) {
    const float* dl = od + (size_t)(j > 0 ? j - 1 : 0) * w;
    const float* dr = od + (size_t)(j < no ? j : no - 1) * w;
    float* s = ev + (size_t)j * w;
    for (int i = 0; i < w; i++) s[i] += cf * (dl[i] + dr[i]);
  }
}

static void fwd97_vertical(const float* x, int h, int w, float* out) {
  int ne = (h + 1) / 2, no = h / 2;
  if (h == 0) return;
  float* lo = out;
  float* hi = out + (size_t)ne * w;
  if (h == 1) {
    for (int i = 0; i < w; i++) lo[i] = x[i] * (1.0f / KK);
    return;
  }
  for (int j = 0; j < ne; j++)
    grk_copy_bytes(lo + (size_t)j * w, x + (size_t)(2 * j) * w,
                sizeof(float) * w);
  for (int j = 0; j < no; j++)
    grk_copy_bytes(hi + (size_t)j * w, x + (size_t)(2 * j + 1) * w,
                sizeof(float) * w);
  lift_odd_v(hi, lo, ne, no, w, ALPHA);
  lift_even_v(lo, hi, ne, no, w, BETA);
  lift_odd_v(hi, lo, ne, no, w, GAMMA);
  lift_even_v(lo, hi, ne, no, w, DELTA);
  for (int j = 0; j < ne * w; j++) lo[j] *= (1.0f / KK);
  for (int j = 0; j < no * w; j++) hi[j] *= KK;
}

// In-place inverse vertical lifting over the planar (lo rows | hi rows)
// scratch the horizontal pass produced — no separate h*w temp buffer.
static void inv97_vertical_ip(float* lohi, int h, int w, float* out) {
  int ne = (h + 1) / 2, no = h / 2;
  if (h == 0) return;
  float* lo = lohi;
  float* hi = lohi + (size_t)ne * w;
  if (h == 1) {
    for (int i = 0; i < w; i++) out[i] = lo[i] * KK;
    return;
  }
  for (int j = 0; j < ne * w; j++) lo[j] *= KK;
  for (int j = 0; j < no * w; j++) hi[j] *= (1.0f / KK);
  lift_even_v(lo, hi, ne, no, w, -DELTA);
  lift_odd_v(hi, lo, ne, no, w, -GAMMA);
  lift_even_v(lo, hi, ne, no, w, -BETA);
  lift_odd_v(hi, lo, ne, no, w, -ALPHA);
  for (int j = 0; j < ne; j++)
    grk_copy_bytes(out + (size_t)(2 * j) * w, lo + (size_t)j * w,
                sizeof(float) * w);
  for (int j = 0; j < no; j++)
    grk_copy_bytes(out + (size_t)(2 * j + 1) * w, hi + (size_t)j * w,
                sizeof(float) * w);
}

// planar horizontal lifting: ev[ne]/od[no] in place, edges peeled so the
// main bodies are contiguous SIMD loops with the same per-element
// arithmetic as the vertical lifts
static inline void lift_odd_h(float* od, const float* ev, int ne, int no,
                              float cf) {
  for (int j = 0; j < no - 1; j++) od[j] += cf * (ev[j] + ev[j + 1]);
  if (no > 0) {
    int j = no - 1;
    float b = (j + 1 < ne) ? ev[j + 1] : ev[j];
    od[j] += cf * (ev[j] + b);
  }
}

static inline void lift_even_h(float* ev, const float* od, int ne, int no,
                               float cf) {
  ev[0] += cf * (od[0] + od[0]);
  int jm = (ne < no) ? ne : no;
  for (int j = 1; j < jm; j++) ev[j] += cf * (od[j - 1] + od[j]);
  for (int j = jm; j < ne; j++) {
    float dl = od[j - 1];
    float dr = od[(j < no) ? j : no - 1];
    ev[j] += cf * (dl + dr);
  }
}

static inline void fwd97_row(const float* x, int n, float* lo, float* hi,
                             float* ev, float* od) {
  int ne = (n + 1) / 2, no = n / 2;
  if (n == 0) return;
  if (n == 1) {
    lo[0] = x[0] * (1.0f / KK);
    return;
  }
  for (int j = 0; j < no; j++) {
    ev[j] = x[2 * j];
    od[j] = x[2 * j + 1];
  }
  if (n & 1) ev[ne - 1] = x[n - 1];
  lift_odd_h(od, ev, ne, no, ALPHA);
  lift_even_h(ev, od, ne, no, BETA);
  lift_odd_h(od, ev, ne, no, GAMMA);
  lift_even_h(ev, od, ne, no, DELTA);
  for (int j = 0; j < ne; j++) lo[j] = ev[j] * (1.0f / KK);
  for (int j = 0; j < no; j++) hi[j] = od[j] * KK;
}

// Band loads for the inverse rows.  LQ/HQ fuse dequantization of T1
// doubled-domain int32 coefficients into the load: value = (float)v *
// m where m = np.float32(0.5 * Delta_b) (transform/quant.py
// dequantize) — one full-plane numpy pass saved per band on the lossy
// decode path.  Two separate multiplies ((v * m) * KK) keep the same
// rounding as the unfused dequantize-then-scale order.
template <bool DQ>
static inline float ld97(const void* p, int j, float m) {
  return DQ ? (float)((const int32_t*)p)[j] * m : ((const float*)p)[j];
}

template <bool LQ, bool HQ>
static inline void inv97_row_t(const void* lo_in, const void* hi_in,
                               int n, float* out, float* ev, float* od,
                               float mlo, float mhi) {
  int ne = (n + 1) / 2, no = n / 2;
  if (n == 0) return;
  if (n == 1) {
    out[0] = ld97<LQ>(lo_in, 0, mlo) * KK;
    return;
  }
  for (int j = 0; j < ne; j++) ev[j] = ld97<LQ>(lo_in, j, mlo) * KK;
  for (int j = 0; j < no; j++)
    od[j] = ld97<HQ>(hi_in, j, mhi) * (1.0f / KK);
  lift_even_h(ev, od, ne, no, -DELTA);
  lift_odd_h(od, ev, ne, no, -GAMMA);
  lift_even_h(ev, od, ne, no, -BETA);
  lift_odd_h(od, ev, ne, no, -ALPHA);
  for (int j = 0; j < no; j++) {
    out[2 * j] = ev[j];
    out[2 * j + 1] = od[j];
  }
  if (n & 1) out[n - 1] = ev[ne - 1];
}

static inline void inv97_row(const float* lo_in, const float* hi_in,
                             int n, float* out, float* ev, float* od) {
  inv97_row_t<false, false>(lo_in, hi_in, n, out, ev, od, 0.0f, 0.0f);
}

}  // namespace

extern "C" {

void grk_fwd97_level(const float* x, int h, int w, float* ll, float* hl,
                     float* lh, float* hh, float* scratch) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  fwd97_vertical(x, h, w, scratch);
  float* ev = row_scratch<float>(2 * (ew + 1));
  float* od = ev + ew + 1;
  for (int y = 0; y < eh; y++)
    fwd97_row(scratch + (size_t)y * w, w, ll + (size_t)y * ew,
              hl + (size_t)y * ow, ev, od);
  for (int y = 0; y < oh; y++)
    fwd97_row(scratch + (size_t)(eh + y) * w, w, lh + (size_t)y * ew,
              hh + (size_t)y * ow, ev, od);
}

void grk_inv97_level(const float* ll, const float* hl, const float* lh,
                     const float* hh, int h, int w, float* out,
                     float* scratch) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  float* ev = row_scratch<float>(2 * (ew + 1));
  float* od = ev + ew + 1;
  // horizontal inverses into (lo rows | hi rows) of scratch
  for (int y = 0; y < eh; y++)
    inv97_row(ll + (size_t)y * ew, hl + (size_t)y * ow, w,
              scratch + (size_t)y * w, ev, od);
  for (int y = 0; y < oh; y++)
    inv97_row(lh + (size_t)y * ew, hh + (size_t)y * ow, w,
              scratch + (size_t)(eh + y) * w, ev, od);
  inv97_vertical_ip(scratch, h, w, out);
}

// One inverse 9/7 level with dequantization fused into the band loads.
// hl/lh/hh are int32 T1 doubled-domain coefficient planes; ll is int32
// too when dq_ll != 0 (level 1 of a decode — every input is a coded
// band) or float32 value-domain otherwise (the previous level's
// output).  dll..dhh are np.float32(0.5 * Delta_b) per band.
void grk_inv97_level_dq(const void* ll, const void* hl, const void* lh,
                        const void* hh, int h, int w, float* out,
                        float* scratch, int dq_ll, float dll, float dhl,
                        float dlh, float dhh) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  float* ev = row_scratch<float>(2 * (ew + 1));
  float* od = ev + ew + 1;
  for (int y = 0; y < eh; y++) {
    float* dst = scratch + (size_t)y * w;
    if (dq_ll)
      inv97_row_t<true, true>((const int32_t*)ll + (size_t)y * ew,
                              (const int32_t*)hl + (size_t)y * ow, w,
                              dst, ev, od, dll, dhl);
    else
      inv97_row_t<false, true>((const float*)ll + (size_t)y * ew,
                               (const int32_t*)hl + (size_t)y * ow, w,
                               dst, ev, od, 0.0f, dhl);
  }
  for (int y = 0; y < oh; y++)
    inv97_row_t<true, true>((const int32_t*)lh + (size_t)y * ew,
                            (const int32_t*)hh + (size_t)y * ow, w,
                            scratch + (size_t)(eh + y) * w, ev, od,
                            dlh, dhh);
  inv97_vertical_ip(scratch, h, w, out);
}

}  // extern "C"
