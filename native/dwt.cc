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

// The level drivers below fuse the vertical and horizontal passes into
// one streaming sweep: vertical lifting produces one low + one high row
// at a time into rolling row buffers, and each produced row is
// horizontally lifted straight into the band arrays (forward) or the
// output plane (inverse).  The plane is read once and written once —
// no full h x w intermediate is materialized (the unfused form wrote
// and re-read one, doubling DWT memory traffic).  Per-element integer
// arithmetic is unchanged, so results stay bit-identical to
// transform/dwt.py.

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

// Wrap-exact int32 add/sub for the INVERSE path: corrupt streams can
// hand the lifting arbitrary int32 band values, and the numpy oracle
// wraps — signed overflow here would be UB (caught by the UBSan fuzz
// harness).  Same single add/sub instruction on x86.
static inline int32_t wadd(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a + (uint32_t)b);
}
static inline int32_t wsub(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a - (uint32_t)b);
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
  {
    int32_t h0 = load_hi<HLO, HHI>(hi, 0);
    ev[0] = wsub(load_lo<HLO, HHI>(lo, 0),
                 wadd(wadd(h0, h0), 2) >> 2);
  }
  int jm = (ne < no) ? ne : no;
  for (int j = 1; j < jm; j++)
    ev[j] = wsub(load_lo<HLO, HHI>(lo, j),
                 wadd(wadd(load_hi<HLO, HHI>(hi, j - 1),
                           load_hi<HLO, HHI>(hi, j)), 2) >> 2);
  for (int j = jm; j < ne; j++) {
    int32_t dl = load_hi<HLO, HHI>(hi, j - 1);
    int32_t dr = load_hi<HLO, HHI>(hi, (j < no) ? j : no - 1);
    ev[j] = wsub(load_lo<HLO, HHI>(lo, j), wadd(wadd(dl, dr), 2) >> 2);
  }
  for (int j = 0; j < no - 1; j++)
    od[j] = wadd(load_hi<HLO, HHI>(hi, j), wadd(ev[j], ev[j + 1]) >> 1);
  {
    int j = no - 1;
    int32_t c = (2 * j + 2 < n) ? ev[j + 1] : ev[j];
    od[j] = wadd(load_hi<HLO, HHI>(hi, j), wadd(ev[j], c) >> 1);
  }
  for (int j = 0; j < no; j++) {
    out[2 * j] = ev[j];
    out[2 * j + 1] = od[j];
  }
  if (n & 1) out[n - 1] = ev[ne - 1];
}

}  // namespace

extern "C" {

// One forward 5/3 level of an even-origin (h x w) plane `x` (contiguous).
// Writes ll/hl/lh/hh as contiguous arrays (caller-sized: ll (eh x ew),
// hl (eh x ow), lh (oh x ew), hh (oh x ow) with eh=ceil(h/2) etc).
// Fused vertical+horizontal streaming sweep — matches transform/dwt.py.
// `scratch` is unused (kept for ABI stability).
void grk_fwd53_level(const int32_t* x, int h, int w, int32_t* ll,
                     int32_t* hl, int32_t* lh, int32_t* hh,
                     int32_t* scratch) {
  (void)scratch;
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  if (h == 0) return;
  int32_t* buf = row_scratch<int32_t>(3 * w + 2 * (ew + 1));
  int32_t* dprev = buf;
  int32_t* dcur = buf + w;
  int32_t* srow = buf + 2 * w;
  int32_t* ev = buf + 3 * w;
  int32_t* od = ev + ew + 1;
  if (h == 1) {  // vertical pass is the identity on the single low row
    fwd53_row(x, w, ll, hl, ev, od);
    return;
  }
  // d[j] = x[2j+1] - ((x[2j] + x[2j+2]) >> 1), mirror at the bottom;
  // s[j] = x[2j] + ((d[j-1] + d[j] + 2) >> 2), mirrors at both ends.
  // d[j] is complete as soon as computed -> lift it into lh/hh row j;
  // s[j] needs d[j-1] (rolling buffer) -> lift into ll/hl row j.
  for (int j = 0; j < oh; j++) {
    const int32_t* a = x + (size_t)(2 * j) * w;
    const int32_t* b = a + w;
    const int32_t* c = (2 * j + 2 < h) ? b + w : a;
    for (int i = 0; i < w; i++) dcur[i] = b[i] - ((a[i] + c[i]) >> 1);
    const int32_t* dl = (j > 0) ? dprev : dcur;
    for (int i = 0; i < w; i++)
      srow[i] = a[i] + ((dl[i] + dcur[i] + 2) >> 2);
    fwd53_row(srow, w, ll + (size_t)j * ew, hl + (size_t)j * ow, ev, od);
    fwd53_row(dcur, w, lh + (size_t)j * ew, hh + (size_t)j * ow, ev, od);
    int32_t* t = dprev;
    dprev = dcur;
    dcur = t;
  }
  if (eh > oh) {  // odd h: last low row mirrors the final detail row
    const int32_t* a = x + (size_t)(2 * (eh - 1)) * w;
    for (int i = 0; i < w; i++) srow[i] = a[i] + ((2 * dprev[i] + 2) >> 2);
    fwd53_row(srow, w, ll + (size_t)(eh - 1) * ew,
              hl + (size_t)(eh - 1) * ow, ev, od);
  }
}

// One inverse 5/3 level -> (h x w) plane `out`.  `halve` fuses the T1
// doubled-domain -> value conversion into the band loads: bit0 halves
// ll, bit1 halves hl/lh/hh (level 1 of a decode passes 3 — every input
// is a coded band; deeper levels pass 2 — ll is the previous level's
// value-domain output).
void grk_inv53_level_h(const int32_t* ll, const int32_t* hl,
                       const int32_t* lh, const int32_t* hh, int h, int w,
                       int32_t* out, int32_t* scratch, int halve) {
  (void)scratch;
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  if (h == 0) return;
  int32_t* buf = row_scratch<int32_t>(3 * w + 2 * (ew + 1));
  int32_t* dprev = buf;
  int32_t* dcur = buf + w;
  int32_t* srow = buf + 2 * w;
  int32_t* ev = buf + 3 * w;
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
  if (h == 1) {  // vertical inverse is the identity on the single low row
    row_lo(ll, hl, w, out, ev, od);
    return;
  }
  // Streamed vertical inverse over horizontally-inverted rows:
  //   e[j] = out[2j]   = s[j] - ((d[j-1] + d[j] + 2) >> 2)
  //   o[j] = out[2j+1] = d[j] + ((e[j] + e[j+1]) >> 1)
  // s/d rows are produced on demand from the band rows; e rows are read
  // back from `out` (still cache-hot) when the trailing odd row needs
  // them.  Mirrors: d[-1] = d[0]; d[no] = d[no-1]; bottom odd row of an
  // even-height plane mirrors its even neighbor upward.
  for (int j = 0; j < eh; j++) {
    row_lo(ll + (size_t)j * ew, hl + (size_t)j * ow, w, srow, ev, od);
    if (j < oh)
      row_hi(lh + (size_t)j * ew, hh + (size_t)j * ow, w, dcur, ev, od);
    const int32_t* dl = (j > 0) ? dprev : dcur;
    const int32_t* dr = (j < oh) ? dcur : dprev;
    int32_t* e = out + (size_t)(2 * j) * w;
    for (int i = 0; i < w; i++)
      e[i] = wsub(srow[i], wadd(wadd(dl[i], dr[i]), 2) >> 2);
    if (j > 0) {
      const int32_t* a = e - 2 * (size_t)w;
      int32_t* o = out + (size_t)(2 * j - 1) * w;
      for (int i = 0; i < w; i++)
        o[i] = wadd(dprev[i], wadd(a[i], e[i]) >> 1);
    }
    int32_t* t = dprev;
    dprev = dcur;
    dcur = t;
  }
  if (2 * oh == h) {  // even h: trailing odd row mirrors upward
    const int32_t* a = out + (size_t)(h - 2) * w;
    int32_t* o = out + (size_t)(h - 1) * w;
    for (int i = 0; i < w; i++)
      o[i] = wadd(dprev[i], wadd(a[i], a[i]) >> 1);
  }
}

}  // extern "C"

// ------------------------------------------------------------ 9/7 (float)
// Irreversible lifting mirroring transform/dwt.py::_fwd_97_even /
// _inv_97_even: same step order and float32 arithmetic (per-element
// expressions unchanged so the compiler's contraction choices match the
// scalar build), even-parity origins (odd-parity rects keep numpy).
//
// Like the 5/3 drivers above, the level drivers stream: the four
// vertical lifting steps run as a rolling-row pipeline (9/7 needs a
// two-row lag per step) and every completed low/high row is handed to
// the horizontal pass immediately, so the plane is read once and
// written once instead of the 4-sweep planar form's ~10x traffic.
// Per-element float expressions are unchanged (-ffp-contract=off), so
// outputs stay bit-identical to the numpy oracle.

namespace {

constexpr float ALPHA = -1.586134342059924f;
constexpr float BETA = -0.052980118572961f;
constexpr float GAMMA = 0.882911075530934f;
constexpr float DELTA = 0.443506852043971f;
constexpr float KK = 1.230174104914001f;

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

// Streamed inverse-9/7 vertical pipeline over horizontally-inverted
// rows.  ProdLo/ProdHi(j, dst) must fill dst with the *scaled* band row
// (lo * K, hi / K — same two-multiply order as the planar form).  The
// four lifting registers roll:
//   s1[j] = lo[j] - D*(hi[j-1] + hi[j])        (clamped)
//   d1[j] = hi[j] - G*(s1[j] + s1[j+1])        (mirrored)
//   e[j]  = out[2j]   = s1[j] - B*(d1[j-1] + d1[j])
//   o[j]  = out[2j+1] = d1[j] - A*(e[j] + e[j+1])
// e rows are read back from `out` (cache-hot) for the trailing odd row.
template <class ProdLo, class ProdHi>
static void inv97_fused(int h, int w, float* out, float* rows,
                        ProdLo produce_lo, ProdHi produce_hi) {
  int ne = (h + 1) / 2, no = h / 2;
  if (h == 0) return;
  float* lon = rows;           // lo[j+1] (scaled), also prologue lo[0]
  float* hic = rows + w;       // hi[j]   (scaled)
  float* hin = rows + 2 * w;   // hi[j+1]
  float* s1c = rows + 3 * w;   // s1[j]
  float* s1n = rows + 4 * w;   // s1[j+1]
  float* d1p = rows + 5 * w;   // d1[j-1]
  float* d1c = rows + 6 * w;   // d1[j]
  if (h == 1) {  // producers already apply the vertical low-band scale
    produce_lo(0, out);
    return;
  }
  produce_lo(0, lon);
  produce_hi(0, hic);
  for (int i = 0; i < w; i++)
    s1c[i] = lon[i] + -DELTA * (hic[i] + hic[i]);
  for (int j = 0; j < ne; j++) {
    if (j + 1 < ne) {
      produce_lo(j + 1, lon);
      const float* hr = hic;  // mirror hi[min(j+1, no-1)]
      if (j + 1 < no) {
        produce_hi(j + 1, hin);
        hr = hin;
      }
      for (int i = 0; i < w; i++)
        s1n[i] = lon[i] + -DELTA * (hic[i] + hr[i]);
    }
    if (j < no) {
      const float* sr = (j + 1 < ne) ? s1n : s1c;
      for (int i = 0; i < w; i++)
        d1c[i] = hic[i] + -GAMMA * (s1c[i] + sr[i]);
    }
    const float* dl = (j > 0) ? d1p : d1c;
    const float* dr = (j < no) ? d1c : d1p;
    float* e = out + (size_t)(2 * j) * w;
    for (int i = 0; i < w; i++)
      e[i] = s1c[i] + -BETA * (dl[i] + dr[i]);
    if (j > 0) {
      const float* a = e - 2 * (size_t)w;
      float* o = out + (size_t)(2 * j - 1) * w;
      for (int i = 0; i < w; i++)
        o[i] = d1p[i] + -ALPHA * (a[i] + e[i]);
    }
    float* t = d1p;
    d1p = d1c;
    d1c = t;
    t = s1c;
    s1c = s1n;
    s1n = t;
    t = hic;
    hic = hin;
    hin = t;
  }
  if (2 * no == h) {  // even h: trailing odd row mirrors upward
    const float* a = out + (size_t)(h - 2) * w;
    float* o = out + (size_t)(h - 1) * w;
    for (int i = 0; i < w; i++) o[i] = d1p[i] + -ALPHA * (a[i] + a[i]);
  }
}

}  // namespace

extern "C" {

// One forward 9/7 level of an even-origin (h x w) plane.  Streamed
// vertical pipeline (two-row lag per lifting step), each completed
// low/high row horizontally lifted straight into the bands:
//   d0[j] = x[2j+1] + A*(x[2j] + x[2j+2])      (mirrored)
//   s1[j] = x[2j]   + B*(d0[j-1] + d0[j])      (clamped)
//   d2[j] = d0[j]   + G*(s1[j] + s1[j+1])      (mirrored)
//   s3[j] = s1[j]   + D*(d2[j-1] + d2[j])      (clamped)
//   lo = s3 / K -> ll/hl row j;  hi = d2 * K -> lh/hh row j
// `scratch` is unused (kept for ABI stability).
void grk_fwd97_level(const float* x, int h, int w, float* ll, float* hl,
                     float* lh, float* hh, float* scratch) {
  (void)scratch;
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  if (h == 0) return;
  float* buf = row_scratch<float>(7 * w + 2 * (ew + 1));
  float* d0c = buf;          // d0[j]
  float* d0n = buf + w;      // d0[j+1]
  float* s1c = buf + 2 * w;  // s1[j]
  float* s1n = buf + 3 * w;  // s1[j+1]
  float* d2p = buf + 4 * w;  // d2[j-1]
  float* d2c = buf + 5 * w;  // d2[j]
  float* trow = buf + 6 * w;
  float* ev = buf + 7 * w;
  float* od = ev + ew + 1;
  if (h == 1) {  // vertical pass is just the low-band scale
    for (int i = 0; i < w; i++) trow[i] = x[i] * (1.0f / KK);
    fwd97_row(trow, w, ll, hl, ev, od);
    return;
  }
  {  // d0[0], s1[0] prologue (clamped d0[-1] = d0[0])
    const float* a = x;
    const float* b = a + w;
    const float* c = (2 < h) ? b + w : a;
    for (int i = 0; i < w; i++) d0c[i] = b[i] + ALPHA * (a[i] + c[i]);
    for (int i = 0; i < w; i++) s1c[i] = a[i] + BETA * (d0c[i] + d0c[i]);
  }
  for (int j = 0; j < eh; j++) {
    if (j + 1 < eh) {
      if (j + 1 < oh) {
        const float* a = x + (size_t)(2 * j + 2) * w;
        const float* b = a + w;
        const float* c = (2 * j + 4 < h) ? b + w : a;
        for (int i = 0; i < w; i++) d0n[i] = b[i] + ALPHA * (a[i] + c[i]);
      } else {  // mirror d0[min(j+1, oh-1)]
        grk_copy_bytes(d0n, d0c, sizeof(float) * w);
      }
      const float* a = x + (size_t)(2 * j + 2) * w;
      for (int i = 0; i < w; i++)
        s1n[i] = a[i] + BETA * (d0c[i] + d0n[i]);
    }
    if (j < oh) {
      const float* sr = (j + 1 < eh) ? s1n : s1c;  // bottom mirror
      for (int i = 0; i < w; i++)
        d2c[i] = d0c[i] + GAMMA * (s1c[i] + sr[i]);
    }
    const float* dl = (j > 0) ? d2p : d2c;
    const float* dr = (j < oh) ? d2c : d2p;
    for (int i = 0; i < w; i++)
      trow[i] = (s1c[i] + DELTA * (dl[i] + dr[i])) * (1.0f / KK);
    fwd97_row(trow, w, ll + (size_t)j * ew, hl + (size_t)j * ow, ev, od);
    if (j < oh) {
      for (int i = 0; i < w; i++) trow[i] = d2c[i] * KK;
      fwd97_row(trow, w, lh + (size_t)j * ew, hh + (size_t)j * ow, ev,
                od);
    }
    float* t = d2p;
    d2p = d2c;
    d2c = t;
    t = d0c;
    d0c = d0n;
    d0n = t;
    t = s1c;
    s1c = s1n;
    s1n = t;
  }
}

void grk_inv97_level(const float* ll, const float* hl, const float* lh,
                     const float* hh, int h, int w, float* out,
                     float* scratch) {
  (void)scratch;
  int ew = (w + 1) / 2, ow = w / 2;
  float* buf = row_scratch<float>(7 * w + 2 * (ew + 1));
  float* ev = buf + 7 * w;
  float* od = ev + ew + 1;
  inv97_fused(
      h, w, out, buf,
      [&](int j, float* dst) {
        inv97_row(ll + (size_t)j * ew, hl + (size_t)j * ow, w, dst, ev,
                  od);
        for (int i = 0; i < w; i++) dst[i] *= KK;
      },
      [&](int j, float* dst) {
        inv97_row(lh + (size_t)j * ew, hh + (size_t)j * ow, w, dst, ev,
                  od);
        for (int i = 0; i < w; i++) dst[i] *= (1.0f / KK);
      });
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
  (void)scratch;
  int ew = (w + 1) / 2, ow = w / 2;
  float* buf = row_scratch<float>(7 * w + 2 * (ew + 1));
  float* ev = buf + 7 * w;
  float* od = ev + ew + 1;
  inv97_fused(
      h, w, out, buf,
      [&](int j, float* dst) {
        if (dq_ll)
          inv97_row_t<true, true>((const int32_t*)ll + (size_t)j * ew,
                                  (const int32_t*)hl + (size_t)j * ow, w,
                                  dst, ev, od, dll, dhl);
        else
          inv97_row_t<false, true>((const float*)ll + (size_t)j * ew,
                                   (const int32_t*)hl + (size_t)j * ow,
                                   w, dst, ev, od, 0.0f, dhl);
        for (int i = 0; i < w; i++) dst[i] *= KK;
      },
      [&](int j, float* dst) {
        inv97_row_t<true, true>((const int32_t*)lh + (size_t)j * ew,
                                (const int32_t*)hh + (size_t)j * ow, w,
                                dst, ev, od, dlh, dhh);
        for (int i = 0; i < w; i++) dst[i] *= (1.0f / KK);
      });
}

}  // extern "C"
