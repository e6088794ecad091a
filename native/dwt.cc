// Native reversible 5/3 DWT, both directions (ISO/IEC 15444-1 Annex F).
//
// Parity: WaveletFwd / WaveletReverse (SURVEY.md §2.1 "Wavelet") — the
// host-side production path for even-parity tile-components (tiles at
// even canvas origins; odd-parity rects keep the numpy reference).
// Row-major int32 planes; vertical lifting runs row-at-a-time so the
// compiler vectorizes across the width (AVX2/AVX-512 via -march=native).
// Bit-identical to grok_tpu/transform/dwt.py (differential-tested).

#include <cstdint>
#include <cstring>
#include <vector>

#include "util.h"

namespace {

// Vertical (column) lifting over a (h x w) plane with row stride `w`.
// Even-parity origin: lows at even rows.  In-place into lo/hi halves of
// a scratch buffer laid out as ceil(h/2) low rows then floor(h/2) high
// rows (still width w).
static void fwd53_vertical(const int32_t* x, int h, int w, int32_t* out) {
  int ne = (h + 1) / 2, no = h / 2;
  int32_t* lo = out;
  int32_t* hi = out + (size_t)ne * w;
  if (h == 1) {
    grk_copy_bytes(lo, x, sizeof(int32_t) * w);
    return;
  }
  // d[j] = x[2j+1] - ((x[2j] + x[2j+2]) >> 1), mirror at the bottom
  for (int j = 0; j < no; j++) {
    const int32_t* a = x + (size_t)(2 * j) * w;
    const int32_t* b = x + (size_t)(2 * j + 1) * w;
    const int32_t* c = (2 * j + 2 < h) ? x + (size_t)(2 * j + 2) * w : a;
    int32_t* d = hi + (size_t)j * w;
    for (int i = 0; i < w; i++) d[i] = b[i] - ((a[i] + c[i]) >> 1);
  }
  // s[j] = x[2j] + ((d[j-1] + d[j] + 2) >> 2), mirrors at both ends
  for (int j = 0; j < ne; j++) {
    const int32_t* a = x + (size_t)(2 * j) * w;
    const int32_t* dl = hi + (size_t)(j > 0 ? j - 1 : 0) * w;
    const int32_t* dr = hi + (size_t)(j < no ? j : no - 1) * w;
    int32_t* s = lo + (size_t)j * w;
    for (int i = 0; i < w; i++) s[i] = a[i] + ((dl[i] + dr[i] + 2) >> 2);
  }
}

static void inv53_vertical(const int32_t* lo, const int32_t* hi, int h,
                           int w, int32_t* out) {
  int ne = (h + 1) / 2, no = h / 2;
  if (h == 1) {
    grk_copy_bytes(out, lo, sizeof(int32_t) * w);
    return;
  }
  // x[2j] = s[j] - ((d[j-1] + d[j] + 2) >> 2)
  for (int j = 0; j < ne; j++) {
    const int32_t* s = lo + (size_t)j * w;
    const int32_t* dl = hi + (size_t)(j > 0 ? j - 1 : 0) * w;
    const int32_t* dr = hi + (size_t)(j < no ? j : no - 1) * w;
    int32_t* e = out + (size_t)(2 * j) * w;
    for (int i = 0; i < w; i++) e[i] = s[i] - ((dl[i] + dr[i] + 2) >> 2);
  }
  // x[2j+1] = d[j] + ((x[2j] + x[2j+2]) >> 1)
  for (int j = 0; j < no; j++) {
    const int32_t* d = hi + (size_t)j * w;
    const int32_t* a = out + (size_t)(2 * j) * w;
    const int32_t* c =
        (2 * j + 2 < h) ? out + (size_t)(2 * j + 2) * w : a;
    int32_t* o = out + (size_t)(2 * j + 1) * w;
    for (int i = 0; i < w; i++) o[i] = d[i] + ((a[i] + c[i]) >> 1);
  }
}

// Horizontal lifting of one row into (lo | hi) halves of `out`.
static inline void fwd53_row(const int32_t* x, int n, int32_t* out) {
  int ne = (n + 1) / 2, no = n / 2;
  int32_t* lo = out;
  int32_t* hi = out + ne;
  if (n == 1) {
    lo[0] = x[0];
    return;
  }
  for (int j = 0; j < no; j++) {
    int32_t a = x[2 * j];
    int32_t c = (2 * j + 2 < n) ? x[2 * j + 2] : a;
    hi[j] = x[2 * j + 1] - ((a + c) >> 1);
  }
  for (int j = 0; j < ne; j++) {
    int32_t dl = hi[j > 0 ? j - 1 : 0];
    int32_t dr = hi[j < no ? j : no - 1];
    lo[j] = x[2 * j] + ((dl + dr + 2) >> 2);
  }
}

static inline void inv53_row(const int32_t* lo, const int32_t* hi, int n,
                             int32_t* out) {
  int ne = (n + 1) / 2, no = n / 2;
  if (n == 1) {
    out[0] = lo[0];
    return;
  }
  for (int j = 0; j < ne; j++) {
    int32_t dl = hi[j > 0 ? j - 1 : 0];
    int32_t dr = hi[j < no ? j : no - 1];
    out[2 * j] = lo[j] - ((dl + dr + 2) >> 2);
  }
  for (int j = 0; j < no; j++) {
    int32_t a = out[2 * j];
    int32_t c = (2 * j + 2 < n) ? out[2 * j + 2] : a;
    out[2 * j + 1] = hi[j] + ((a + c) >> 1);
  }
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
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2;
  fwd53_vertical(x, h, w, scratch);  // scratch: lo rows then hi rows
  std::vector<int32_t> row(w);
  for (int y = 0; y < eh; y++) {
    fwd53_row(scratch + (size_t)y * w, w, row.data());
    grk_copy_bytes(ll + (size_t)y * ew, row.data(), sizeof(int32_t) * ew);
    grk_copy_bytes(hl + (size_t)y * ow, row.data() + ew, sizeof(int32_t) * ow);
  }
  int oh = h / 2;
  for (int y = 0; y < oh; y++) {
    fwd53_row(scratch + (size_t)(eh + y) * w, w, row.data());
    grk_copy_bytes(lh + (size_t)y * ew, row.data(), sizeof(int32_t) * ew);
    grk_copy_bytes(hh + (size_t)y * ow, row.data() + ew, sizeof(int32_t) * ow);
  }
}

// One inverse 5/3 level -> (h x w) plane `out`.
void grk_inv53_level(const int32_t* ll, const int32_t* hl,
                     const int32_t* lh, const int32_t* hh, int h, int w,
                     int32_t* out, int32_t* scratch) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  // horizontal inverses into the (lo rows | hi rows) scratch layout
  std::vector<int32_t> lo(ew), hi(ow > 0 ? ow : 1);
  for (int y = 0; y < eh; y++) {
    grk_copy_bytes(lo.data(), ll + (size_t)y * ew, sizeof(int32_t) * ew);
    grk_copy_bytes(hi.data(), hl + (size_t)y * ow, sizeof(int32_t) * ow);
    inv53_row(lo.data(), hi.data(), w, scratch + (size_t)y * w);
  }
  for (int y = 0; y < oh; y++) {
    grk_copy_bytes(lo.data(), lh + (size_t)y * ew, sizeof(int32_t) * ew);
    grk_copy_bytes(hi.data(), hh + (size_t)y * ow, sizeof(int32_t) * ow);
    inv53_row(lo.data(), hi.data(), w, scratch + (size_t)(eh + y) * w);
  }
  inv53_vertical(scratch, scratch + (size_t)eh * w, h, w, out);
}

}  // extern "C"

// ------------------------------------------------------------ 9/7 (float)
// Irreversible lifting mirroring transform/dwt.py::_fwd_97_even /
// _inv_97_even: same step order and float32 arithmetic, even-parity
// origins (odd-parity rects keep the numpy path).

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

static void inv97_vertical(const float* lo_in, const float* hi_in, int h,
                           int w, float* out, float* tmp) {
  int ne = (h + 1) / 2, no = h / 2;
  float* lo = tmp;
  float* hi = tmp + (size_t)ne * w;
  if (h == 1) {
    for (int i = 0; i < w; i++) out[i] = lo_in[i] * KK;
    return;
  }
  for (int j = 0; j < ne * w; j++) lo[j] = lo_in[j] * KK;
  for (int j = 0; j < no * w; j++) hi[j] = hi_in[j] * (1.0f / KK);
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

static inline void fwd97_row(const float* x, int n, float* out) {
  int ne = (n + 1) / 2, no = n / 2;
  float* lo = out;
  float* hi = out + ne;
  if (n == 1) {
    lo[0] = x[0] * (1.0f / KK);
    return;
  }
  for (int j = 0; j < ne; j++) lo[j] = x[2 * j];
  for (int j = 0; j < no; j++) hi[j] = x[2 * j + 1];
  for (int j = 0; j < no; j++)
    hi[j] += ALPHA * (lo[j] + lo[j + 1 < ne ? j + 1 : j]);
  for (int j = 0; j < ne; j++)
    lo[j] += BETA * (hi[j > 0 ? j - 1 : 0] + hi[j < no ? j : no - 1]);
  for (int j = 0; j < no; j++)
    hi[j] += GAMMA * (lo[j] + lo[j + 1 < ne ? j + 1 : j]);
  for (int j = 0; j < ne; j++)
    lo[j] += DELTA * (hi[j > 0 ? j - 1 : 0] + hi[j < no ? j : no - 1]);
  for (int j = 0; j < ne; j++) lo[j] *= (1.0f / KK);
  for (int j = 0; j < no; j++) hi[j] *= KK;
}

static inline void inv97_row(const float* lo_in, const float* hi_in,
                             int n, float* out, float* tmp) {
  int ne = (n + 1) / 2, no = n / 2;
  float* lo = tmp;
  float* hi = tmp + ne;
  if (n == 1) {
    out[0] = lo_in[0] * KK;
    return;
  }
  for (int j = 0; j < ne; j++) lo[j] = lo_in[j] * KK;
  for (int j = 0; j < no; j++) hi[j] = hi_in[j] * (1.0f / KK);
  for (int j = 0; j < ne; j++)
    lo[j] -= DELTA * (hi[j > 0 ? j - 1 : 0] + hi[j < no ? j : no - 1]);
  for (int j = 0; j < no; j++)
    hi[j] -= GAMMA * (lo[j] + lo[j + 1 < ne ? j + 1 : j]);
  for (int j = 0; j < ne; j++)
    lo[j] -= BETA * (hi[j > 0 ? j - 1 : 0] + hi[j < no ? j : no - 1]);
  for (int j = 0; j < no; j++)
    hi[j] -= ALPHA * (lo[j] + lo[j + 1 < ne ? j + 1 : j]);
  for (int j = 0; j < ne; j++) out[2 * j] = lo[j];
  for (int j = 0; j < no; j++) out[2 * j + 1] = hi[j];
}

}  // namespace

extern "C" {

void grk_fwd97_level(const float* x, int h, int w, float* ll, float* hl,
                     float* lh, float* hh, float* scratch) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  fwd97_vertical(x, h, w, scratch);
  std::vector<float> row(w);
  for (int y = 0; y < eh; y++) {
    fwd97_row(scratch + (size_t)y * w, w, row.data());
    grk_copy_bytes(ll + (size_t)y * ew, row.data(), sizeof(float) * ew);
    grk_copy_bytes(hl + (size_t)y * ow, row.data() + ew, sizeof(float) * ow);
  }
  for (int y = 0; y < oh; y++) {
    fwd97_row(scratch + (size_t)(eh + y) * w, w, row.data());
    grk_copy_bytes(lh + (size_t)y * ew, row.data(), sizeof(float) * ew);
    grk_copy_bytes(hh + (size_t)y * ow, row.data() + ew, sizeof(float) * ow);
  }
}

void grk_inv97_level(const float* ll, const float* hl, const float* lh,
                     const float* hh, int h, int w, float* out,
                     float* scratch) {
  int eh = (h + 1) / 2, ew = (w + 1) / 2, ow = w / 2, oh = h / 2;
  // horizontal inverses into (lo rows | hi rows) of scratch
  std::vector<float> lo(ew), hi(ow > 0 ? ow : 1), tmp(w);
  for (int y = 0; y < eh; y++) {
    grk_copy_bytes(lo.data(), ll + (size_t)y * ew, sizeof(float) * ew);
    grk_copy_bytes(hi.data(), hl + (size_t)y * ow, sizeof(float) * ow);
    inv97_row(lo.data(), hi.data(), w, scratch + (size_t)y * w, tmp.data());
  }
  for (int y = 0; y < oh; y++) {
    grk_copy_bytes(lo.data(), lh + (size_t)y * ew, sizeof(float) * ew);
    grk_copy_bytes(hi.data(), hh + (size_t)y * ow, sizeof(float) * ow);
    inv97_row(lo.data(), hi.data(), w,
              scratch + (size_t)(eh + y) * w, tmp.data());
  }
  std::vector<float> vtmp((size_t)h * w);
  inv97_vertical(scratch, scratch + (size_t)eh * w, h, w, out, vtmp.data());
}

}  // extern "C"
