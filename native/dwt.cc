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
    std::memcpy(lo, x, sizeof(int32_t) * w);
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
    std::memcpy(out, lo, sizeof(int32_t) * w);
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
    std::memcpy(ll + (size_t)y * ew, row.data(), sizeof(int32_t) * ew);
    std::memcpy(hl + (size_t)y * ow, row.data() + ew, sizeof(int32_t) * ow);
  }
  int oh = h / 2;
  for (int y = 0; y < oh; y++) {
    fwd53_row(scratch + (size_t)(eh + y) * w, w, row.data());
    std::memcpy(lh + (size_t)y * ew, row.data(), sizeof(int32_t) * ew);
    std::memcpy(hh + (size_t)y * ow, row.data() + ew, sizeof(int32_t) * ow);
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
    std::memcpy(lo.data(), ll + (size_t)y * ew, sizeof(int32_t) * ew);
    std::memcpy(hi.data(), hl + (size_t)y * ow, sizeof(int32_t) * ow);
    inv53_row(lo.data(), hi.data(), w, scratch + (size_t)y * w);
  }
  for (int y = 0; y < oh; y++) {
    std::memcpy(lo.data(), lh + (size_t)y * ew, sizeof(int32_t) * ew);
    std::memcpy(hi.data(), hh + (size_t)y * ow, sizeof(int32_t) * ow);
    inv53_row(lo.data(), hi.data(), w, scratch + (size_t)(eh + y) * w);
  }
  inv53_vertical(scratch, scratch + (size_t)eh * w, h, w, out);
}

}  // extern "C"
