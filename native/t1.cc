// Native EBCOT Tier-1 batch coder (MQ path).
//
// Parity: the reference's T1Part1 + mqc engine (SURVEY.md §2.1 "Tier-1
// Part 1") — here as a C ABI batch API so Python can hand entire
// codeblock batches to a thread pool (SURVEY.md §2.3: the reference uses a
// Taskflow DAG over codeblocks; we use std::thread over a job queue).
//
// The algorithm is a direct translation of the oracle-validated Python
// reference in grok_tpu/t1/coder.py + mq.py (ISO/IEC 15444-1 Annexes C/D);
// differential-tested against it in tests/test_native_t1.py.

#include <atomic>
#include <cmath>
#include <limits>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "util.h"

#if defined(__BMI2__)
#include <immintrin.h>
#endif
#if defined(__x86_64__)
#include <x86intrin.h>
#endif

namespace {

// pass-granularity cycle profiling (dev tool, ~nil overhead at pass
// granularity; single-threaded accuracy only): [enc=0/dec=1][sig,ref,cln,setup]
static uint64_t g_prof_cycles[2][4];
static uint64_t g_prof_count[2][4];
static inline uint64_t prof_tsc() {
#if defined(__x86_64__)
  return __rdtsc();
#else
  return 0;
#endif
}

// ---------------------------------------------------------------- MQ coder

struct QeRow { uint16_t qe; uint8_t nmps, nlps, sw; };
static const QeRow QE[47] = {
  {0x5601,1,1,1},{0x3401,2,6,0},{0x1801,3,9,0},{0x0AC1,4,12,0},
  {0x0521,5,29,0},{0x0221,38,33,0},{0x5601,7,6,1},{0x5401,8,14,0},
  {0x4801,9,14,0},{0x3801,10,14,0},{0x3001,11,17,0},{0x2401,12,18,0},
  {0x1C01,13,20,0},{0x1601,29,21,0},{0x5601,15,14,1},{0x5401,16,14,0},
  {0x5101,17,15,0},{0x4801,18,16,0},{0x3801,19,17,0},{0x3401,20,18,0},
  {0x3001,21,19,0},{0x2801,22,19,0},{0x2401,23,20,0},{0x2201,24,21,0},
  {0x1C01,25,22,0},{0x1801,26,23,0},{0x1601,27,24,0},{0x1401,28,25,0},
  {0x1201,29,26,0},{0x1101,30,27,0},{0x0AC1,31,28,0},{0x09C1,32,29,0},
  {0x08A1,33,30,0},{0x0521,34,31,0},{0x0441,35,32,0},{0x02A1,36,33,0},
  {0x0221,37,34,0},{0x0141,38,35,0},{0x0111,39,36,0},{0x0085,40,37,0},
  {0x0049,41,38,0},{0x0025,42,39,0},{0x0015,43,40,0},{0x0009,44,41,0},
  {0x0005,45,42,0},{0x0001,45,43,0},{0x5601,46,46,0},
};

enum { NCTX = 19, CTX_ZC = 0, CTX_SC = 9, CTX_MAG = 14, CTX_RL = 17,
       CTX_UNI = 18 };

// Context state packed as si = state*2 + mps so the (d == MPS) test is a
// bit operation instead of a mispredicting branch; QE2 carries the si
// transitions with SWITCH folded into the LPS target.
struct QeRow2 { uint32_t qe; uint8_t nmps, nlps; };
struct Qe2Table {
  QeRow2 t[94];
  Qe2Table() {
    for (int s = 0; s < 47; s++) {
      for (int mps = 0; mps < 2; mps++) {
        QeRow2& r = t[s * 2 + mps];
        r.qe = QE[s].qe;
        r.nmps = (uint8_t)(QE[s].nmps * 2 + mps);
        r.nlps = (uint8_t)(QE[s].nlps * 2 + (mps ^ QE[s].sw));
      }
    }
  }
};
static const Qe2Table QE2;

typedef uint8_t Ctx;  // si = state*2 + mps

static void init_ctxs(Ctx* c) {
  std::memset(c, 0, sizeof(Ctx) * NCTX);
  c[CTX_ZC] = 4 * 2;
  c[CTX_RL] = 3 * 2;
  c[CTX_UNI] = 46 * 2;
}

struct MQEnc {
  uint32_t a = 0x8000, c = 0, ct = 12;
  // arena-backed output: bp points at the last written byte (bp == b0 is
  // the fake leading byte).  A raw pointer keeps byteout() free of the
  // vector capacity check that showed up in the hot-loop profile.
  uint8_t* b0 = nullptr;
  uint8_t* bp = nullptr;
  uint8_t* bend = nullptr;  // growth trigger: byteout writes <=2 bytes
  std::vector<uint8_t> arena;
  Ctx ctx[NCTX];

  explicit MQEnc(size_t cap = 8192) {
    arena.resize(cap + 32);
    init_ctxs(ctx);
    restart();
  }
  void restart() {
    a = 0x8000; c = 0; ct = 12;
    b0 = bp = arena.data();
    bend = arena.data() + arena.size();
    *bp = 0;
  }
  // Out-of-line growth: the sizing bound below byteout() covers every
  // legal input, but a worst-case aggregated cleanup pass can exceed the
  // amortized estimate mid-pass — grow instead of smashing the heap.
  __attribute__((noinline)) void grow() {
    size_t off = (size_t)(bp - arena.data());  // b0 == arena.data() always
    arena.resize(arena.size() * 2);
    b0 = arena.data();
    bp = b0 + off;
    bend = b0 + arena.size();
  }

  void byteout() {
    if (bp + 2 >= bend) grow();
    if (*bp == 0xFF) {
      *++bp = (c >> 20) & 0xFF; c &= 0xFFFFF; ct = 7;
    } else if (c < 0x8000000) {
      *++bp = (c >> 19) & 0xFF; c &= 0x7FFFF; ct = 8;
    } else {
      (*bp)++;
      if (*bp == 0xFF) {
        c &= 0x7FFFFFF;
        *++bp = (c >> 20) & 0xFF; c &= 0xFFFFF; ct = 7;
      } else {
        *++bp = (c >> 19) & 0xFF; c &= 0x7FFFF; ct = 8;
      }
    }
  }
  // bulk renormalization; only called on the renorm path (encode() takes
  // an early return when a keeps bit 15 after an MPS)
  inline void renorm() {
    int n = __builtin_clz((unsigned)a) - 16;  // shifts to reach bit 15
    while (n >= (int)ct) {
      int s = (int)ct;
      a <<= s;
      c <<= s;
      n -= s;
      ct = 0;
      byteout();
    }
    a = (uint32_t)(a << n) & 0xFFFF;
    c <<= n;
    ct -= (uint32_t)n;
    if (ct == 0) byteout();
  }
  inline void encode(int d, int cn) {
    Ctx si = ctx[cn];
    const QeRow2& q = QE2.t[si];
    uint32_t qe = q.qe;
    uint32_t a2 = a - qe;
    if (((d ^ si) & 1) == 0 && (a2 & 0x8000)) {  // MPS without renorm
      a = a2;
      c += qe;
      return;
    }
    uint32_t is_lps = (uint32_t)(d ^ si) & 1;
    uint32_t small = a2 < qe;
    c += (small ^ is_lps ^ 1) ? qe : 0;
    a = (small ^ is_lps) ? qe : a2;
    ctx[cn] = is_lps ? q.nlps : q.nmps;
    renorm();
  }
  int num_bytes() const { return (int)(bp - b0); }
  // flush into out (appends); returns bytes appended
  int flush(std::vector<uint8_t>& out) {
    uint32_t tempc = c + a;
    c |= 0xFFFF;
    if (c >= tempc) c -= 0x8000;
    c <<= ct; byteout();
    c <<= ct; byteout();
    uint8_t* end = bp + 1;
    if (end[-1] == 0xFF) end--;
    out.insert(out.end(), b0 + 1, end);
    return (int)(end - (b0 + 1));
  }
};

struct MQDec {
  uint32_t a = 0, c = 0, ct = 0;
  const uint8_t* data = nullptr;
  int len = 0, bp = 0;
  Ctx ctx[NCTX];

  void init_ctx() { init_ctxs(ctx); }
  uint8_t at(int i) const { return (i >= 0 && i < len) ? data[i] : 0xFF; }
  void bytein() {
    if (at(bp) == 0xFF) {
      if (at(bp + 1) > 0x8F) { c += 0xFF00; ct = 8; }
      else { bp++; c += (uint32_t)at(bp) << 9; ct = 7; }
    } else { bp++; c += (uint32_t)at(bp) << 8; ct = 8; }
  }
  void init_seg(const uint8_t* d, int l) {
    data = d; len = l; bp = 0;
    c = (uint32_t)at(0) << 16;
    bytein();
    c <<= 7; ct -= 7; a = 0x8000;
  }
  // no-op when a already has bit 15 set, mirroring MQEnc::renorm
  inline void renorm() {
    int n = __builtin_clz((unsigned)(a & 0xFFFF)) - 16;
    a = (uint32_t)(a << n) & 0xFFFF;
    while (n > 0) {
      if (ct == 0) bytein();
      int s = n < (int)ct ? n : (int)ct;
      c <<= s;
      ct -= (uint32_t)s;
      n -= s;
    }
  }
  inline int decode(int cn) {
    Ctx si = ctx[cn];
    const QeRow2& q = QE2.t[si];
    uint32_t qe = q.qe;
    uint32_t mps = si & 1;
    uint32_t a2 = a - qe;
    uint32_t chigh = (c >> 16) & 0xFFFF;
    if (chigh >= qe && (a2 & 0x8000)) {       // MPS without renorm
      c -= qe << 16;
      a = a2;
      return (int)mps;
    }
    uint32_t ge = chigh >= qe;
    c -= ge ? qe << 16 : 0;
    uint32_t small = a2 < qe;
    uint32_t lps = (small == ge);             // renorm path takes LPS when
                                              // conditional exchange says so
    a = ge ? a2 : qe;
    ctx[cn] = lps ? q.nlps : q.nmps;
    renorm();
    return (int)(mps ^ lps);
  }
};

// raw (bypass) coders
struct RawEnc {
  std::vector<uint8_t> buf;
  uint32_t acc = 0, used = 0, cap = 8;
  inline void encode(int d) {
    acc = (acc << 1) | (d & 1);
    if (++used == cap) {
      buf.push_back((uint8_t)acc);
      cap = (acc == 0xFF) ? 7 : 8;
      acc = 0; used = 0;
    }
  }
  // append n (<=16) bits, MSB first — one boundary check per byte at most
  inline void encode_n(uint32_t bits, int n) {
    while (n > 0) {
      int room = (int)(cap - used);
      int take = n < room ? n : room;
      acc = (acc << take) | ((bits >> (n - take)) & ((1u << take) - 1));
      used += (uint32_t)take;
      n -= take;
      if (used == cap) {
        buf.push_back((uint8_t)acc);
        cap = (acc == 0xFF) ? 7 : 8;
        acc = 0; used = 0;
      }
    }
  }
  int num_bytes() const { return (int)buf.size() + (used ? 1 : 0); }
  int flush(std::vector<uint8_t>& out) {
    if (used) {
      acc <<= (cap - used);
      buf.push_back((uint8_t)acc);
      acc = 0; used = 0; cap = 8;
    }
    size_t n = buf.size();
    if (n && buf[n - 1] == 0xFF) n--;
    out.insert(out.end(), buf.begin(), buf.begin() + n);
    int r = (int)n;
    buf.clear();
    return r;
  }
};

struct RawDec {
  const uint8_t* data = nullptr;
  int len = 0, pos = 0;
  uint32_t acc = 0, avail = 0;
  bool prev_ff = false;
  void init(const uint8_t* d, int l) {
    data = d; len = l; pos = 0; acc = 0; avail = 0; prev_ff = false;
  }
  inline int decode() {
    if (avail == 0) {
      uint8_t b = (pos < len) ? data[pos] : 0xFF;
      pos++;
      acc = b;
      avail = prev_ff ? 7 : 8;
      prev_ff = (b == 0xFF);
    }
    avail--;
    return (acc >> avail) & 1;
  }
  // read n (<=16) bits MSB first — one refill check per byte at most
  inline uint32_t decode_n(int n) {
    uint32_t out = 0;
    while (n > 0) {
      if (avail == 0) {
        uint8_t b = (pos < len) ? data[pos] : 0xFF;
        pos++;
        acc = b;
        avail = prev_ff ? 7 : 8;
        prev_ff = (b == 0xFF);
      }
      int take = n < (int)avail ? n : (int)avail;
      avail -= (uint32_t)take;
      out = (out << take) | ((acc >> avail) & ((1u << take) - 1));
      n -= take;
    }
    return out;
  }
};

// ------------------------------------------------------------ EBCOT passes

// style bits (match grok_tpu.params.CblkStyle)
enum { STY_LAZY = 1, STY_RESET = 2, STY_TERMALL = 4, STY_VSC = 8,
       STY_PTERM = 16, STY_SEGSYM = 32 };

// ZC context tables (ISO 15444-1 Table D.1); HL transposes H and V
static inline int zc_ctx(int h, int v, int d, int orient) {
  if (orient == 3) {  // HH
    int hv = h + v;
    if (d >= 3) return 8;
    if (d == 2) return hv >= 1 ? 7 : 6;
    if (d == 1) { if (hv >= 2) return 5; return hv == 1 ? 4 : 3; }
    if (hv >= 2) return 2;
    return hv == 1 ? 1 : 0;
  }
  if (orient == 1) { int t = h; h = v; v = t; }  // HL: transpose
  if (h == 2) return 8;
  if (h == 1) { if (v >= 1) return 7; return d >= 1 ? 6 : 5; }
  if (v == 2) return 4;
  if (v == 1) return 3;
  if (d >= 2) return 2;
  return d == 1 ? 1 : 0;
}

// SC context Table D.2 (mirrors _SC_TABLE in grok_tpu/t1/coder.py):
//   ( 1, 1)->(4,0) ( 1,0)->(3,0) ( 1,-1)->(2,0)
//   ( 0, 1)->(1,0) ( 0,0)->(0,0) ( 0,-1)->(1,1)
//   (-1, 1)->(2,1) (-1,0)->(3,1) (-1,-1)->(4,1)
static inline void sc_ctx(int hc, int vc, int* cn, int* xorbit) {
  int hi = 1 - hc;  // hc=1 -> 0, hc=0 -> 1, hc=-1 -> 2
  int vi = 1 - vc;
  static const int8_t OFF[3][3] = {{4, 3, 2}, {1, 0, 1}, {2, 3, 4}};
  static const int8_t XR[3][3] = {{0, 0, 0}, {0, 0, 1}, {1, 1, 1}};
  *cn = CTX_SC + OFF[hi][vi];
  *xorbit = XR[hi][vi];
}

// Flags-word state: one uint32 per sample tracks neighborhood
// significance, neighbor signs, and own sig/visited/refined/sign bits, so
// each pass does a single load + LUT instead of 9 neighbor loads
// (SURVEY.md §2.1 "flags array (one u32 per column position...)" — same
// idea, one word per sample).
enum : uint32_t {
  F_NW = 1u << 0, F_N = 1u << 1, F_NE = 1u << 2, F_W = 1u << 3,
  F_E = 1u << 4, F_SW = 1u << 5, F_S = 1u << 6, F_SE = 1u << 7,
  F_WNEG = 1u << 8, F_ENEG = 1u << 9, F_NNEG = 1u << 10, F_SNEG = 1u << 11,
  F_SIG = 1u << 12, F_VIS = 1u << 13, F_REF = 1u << 14, F_NEG = 1u << 15,
};
// VSC: stripe-causal masking of the row below
static const uint32_t VSC_MASK = ~(F_SW | F_S | F_SE | F_SNEG);

// context LUTs built once from the scalar rules above
struct Luts {
  uint8_t zc[4][256];
  uint8_t sc_cn[256];
  uint8_t sc_xor[256];
  Luts() {
    for (int orient = 0; orient < 4; orient++) {
      for (int f = 0; f < 256; f++) {
        int h = ((f >> 3) & 1) + ((f >> 4) & 1);
        int v = ((f >> 1) & 1) + ((f >> 6) & 1);
        int d = (f & 1) + ((f >> 2) & 1) + ((f >> 5) & 1) + ((f >> 7) & 1);
        zc[orient][f] = (uint8_t)zc_ctx(h, v, d, orient);
      }
    }
    for (int idx = 0; idx < 256; idx++) {
      // idx bits follow pext order over SC_MASK (ascending flag-bit
      // position): 0 Nsig 1 Wsig 2 Esig 3 Ssig 4 Wneg 5 Eneg 6 Nneg 7 Sneg
      auto contrib = [&](int sigb, int negb) {
        if (!((idx >> sigb) & 1)) return 0;
        return ((idx >> negb) & 1) ? -1 : 1;
      };
      int hc = contrib(1, 4) + contrib(2, 5);
      int vc = contrib(0, 6) + contrib(3, 7);
      if (hc > 1) hc = 1; if (hc < -1) hc = -1;
      if (vc > 1) vc = 1; if (vc < -1) vc = -1;
      int cn, xb;
      sc_ctx(hc, vc, &cn, &xb);
      sc_cn[idx] = (uint8_t)cn;
      sc_xor[idx] = (uint8_t)xb;
    }
  }
};
static const Luts LUT;

// bits of the flags word that feed sign coding, in pext (ascending) order:
// N(1) W(3) E(4) S(6) WNEG(8) ENEG(9) NNEG(10) SNEG(11)
static const uint32_t SC_MASK =
    F_N | F_W | F_E | F_S | F_WNEG | F_ENEG | F_NNEG | F_SNEG;

static inline int sc_index(uint32_t f) {
#if defined(__BMI2__)
  return (int)_pext_u32(f, SC_MASK);
#else
  return (int)(((f >> 1) & 1) | (((f >> 3) & 1) << 1) |
               (((f >> 4) & 1) << 2) | (((f >> 6) & 1) << 3) |
               (((f >> 8) & 1) << 4) | (((f >> 9) & 1) << 5) |
               (((f >> 10) & 1) << 6) | (((f >> 11) & 1) << 7));
#endif
}

// Stripe-contiguous state layout: the four rows of a stripe-column are
// adjacent words (one cache line per column visit instead of four), and a
// stripe scan walks memory sequentially.  Data coordinates y in [-1, h],
// x in [-1, w]; arithmetic shift maps y=-1 into a border stripe.
struct T1State {
  int h, w;
  int nstripes;
  int n_sig = 0;   // significant samples so far: n_sig == 0 makes the
                   // sig/ref passes no-ops, n_sig == h*w the sig/cleanup
                   // scans (deep-precision noise spends most planes there)
  size_t sstride;  // words per stripe row: (w+2)*4
  std::vector<uint32_t> flags;
  std::vector<uint32_t> mag;
  std::vector<int32_t> rec;

  T1State(int hh, int ww) : h(hh), w(ww) {
    nstripes = (h + 3) >> 2;
    sstride = (size_t)(w + 2) * 4;
    size_t n = (size_t)(nstripes + 2) * sstride;
    flags.assign(n, 0);
    mag.assign(n, 0);
    rec.assign(n, 0);
  }
  inline size_t idx(int y, int x) const {
    return (size_t)((y >> 2) + 1) * sstride + (size_t)(x + 1) * 4 + (y & 3);
  }

  inline void set_sig(size_t i, int k, uint32_t neg) {
    uint32_t* F = flags.data();
    F[i] |= F_SIG;
    n_sig++;
    size_t up = (k > 0) ? i - 1 : i - sstride + 3;
    size_t dn = (k < 3) ? i + 1 : i + sstride - 3;
    F[up - 4] |= F_SE;
    F[up] |= F_S | (neg ? F_SNEG : 0);
    F[up + 4] |= F_SW;
    F[i - 4] |= F_E | (neg ? F_ENEG : 0);
    F[i + 4] |= F_W | (neg ? F_WNEG : 0);
    F[dn - 4] |= F_NE;
    F[dn] |= F_N | (neg ? F_NNEG : 0);
    F[dn + 4] |= F_NW;
  }
  void clear_visited() {
    for (auto& f : flags) f &= ~F_VIS;
  }
};

static inline bool is_raw_pass(int ptype, int bpno, int numbps, int style) {
  return (style & STY_LAZY) && ptype <= 1 && bpno <= numbps - 5;
}
static inline bool is_term_pass(int ptype, int bpno, int numbps, int style,
                                bool last) {
  if (last) return true;
  if (style & STY_TERMALL) return true;
  if (style & STY_LAZY) {
    if (ptype == 2 && bpno <= numbps - 4) return true;
    if (ptype == 1 && bpno <= numbps - 5) return true;
  }
  return false;
}
static inline int64_t first_sig_rec(int bpno) {
  int64_t one = 1LL << bpno;
  return one | (one >> 1);
}
static inline int64_t refined_rec(int64_t old, int bpno, int bit) {
  if (bpno > 0) {
    int64_t half = 1LL << (bpno - 1);
    return bit ? old + half : old - half;
  }
  return bit ? old : old - 1;
}

}  // namespace

// ---------------------------------------------------------------- C ABI

extern "C" {

struct GrkT1EncJob {
  int32_t h, w, orient, style;
  int32_t need_dist;  // 0: skip distortion tracking (single-layer encodes)
  int32_t stride;     // row stride of coeffs in elements (0 -> w): lets
                      // callers pass band-array views without copying
  const int32_t* coeffs;
  uint8_t* out;
  int32_t out_cap;
  int32_t out_len;
  int32_t numbps;
  int32_t num_passes;
  int32_t* pass_rates;   // capacity >= 3*31
  double* pass_dists;
  uint8_t* pass_terms;
  int32_t status;        // 0 ok, 1 output overflow
  int32_t _pad;
  double e0;             // sum of squared magnitudes (need_dist only):
                         // the initial distortion PCRD -q mode starts from
  float delta;           // > 0: coeffs is float32 and ingest applies
                         // dead-zone quantization floor(|v|/delta)
  int32_t roi_shift;     // max-shift ROI upshift applied to magnitudes
  int32_t rate_cap;      // > 0: stop encoding after the first pass whose
                         // cumulative rate reaches this many bytes (the
                         // stream is flushed, so any prefix stays
                         // decodable); rate-quota PCRD uses this to skip
                         // deep passes a byte cap will provably discard
  int32_t* hull_pass;    // out (need_dist only): PCRD convex-hull pass
  double* hull_slope;    // indices + raw (unweighted) slopes — hull
  int32_t hull_n;        // SELECTION is invariant under the uniform
                         // distortion weight Python applies afterwards
  int32_t* hull_rate;    // out: cumulative rate at each hull point
};

struct GrkT1DecJob {
  int32_t h, w, orient, style, numbps, num_passes;
  const uint8_t* data;
  int32_t data_len;
  const int32_t* seg_lens;
  int32_t num_segs;
  int32_t* out;          // doubled-domain signed values
  int32_t out_stride;    // row stride of out in elements (0 -> w); a
                         // strided destination (direct band write) must
                         // arrive pre-zeroed
  int32_t status;
};

// Inverse of grk_stuff_bits: expand a stuffed byte stream into one
// 0/1 byte per bit (8 bits per input byte, 7 after a 0xFF).  Writes
// nbytes*8 entries at most; returns the bit count.
long grk_destuff_bits(const uint8_t* in, long nbytes, uint8_t* out) {
  long n = 0;
  bool prev_ff = false;
  for (long i = 0; i < nbytes; i++) {
    uint8_t b = in[i];
    int avail = prev_ff ? 7 : 8;
    for (int k = avail - 1; k >= 0; k--) out[n++] = (b >> k) & 1;
    prev_ff = (b == 0xFF);
  }
  return n;
}

}  // extern "C"

namespace {

struct DistTrack {
  T1State* st;
  double total = 0;
  bool enabled = true;
  inline void on_sig(size_t i, int bpno) {
    if (!enabled) return;
    int64_t nr = first_sig_rec(bpno);
    int64_t m = st->mag[i];
    int64_t old = st->rec[i];
    total += (double)((m - old) * (m - old) - (m - nr) * (m - nr));
    st->rec[i] = (int32_t)nr;
  }
  inline void on_ref(size_t i, int bpno, int bit) {
    if (!enabled) return;
    int64_t old = st->rec[i];
    int64_t nr = refined_rec(old, bpno, bit);
    int64_t m = st->mag[i];
    total += (double)((m - old) * (m - old) - (m - nr) * (m - nr));
    st->rec[i] = (int32_t)nr;
  }
};

template <bool TRACK>
static void enc_sigpass(T1State& st, int bpno, int orient, bool vsc,
                        MQEnc& mq, RawEnc* raw, DistTrack& dt) {
  // no significant sample -> no neighborhoods; all significant -> all
  // coded: either way the pass codes nothing
  if (st.n_sig == 0 || st.n_sig == st.h * st.w) return;
  const uint32_t one = 1u << bpno;
  const uint8_t* zc = LUT.zc[orient];
  uint32_t* FL = st.flags.data();
  for (int sy = 0; sy < st.h; sy += 4) {
    int rows = std::min(4, st.h - sy);
    size_t i0 = st.idx(sy, 0);
    for (int x = 0; x < st.w; x++, i0 += 4) {
      uint32_t f0 = FL[i0], f1 = FL[i0 + 1], f2 = FL[i0 + 2],
               f3 = FL[i0 + 3];
      if (!((f0 | f1 | f2 | f3) & 0xFF)) continue;           // no neighbors
      if ((f0 & f1 & f2 & f3) & F_SIG) continue;             // all coded
      for (int k = 0; k < rows; k++) {
        size_t i = i0 + k;
        uint32_t F = FL[i];
        if (vsc && k == 3) F &= VSC_MASK;
        if ((F & F_SIG) || !(F & 0xFF)) continue;
        int bit = (st.mag[i] & one) ? 1 : 0;
        if (raw) raw->encode(bit);
        else mq.encode(bit, CTX_ZC + zc[F & 0xFF]);
        if (bit) {
          uint32_t neg = (F & F_NEG) ? 1 : 0;
          if (raw) raw->encode((int)neg);
          else {
            int si = sc_index(F);
            mq.encode((int)(neg ^ LUT.sc_xor[si]), LUT.sc_cn[si]);
          }
          st.set_sig(i, k, neg);
          if (TRACK) dt.on_sig(i, bpno);
        }
        FL[i] |= F_VIS;
      }
    }
  }
}

template <bool TRACK>
static void enc_refpass(T1State& st, int bpno, bool vsc, MQEnc& mq,
                        RawEnc* raw, DistTrack& dt) {
  if (st.n_sig == 0) return;  // nothing significant to refine
  const uint32_t one = 1u << bpno;
  uint32_t* FL = st.flags.data();
  for (int sy = 0; sy < st.h; sy += 4) {
    int rows = std::min(4, st.h - sy);
    size_t i0 = st.idx(sy, 0);
    for (int x = 0; x < st.w; x++, i0 += 4) {
      uint32_t f0 = FL[i0], f1 = FL[i0 + 1], f2 = FL[i0 + 2],
               f3 = FL[i0 + 3];
      if (!((f0 | f1 | f2 | f3) & F_SIG)) continue;      // nothing to refine
      if (!TRACK && raw && rows == 4 &&
          ((f0 & f1 & f2 & f3) & F_SIG) &&
          !((f0 | f1 | f2 | f3) & F_VIS)) {
        // whole column refines raw: batch the four magnitude bits
        uint32_t bits = (((st.mag[i0] >> bpno) & 1) << 3) |
                        (((st.mag[i0 + 1] >> bpno) & 1) << 2) |
                        (((st.mag[i0 + 2] >> bpno) & 1) << 1) |
                        ((st.mag[i0 + 3] >> bpno) & 1);
        raw->encode_n(bits, 4);
        FL[i0] |= F_REF; FL[i0 + 1] |= F_REF;
        FL[i0 + 2] |= F_REF; FL[i0 + 3] |= F_REF;
        continue;
      }
      for (int k = 0; k < rows; k++) {
        size_t i = i0 + k;
        uint32_t F = FL[i];
        if (vsc && k == 3) F &= VSC_MASK;  // stripe-causal MR contexts too
        if (!(F & F_SIG) || (F & F_VIS)) continue;
        int bit = (st.mag[i] & one) ? 1 : 0;
        if (raw) raw->encode(bit);
        else {
          int cn;
          if (!(F & F_REF))
            cn = CTX_MAG + ((F & 0xFF) ? 1 : 0);
          else
            cn = CTX_MAG + 2;
          mq.encode(bit, cn);
        }
        FL[i] |= F_REF;
        if (TRACK) dt.on_ref(i, bpno, bit);
      }
    }
  }
}

template <bool TRACK>
static void enc_clnpass(T1State& st, int bpno, int orient, bool vsc,
                        MQEnc& mq, DistTrack& dt, bool segsym) {
  if (st.n_sig == st.h * st.w) {  // everything coded in earlier passes
    if (segsym) {
      mq.encode(1, CTX_UNI); mq.encode(0, CTX_UNI);
      mq.encode(1, CTX_UNI); mq.encode(0, CTX_UNI);
    }
    return;
  }
  const uint32_t one = 1u << bpno;
  const uint8_t* zc = LUT.zc[orient];
  uint32_t* FL = st.flags.data();
  for (int sy = 0; sy < st.h; sy += 4) {
    int rows = std::min(4, st.h - sy);
    size_t base0 = st.idx(sy, 0);
    for (int x = 0; x < st.w; x++, base0 += 4) {
      int kstart = 0;
      size_t base = base0;
      uint32_t f0 = FL[base], f1 = FL[base + 1], f2 = FL[base + 2],
               f3 = FL[base + 3];
      // skip columns where every sample is already significant or visited
      if ((f0 & (F_SIG | F_VIS)) && (f1 & (F_SIG | F_VIS)) &&
          (f2 & (F_SIG | F_VIS)) && (f3 & (F_SIG | F_VIS)) && rows == 4)
        continue;
      if (rows == 4) {
        uint32_t fv3 = vsc ? (f3 & VSC_MASK) : f3;
        bool agg = !((f0 | f1 | f2 | fv3) & (F_SIG | F_VIS | 0xFF));
        if (agg) {
          int first = 4;
          for (int k = 0; k < 4; k++) {
            if (st.mag[base + k] & one) { first = k; break; }
          }
          mq.encode(first == 4 ? 0 : 1, CTX_RL);
          if (first == 4) continue;
          mq.encode((first >> 1) & 1, CTX_UNI);
          mq.encode(first & 1, CTX_UNI);
          size_t i = base + first;
          uint32_t F = FL[i];
          if (vsc && first == 3) F &= VSC_MASK;
          uint32_t neg = (F & F_NEG) ? 1 : 0;
          int si = sc_index(F);
          mq.encode((int)(neg ^ LUT.sc_xor[si]), LUT.sc_cn[si]);
          st.set_sig(i, first, neg);
          if (TRACK) dt.on_sig(i, bpno);
          kstart = first + 1;
        }
      }
      for (int k = kstart; k < rows; k++) {
        size_t i = base + k;
        uint32_t F = FL[i];
        if (vsc && k == 3) F &= VSC_MASK;
        if (F & (F_SIG | F_VIS)) continue;
        int bit = (st.mag[i] & one) ? 1 : 0;
        mq.encode(bit, CTX_ZC + zc[F & 0xFF]);
        if (bit) {
          uint32_t neg = (F & F_NEG) ? 1 : 0;
          int si = sc_index(F);
          mq.encode((int)(neg ^ LUT.sc_xor[si]), LUT.sc_cn[si]);
          st.set_sig(i, k, neg);
          if (TRACK) dt.on_sig(i, bpno);
        }
      }
    }
  }
  if (segsym) {
    mq.encode(1, CTX_UNI); mq.encode(0, CTX_UNI);
    mq.encode(1, CTX_UNI); mq.encode(0, CTX_UNI);
  }
}

static void encode_one(GrkT1EncJob* j) {
  int h = j->h, w = j->w;
  int cstride = j->stride > 0 ? j->stride : w;
  uint64_t stsc = prof_tsc();
  T1State st(h, w);
  uint32_t maxmag = 0;
  double e0 = 0.0;
  bool want_e0 = j->need_dist != 0;
  int shift = j->roi_shift;
  if (j->delta > 0.0f) {
    // fused dead-zone quantization (floor(|v|/delta), float32 division
    // exactly as the numpy reference) — saves a full-band numpy pass
    const float* cf = (const float*)j->coeffs;
    float delta = j->delta;
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        float v = cf[(size_t)y * cstride + x];
        size_t i = st.idx(y, x);
        uint32_t m = (uint32_t)floorf(fabsf(v) / delta);
        m <<= shift;
        st.mag[i] = m;
        if (v < 0.0f) st.flags[i] |= F_NEG;
        if (m > maxmag) maxmag = m;
        if (want_e0) e0 += (double)m * (double)m;
      }
    }
  } else {
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        int32_t v = j->coeffs[(size_t)y * cstride + x];
        size_t i = st.idx(y, x);
        uint32_t m = v < 0 ? (uint32_t)(-(int64_t)v) : (uint32_t)v;
        m <<= shift;
        st.mag[i] = m;
        if (v < 0) st.flags[i] |= F_NEG;
        if (m > maxmag) maxmag = m;
        if (want_e0) e0 += (double)m * (double)m;
      }
    }
  }
  j->e0 = e0;
  g_prof_cycles[0][3] += prof_tsc() - stsc;
  g_prof_count[0][3]++;
  int numbps = 0;
  while (maxmag >> numbps) numbps++;
  j->numbps = numbps;
  j->num_passes = 0;
  j->out_len = 0;
  j->status = 0;
  if (numbps == 0) return;

  // MQ output bound: <=2.25 decisions/sample/plane, <=8/7 bits out per
  // decision plus per-segment flush slack
  size_t mq_cap = (size_t)h * w * (size_t)numbps / 3 + 1024;
  MQEnc mq(mq_cap);
  RawEnc raw;
  bool raw_active = false;
  std::vector<uint8_t> out;
  DistTrack dt{&st};
  dt.enabled = j->need_dist != 0;
  int style = j->style;
  bool vsc = style & STY_VSC;
  int total_passes = 3 * numbps - 2;
  int passno = 0;

  for (int bpno = numbps - 1; bpno >= 0; bpno--) {
    int pt_first = (bpno == numbps - 1) ? 2 : 0;
    for (int ptype = pt_first; ptype <= 2; ptype++) {
      bool rawp = is_raw_pass(ptype, bpno, numbps, style);
      if (rawp && !raw_active) { raw = RawEnc(); raw_active = true; }
      uint64_t ptsc = prof_tsc();
      if (ptype == 0) {
        if (dt.enabled) enc_sigpass<true>(st, bpno, j->orient, vsc, mq,
                                          rawp ? &raw : nullptr, dt);
        else enc_sigpass<false>(st, bpno, j->orient, vsc, mq,
                                rawp ? &raw : nullptr, dt);
      } else if (ptype == 1) {
        if (dt.enabled) enc_refpass<true>(st, bpno, vsc, mq,
                                          rawp ? &raw : nullptr, dt);
        else enc_refpass<false>(st, bpno, vsc, mq,
                                rawp ? &raw : nullptr, dt);
      } else {
        if (dt.enabled) enc_clnpass<true>(st, bpno, j->orient, vsc, mq, dt,
                                          style & STY_SEGSYM);
        else enc_clnpass<false>(st, bpno, j->orient, vsc, mq, dt,
                                style & STY_SEGSYM);
        st.clear_visited();
      }
      g_prof_cycles[0][ptype] += prof_tsc() - ptsc;
      g_prof_count[0][ptype]++;
      bool last = passno == total_passes - 1;
      bool term = is_term_pass(ptype, bpno, numbps, style, last);
      int rate;
      if (term) {
        if (rawp) { raw.flush(out); raw_active = false; }
        else {
          mq.flush(out);
          Ctx saved[NCTX];
          std::memcpy(saved, mq.ctx, sizeof(saved));
          mq.restart();
          std::memcpy(mq.ctx, saved, sizeof(saved));
        }
        rate = (int)out.size();
      } else {
        int pending = rawp ? raw.num_bytes() + 1 : mq.num_bytes() + 4;
        rate = (int)out.size() + pending;
      }
      if (style & STY_RESET) init_ctxs(mq.ctx);
      j->pass_rates[passno] = rate;
      j->pass_dists[passno] = dt.total;
      j->pass_terms[passno] = term;
      passno++;
      // no post-pass arena guard needed: byteout() grows the arena when
      // within 2 bytes of the end, so a sizing shortfall can't overrun
      if (j->rate_cap > 0 && !last && rate >= j->rate_cap) {
        // rate-quota early stop: flush so every prefix stays decodable
        // (equivalent to a block whose stream simply has fewer passes)
        if (!term) {
          if (rawp) { raw.flush(out); raw_active = false; }
          else mq.flush(out);
          j->pass_rates[passno - 1] = (int)out.size();
        }
        goto capped;
      }
    }
  }
capped:
  j->num_passes = passno;
  int total = (int)out.size();
  for (int i = 0; i < passno; i++)
    if (j->pass_rates[i] > total) j->pass_rates[i] = total;
  for (int i = passno - 2; i >= 0; i--)
    if (j->pass_rates[i] > j->pass_rates[i + 1])
      j->pass_rates[i] = j->pass_rates[i + 1];
  j->hull_n = -1;
  if (dt.enabled && j->hull_pass) {
    // feasible truncation points with strictly decreasing slopes — the
    // mirror of ratecontrol.convex_hull on the unweighted distortions
    // (uniform weighting preserves both the dd<=0 and slope-dominance
    // comparisons, so the selected point set is identical)
    int hn = 0;
    int64_t base_r = 0;
    double base_d = 0.0;
    for (int i = 0; i < passno; i++) {
      int64_t rate = j->pass_rates[i];
      double dist = j->pass_dists[i];
      for (;;) {
        int64_t dr = rate - base_r;
        double dd = dist - base_d;
        if (dd <= 0.0) break;
        double slope = dr <= 0
            ? std::numeric_limits<double>::infinity() : dd / (double)dr;
        if (hn && j->hull_slope[hn - 1] <= slope) {
          hn--;
          if (hn) {
            base_r = j->pass_rates[j->hull_pass[hn - 1]];
            base_d = j->pass_dists[j->hull_pass[hn - 1]];
          } else {
            base_r = 0;
            base_d = 0.0;
          }
          continue;
        }
        j->hull_pass[hn] = i;
        j->hull_slope[hn] = slope;
        j->hull_rate[hn] = (int32_t)rate;
        hn++;
        base_r = rate;
        base_d = dist;
        break;
      }
    }
    j->hull_n = hn;
  }
  if (total > j->out_cap) { j->status = 1; return; }
  grk_copy_bytes(j->out, out.data(), total);  // empty vec: null .data()
  j->out_len = total;
}

// ------------------------------------------------------------- decoder

static void dec_sigpass(T1State& st, int bpno_rec, int orient,
                        bool vsc, MQDec& mq, RawDec* raw) {
  if (st.n_sig == 0 || st.n_sig == st.h * st.w) return;
  const uint8_t* zc = LUT.zc[orient];
  uint32_t* FL = st.flags.data();
  for (int sy = 0; sy < st.h; sy += 4) {
    int rows = std::min(4, st.h - sy);
    size_t i0 = st.idx(sy, 0);
    for (int x = 0; x < st.w; x++, i0 += 4) {
      uint32_t f0 = FL[i0], f1 = FL[i0 + 1], f2 = FL[i0 + 2],
               f3 = FL[i0 + 3];
      if (!((f0 | f1 | f2 | f3) & 0xFF)) continue;
      if ((f0 & f1 & f2 & f3) & F_SIG) continue;
      for (int k = 0; k < rows; k++) {
        size_t i = i0 + k;
        uint32_t F = FL[i];
        if (vsc && k == 3) F &= VSC_MASK;
        if ((F & F_SIG) || !(F & 0xFF)) continue;
        int bit = raw ? raw->decode()
                      : mq.decode(CTX_ZC + zc[F & 0xFF]);
        if (bit) {
          uint32_t neg;
          if (raw) neg = (uint32_t)raw->decode();
          else {
            int si = sc_index(F);
            neg = (uint32_t)(mq.decode(LUT.sc_cn[si]) ^ LUT.sc_xor[si]);
          }
          if (neg) FL[i] |= F_NEG;
          st.set_sig(i, k, neg);
          st.rec[i] = (int32_t)first_sig_rec(bpno_rec);
        }
        FL[i] |= F_VIS;
      }
    }
  }
}

static void dec_refpass(T1State& st, int bpno_rec, bool vsc, MQDec& mq,
                        RawDec* raw) {
  if (st.n_sig == 0) return;
  uint32_t* FL = st.flags.data();
  for (int sy = 0; sy < st.h; sy += 4) {
    int rows = std::min(4, st.h - sy);
    size_t i0 = st.idx(sy, 0);
    for (int x = 0; x < st.w; x++, i0 += 4) {
      uint32_t f0 = FL[i0], f1 = FL[i0 + 1], f2 = FL[i0 + 2],
               f3 = FL[i0 + 3];
      if (!((f0 | f1 | f2 | f3) & F_SIG)) continue;
      if (raw && rows == 4 && ((f0 & f1 & f2 & f3) & F_SIG) &&
          !((f0 | f1 | f2 | f3) & F_VIS)) {
        uint32_t bits = raw->decode_n(4);
        for (int k = 0; k < 4; k++) {
          size_t i = i0 + k;
          FL[i] |= F_REF;
          st.rec[i] = (int32_t)refined_rec(st.rec[i], bpno_rec,
                                           (int)((bits >> (3 - k)) & 1));
        }
        continue;
      }
      for (int k = 0; k < rows; k++) {
        size_t i = i0 + k;
        uint32_t F = FL[i];
        if (vsc && k == 3) F &= VSC_MASK;
        if (!(F & F_SIG) || (F & F_VIS)) continue;
        int bit;
        if (raw) bit = raw->decode();
        else {
          int cn;
          if (!(F & F_REF)) cn = CTX_MAG + ((F & 0xFF) ? 1 : 0);
          else cn = CTX_MAG + 2;
          bit = mq.decode(cn);
        }
        FL[i] |= F_REF;
        st.rec[i] = (int32_t)refined_rec(st.rec[i], bpno_rec, bit);
      }
    }
  }
}

static void dec_clnpass(T1State& st, int bpno_rec, int orient, bool vsc,
                        MQDec& mq, bool segsym) {
  if (st.n_sig == st.h * st.w) {
    if (segsym) {
      mq.decode(CTX_UNI); mq.decode(CTX_UNI);
      mq.decode(CTX_UNI); mq.decode(CTX_UNI);
    }
    return;
  }
  const uint8_t* zc = LUT.zc[orient];
  uint32_t* FL = st.flags.data();
  for (int sy = 0; sy < st.h; sy += 4) {
    int rows = std::min(4, st.h - sy);
    size_t base0 = st.idx(sy, 0);
    for (int x = 0; x < st.w; x++, base0 += 4) {
      int kstart = 0;
      size_t base = base0;
      uint32_t f0 = FL[base], f1 = FL[base + 1], f2 = FL[base + 2],
               f3 = FL[base + 3];
      if ((f0 & (F_SIG | F_VIS)) && (f1 & (F_SIG | F_VIS)) &&
          (f2 & (F_SIG | F_VIS)) && (f3 & (F_SIG | F_VIS)) && rows == 4)
        continue;
      if (rows == 4) {
        uint32_t fv3 = vsc ? (f3 & VSC_MASK) : f3;
        bool agg = !((f0 | f1 | f2 | fv3) & (F_SIG | F_VIS | 0xFF));
        if (agg) {
          if (!mq.decode(CTX_RL)) continue;
          int first = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI);
          size_t i = base + first;
          uint32_t F = FL[i];
          if (vsc && first == 3) F &= VSC_MASK;
          int si = sc_index(F);
          uint32_t neg = (uint32_t)(mq.decode(LUT.sc_cn[si]) ^ LUT.sc_xor[si]);
          if (neg) FL[i] |= F_NEG;
          st.set_sig(i, first, neg);
          st.rec[i] = (int32_t)first_sig_rec(bpno_rec);
          kstart = first + 1;
        }
      }
      for (int k = kstart; k < rows; k++) {
        size_t i = base + k;
        uint32_t F = FL[i];
        if (vsc && k == 3) F &= VSC_MASK;
        if (F & (F_SIG | F_VIS)) continue;
        int bit = mq.decode(CTX_ZC + zc[F & 0xFF]);
        if (bit) {
          int si = sc_index(F);
          uint32_t neg = (uint32_t)(mq.decode(LUT.sc_cn[si]) ^ LUT.sc_xor[si]);
          if (neg) FL[i] |= F_NEG;
          st.set_sig(i, k, neg);
          st.rec[i] = (int32_t)first_sig_rec(bpno_rec);
        }
      }
    }
  }
  if (segsym) {
    mq.decode(CTX_UNI); mq.decode(CTX_UNI);
    mq.decode(CTX_UNI); mq.decode(CTX_UNI);
  }
}

static void decode_one(GrkT1DecJob* j) {
  int h = j->h, w = j->w;
  int ostride = j->out_stride > 0 ? j->out_stride : w;
  T1State st(h, w);
  j->status = 0;
  if (ostride == w)
    std::memset(j->out, 0, sizeof(int32_t) * (size_t)h * w);
  if (j->numbps <= 0 || j->num_passes <= 0) return;
  int numbps = j->numbps;
  int style = j->style;
  bool vsc = style & STY_VSC;

  struct Seg { int first, last; bool raw; };
  std::vector<Seg> segs;
  {
    int total = 3 * numbps - 2;
    int passno = 0;
    int cur_first = -1;
    bool cur_raw = false;
    for (int bpno = numbps - 1; bpno >= 0; bpno--) {
      int pt_first = (bpno == numbps - 1) ? 2 : 0;
      for (int ptype = pt_first; ptype <= 2; ptype++) {
        bool rawp = is_raw_pass(ptype, bpno, numbps, style);
        if (cur_first >= 0 && rawp != cur_raw) {
          segs.push_back({cur_first, passno - 1, cur_raw});
          cur_first = -1;
        }
        if (cur_first < 0) { cur_first = passno; cur_raw = rawp; }
        bool last = passno == total - 1;
        if (is_term_pass(ptype, bpno, numbps, style, last)) {
          segs.push_back({cur_first, passno, cur_raw});
          cur_first = -1;
        }
        passno++;
      }
    }
    if (cur_first >= 0) segs.push_back({cur_first, passno - 1, cur_raw});
  }
  std::vector<std::pair<int, int>> seg_rng(segs.size(), {0, 0});
  {
    int off = 0;
    for (int s = 0; s < (int)segs.size(); s++) {
      int len = (s < j->num_segs) ? j->seg_lens[s] : 0;
      if (off > j->data_len) off = j->data_len;
      int end = off + len;
      if (end > j->data_len) end = j->data_len;
      seg_rng[s] = {off, end};
      off += len;
    }
  }

  MQDec mq;
  mq.init_ctx();
  RawDec raw;
  int cur_seg = -1;
  int passno = 0;
  bool done = false;
  for (int bpno = numbps - 1; bpno >= 0 && !done; bpno--) {
    int pt_first = (bpno == numbps - 1) ? 2 : 0;
    for (int ptype = pt_first; ptype <= 2; ptype++) {
      if (passno >= j->num_passes) { done = true; break; }
      int si = 0;
      for (; si < (int)segs.size(); si++)
        if (segs[si].first <= passno && passno <= segs[si].last) break;
      bool rawp = si < (int)segs.size() && segs[si].raw;
      if (si != cur_seg) {
        int s0 = seg_rng[si].first, s1 = seg_rng[si].second;
        if (rawp) raw.init(j->data + s0, s1 - s0);
        else mq.init_seg(j->data + s0, s1 - s0);
        cur_seg = si;
      }
      uint64_t ptsc = prof_tsc();
      if (ptype == 0) dec_sigpass(st, bpno + 1, j->orient, vsc, mq,
                                  rawp ? &raw : nullptr);
      else if (ptype == 1) dec_refpass(st, bpno + 1, vsc, mq,
                                       rawp ? &raw : nullptr);
      else {
        dec_clnpass(st, bpno + 1, j->orient, vsc, mq, style & STY_SEGSYM);
        st.clear_visited();
      }
      g_prof_cycles[1][ptype] += prof_tsc() - ptsc;
      g_prof_count[1][ptype]++;
      if (style & STY_RESET) init_ctxs(mq.ctx);
      passno++;
    }
  }
  uint64_t wtsc = prof_tsc();
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      size_t i = st.idx(y, x);
      int32_t m = st.rec[i];
      // unsigned negation: a corrupt stream can drive rec to INT32_MIN,
      // whose two's-complement negation is UB spelled as -m (UBSan)
      j->out[(size_t)y * ostride + x] =
          (st.flags[i] & F_NEG) ? (int32_t)(0u - (uint32_t)m) : m;
    }
  }
  g_prof_cycles[1][3] += prof_tsc() - wtsc;
  g_prof_count[1][3]++;
}

template <typename Job, void (*Fn)(Job*)>
static void run_batch(Job* jobs, int n, int num_threads) {
  if (num_threads <= 0)
    num_threads = (int)std::thread::hardware_concurrency();
  if (num_threads < 1) num_threads = 1;
  if (num_threads == 1 || n <= 1) {
    for (int i = 0; i < n; i++) Fn(&jobs[i]);
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Fn(&jobs[i]);
    }
  };
  int nt = std::min(num_threads, n);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// profiling readout (dev tool): copies [enc/dec][sig,ref,cln,setup]
// cycles then counts into out[16]; reset clears the accumulators.
void grk_t1_prof_read(uint64_t* out) {
  std::memcpy(out, g_prof_cycles, sizeof(g_prof_cycles));
  std::memcpy(out + 8, g_prof_count, sizeof(g_prof_count));
}
void grk_t1_prof_reset() {
  std::memset(g_prof_cycles, 0, sizeof(g_prof_cycles));
  std::memset(g_prof_count, 0, sizeof(g_prof_count));
}

int grk_t1_encode_batch(GrkT1EncJob* jobs, int n, int num_threads) {
  run_batch<GrkT1EncJob, encode_one>(jobs, n, num_threads);
  for (int i = 0; i < n; i++)
    if (jobs[i].status) return 1;
  return 0;
}

int grk_t1_decode_batch(GrkT1DecJob* jobs, int n, int num_threads) {
  run_batch<GrkT1DecJob, decode_one>(jobs, n, num_threads);
  return 0;
}

int grk_t1_abi_version() { return 13; }  // v13: encode_tile PCRD feed

// Re-serialize an unstuffed MSB-first bit buffer with the HT bit-writer's
// 0xFF stuffing (7-bit capacity after a 0xFF byte), zero-padded flush and
// trailing-0xFF guard byte.  Returns the stuffed byte count, or -1 if the
// output would exceed `cap`.  Consumed by the device HT encode path
// (grok_tpu/ops/ht_encode.py).
long grk_stuff_bits(const uint8_t* in, long nbits, uint8_t* out, long cap) {
  long n = 0;
  uint32_t acc = 0;
  int used = 0, width = 8;
  for (long i = 0; i < nbits; i++) {
    acc = (acc << 1) | ((in[i >> 3] >> (7 - (i & 7))) & 1);
    if (++used == width) {
      if (n >= cap) return -1;
      out[n++] = (uint8_t)acc;
      width = (acc == 0xFF) ? 7 : 8;
      acc = 0;
      used = 0;
    }
  }
  if (used) {
    acc <<= width - used;
    if (n >= cap) return -1;
    out[n++] = (uint8_t)acc;
  }
  if (n && out[n - 1] == 0xFF) {
    if (n >= cap) return -1;
    out[n++] = 0;
  }
  return n;
}

}  // extern "C"
