// Native HTJ2K (Part 15) batch block coder.
//
// Parity: the reference's HT Tier-1 (SURVEY.md §2.1 "Tier-1 HT") — C++
// production path for the cleanup-pass codec defined in
// grok_tpu/t1/ht.py (bit-identical to the Python reference; see that
// module's docstring for the conformance status of the VLC tables).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <immintrin.h>

#include "util.h"

namespace {

static const int MEL_E[13] = {0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5};

// CxtVLC quad-significance code (swap point: grok_tpu/t1/ht_tables.py
// installs tables via grk_ht_set_vlc; default = identity stand-in).
// Per-context (GRK_HT_NUM_CTX slots, selected by neighbor-quad
// significance) variable-length prefix codes up to GRK_HT_MAX_CWD bits:
// the decoder peeks a GRK_HT_MAX_CWD-bit window in the selected
// context's LUT and consumes g_vlc_lut_len bits.
#define GRK_HT_MAX_CWD 7
#define GRK_HT_NUM_CTX 8
static uint8_t g_vlc_enc[GRK_HT_NUM_CTX * 16];
static uint8_t g_vlc_len[GRK_HT_NUM_CTX * 16];
static uint8_t g_vlc_lut_rho[GRK_HT_NUM_CTX << GRK_HT_MAX_CWD];
static uint8_t g_vlc_lut_len[GRK_HT_NUM_CTX << GRK_HT_MAX_CWD];
static bool g_vlc_init = []() {
  for (int c = 0; c < GRK_HT_NUM_CTX; c++)
    for (int n = 0; n < 16; n++) {
      g_vlc_enc[c * 16 + n] = (uint8_t)n;
      g_vlc_len[c * 16 + n] = 4;
      for (int k = 0; k < (1 << (GRK_HT_MAX_CWD - 4)); k++) {
        int w = (c << GRK_HT_MAX_CWD) | (n << (GRK_HT_MAX_CWD - 4)) | k;
        g_vlc_lut_rho[w] = (uint8_t)n;
        g_vlc_lut_len[w] = 4;
      }
    }
  return true;
}();

// quad coding context from neighbor significance (mirrors
// t1/ht_tables.py::quad_context)
static inline uint32_t ht_quad_ctx(uint32_t left, uint32_t up,
                                   uint32_t upleft) {
  return (left ? 1u : 0u) | (up ? 2u : 0u) | (upleft ? 4u : 0u);
}

// Fast unstuffed MSB-first bit packer over a caller-provided raw buffer
// (no growth checks in the hot path — the caller sizes the scratch to
// the worst case): a 64-bit accumulator drains four bytes at a time via
// one bswap32 store.  The stream is stuffed once at assembly time
// (stuff_stream), which is byte-identical to streaming the bits through
// a stuffing-aware writer.
struct FastBitW {
  // Branchless writer: `acc` holds the <8 pending bits LEFT-aligned and
  // every put unconditionally stores the 8-byte window at the byte
  // cursor, then advances past the completed whole bytes.  The old
  // 32-bit-accumulator variant flushed behind a data-dependent branch
  // (taken ~40% of puts with an input-dependent pattern — a steady
  // mispredict tax on the encode hot loop); an always-store writer
  // trades that for one cheap store per put.  Callers may pass n up to
  // 56 bits (ht.cc callers stay <= 32); n == 0 is a no-op by masking.
  uint8_t* base = nullptr;
  uint8_t* p = nullptr;
  uint64_t acc = 0;
  uint32_t used = 0;  // pending bits in acc, always < 8 between puts
  void init(uint8_t* buf) {
    base = p = buf;
    acc = 0;
    used = 0;
  }
  inline void put(int bit) { put_bits((uint32_t)(bit & 1), 1); }
  inline void put_bits(uint64_t v, int n) {
    // shift (64 - used - n) is 0..63 except the degenerate used=n=0
    // case, where the &63 wrap makes it 0 and the masked v is 0 anyway
    uint32_t sh = (64u - used - (uint32_t)n) & 63u;
    acc |= (v & ((1ull << n) - 1)) << sh;
    used += (uint32_t)n;
    uint64_t be = __builtin_bswap64(acc);
    std::memcpy(p, &be, 8);
    p += used >> 3;
    acc <<= (used & ~7u);
    used &= 7u;
  }
  long nbits() const { return (long)(p - base) * 8 + used; }
  // close the packed byte buffer; the zero-padded partial byte is
  // already in memory from the last unconditional store
  void finalize() {
    if (used) {
      p++;
      used = 0;
      acc = 0;
    }
  }
};

// Byte-wise 0xFF stuffer: same output as streaming the bits through a
// stuffing-aware writer with zero-pad flush and trailing-0xFF guard
// (grk_stuff_bits semantics), but ~1 loop iteration per byte.
static void stuff_stream(const FastBitW& bw, long nbits,
                         std::vector<uint8_t>& out) {
  out.clear();
  out.reserve((size_t)(nbits / 7 + 16));
  const uint8_t* in = bw.base;
  long nbytes = (nbits + 7) / 8;
  long i = 0;
  // while no 0xFF has been emitted the output equals the input byte for
  // byte, so the FF-free prefix (and the first 0xFF itself) copies
  // wholesale; alignment is only lost once a 7-bit byte follows it
  if (nbytes > 1) {
    long aligned = nbytes - 1;  // the final byte may be partial
    const void* ff = memchr(in, 0xFF, (size_t)aligned);
    long pre = ff ? (const uint8_t*)ff - in + 1 : aligned;
    out.insert(out.end(), in, in + pre);
    i = pre;
  }
  uint32_t acc = 0, used = 0;
  uint32_t width = (!out.empty() && out.back() == 0xFF) ? 7 : 8;
  for (; i < nbytes; i++) {
    uint32_t take = (i == nbytes - 1) ? (uint32_t)(nbits - 8 * i) : 8u;
    acc = (acc << take) | (uint32_t)(in[i] >> (8 - take));
    used += take;
    while (used >= width) {
      uint8_t b = (uint8_t)((acc >> (used - width)) & ((1u << width) - 1));
      out.push_back(b);
      used -= width;
      width = (b == 0xFF) ? 7 : 8;
    }
  }
  if (used) {
    uint8_t b = (uint8_t)((acc << (width - used)) & ((1u << width) - 1));
    out.push_back(b);
  }
  if (!out.empty() && out.back() == 0xFF) out.push_back(0);
}

// Fast stuffed-stream reader: destuffs once into a packed bit buffer,
// then serves get/get_bits via unaligned big-endian loads.
struct FastBitR {
  std::vector<uint8_t> buf;  // packed payload bits + 8 guard bytes
  size_t bitpos = 0;
  void init(const uint8_t* d, int len) {
    buf.assign((size_t)len + 16, 0);
    uint64_t acc = 0;
    uint32_t used = 0;
    size_t o = 0;
    int i = 0;
    // until the first 0xFF the packed payload equals the stuffed bytes,
    // so the FF-free prefix (plus that 0xFF itself) copies wholesale
    if (len > 0) {
      const void* ff = memchr(d, 0xFF, (size_t)len);
      int pre = ff ? (int)((const uint8_t*)ff - d) + 1 : len;
      memcpy(buf.data(), d, (size_t)pre);
      o = (size_t)pre;
      i = pre;
    }
    bool prev_ff = i > 0 && d[i - 1] == 0xFF;
    for (; i < len; i++) {
      uint8_t b = d[i];
      uint32_t c = prev_ff ? 7 : 8;
      prev_ff = (b == 0xFF);
      acc = (acc << c) | (uint64_t)(b & ((1u << c) - 1));
      used += c;
      while (used >= 8) {
        used -= 8;
        buf[o++] = (uint8_t)(acc >> used);
      }
    }
    if (used) buf[o++] = (uint8_t)(acc << (8 - used));
    bitpos = 0;  // tolerant: reads past the end return zeros (guard bytes)
  }
  inline int get() { return (int)get_bits(1); }
  inline uint32_t get_bits(int n) {
    if (n == 0) return 0;
    size_t byte = bitpos >> 3;
    if (byte + 8 > buf.size()) {  // tolerant: corrupt stream over-read
      bitpos += (size_t)n;
      return 0;
    }
    uint32_t off = (uint32_t)(bitpos & 7);
    uint64_t w;
    std::memcpy(&w, buf.data() + byte, 8);
    w = __builtin_bswap64(w);
    bitpos += (size_t)n;
    return (uint32_t)((w << off) >> (64 - n));
  }
};

struct MELEnc {
  int k = 0, run = 0;
  FastBitW bw;
  void init(uint8_t* buf) { bw.init(buf); }
  inline void encode(int e) {
    int t = 1 << MEL_E[k];
    if (e == 0) {
      if (++run == t) {
        bw.put(1);
        run = 0;
        if (k < 12) k++;
      }
    } else {
      bw.put(0);
      bw.put_bits((uint32_t)run, MEL_E[k]);
      run = 0;
      if (k > 0) k--;
    }
  }
  // returns payload bit count (run-terminator included)
  long finish() {
    if (run) bw.put(1);
    long n = bw.nbits();
    bw.finalize();
    return n;
  }
};

struct MELDec {
  int k = 0;
  FastBitR br;
  int pending_zeros = 0;
  bool pending_one = false;
  inline int decode() {
    if (pending_zeros > 0) { pending_zeros--; return 0; }
    if (pending_one) { pending_one = false; return 1; }
    int t = 1 << MEL_E[k];
    if (br.get()) {
      if (k < 12) k++;
      pending_zeros = t - 1;
      return 0;
    }
    int run = (int)br.get_bits(MEL_E[k]);
    if (k > 0) k--;
    if (run > 0) {
      pending_zeros = run - 1;
      pending_one = true;
      return 0;
    }
    return 1;
  }
};

static inline void put_u(FastBitW& bw, uint32_t u) {
  if (u == 0) bw.put(0);
  else if (u == 1) bw.put_bits(0b10, 2);
  else if (u == 2) bw.put_bits(0b110, 3);
  else { bw.put_bits(0b111, 3); bw.put_bits(u - 3, 7); }
}

static inline uint32_t get_u(FastBitR& br) {
  if (!br.get()) return 0;
  if (!br.get()) return 1;
  if (!br.get()) return 2;
  return 3 + br.get_bits(7);
}

}  // namespace

extern "C" {

void grk_ht_set_vlc(const uint8_t* enc_cwd, const uint8_t* enc_len,
                    const uint8_t* lut_rho, const uint8_t* lut_len) {
  std::memcpy(g_vlc_enc, enc_cwd, GRK_HT_NUM_CTX * 16);
  std::memcpy(g_vlc_len, enc_len, GRK_HT_NUM_CTX * 16);
  std::memcpy(g_vlc_lut_rho, lut_rho, GRK_HT_NUM_CTX << GRK_HT_MAX_CWD);
  std::memcpy(g_vlc_lut_len, lut_len, GRK_HT_NUM_CTX << GRK_HT_MAX_CWD);
}


struct GrkHTEncJob {
  int32_t h, w;
  int32_t stride;  // row stride of coeffs in elements (0 -> w)
  int32_t _pad;    // keep the pointer 8-byte aligned
  const int32_t* coeffs;
  uint8_t* out;
  int32_t out_cap;
  int32_t out_len;
  int32_t numbps;
  int32_t status;  // 0 ok, 1 overflow
};

struct GrkHTDecJob {
  int32_t h, w;
  const uint8_t* data;
  int32_t data_len;
  int32_t* out;         // doubled-domain
  int32_t out_stride;   // row stride in elements (0 -> w); strided
                        // destinations must arrive pre-zeroed
  int32_t status;
};

}  // extern "C"

namespace {

// Shared per-quad VLC emission: rho codeword (context-selected) +
// zigzagged u residual.
static inline void ht_put_quad_vlc(FastBitW& vlc, uint32_t ctx,
                                   uint32_t rho, uint32_t umax,
                                   uint32_t& u_pred) {
  // fuse the codeword and the u prefix into one put_bits when possible
  int diff = (int)umax - (int)u_pred;
  uint32_t zz = diff >= 0 ? ((uint32_t)diff << 1)
                          : (((uint32_t)(-diff) << 1) - 1);
  u_pred = umax;
  uint32_t cw = g_vlc_enc[ctx * 16 + rho], cl = g_vlc_len[ctx * 16 + rho];
  // branchless u-code (mirror of the decode-side window decode): the
  // small codes are zz ones then a zero, read as ((1<<zz)-1)<<1 over
  // zz+1 bits; the escape is '111' + 7-bit residual (zz <= 62 fits)
  uint32_t small = zz <= 2;
  uint32_t ul = small ? zz + 1 : 10;
  uint32_t uv = small ? ((1u << (zz & 31)) - 1) << 1
                      : (0x380u | (zz - 3));
  vlc.put_bits((cw << ul) | uv, (int)(cl + ul));
}

static void ht_encode_one(GrkHTEncJob* j) {
  int h = j->h, w = j->w;
  int cstride = j->stride > 0 ? j->stride : w;
  j->status = 0;
  j->out_len = 0;
  const int32_t* cf = j->coeffs;
  // numbps (the OR of every |v|, accumulated inside the quad loops so
  // the samples are read once) only needs the bit LENGTH, and
  // bitlen(OR of |v|) == bitlen(max |v|); the raw |v| OR is kept
  // unclamped so INT32_MIN still reports 32 like the Python oracle
  // (the per-quad magnitude clamp keeps the stream decodable).  All-zero
  // blocks fall out at assembly time: the coded scratch is simply
  // discarded (thread-local, reused by the next job).
  uint32_t ormag_raw = 0;

  // thread-local scratch sized to the worst case so the bit writers can
  // run unchecked: MagSgn <= 33 bits/sample, VLC <= 17 bits/quad,
  // MEL <= 6 bits/quad (+ flush)
  thread_local std::vector<uint8_t> ms_raw, mel_raw, vlc_raw;
  size_t np = (size_t)h * w;
  if (ms_raw.size() < np * 5 + 64) ms_raw.resize(np * 5 + 64);
  if (vlc_raw.size() < np * 3 + 64) vlc_raw.resize(np * 3 + 64);
  if (mel_raw.size() < np + 64) mel_raw.resize(np + 64);
  FastBitW magsgn;
  MELEnc mel;
  FastBitW vlc;
  magsgn.init(ms_raw.data());
  mel.init(mel_raw.data());
  vlc.init(vlc_raw.data());
  int qh = (h + 1) / 2, qw = (w + 1) / 2;
  // neighbor-significance context rows (previous / current quad row;
  // +8 slack so the vectorized precompute can store whole 8-quad
  // groups at the row tail)
  thread_local std::vector<uint8_t> rho_prev, rho_cur;
  rho_prev.assign((size_t)qw + 8, 0);
  rho_cur.assign((size_t)qw + 8, 0);
  if ((h & 1) == 0 && (w & 1) == 0) {
#if defined(__AVX512F__) && defined(__AVX512BW__) && \
    defined(__AVX512CD__) && defined(__AVX512VL__) && defined(__BMI2__)
    // fast path, vectorized front: for each quad row, ONE SIMD sweep
    // computes every quad's rho nibble, umax, and the four MagSgn
    // s-values ((m-1)<<1 | sign; garbage where m == 0, never emitted)
    // into L1-resident temps, then the serial MEL/VLC/MagSgn writers
    // consume them with no per-sample recomputation.  The scalar
    // front (abs/clamp/or/clz per quad) was measured at 43% of the
    // encode kernel; this sweep does 16 samples per iteration.
    thread_local std::vector<uint32_t> q_s;
    thread_local std::vector<uint8_t> q_umax;
    if (q_s.size() < (size_t)qw * 4 + 32) {
      q_s.resize((size_t)qw * 4 + 32);
      q_umax.resize((size_t)qw + 8);
    }
    const __m512i vclamp = _mm512_set1_epi32(0x7FFFFFFF);
    const __m512i vtwo = _mm512_set1_epi32(2);
    // quad-order interleave of row a / row b samples (TL,BL,TR,BR)
    const __m512i idx_lo = _mm512_set_epi32(23, 7, 22, 6, 21, 5, 20, 4,
                                            19, 3, 18, 2, 17, 1, 16, 0);
    const __m512i idx_hi = _mm512_set_epi32(31, 15, 30, 14, 29, 13, 28,
                                            12, 27, 11, 26, 10, 25, 9,
                                            24, 8);
    // lane representatives (dword 0 of each 128-bit lane, both zmm)
    const __m512i idx_g = _mm512_set_epi32(0, 0, 0, 0, 0, 0, 0, 0,
                                           28, 24, 20, 16, 12, 8, 4, 0);
    __m512i vor = _mm512_setzero_si512();
    for (int qy = 0; qy < qh; qy++) {
      const int32_t* a = cf + (size_t)(2 * qy) * cstride;
      const int32_t* b = a + cstride;
      for (int c0 = 0; c0 < w; c0 += 16) {
        __mmask16 lm = (w - c0 >= 16)
                           ? (__mmask16)0xFFFF
                           : (__mmask16)((1u << (w - c0)) - 1);
        __m512i va = _mm512_maskz_loadu_epi32(lm, a + c0);
        __m512i vb = _mm512_maskz_loadu_epi32(lm, b + c0);
        __m512i ra = _mm512_abs_epi32(va);
        __m512i rb = _mm512_abs_epi32(vb);
        vor = _mm512_or_si512(vor, _mm512_or_si512(ra, rb));
        __m512i ma = _mm512_min_epu32(ra, vclamp);
        __m512i mb2 = _mm512_min_epu32(rb, vclamp);
        __m512i sa = _mm512_srli_epi32(va, 31);
        __m512i sb = _mm512_srli_epi32(vb, 31);
        __m512i mlo = _mm512_permutex2var_epi32(ma, idx_lo, mb2);
        __m512i mhi = _mm512_permutex2var_epi32(ma, idx_hi, mb2);
        __m512i slo = _mm512_permutex2var_epi32(sa, idx_lo, sb);
        __m512i shi = _mm512_permutex2var_epi32(sa, idx_hi, sb);
        __m512i svlo = _mm512_sub_epi32(
            _mm512_add_epi32(_mm512_slli_epi32(mlo, 1), slo), vtwo);
        __m512i svhi = _mm512_sub_epi32(
            _mm512_add_epi32(_mm512_slli_epi32(mhi, 1), shi), vtwo);
        _mm512_storeu_si512(q_s.data() + 2 * c0, svlo);
        _mm512_storeu_si512(q_s.data() + 2 * c0 + 16, svhi);
        uint32_t rbits =
            (uint32_t)_mm512_cmpneq_epu32_mask(mlo, _mm512_setzero_si512())
            | ((uint32_t)_mm512_cmpneq_epu32_mask(mhi,
                                                  _mm512_setzero_si512())
               << 16);
        // spread the 8 rho nibbles to bytes
        uint64_t spread = _pdep_u64(rbits, 0x0F0F0F0F0F0F0F0FULL);
        std::memcpy(rho_cur.data() + (c0 >> 1), &spread, 8);
        // per-quad OR then lzcnt -> umax (all-zero quad yields 0)
        __m512i t = _mm512_or_si512(
            mlo, _mm512_shuffle_epi32(mlo, (_MM_PERM_ENUM)0x4E));
        t = _mm512_or_si512(t,
                            _mm512_shuffle_epi32(t, (_MM_PERM_ENUM)0xB1));
        __m512i u = _mm512_or_si512(
            mhi, _mm512_shuffle_epi32(mhi, (_MM_PERM_ENUM)0x4E));
        u = _mm512_or_si512(u,
                            _mm512_shuffle_epi32(u, (_MM_PERM_ENUM)0xB1));
        __m512i lz = _mm512_permutex2var_epi32(_mm512_lzcnt_epi32(t),
                                               idx_g,
                                               _mm512_lzcnt_epi32(u));
        __m256i um8 = _mm256_sub_epi32(_mm256_set1_epi32(32),
                                       _mm512_castsi512_si256(lz));
        _mm_storel_epi64((__m128i*)(q_umax.data() + (c0 >> 1)),
                         _mm256_cvtepi32_epi8(um8));
      }
      uint32_t u_pred = 1;
      uint32_t left = 0;
      uint32_t upleft = 0;
      for (int qx = 0; qx < qw; qx++) {
        uint32_t rho = rho_cur[qx];
        mel.encode(rho ? 1 : 0);
        uint32_t up = rho_prev[qx];
        uint32_t ctx = ht_quad_ctx(left, up, upleft);
        upleft = up;
        left = rho;
        if (!rho) continue;
        uint32_t umax = q_umax[qx];
        ht_put_quad_vlc(vlc, ctx, rho, umax, u_pred);
        int nb = (int)umax + 1;
        const uint32_t* s = q_s.data() + 4 * qx;
        if (rho == 15u && nb <= 16) {
          magsgn.put_bits(((uint64_t)s[0] << nb) | s[1], 2 * nb);
          magsgn.put_bits(((uint64_t)s[2] << nb) | s[3], 2 * nb);
        } else {
          magsgn.put_bits(s[0], (rho & 1u) ? nb : 0);
          magsgn.put_bits(s[1], (rho & 2u) ? nb : 0);
          magsgn.put_bits(s[2], (rho & 4u) ? nb : 0);
          magsgn.put_bits(s[3], (rho & 8u) ? nb : 0);
        }
      }
      std::swap(rho_prev, rho_cur);
    }
    ormag_raw |= (uint32_t)_mm512_reduce_or_epi32(vor);
#else
    // fast path: every quad is full (the production codeblock shape),
    // branch-lean with two row pointers and one clz per quad
    for (int qy = 0; qy < qh; qy++) {
      uint32_t u_pred = 1;
      uint32_t left = 0;
      const int32_t* a = cf + (size_t)(2 * qy) * cstride;
      const int32_t* b = a + cstride;
      for (int qx = 0; qx < qw; qx++, a += 2, b += 2) {
        // sample order TL, BL, TR, BR (matches ht.py x-major-then-y)
        int32_t v0 = a[0], v1 = b[0], v2 = a[1], v3 = b[1];
        uint32_t r0 = v0 < 0 ? 0u - (uint32_t)v0 : (uint32_t)v0;
        uint32_t r1 = v1 < 0 ? 0u - (uint32_t)v1 : (uint32_t)v1;
        uint32_t r2 = v2 < 0 ? 0u - (uint32_t)v2 : (uint32_t)v2;
        uint32_t r3 = v3 < 0 ? 0u - (uint32_t)v3 : (uint32_t)v3;
        ormag_raw |= r0 | r1 | r2 | r3;
        uint32_t m0 = r0 > 0x7FFFFFFFu ? 0x7FFFFFFFu : r0;
        uint32_t m1 = r1 > 0x7FFFFFFFu ? 0x7FFFFFFFu : r1;
        uint32_t m2 = r2 > 0x7FFFFFFFu ? 0x7FFFFFFFu : r2;
        uint32_t m3 = r3 > 0x7FFFFFFFu ? 0x7FFFFFFFu : r3;
        uint32_t rho = (m0 ? 1u : 0u) | (m1 ? 2u : 0u) | (m2 ? 4u : 0u)
                       | (m3 ? 8u : 0u);
        mel.encode(rho ? 1 : 0);
        uint32_t ctx = ht_quad_ctx(left, rho_prev[qx],
                                   qx ? rho_prev[qx - 1] : 0);
        rho_cur[qx] = (uint8_t)rho;
        left = rho;
        if (!rho) continue;
        uint32_t umax = 32u - (uint32_t)__builtin_clz(m0 | m1 | m2 | m3);
        ht_put_quad_vlc(vlc, ctx, rho, umax, u_pred);
        int nb = (int)umax + 1;
        if (rho == 15u && nb <= 16) {
          // dense quad, short words (the common case on natural
          // content): pack sample pairs into single put_bits calls
          uint32_t s0 = ((m0 - 1) << 1) | (v0 < 0 ? 1u : 0u);
          uint32_t s1 = ((m1 - 1) << 1) | (v1 < 0 ? 1u : 0u);
          uint32_t s2 = ((m2 - 1) << 1) | (v2 < 0 ? 1u : 0u);
          uint32_t s3 = ((m3 - 1) << 1) | (v3 < 0 ? 1u : 0u);
          magsgn.put_bits((s0 << nb) | s1, 2 * nb);
          magsgn.put_bits((s2 << nb) | s3, 2 * nb);
        } else {
          // insignificant samples contribute zero bits: n == 0 puts are
          // masked no-ops, so these four are branch-free on rho
          magsgn.put_bits(((m0 - 1) << 1) | (v0 < 0 ? 1u : 0u),
                          m0 ? nb : 0);
          magsgn.put_bits(((m1 - 1) << 1) | (v1 < 0 ? 1u : 0u),
                          m1 ? nb : 0);
          magsgn.put_bits(((m2 - 1) << 1) | (v2 < 0 ? 1u : 0u),
                          m2 ? nb : 0);
          magsgn.put_bits(((m3 - 1) << 1) | (v3 < 0 ? 1u : 0u),
                          m3 ? nb : 0);
        }
      }
      std::swap(rho_prev, rho_cur);
    }
#endif
  } else {
    for (int qy = 0; qy < qh; qy++) {
      uint32_t u_pred = 1;
      uint32_t left = 0;
      for (int qx = 0; qx < qw; qx++) {
        int y0 = 2 * qy, x0 = 2 * qx;
        int ny = std::min(2, h - y0), nx = std::min(2, w - x0);
        // sample order: x-major then y (matches ht.py: for x in xs
        // for y in ys)
        int32_t vals[4];
        int ns = 0;
        for (int dx = 0; dx < nx; dx++)
          for (int dy = 0; dy < ny; dy++)
            vals[ns++] = cf[(size_t)(y0 + dy) * cstride + (x0 + dx)];
        uint32_t rho = 0, umax = 0;
        uint32_t mags[4];
        for (int i = 0; i < ns; i++) {
          int32_t v = vals[i];
          uint32_t rm = v < 0 ? 0u - (uint32_t)v : (uint32_t)v;
          ormag_raw |= rm;
          uint32_t m = rm > 0x7FFFFFFFu ? 0x7FFFFFFFu : rm;
          mags[i] = m;
          if (m) {
            rho |= 1u << i;
            uint32_t e = 32u - (uint32_t)__builtin_clz(m);
            if (e > umax) umax = e;
          }
        }
        mel.encode(rho ? 1 : 0);
        uint32_t ctx = ht_quad_ctx(left, rho_prev[qx],
                                   qx ? rho_prev[qx - 1] : 0);
        rho_cur[qx] = (uint8_t)rho;
        left = rho;
        if (!rho) continue;
        if (ns == 4) {
          ht_put_quad_vlc(vlc, ctx, rho, umax, u_pred);
        } else {
          vlc.put_bits(rho, ns);
          int diff = (int)umax - (int)u_pred;
          uint32_t zz = diff >= 0 ? ((uint32_t)diff << 1)
                                  : (((uint32_t)(-diff) << 1) - 1);
          put_u(vlc, zz);
          u_pred = umax;
        }
        for (int i = 0; i < ns; i++) {
          if (rho & (1u << i)) {
            magsgn.put_bits(((mags[i] - 1) << 1) | (vals[i] < 0 ? 1u : 0u),
                            (int)umax + 1);
          }
        }
      }
      std::swap(rho_prev, rho_cur);
    }
  }
  // bit length of the raw |v| OR (uint64 so a bit-31 magnitude can
  // report numbps 32 without a UB 32-bit shift)
  uint64_t om = ormag_raw;
  int numbps = 0;
  while (om >> numbps) numbps++;
  j->numbps = numbps;
  if (numbps == 0) return;  // all-zero block: no coded bytes

  long ms_bits = magsgn.nbits();
  magsgn.finalize();
  long mel_bits = mel.finish();
  long vlc_bits = vlc.nbits();
  vlc.finalize();
  thread_local std::vector<uint8_t> ms_s, mel_s, vlc_s;
  stuff_stream(magsgn, ms_bits, ms_s);
  stuff_stream(mel.bw, mel_bits, mel_s);
  stuff_stream(vlc, vlc_bits, vlc_s);
  size_t scup = mel_s.size() + vlc_s.size() + 2;
  if (scup > 4079) { j->status = 1; return; }
  size_t total = ms_s.size() + scup;
  if ((int)total > j->out_cap) { j->status = 1; return; }
  uint8_t* o = j->out;
  grk_copy_bytes(o, ms_s.data(), ms_s.size());
  o += ms_s.size();
  grk_copy_bytes(o, mel_s.data(), mel_s.size());
  o += mel_s.size();
  for (size_t i = vlc_s.size(); i-- > 0;) *o++ = vlc_s[i];
  *o++ = (uint8_t)(scup & 0x0F);
  *o++ = (uint8_t)((scup >> 4) & 0xFF);
  j->out_len = (int32_t)total;
}

// Random-access MagSgn bit read: bit-identical to FastBitR::get_bits at
// the same bit offset (same 64-bit window rule, same tolerant zero past
// the guard) but with NO serial bitpos dependency — offsets come from a
// prefix sum, so extractions are independent and the OOO core overlaps
// them across quads.
static inline uint32_t ms_peek(const uint8_t* b, size_t bufsz, size_t o,
                               int n) {
  size_t byte = o >> 3;
  if (byte + 8 > bufsz) return 0;
  uint64_t w;
  std::memcpy(&w, b + byte, 8);
  w = __builtin_bswap64(w);
  return (uint32_t)((w << (o & 7)) >> (64 - n));
}

#ifdef __AVX512F__
// Vectorized decode pass B needs: per-lane popcount-below-i of rho to
// turn the per-quad MagSgn base offset into per-sample bit offsets.
static uint64_t k_pfx_lut[16];  // packed 4x u16, sample order TL,BL,TR,BR
static bool k_pfx_init = []() {
  for (int r = 0; r < 16; r++) {
    uint64_t v = 0;
    for (int i = 0; i < 4; i++) {
      uint64_t p = (uint64_t)__builtin_popcount(r & ((1 << i) - 1));
      v |= p << (16 * i);
    }
    k_pfx_lut[r] = v;
  }
  return true;
}();
#endif

static void ht_decode_one(GrkHTDecJob* j) {
  int h = j->h, w = j->w;
  int ostride = j->out_stride > 0 ? j->out_stride : w;
  j->status = 0;
  if (ostride == w)
    std::memset(j->out, 0, sizeof(int32_t) * (size_t)h * w);
  if (j->data_len < 2) return;
  const uint8_t* d = j->data;
  int L = j->data_len;
  int scup = ((d[L - 1] & 0xFF) << 4) | (d[L - 2] & 0x0F);
  if (scup < 2 || scup > L) return;
  int ms_len = L - scup;
  int suf_len = scup - 2;
  FastBitR ms;
  ms.init(d, ms_len);
  MELDec mel;
  mel.br.init(d + ms_len, suf_len);
  std::vector<uint8_t> rev(suf_len);
  for (int i = 0; i < suf_len; i++) rev[i] = d[ms_len + suf_len - 1 - i];
  FastBitR vlc;
  vlc.init(rev.data(), suf_len);

  int qh = (h + 1) / 2, qw = (w + 1) / 2;
  // neighbor-significance context rows (previous / current quad row)
  thread_local std::vector<uint8_t> rho_prev, rho_cur;
  rho_prev.assign((size_t)qw, 0);
  rho_cur.assign((size_t)qw, 0);
  if ((h & 1) == 0 && (w & 1) == 0) {
    // fast path (every quad full), TWO passes.  Pass A is the serial
    // chain (MEL + one 17-bit VLC window covering codeword + u code +
    // the u predictor), recording per significant quad its rho, nb,
    // MagSgn bit offset (prefix sum) and output offset.  Pass B
    // extracts every sample with independent random-access ms_peek
    // reads -- the serial MagSgn cursor is gone, so extractions from
    // different quads overlap in the OOO window.
    thread_local std::vector<uint8_t> q_rho, q_nb;
    thread_local std::vector<uint32_t> q_off;
    thread_local std::vector<uint64_t> q_dst;
    size_t maxq = (size_t)qh * qw;
    if (q_rho.size() < maxq) {
      q_rho.resize(maxq);
      q_nb.resize(maxq);
      q_off.resize(maxq);
      q_dst.resize(maxq);
    }
    size_t nq = 0;
    uint32_t ms_bit = 0;
    for (int qy = 0; qy < qh; qy++) {
      uint32_t u_pred = 1;
      uint32_t left = 0;
      uint64_t drow = (uint64_t)(2 * qy) * (uint64_t)ostride;
      for (int qx = 0; qx < qw; qx++) {
        uint32_t ctx = ht_quad_ctx(left, rho_prev[qx],
                                   qx ? rho_prev[qx - 1] : 0);
        if (!mel.decode()) {
          rho_cur[qx] = 0;
          left = 0;
          continue;
        }
        uint32_t win = vlc.get_bits(GRK_HT_MAX_CWD + 10);
        uint32_t cw = (ctx << GRK_HT_MAX_CWD) | (win >> 10);
        uint32_t rho = g_vlc_lut_rho[cw];
        uint32_t clen = g_vlc_lut_len[cw];
        rho_cur[qx] = (uint8_t)rho;
        left = rho;
        uint32_t uw = (win >> (GRK_HT_MAX_CWD - clen)) & 0x3FF;
        // branchless u code: count the leading ones of the 10-bit
        // window (0,10,110 prefixes; >= 3 ones = the 7-bit escape).
        // The 4-way branch chain mispredicted heavily on varying u —
        // this clz form measured +11-20% on the whole decode kernel.
        uint32_t ones = (uint32_t)__builtin_clz(~(uw << 22));
        uint32_t zz = (ones >= 3) ? 3 + (uw & 0x7F) : ones;
        uint32_t ulen = (ones >= 3) ? 10 : ones + 1;
        vlc.bitpos -= (size_t)(GRK_HT_MAX_CWD + 10 - clen - ulen);
        int diff = (zz & 1) ? -(int)((zz + 1) >> 1) : (int)(zz >> 1);
        int umax = (int)u_pred + diff;
        u_pred = (uint32_t)umax;
        if (umax < 1 || umax > 31) {  // tolerant bail-out: extract the
          qy = qh;                    // quads recorded so far, then stop
          break;
        }
        q_rho[nq] = (uint8_t)rho;
        q_nb[nq] = (uint8_t)(umax + 1);
        q_off[nq] = ms_bit;
        q_dst[nq] = drow + (uint64_t)(2 * qx);
        nq++;
        ms_bit += (uint32_t)__builtin_popcount(rho) * (uint32_t)(umax + 1);
      }
      std::swap(rho_prev, rho_cur);
    }
    const uint8_t* mb = ms.buf.data();
    size_t mbs = ms.buf.size();
    int32_t* outp = j->out;
    size_t i = 0;
#ifdef __AVX512F__
    {
      // Vectorized pass B: two quads per iteration, 8 zmm lanes = 8
      // samples.  Each lane extracts one MagSgn sample with the same
      // 64-bit window rule as ms_peek (the masked-zero gather
      // reproduces the tolerant past-the-end zero), computes the
      // doubled-domain value branch-free, and one k-masked 32-bit
      // scatter places only the rho-significant samples (insignificant
      // lanes read a duplicated in-bounds window and are never
      // stored).  Measured +11% on the whole decode kernel vs the
      // scalar dense/sparse split under the PGO build.
      const __m512i bswap_mask = _mm512_set4_epi32(
          0x08090a0b, 0x0c0d0e0f, 0x00010203, 0x04050607);
      const __m512i v7 = _mm512_set1_epi64(7);
      const __m512i v64 = _mm512_set1_epi64(64);
      const __m512i v1 = _mm512_set1_epi64(1);
      const __m512i v3 = _mm512_set1_epi64(3);
      const __m512i vn1 = _mm512_set1_epi64(~1ll);
      // per-quad destination pattern in sample order TL, BL, TR, BR
      const __m512i dquad = _mm512_set_epi64(
          (long long)ostride + 1, 1, (long long)ostride, 0,
          (long long)ostride + 1, 1, (long long)ostride, 0);
      const __m512i vcap = _mm512_set1_epi64((long long)(mbs - 8));
      for (; i + 2 <= nq; i += 2) {
        uint32_t rho0 = q_rho[i], rho1 = q_rho[i + 1];
        uint64_t nb0 = q_nb[i], nb1 = q_nb[i + 1];
        // per-lane bit offsets: off + popcount_below(rho, lane) * nb
        __m128i pfx = _mm_set_epi64x((long long)k_pfx_lut[rho1],
                                     (long long)k_pfx_lut[rho0]);
        __m512i pfxq = _mm512_cvtepu16_epi64(pfx);
        __m512i nbv = _mm512_inserti64x4(
            _mm512_set1_epi64((long long)nb0),
            _mm256_set1_epi64x((long long)nb1), 1);
        __m512i base = _mm512_inserti64x4(
            _mm512_set1_epi64((long long)q_off[i]),
            _mm256_set1_epi64x((long long)q_off[i + 1]), 1);
        __m512i offs = _mm512_add_epi64(base,
            _mm512_mullo_epi64(pfxq, nbv));
        __m512i bytea = _mm512_srli_epi64(offs, 3);
        // tolerant bound: lanes past buf.size()-8 read as zero, exactly
        // ms_peek's byte + 8 > bufsz rule
        __mmask8 okm = _mm512_cmple_epu64_mask(bytea, vcap);
        __m512i w = _mm512_mask_i64gather_epi64(
            _mm512_setzero_si512(), okm, bytea, mb, 1);
        w = _mm512_shuffle_epi8(w, bswap_mask);  // bswap64 per lane
        w = _mm512_sllv_epi64(w, _mm512_and_epi64(offs, v7));
        __m512i v = _mm512_srlv_epi64(w, _mm512_sub_epi64(v64, nbv));
        // val = 2*((v>>1)+1)+1 == (v & ~1) + 3; negate where v&1
        __m512i val = _mm512_add_epi64(_mm512_and_epi64(v, vn1), v3);
        __m512i m = _mm512_sub_epi64(_mm512_setzero_si512(),
                                     _mm512_and_epi64(v, v1));
        val = _mm512_sub_epi64(_mm512_xor_epi64(val, m), m);
        __m256i val32 = _mm512_cvtepi64_epi32(val);
        __m512i didx = _mm512_add_epi64(dquad, _mm512_inserti64x4(
            _mm512_set1_epi64((long long)q_dst[i]),
            _mm256_set1_epi64x((long long)q_dst[i + 1]), 1));
        __mmask8 sm = (__mmask8)(rho0 | (rho1 << 4));
        _mm512_mask_i64scatter_epi32(outp, sm, didx, val32, 4);
      }
    }
#endif
    for (; i < nq; i++) {
      uint32_t rho = q_rho[i];
      int nb = q_nb[i];
      int32_t* o0 = outp + q_dst[i];
      int32_t* o1 = o0 + ostride;
      size_t o = q_off[i];
      // sample order TL, BL, TR, BR
      if (rho == 15u) {  // dense quad: four independent extractions
        uint32_t v0 = ms_peek(mb, mbs, o, nb);
        uint32_t v1 = ms_peek(mb, mbs, o + (size_t)nb, nb);
        uint32_t v2 = ms_peek(mb, mbs, o + 2 * (size_t)nb, nb);
        uint32_t v3 = ms_peek(mb, mbs, o + 3 * (size_t)nb, nb);
        int32_t a0 = (int32_t)(2 * ((v0 >> 1) + 1) + 1);
        int32_t a1 = (int32_t)(2 * ((v1 >> 1) + 1) + 1);
        int32_t a2 = (int32_t)(2 * ((v2 >> 1) + 1) + 1);
        int32_t a3 = (int32_t)(2 * ((v3 >> 1) + 1) + 1);
        o0[0] = (v0 & 1) ? -a0 : a0;
        o1[0] = (v1 & 1) ? -a1 : a1;
        o0[1] = (v2 & 1) ? -a2 : a2;
        o1[1] = (v3 & 1) ? -a3 : a3;
      } else {
        if (rho & 1u) {
          uint32_t v = ms_peek(mb, mbs, o, nb);
          o += (size_t)nb;
          int32_t val = (int32_t)(2 * ((v >> 1) + 1) + 1);
          o0[0] = (v & 1) ? -val : val;
        }
        if (rho & 2u) {
          uint32_t v = ms_peek(mb, mbs, o, nb);
          o += (size_t)nb;
          int32_t val = (int32_t)(2 * ((v >> 1) + 1) + 1);
          o1[0] = (v & 1) ? -val : val;
        }
        if (rho & 4u) {
          uint32_t v = ms_peek(mb, mbs, o, nb);
          o += (size_t)nb;
          int32_t val = (int32_t)(2 * ((v >> 1) + 1) + 1);
          o0[1] = (v & 1) ? -val : val;
        }
        if (rho & 8u) {
          uint32_t v = ms_peek(mb, mbs, o, nb);
          int32_t val = (int32_t)(2 * ((v >> 1) + 1) + 1);
          o1[1] = (v & 1) ? -val : val;
        }
      }
    }
    return;
  }
  for (int qy = 0; qy < qh; qy++) {
    uint32_t u_pred = 1;
    uint32_t left = 0;
    for (int qx = 0; qx < qw; qx++) {
      int y0 = 2 * qy, x0 = 2 * qx;
      int ny = std::min(2, h - y0), nx = std::min(2, w - x0);
      int ns = ny * nx;
      uint32_t ctx = ht_quad_ctx(left, rho_prev[qx],
                                 qx ? rho_prev[qx - 1] : 0);
      if (!mel.decode()) {
        rho_cur[qx] = 0;
        left = 0;
        continue;
      }
      uint32_t rho;
      if (ns == 4) {
        // prefix-code window read: peek the max-width window, consume
        // the matched codeword's length (LUT built by t1/ht_tables.py,
        // context-selected)
        uint32_t win = vlc.get_bits(GRK_HT_MAX_CWD);
        uint32_t cw = (ctx << GRK_HT_MAX_CWD) | win;
        rho = g_vlc_lut_rho[cw];
        vlc.bitpos -= (size_t)(GRK_HT_MAX_CWD - g_vlc_lut_len[cw]);
      } else {
        rho = vlc.get_bits(ns);
      }
      rho_cur[qx] = (uint8_t)rho;
      left = rho;
      uint32_t zz = get_u(vlc);
      int diff = (zz & 1) ? -(int)((zz + 1) >> 1) : (int)(zz >> 1);
      int umax = (int)u_pred + diff;
      u_pred = (uint32_t)umax;
      if (umax < 1 || umax > 31) return;  // tolerant bail-out
      int i = 0;
      for (int dx = 0; dx < nx; dx++) {
        for (int dy = 0; dy < ny; dy++, i++) {
          if (rho & (1u << i)) {
            uint32_t m = ms.get_bits(umax) + 1;
            int sgn = ms.get();
            int32_t val = (int32_t)(2 * m + 1);
            j->out[(size_t)(y0 + dy) * ostride + (x0 + dx)] =
                sgn ? -val : val;
          }
        }
      }
    }
    std::swap(rho_prev, rho_cur);
  }
}

template <typename Job, void (*Fn)(Job*)>
static void run_batch_ht(Job* jobs, int n, int num_threads) {
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

int grk_ht_encode_batch(GrkHTEncJob* jobs, int n, int num_threads) {
  run_batch_ht<GrkHTEncJob, ht_encode_one>(jobs, n, num_threads);
  for (int i = 0; i < n; i++)
    if (jobs[i].status) return 1;
  return 0;
}

int grk_ht_decode_batch(GrkHTDecJob* jobs, int n, int num_threads) {
  run_batch_ht<GrkHTDecJob, ht_decode_one>(jobs, n, num_threads);
  return 0;
}

}  // extern "C"
