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

namespace {

static const int MEL_E[13] = {0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5};

struct BitWriterMSB {
  // 64-bit accumulator bit packer; bytes drain through the 0xFF-stuffing
  // rule (7-bit capacity after an 0xFF byte)
  std::vector<uint8_t> bytes;
  uint64_t acc = 0;
  uint32_t used = 0, cap = 8;
  inline void drain() {
    while (used >= cap) {
      uint8_t b = (uint8_t)((acc >> (used - cap)) & ((1u << cap) - 1));
      bytes.push_back(b);
      used -= cap;
      cap = (b == 0xFF) ? 7 : 8;
    }
  }
  inline void put(int bit) {
    acc = (acc << 1) | (uint32_t)(bit & 1);
    used++;
    drain();
  }
  inline void put_bits(uint32_t v, int n) {
    acc = (acc << n) | (v & ((n >= 32) ? 0xFFFFFFFFu : ((1u << n) - 1)));
    used += n;
    drain();
  }
  void flush() {
    while (used) put(0);  // zero-pad to the next (stuffing-aware) boundary
    if (!bytes.empty() && bytes.back() == 0xFF) bytes.push_back(0);
    acc = 0; used = 0; cap = 8;
  }
};

struct BitReaderMSB {
  // 64-bit reservoir reader honoring the 0xFF-stuffing rule
  const uint8_t* data = nullptr;
  int len = 0, pos = 0;
  uint64_t acc = 0;
  uint32_t avail = 0;
  bool prev_ff = false;
  void init(const uint8_t* d, int l) {
    data = d; len = l; pos = 0; acc = 0; avail = 0; prev_ff = false;
  }
  inline void refill(uint32_t need) {
    while (avail < need) {
      uint8_t b = pos < len ? data[pos] : 0;
      pos++;
      uint32_t c = prev_ff ? 7 : 8;
      acc = (acc << c) | (uint64_t)(b & ((1u << c) - 1));
      avail += c;
      prev_ff = (b == 0xFF);
    }
  }
  inline int get() {
    refill(1);
    avail--;
    return (int)((acc >> avail) & 1);
  }
  inline uint32_t get_bits(int n) {
    if (n == 0) return 0;
    refill((uint32_t)n);
    avail -= (uint32_t)n;
    return (uint32_t)((acc >> avail) & ((n >= 32) ? 0xFFFFFFFFu
                                                  : ((1u << n) - 1)));
  }
};

struct MELEnc {
  int k = 0, run = 0;
  BitWriterMSB bw;
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
  void flush() {
    if (run) bw.put(1);
    bw.flush();
  }
};

struct MELDec {
  int k = 0;
  BitReaderMSB br;
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

static inline void put_u(BitWriterMSB& bw, uint32_t u) {
  if (u == 0) bw.put(0);
  else if (u == 1) bw.put_bits(0b10, 2);
  else if (u == 2) bw.put_bits(0b110, 3);
  else { bw.put_bits(0b111, 3); bw.put_bits(u - 3, 7); }
}

static inline uint32_t get_u(BitReaderMSB& br) {
  if (!br.get()) return 0;
  if (!br.get()) return 1;
  if (!br.get()) return 2;
  return 3 + br.get_bits(7);
}

}  // namespace

extern "C" {

struct GrkHTEncJob {
  int32_t h, w;
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
  int32_t* out;  // doubled-domain
  int32_t status;
};

}  // extern "C"

namespace {

static void ht_encode_one(GrkHTEncJob* j) {
  int h = j->h, w = j->w;
  j->status = 0;
  j->out_len = 0;
  uint32_t maxmag = 0;
  const int32_t* cf = j->coeffs;
  for (size_t i = 0; i < (size_t)h * w; i++) {
    int32_t v = cf[i];
    uint32_t m = v < 0 ? (uint32_t)(-(int64_t)v) : (uint32_t)v;
    if (m > maxmag) maxmag = m;
  }
  int numbps = 0;
  while (maxmag >> numbps) numbps++;
  j->numbps = numbps;
  if (numbps == 0) return;

  BitWriterMSB magsgn;
  MELEnc mel;
  BitWriterMSB vlc;
  int qh = (h + 1) / 2, qw = (w + 1) / 2;
  for (int qy = 0; qy < qh; qy++) {
    uint32_t u_pred = 1;
    for (int qx = 0; qx < qw; qx++) {
      int y0 = 2 * qy, x0 = 2 * qx;
      int ny = std::min(2, h - y0), nx = std::min(2, w - x0);
      // sample order: x-major then y (matches ht.py: for x in xs for y in ys)
      int32_t vals[4];
      int ns = 0;
      for (int dx = 0; dx < nx; dx++)
        for (int dy = 0; dy < ny; dy++)
          vals[ns++] = cf[(size_t)(y0 + dy) * w + (x0 + dx)];
      uint32_t rho = 0, umax = 0;
      uint32_t mags[4];
      for (int i = 0; i < ns; i++) {
        uint32_t m = vals[i] < 0 ? (uint32_t)(-(int64_t)vals[i])
                                 : (uint32_t)vals[i];
        mags[i] = m;
        if (m) {
          rho |= 1u << i;
          uint32_t e = 32u - (uint32_t)__builtin_clz(m);
          if (e > umax) umax = e;
        }
      }
      mel.encode(rho ? 1 : 0);
      if (!rho) continue;
      vlc.put_bits(rho, ns);
      int diff = (int)umax - (int)u_pred;
      uint32_t zz = diff >= 0 ? ((uint32_t)diff << 1)
                              : (((uint32_t)(-diff) << 1) - 1);
      put_u(vlc, zz);
      u_pred = umax;
      for (int i = 0; i < ns; i++) {
        if (rho & (1u << i)) {
          magsgn.put_bits(((mags[i] - 1) << 1) | (vals[i] < 0 ? 1u : 0u),
                          (int)umax + 1);
        }
      }
    }
  }
  magsgn.flush();
  mel.flush();
  vlc.flush();
  size_t scup = mel.bw.bytes.size() + vlc.bytes.size() + 2;
  if (scup > 4079) { j->status = 1; return; }
  size_t total = magsgn.bytes.size() + scup;
  if ((int)total > j->out_cap) { j->status = 1; return; }
  uint8_t* o = j->out;
  std::memcpy(o, magsgn.bytes.data(), magsgn.bytes.size());
  o += magsgn.bytes.size();
  std::memcpy(o, mel.bw.bytes.data(), mel.bw.bytes.size());
  o += mel.bw.bytes.size();
  for (size_t i = vlc.bytes.size(); i-- > 0;) *o++ = vlc.bytes[i];
  *o++ = (uint8_t)(scup & 0x0F);
  *o++ = (uint8_t)((scup >> 4) & 0xFF);
  j->out_len = (int32_t)total;
}

static void ht_decode_one(GrkHTDecJob* j) {
  int h = j->h, w = j->w;
  j->status = 0;
  std::memset(j->out, 0, sizeof(int32_t) * (size_t)h * w);
  if (j->data_len < 2) return;
  const uint8_t* d = j->data;
  int L = j->data_len;
  int scup = ((d[L - 1] & 0xFF) << 4) | (d[L - 2] & 0x0F);
  if (scup < 2 || scup > L) return;
  int ms_len = L - scup;
  int suf_len = scup - 2;
  BitReaderMSB ms;
  ms.init(d, ms_len);
  MELDec mel;
  mel.br.init(d + ms_len, suf_len);
  std::vector<uint8_t> rev(suf_len);
  for (int i = 0; i < suf_len; i++) rev[i] = d[ms_len + suf_len - 1 - i];
  BitReaderMSB vlc;
  vlc.init(rev.data(), suf_len);

  int qh = (h + 1) / 2, qw = (w + 1) / 2;
  for (int qy = 0; qy < qh; qy++) {
    uint32_t u_pred = 1;
    for (int qx = 0; qx < qw; qx++) {
      int y0 = 2 * qy, x0 = 2 * qx;
      int ny = std::min(2, h - y0), nx = std::min(2, w - x0);
      int ns = ny * nx;
      if (!mel.decode()) continue;
      uint32_t rho = vlc.get_bits(ns);
      uint32_t zz = get_u(vlc);
      int diff = (zz & 1) ? -(int)((zz + 1) >> 1) : (int)(zz >> 1);
      int umax = (int)u_pred + diff;
      u_pred = (uint32_t)umax;
      if (umax < 1 || umax > 32) return;  // tolerant bail-out
      int i = 0;
      for (int dx = 0; dx < nx; dx++) {
        for (int dy = 0; dy < ny; dy++, i++) {
          if (rho & (1u << i)) {
            uint32_t m = ms.get_bits(umax) + 1;
            int sgn = ms.get();
            int32_t val = (int32_t)(2 * m + 1);
            j->out[(size_t)(y0 + dy) * w + (x0 + dx)] = sgn ? -val : val;
          }
        }
      }
    }
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
