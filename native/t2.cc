// Native Tier-2 packet header coder.
//
// Parity: T2Compress/T2Decompress packet-header coding (SURVEY.md §2.1
// "Tier-2", src/lib/core/t2/ [P]; ISO/IEC 15444-1 B.9-B.12).  The
// progression iteration (PacketIter) and body assembly stay in Python
// (grok_tpu/t2/packets.py); this module owns the per-precinct resumable
// state — inclusion + zero-bitplane tag trees, per-codeblock Lblock /
// inclusion-layer / pass counters — and the bit-level header codec, which
// profiled as ~15-20%% of end-to-end host codec time in pure Python.
//
// The algorithm is a direct translation of the oracle-validated Python
// reference (grok_tpu/t2/packets.py + bitio.py + tagtree.py); differential
// tests in tests/test_native_t2.py keep both byte-identical.

#include <cmath>
#include <cstdint>
#include <limits>
#include <cstring>
#include <vector>

namespace t2 {

// ------------------------------------------------------------- bit I/O
// Exact mirror of grok_tpu/t2/bitio.py: MSB-first with 0xFF stuffing
// (7 payload bits after an emitted 0xFF byte).

struct BitW {
  std::vector<uint8_t> buf;
  uint32_t acc = 0;
  int used = 0, cap = 8;

  inline void put(int b) {
    acc = (acc << 1) | (b & 1);
    if (++used == cap) {
      buf.push_back((uint8_t)(acc & ((1u << cap) - 1)));
      cap = (buf.back() == 0xFF) ? 7 : 8;
      acc = 0;
      used = 0;
    }
  }
  inline void putn(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; i--) put((int)((v >> i) & 1));
  }
  void flush() {
    while (used) put(0);
    if (cap == 7) {  // last emitted byte was 0xFF: guard byte
      buf.push_back(0);
      cap = 8;
    }
  }
};

struct BitR {
  const uint8_t* d;
  long len, pos;
  uint32_t acc = 0;
  int avail = 0;
  bool prev_ff = false;

  BitR(const uint8_t* dd, long l, long p) : d(dd), len(l), pos(p) {}
  inline int bit() {
    if (avail == 0) {
      uint8_t b = 0;  // tolerant: past-the-end reads zeros
      if (pos < len) b = d[pos++];
      acc = b;
      avail = prev_ff ? 7 : 8;
      prev_ff = (b == 0xFF);
    }
    avail--;
    return (int)((acc >> avail) & 1);
  }
  inline uint32_t bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | (uint32_t)bit();
    return v;
  }
  void align() {
    avail = 0;
    if (prev_ff) {
      if (pos < len) pos++;
      prev_ff = false;
    }
  }
};

// ------------------------------------------------------------ tag tree
// Array-based resumable tag tree (grok_tpu/t2/tagtree.py; ISO B.10.2).

constexpr int32_t UNKNOWN = 999999999;

struct TagTree {
  int w = 0, h = 0, nleaves = 0, leaf0 = 0;
  std::vector<int32_t> parent;  // node index or -1 (root)
  std::vector<int32_t> value, low;
  std::vector<uint8_t> known;

  void build(int ww, int hh) {
    w = ww;
    h = hh;
    parent.clear();
    if (w <= 0 || h <= 0) {
      nleaves = 0;
      return;
    }
    // level dims from leaves up to the 1x1 root
    std::vector<std::pair<int, int>> dims;
    int lw = w, lh = h;
    for (;;) {
      dims.push_back({lw, lh});
      if (lw == 1 && lh == 1) break;
      lw = (lw + 1) / 2;
      lh = (lh + 1) / 2;
    }
    // lay out root-first so parents precede children
    int total = 0;
    for (auto& dlv : dims) total += dlv.first * dlv.second;
    parent.assign(total, -1);
    int off_prev = -1, off_cur = 0;
    int pw = 0;
    for (int li = (int)dims.size() - 1; li >= 0; li--) {
      int cw = dims[li].first, ch = dims[li].second;
      if (off_prev >= 0) {
        for (int j = 0; j < ch; j++)
          for (int i = 0; i < cw; i++)
            parent[off_cur + j * cw + i] = off_prev + (j / 2) * pw + (i / 2);
      }
      off_prev = off_cur;
      off_cur += cw * ch;
      pw = cw;
    }
    leaf0 = off_prev;
    nleaves = w * h;
    value.assign(total, UNKNOWN);
    low.assign(total, 0);
    known.assign(total, 0);
  }
  void reset() {
    std::fill(value.begin(), value.end(), UNKNOWN);
    std::fill(low.begin(), low.end(), 0);
    std::fill(known.begin(), known.end(), 0);
  }
  void set_value(int leafno, int32_t v) {
    int n = leaf0 + leafno;
    while (n >= 0 && value[n] > v) {
      value[n] = v;
      n = parent[n];
    }
  }
  void encode(BitW& bio, int leafno, int32_t threshold) {
    int stack[32];
    int sp = 0;
    int n = leaf0 + leafno;
    while (parent[n] >= 0) {
      stack[sp++] = n;
      n = parent[n];
    }
    int32_t lo = 0;
    for (;;) {
      if (lo > low[n]) low[n] = lo;
      else lo = low[n];
      while (lo < threshold) {
        if (lo >= value[n]) {
          if (!known[n]) {
            bio.put(1);
            known[n] = 1;
          }
          break;
        }
        bio.put(0);
        lo++;
      }
      low[n] = lo;
      if (sp == 0) break;
      n = stack[--sp];
    }
  }
  bool decode(BitR& bio, int leafno, int32_t threshold) {
    int stack[32];
    int sp = 0;
    int n = leaf0 + leafno;
    while (parent[n] >= 0) {
      stack[sp++] = n;
      n = parent[n];
    }
    int32_t lo = 0;
    for (;;) {
      if (lo > low[n]) low[n] = lo;
      else lo = low[n];
      while (lo < threshold && lo < value[n]) {
        if (bio.bit()) value[n] = lo;
        else lo++;
      }
      low[n] = lo;
      if (sp == 0) break;
      n = stack[--sp];
    }
    return value[n] < threshold;
  }
};

// ---------------------------------------------------- segment layout
// Mirrors grok_tpu/t1/coder.py segment_layout / _is_raw_pass /
// _is_term_pass (SURVEY.md B.6 "Segments").

enum { STY_LAZY = 1, STY_RESET = 2, STY_TERMALL = 4, STY_VSC = 8,
       STY_PTERM = 16, STY_SEGSYM = 32 };

static inline bool raw_pass(int ptype, int bpno, int numbps, int style) {
  return (style & STY_LAZY) && ptype <= 1 && bpno <= numbps - 5;
}
static inline bool term_pass(int ptype, int bpno, int numbps, int style,
                             bool last) {
  if (last) return true;
  if (style & STY_TERMALL) return true;
  if (style & STY_LAZY) {
    if (ptype == 2 && bpno <= numbps - 4) return true;
    if (ptype == 1 && bpno <= numbps - 5) return true;
  }
  return false;
}

// codeword-segment bounds [s0, s1] by pass index
static int seg_bounds(int style, int numbps, int32_t (*bounds)[2], int cap) {
  int nsegs = 0;
  int total = 3 * numbps - 2;
  int passno = 0;
  int cur_first = -1;
  bool cur_raw = false;
  for (int bpno = numbps - 1; bpno >= 0; bpno--) {
    int pt_first = (bpno == numbps - 1) ? 2 : 0;
    for (int ptype = pt_first; ptype <= 2; ptype++) {
      bool rawp = raw_pass(ptype, bpno, numbps, style);
      if (cur_first >= 0 && rawp != cur_raw) {
        if (nsegs < cap) { bounds[nsegs][0] = cur_first;
                           bounds[nsegs][1] = passno - 1; }
        nsegs++;
        cur_first = -1;
      }
      if (cur_first < 0) {
        cur_first = passno;
        cur_raw = rawp;
      }
      bool last = passno == total - 1;
      if (term_pass(ptype, bpno, numbps, style, last)) {
        if (nsegs < cap) { bounds[nsegs][0] = cur_first;
                           bounds[nsegs][1] = passno; }
        nsegs++;
        cur_first = -1;
      }
      passno++;
    }
  }
  if (cur_first >= 0) {
    if (nsegs < cap) { bounds[nsegs][0] = cur_first;
                       bounds[nsegs][1] = passno - 1; }
    nsegs++;
  }
  return nsegs < cap ? nsegs : cap;
}

// split passes [first, first+num_new) into per-segment runs
static int contribution_runs(int style, int numbps, int first, int num_new,
                             int32_t (*runs)[2], int cap) {
  int32_t bounds[128][2];
  int nsegs = seg_bounds(style, numbps, bounds, 128);
  int n = 0;
  int p = first;
  int end = first + num_new;
  while (p < end) {
    bool found = false;
    for (int s = 0; s < nsegs; s++) {
      if (bounds[s][0] <= p && p <= bounds[s][1]) {
        int take = (end - 1 < bounds[s][1] ? end - 1 : bounds[s][1]) - p + 1;
        if (n < cap) { runs[n][0] = p; runs[n][1] = take; }
        n++;
        p += take;
        found = true;
        break;
      }
    }
    if (!found) {
      if (n < cap) { runs[n][0] = p; runs[n][1] = end - p; }
      n++;
      break;
    }
  }
  return n < cap ? n : cap;
}

static inline int floorlog2(uint32_t x) {  // x >= 1
  return 31 - __builtin_clz(x);
}
static inline int bit_length(uint32_t x) {
  return x ? 32 - __builtin_clz(x) : 0;
}

// pass-count code (SURVEY.md B.6)
static void write_numpasses(BitW& bio, int n) {
  if (n == 1) bio.put(0);
  else if (n == 2) bio.putn(0b10, 2);
  else if (n <= 5) { bio.putn(0b11, 2); bio.putn((uint32_t)(n - 3), 2); }
  else if (n <= 36) { bio.putn(0b1111, 4); bio.putn((uint32_t)(n - 6), 5); }
  else { bio.putn(0b111111111, 9); bio.putn((uint32_t)(n - 37), 7); }
}
static int read_numpasses(BitR& bio) {
  if (!bio.bit()) return 1;
  if (!bio.bit()) return 2;
  uint32_t v = bio.bits(2);
  if (v < 3) return 3 + (int)v;
  v = bio.bits(5);
  if (v < 31) return 6 + (int)v;
  return 37 + (int)bio.bits(7);
}

// ------------------------------------------------------------ precinct

struct Cblk {
  int32_t incl_layer = -1;
  int32_t lblock = 3;
  int32_t total = 0;
  int32_t numbps = 0;  // decoder: mb - zb once included
};

struct Band {
  int cw = 0, ch = 0, off = 0;  // off: first cblk index in prc.cblks
  TagTree incl, imsb;
};

struct Prc {
  std::vector<Band> bands;
  std::vector<Cblk> cblks;
  std::vector<uint8_t> hdr;  // last encoded packet header (growable)
  bool enc_leaves_set = false;

  void reset() {
    for (auto& b : bands) {
      b.incl.reset();
      b.imsb.reset();
    }
    for (auto& c : cblks) c = Cblk{};
    enc_leaves_set = false;
  }
};

}  // namespace t2

// ---------------------------------------------------------------- C ABI

extern "C" {

void* grk_t2_prc_new(int nbands, const int32_t* cw, const int32_t* ch) {
  auto* p = new t2::Prc();
  p->bands.resize(nbands);
  int off = 0;
  for (int b = 0; b < nbands; b++) {
    t2::Band& bd = p->bands[b];
    bd.cw = cw[b];
    bd.ch = ch[b];
    bd.off = off;
    bd.incl.build(cw[b], ch[b]);
    bd.imsb.build(cw[b], ch[b]);
    off += cw[b] * ch[b];
  }
  p->cblks.resize(off);
  return p;
}

void grk_t2_prc_free(void* h) { delete (t2::Prc*)h; }

void grk_t2_prc_reset(void* h) { ((t2::Prc*)h)->reset(); }

// Encode one packet header for this precinct/layer.  Arrays are indexed by
// flat cblk index (band-major raster).  The header bytes land in the
// precinct's growable buffer (read them via grk_t2_prc_hdr) and the body
// byte range of each contributing cblk goes to body_ranges[2i..2i+1]
// (start, end into cblk.data; -1,-1 = no contribution).  Returns the
// header length in bytes.
long grk_t2_encode_packet(
    void* h, int layno, int style, int mixed,
    const int32_t* npasses_layer, const int32_t* first_layer,
    const int32_t* zero_bitplanes, const int32_t* numbps,
    const int32_t* is_ht,
    const int32_t* pass_rates, int rates_stride,
    int32_t* body_ranges) {
  auto* p = (t2::Prc*)h;
  int ncb = (int)p->cblks.size();
  for (int i = 0; i < ncb; i++) {
    body_ranges[2 * i] = -1;
    body_ranges[2 * i + 1] = -1;
  }
  if (!p->enc_leaves_set) {
    for (auto& bd : p->bands) {
      if (!bd.cw || !bd.ch) continue;
      for (int i = 0; i < bd.cw * bd.ch; i++) {
        bd.incl.set_value(i, first_layer[bd.off + i]);
        bd.imsb.set_value(i, zero_bitplanes[bd.off + i]);
      }
    }
    p->enc_leaves_set = true;
  }
  t2::BitW bio;
  bool any = false;
  for (int i = 0; i < ncb && !any; i++) any = npasses_layer[i] > 0;
  if (!any) {
    bio.put(0);
    bio.flush();
    p->hdr.swap(bio.buf);
    return (long)p->hdr.size();
  }
  bio.put(1);
  for (auto& bd : p->bands) {
    int n = bd.cw * bd.ch;
    for (int i = 0; i < n; i++) {
      int ci = bd.off + i;
      t2::Cblk& cb = p->cblks[ci];
      int np = npasses_layer[ci];
      bool already = cb.incl_layer >= 0;
      if (!already) bd.incl.encode(bio, i, layno + 1);
      else bio.put(np ? 1 : 0);
      if (!np) continue;
      if (!already) {
        bd.imsb.encode(bio, i, zero_bitplanes[ci] + 1);
        if (mixed) bio.put(is_ht[ci] ? 1 : 0);
        cb.incl_layer = layno;
        cb.lblock = 3;
        cb.total = 0;
      }
      t2::write_numpasses(bio, np);
      int32_t runs[200][2];
      int nr = t2::contribution_runs(style, numbps[ci], cb.total, np,
                                     runs, 200);
      const int32_t* rates = pass_rates + (size_t)ci * rates_stride;
      // Lblock update: one comma code fitting all runs
      int needed = 0;
      for (int r = 0; r < nr; r++) {
        int p0 = runs[r][0], rn = runs[r][1];
        int32_t start = p0 > 0 ? rates[p0 - 1] : 0;
        int32_t ln = rates[p0 + rn - 1] - start;
        int bl = t2::bit_length((uint32_t)ln);
        if (bl < 1) bl = 1;
        int bits = bl - t2::floorlog2((uint32_t)rn);
        if (bits > needed) needed = bits;
      }
      if (needed > cb.lblock) {
        for (int k = cb.lblock; k < needed; k++) bio.put(1);
        cb.lblock = needed;
      }
      bio.put(0);
      for (int r = 0; r < nr; r++) {
        int p0 = runs[r][0], rn = runs[r][1];
        int32_t start = p0 > 0 ? rates[p0 - 1] : 0;
        int32_t ln = rates[p0 + rn - 1] - start;
        bio.putn((uint32_t)ln, cb.lblock + t2::floorlog2((uint32_t)rn));
      }
      int32_t bstart = cb.total > 0 ? rates[cb.total - 1] : 0;
      int32_t bend = rates[cb.total + np - 1];
      body_ranges[2 * ci] = bstart;
      body_ranges[2 * ci + 1] = bend;
      cb.total += np;
    }
  }
  bio.flush();
  p->hdr.swap(bio.buf);
  return (long)p->hdr.size();
}

const uint8_t* grk_t2_prc_hdr(void* h) {
  return ((t2::Prc*)h)->hdr.data();
}

// Rate-control dry run: total header+body bytes of this precinct's
// packets for layers 0..nlayers_sim-1, replayed from fresh state in one
// call (the tag-tree / Lblock / inclusion state evolves across layers,
// so a trial that changes any layer must replay them all).
// npasses_mat is layer-major: layer L's per-cblk pass counts start at
// npasses_mat + L * ncb.  body_ranges is 2*ncb scratch.
long grk_t2_size_layers(
    void* h, int nlayers_sim, int style, int mixed,
    const int32_t* npasses_mat, const int32_t* first_layer,
    const int32_t* zero_bitplanes, const int32_t* numbps,
    const int32_t* is_ht,
    const int32_t* pass_rates, int rates_stride,
    int32_t* body_ranges) {
  auto* p = (t2::Prc*)h;
  p->reset();
  int ncb = (int)p->cblks.size();
  long total = 0;
  for (int L = 0; L < nlayers_sim; L++) {
    total += grk_t2_encode_packet(
        h, L, style, mixed, npasses_mat + (size_t)L * ncb, first_layer,
        zero_bitplanes, numbps, is_ht, pass_rates, rates_stride,
        body_ranges);
    for (int i = 0; i < ncb; i++)
      if (body_ranges[2 * i] >= 0)
        total += body_ranges[2 * i + 1] - body_ranges[2 * i];
  }
  p->reset();  // leave the handle in the fresh state consumers expect
  return total;
}

// Decode one packet header.  Outputs per flat cblk index: whether the cblk
// contributes to this packet, whether it was newly included (zb/is_ht then
// valid), and the (npasses, length) chunk list.  Returns 0 on success,
// 1 on a malformed header (Lblock/zero-bitplane runaway or chunk
// overflow); out_hdr_pos receives the byte-aligned position after the
// header either way.
int grk_t2_decode_packet(
    void* h, int layno, int style, int mixed,
    const uint8_t* hdr, long hdr_len, long hdr_pos,
    const int32_t* mb_per_band,
    int32_t* out_incl, int32_t* out_newly, int32_t* out_zb,
    int32_t* out_isht, int32_t* out_nchunks, int32_t* out_chunks,
    int maxch, long* out_hdr_pos) {
  auto* p = (t2::Prc*)h;
  int ncb = (int)p->cblks.size();
  std::memset(out_incl, 0, sizeof(int32_t) * ncb);
  std::memset(out_newly, 0, sizeof(int32_t) * ncb);
  std::memset(out_nchunks, 0, sizeof(int32_t) * ncb);
  t2::BitR bio(hdr, hdr_len, hdr_pos);
  if (!bio.bit()) {
    bio.align();
    *out_hdr_pos = bio.pos;
    return 0;
  }
  int bandno = -1;
  for (auto& bd : p->bands) {
    bandno++;
    int n = bd.cw * bd.ch;
    if (!n) continue;
    int32_t mb = mb_per_band[bandno];
    for (int i = 0; i < n; i++) {
      int ci = bd.off + i;
      t2::Cblk& cb = p->cblks[ci];
      bool already = cb.incl_layer >= 0;
      bool included;
      if (!already) included = bd.incl.decode(bio, i, layno + 1);
      else included = bio.bit() != 0;
      if (!included) continue;
      if (!already) {
        int32_t k = 1;
        while (!bd.imsb.decode(bio, i, k)) {
          if (++k > mb + 256) {  // runaway: corrupt header
            bio.align();
            *out_hdr_pos = bio.pos;
            return 1;
          }
        }
        cb.numbps = mb - (k - 1);
        out_zb[ci] = k - 1;
        if (mixed) out_isht[ci] = bio.bit();
        out_newly[ci] = 1;
        cb.incl_layer = layno;
        cb.lblock = 3;
        cb.total = 0;
      }
      int np = t2::read_numpasses(bio);
      int32_t runs[200][2];
      int nr = t2::contribution_runs(style, cb.numbps, cb.total, np,
                                     runs, 200);
      while (bio.bit()) {
        if (++cb.lblock > 64) {  // runaway comma code: corrupt header
          bio.align();
          *out_hdr_pos = bio.pos;
          return 1;
        }
      }
      if (nr > maxch) {
        bio.align();
        *out_hdr_pos = bio.pos;
        return 1;
      }
      for (int r = 0; r < nr; r++) {
        int rn = runs[r][1];
        uint32_t ln = bio.bits(cb.lblock + t2::floorlog2((uint32_t)rn));
        out_chunks[((size_t)ci * maxch + r) * 2] = rn;
        out_chunks[((size_t)ci * maxch + r) * 2 + 1] = (int32_t)ln;
      }
      out_nchunks[ci] = nr;
      out_incl[ci] = 1;
      cb.total += np;
    }
  }
  bio.align();
  *out_hdr_pos = bio.pos;
  return 0;
}

// Sequential whole-tile packet decode for the common inline-header case
// (no SOP/EPH/PPT, no window/layer skipping): parses each packet header
// via grk_t2_decode_packet and advances over the packet bodies.  First
// inclusion is mirrored per GLOBAL codeblock index g = bases[pkt] +
// local (g_zb/g_isht/g_newly, with g_newly = layno + 1 so 0 means never
// included); codeword-segment chunks are appended to a thread-local
// record vector as (g, passes, data offset, clamped len) int32 quads in
// arrival order (lengths are clamped to the stream end, matching the
// Python consumer's short slices, while the position still advances by
// the signaled length).  *out_recs/*out_nrec expose the vector until the
// next call on this thread.  Stops without error when the stream
// truncates (pos >= data_len before a packet).  Returns packets
// consumed, or -(pkt+1) on a malformed header / per-packet chunk
// overflow.  *inout_pos carries the stream position in and out.
long grk_t2_decode_seq(
    const uint64_t* prcs, const int32_t* laynos, const int32_t* styles,
    const int32_t* mixeds, const uint64_t* mb_ptrs, const int32_t* bases,
    int npackets, const uint8_t* data, long data_len, long* inout_pos,
    int32_t* g_zb, int32_t* g_isht, int32_t* g_newly,
    const int32_t** out_recs, long* out_nrec) {
  constexpr int kMaxCh = 200;  // per-packet bound; == native.py MAX_CHUNKS
  long pos = *inout_pos;
  thread_local std::vector<int32_t> l_incl, l_newly, l_zb, l_isht, l_nch,
      l_chunks, recs;
  recs.clear();
  long pkt = 0;
  for (; pkt < npackets; pkt++) {
    if (pos >= data_len) break;  // tolerant: truncated tile data
    // tolerate SOP markers that are present but not signaled in COD
    // (decode_packet skips them unconditionally; this path is only
    // taken when COD does NOT signal SOP)
    if (pos + 2 <= data_len && data[pos] == 0xFF && data[pos + 1] == 0x91)
      pos += 6;
    if (pos >= data_len) break;
    auto* p = (t2::Prc*)(uintptr_t)prcs[pkt];
    int ncb = (int)p->cblks.size();
    if ((int)l_incl.size() < ncb) {
      l_incl.resize(ncb);
      l_newly.resize(ncb);
      l_zb.resize(ncb);
      l_isht.resize(ncb);
      l_nch.resize(ncb);
      l_chunks.resize((size_t)ncb * kMaxCh * 2);
    }
    long hp = pos;
    int rc = grk_t2_decode_packet(
        (void*)p, laynos[pkt], styles[pkt], mixeds[pkt], data, data_len,
        pos, (const int32_t*)(uintptr_t)mb_ptrs[pkt], l_incl.data(),
        l_newly.data(), l_zb.data(), l_isht.data(), l_nch.data(),
        l_chunks.data(), kMaxCh, &hp);
    if (rc) {
      *inout_pos = pos;
      return -(pkt + 1);
    }
    pos = hp;
    int32_t base = bases[pkt];
    for (int ci = 0; ci < ncb; ci++) {
      if (!l_incl[ci]) continue;
      int g = base + ci;
      if (l_newly[ci]) {
        g_newly[g] = laynos[pkt] + 1;  // 0 = never newly included
        g_zb[g] = l_zb[ci];
        g_isht[g] = l_isht[ci];
      }
      for (int k = 0; k < l_nch[ci]; k++) {
        int32_t np = l_chunks[((size_t)ci * kMaxCh + k) * 2];
        // chunk lengths are raw uint32 header fields (lblock can grow
        // past 31 on corrupt streams): widen before comparing so a
        // wrapped-negative int32 can't slip through the clamp as a
        // negative record length / backwards position step
        int64_t ln = (int64_t)(uint32_t)l_chunks[
            ((size_t)ci * kMaxCh + k) * 2 + 1];
        long avail = data_len - pos;
        int32_t rec = ln <= avail ? (int32_t)ln
                                  : (avail > 0 ? (int32_t)avail : 0);
        recs.push_back(g);
        recs.push_back(np);
        // clamp the recorded offset so an overrun position can't wrap
        // int32 (rec is 0 in that case, keeping off + rec <= data_len)
        recs.push_back((int32_t)(pos < data_len ? pos : data_len));
        recs.push_back(rec);
        pos += ln;  // may run past data_len; the packet loop then stops
      }
    }
  }
  *inout_pos = pos;
  *out_recs = recs.data();
  *out_nrec = (long)(recs.size() / 4);
  return pkt;
}

// Whole-tile Tier-1 decode from grk_t2_decode_seq chunk records (the
// band-batched run_t1 roadmap item): groups the arrival-ordered records
// per global codeblock, regroups chunks into codeword segments with the
// same seg_bounds layout the packet coder uses (unmatched passes fold
// into segment 0, mirroring t2/packets.py collect_seg_lengths), gathers
// each codeblock's bytes contiguously, and dispatches GrkT1DecJob /
// GrkHTDecJob batches that write doubled-domain values straight into
// the pre-zeroed band arrays.  Statics per codeblock g:
//   st_hw[2g..]   = h, w
//   st_meta[4g..] = orient, style, mb (band numbps bound), band_id
//   st_flags[g]   = bit0 HT band, bit1 MIXED (per-block flag in isht)
//   st_off[g]     = element offset of the codeblock in its band array
// Returns the number of jobs dispatched, or < 0 on inconsistent input
// (caller falls back to the per-codeblock Python path).
// Only reachable from the amalgam build (needs the T1/HT batch entry
// points earlier in the TU).
long grk_t1_decode_tile(
    const int32_t* recs, long nrec, const uint8_t* data, long data_len,
    int ncb, const int32_t* st_hw, const int32_t* st_meta,
    const int32_t* st_flags, const int32_t* st_off, const int32_t* zb,
    const int32_t* isht, const uint64_t* band_base,
    const int32_t* band_stride, int num_threads) {
  thread_local std::vector<int32_t> cnt, start, cur, npass, order_idx,
      seglens;
  thread_local std::vector<uint8_t> gather;
  thread_local std::vector<GrkT1DecJob> mq_jobs;
  thread_local std::vector<GrkHTDecJob> ht_jobs;
  cnt.assign(ncb, 0);
  npass.assign(ncb, 0);
  long total_bytes = 0;
  for (long r = 0; r < nrec; r++) {
    int32_t g = recs[4 * r];
    if (g < 0 || g >= ncb) return -1;
    // defend against inconsistent records (negative pass counts /
    // lengths, ranges outside the stream): bail to the Python path
    int32_t np = recs[4 * r + 1], off = recs[4 * r + 2],
            ln = recs[4 * r + 3];
    if (np < 0 || ln < 0 || off < 0 || (long)off + ln > data_len)
      return -1;
    cnt[g]++;
    npass[g] += np;
    total_bytes += ln;
  }
  start.resize(ncb + 1);
  start[0] = 0;
  for (int g = 0; g < ncb; g++) start[g + 1] = start[g] + cnt[g];
  cur.assign(start.begin(), start.begin() + ncb);
  order_idx.resize(nrec);
  for (long r = 0; r < nrec; r++) order_idx[cur[recs[4 * r]]++] = (int32_t)r;
  gather.resize((size_t)total_bytes);
  mq_jobs.clear();
  ht_jobs.clear();
  seglens.clear();
  size_t gpos = 0;
  for (int g = 0; g < ncb; g++) {
    if (!cnt[g] || npass[g] <= 0) continue;
    int h = st_hw[2 * g], w = st_hw[2 * g + 1];
    if (h <= 0 || w <= 0) continue;  // empty rect: python path skips too
    int orient = st_meta[4 * g], style = st_meta[4 * g + 1];
    int mb = st_meta[4 * g + 2], band = st_meta[4 * g + 3];
    int numbps = mb - zb[g];
    int flags = st_flags[g];
    bool is_ht = (flags & 1) && (!(flags & 2) || isht[g]);
    uint8_t* dst0 = gather.data() + gpos;
    int32_t bounds[128][2];
    int nsegs_layout =
        is_ht ? 0 : t2::seg_bounds(style, numbps, bounds, 128);
    int32_t seg_len[129] = {0};
    bool seg_touch[129] = {false};
    int max_si = 0;
    long glen = 0;
    int p = 0;
    for (int k = start[g]; k < start[g + 1]; k++) {
      const int32_t* rec = recs + 4 * (size_t)order_idx[k];
      int32_t np = rec[1], off = rec[2], ln = rec[3];
      if (ln) memcpy(dst0 + glen, data + off, (size_t)ln);
      glen += ln;
      int si = 0;  // collect_seg_lengths: seg_of_pass.get(p, 0)
      for (int s = 0; s < nsegs_layout; s++)
        if (bounds[s][0] <= p && p <= bounds[s][1]) {
          si = s;
          break;
        }
      if (si > 128) si = 128;
      seg_len[si] += ln;
      seg_touch[si] = true;
      if (si > max_si) max_si = si;
      p += np;
    }
    int32_t* out = (int32_t*)(uintptr_t)band_base[band] + st_off[g];
    if (is_ht) {
      GrkHTDecJob j;
      j.h = h;
      j.w = w;
      j.data = dst0;
      j.data_len = (int32_t)glen;
      j.out = out;
      j.out_stride = band_stride[band];
      j.status = 0;
      ht_jobs.push_back(j);
    } else {
      size_t sl0 = seglens.size();
      int nseg_out = 0;
      for (int s = 0; s <= max_si; s++)
        if (seg_touch[s]) {
          seglens.push_back(seg_len[s]);
          nseg_out++;
        }
      GrkT1DecJob j;
      j.h = h;
      j.w = w;
      j.orient = orient;
      j.style = style;
      j.numbps = numbps;
      j.num_passes = npass[g];
      j.data = dst0;
      j.data_len = (int32_t)glen;
      j.seg_lens = (const int32_t*)(uintptr_t)sl0;  // index; fixed below
      j.num_segs = nseg_out;
      j.out = out;
      j.out_stride = band_stride[band];
      j.status = 0;
      mq_jobs.push_back(j);
    }
    gpos += (size_t)glen;
  }
  for (auto& j : mq_jobs)  // seglens stable now: indices -> pointers
    j.seg_lens = seglens.data() + (size_t)(uintptr_t)j.seg_lens;
  if (!ht_jobs.empty())
    grk_ht_decode_batch(ht_jobs.data(), (int)ht_jobs.size(), num_threads);
  if (!mq_jobs.empty())
    grk_t1_decode_batch(mq_jobs.data(), (int)mq_jobs.size(), num_threads);
  return (long)(mq_jobs.size() + ht_jobs.size());
}

// Whole-tile Tier-1 ENCODE (the encode mirror of grk_t1_decode_tile):
// per-codeblock statics -> GrkT1EncJob/GrkHTEncJob batches coded into a
// caller-owned arena, pass rates written straight into the caller's
// (ncb, rates_stride) matrix that grk_t2_encode_seq consumes.  Only the
// untargeted single-layer path routes here (need_dist is always 0; ROI
// and rate-quota keep the per-codeblock Python loop).  Statics per
// global codeblock g:
//   st_hw[2g..]   = h, w  (h <= 0: empty rect, left all-zero)
//   st_meta[4g..] = orient, style, mb (band numbps bound), band_id
//   st_flags[g]   = bit0 HT coder for this block (MIXED already applied)
//   st_coff[g]    = element offset of the codeblock in its band array
// band_delta[band_id] > 0 marks a float32 band with fused dead-zone
// quantization (the MQ ingest fuses it; HT blocks quantize into scratch
// with the exact float32 math of transform/quant.quantize).  Returns
// the job count, or -1 on output-arena overflow (caller falls back).
// With need_dist != 0 (rate-targeted / multi-layer encodes) the outputs
// additionally carry the PCRD feed: out_e0[g] (initial squared error),
// per-pass distortion convex hulls as (ncb, rates_stride) row matrices
// hull_pass / hull_slope (raw, unweighted) / hull_rate with point counts
// in hull_n[g] — byte-parity mirrors of the per-codeblock epilogue
// (t1.cc) and ratecontrol.convex_hull.  HT blocks carry one pass whose
// distortion is the full coefficient energy, matching the Python path.
// Only reachable from the amalgam build (needs the T1/HT batch entry
// points earlier in the TU).
long grk_t1_encode_tile(
    int ncb, const int32_t* st_hw, const int32_t* st_meta,
    const int32_t* st_flags, const int64_t* st_coff,
    const uint64_t* band_base, const int32_t* band_stride,
    const float* band_delta,
    uint8_t* arena, const int64_t* out_offs, const int32_t* out_caps,
    int32_t* out_lens, int32_t* out_numbps, int32_t* out_npasses,
    int32_t* rates, int rates_stride,
    int need_dist, double* out_e0,
    int32_t* hull_pass, double* hull_slope, int32_t* hull_rate,
    int32_t* hull_n, int num_threads) {
  constexpr int kMaxPasses = 96;  // == t1/native.py MAX_PASSES
  thread_local std::vector<GrkT1EncJob> mq_jobs;
  thread_local std::vector<GrkHTEncJob> ht_jobs;
  thread_local std::vector<int32_t> mq_g, ht_g, qbuf;
  thread_local std::vector<double> dists;
  thread_local std::vector<uint8_t> terms;
  mq_jobs.clear();
  ht_jobs.clear();
  mq_g.clear();
  ht_g.clear();
  size_t qtotal = 0;  // quantized scratch for lossy HT blocks
  for (int g = 0; g < ncb; g++) {
    int h = st_hw[2 * g], w = st_hw[2 * g + 1];
    if (h <= 0 || w <= 0) continue;
    if ((st_flags[g] & 1) && band_delta[st_meta[4 * g + 3]] > 0.0f)
      qtotal += (size_t)h * w;
  }
  qbuf.resize(qtotal);
  size_t qpos = 0;
  for (int g = 0; g < ncb; g++) {
    out_lens[g] = 0;
    out_numbps[g] = 0;
    out_npasses[g] = 0;
    if (need_dist) {
      out_e0[g] = 0.0;
      hull_n[g] = 0;
    }
    int h = st_hw[2 * g], w = st_hw[2 * g + 1];
    if (h <= 0 || w <= 0) continue;
    int band = st_meta[4 * g + 3];
    const void* src = (const void*)((uintptr_t)band_base[band] +
                                    4u * (uint64_t)st_coff[g]);
    float delta = band_delta[band];
    if (st_flags[g] & 1) {
      GrkHTEncJob j{};
      j.h = h;
      j.w = w;
      if (delta > 0.0f) {
        // fused dead-zone quantization for the HT path — exact float32
        // division + floorf like quantize() (the HT batch entry takes
        // int32 coefficients only)
        const float* cf = (const float*)src;
        int bstride = band_stride[band];
        int32_t* qp = qbuf.data() + qpos;
        for (int y = 0; y < h; y++)
          for (int x = 0; x < w; x++) {
            float v = cf[(size_t)y * bstride + x];
            uint32_t m = (uint32_t)floorf(fabsf(v) / delta);
            qp[(size_t)y * w + x] = v < 0.0f ? -(int32_t)m : (int32_t)m;
          }
        j.coeffs = qp;
        j.stride = w;
        qpos += (size_t)h * w;
      } else {
        j.coeffs = (const int32_t*)src;
        j.stride = band_stride[band];
      }
      if (need_dist) {
        // coefficient energy = distortion removed by the single HT pass
        // (mirror of t1/native.py ht_encode_batch_native: quantized for
        // lossy bands, raw for reversible).  Integer squares summed in
        // double: exact below 2^53, so summation order is immaterial.
        const int32_t* cq = j.coeffs;
        double e0 = 0.0;
        for (int y = 0; y < h; y++)
          for (int x = 0; x < w; x++) {
            double v = (double)cq[(size_t)y * j.stride + x];
            e0 += v * v;
          }
        out_e0[g] = e0;
      }
      j.out = arena + out_offs[g];
      j.out_cap = out_caps[g];
      ht_jobs.push_back(j);
      ht_g.push_back(g);
    } else {
      GrkT1EncJob j{};
      j.h = h;
      j.w = w;
      j.orient = st_meta[4 * g];
      j.style = st_meta[4 * g + 1];
      j.need_dist = need_dist ? 1 : 0;
      j.stride = band_stride[band];
      j.coeffs = (const int32_t*)src;
      j.delta = delta;
      j.out = arena + out_offs[g];
      j.out_cap = out_caps[g];
      j.pass_rates = rates + (size_t)g * rates_stride;
      if (need_dist) {
        j.hull_pass = hull_pass + (size_t)g * rates_stride;
        j.hull_slope = hull_slope + (size_t)g * rates_stride;
        j.hull_rate = hull_rate + (size_t)g * rates_stride;
      }
      mq_jobs.push_back(j);  // pass_dists/pass_terms pointed below
      mq_g.push_back(g);
    }
  }
  dists.resize(mq_jobs.size() * (size_t)kMaxPasses);
  terms.resize(mq_jobs.size() * (size_t)kMaxPasses);
  for (size_t i = 0; i < mq_jobs.size(); i++) {
    mq_jobs[i].pass_dists = dists.data() + i * kMaxPasses;
    mq_jobs[i].pass_terms = terms.data() + i * kMaxPasses;
  }
  int rc = 0;
  if (!ht_jobs.empty())
    rc |= grk_ht_encode_batch(ht_jobs.data(), (int)ht_jobs.size(),
                              num_threads);
  if (!mq_jobs.empty())
    rc |= grk_t1_encode_batch(mq_jobs.data(), (int)mq_jobs.size(),
                              num_threads);
  if (rc) return -1;
  for (size_t i = 0; i < ht_jobs.size(); i++) {
    int g = ht_g[i];
    const GrkHTEncJob& j = ht_jobs[i];
    int mb = st_meta[4 * g + 2];
    out_lens[g] = j.out_len;
    out_numbps[g] = j.numbps > mb ? mb : j.numbps;  // ingest clamp parity
    if (j.numbps > 0) {
      out_npasses[g] = 1;  // HTONLY: one cleanup pass carrying everything
      rates[(size_t)g * rates_stride] = j.out_len;
      if (need_dist && out_e0[g] > 0.0) {
        // single feasible truncation point, exactly ratecontrol.
        // convex_hull([len], [e0]): slope inf when the pass is free
        size_t row = (size_t)g * rates_stride;
        hull_pass[row] = 0;
        hull_rate[row] = j.out_len;
        hull_slope[row] = j.out_len > 0
            ? out_e0[g] / (double)j.out_len
            : std::numeric_limits<double>::infinity();
        hull_n[g] = 1;
      }
    }
  }
  for (size_t i = 0; i < mq_jobs.size(); i++) {
    int g = mq_g[i];
    const GrkT1EncJob& j = mq_jobs[i];
    int mb = st_meta[4 * g + 2];
    out_lens[g] = j.out_len;
    out_numbps[g] = j.numbps > mb ? mb : j.numbps;
    out_npasses[g] = j.num_passes;
    if (need_dist) {
      out_e0[g] = j.e0;
      hull_n[g] = j.hull_n > 0 ? j.hull_n : 0;
    }
  }
  return (long)(mq_jobs.size() + ht_jobs.size());
}

// Sequential whole-tile packet ENCODE (mirror of grk_t2_decode_seq, for
// tile/processor.write_packets): emits every packet — SOP header, packet
// header, EPH, codeblock body chunks — into thread-local growable
// buffers in one call.  Per-packet inputs are flat arrays in signaled
// progression order; per-codeblock statics are GLOBAL arrays indexed by
// bases[pkt] + local index (same first-encounter enumeration the decode
// side uses).  npl_mat is layer-major with row stride ncb_total:
// packet pkt reads row laynos[pkt] offset by bases[pkt].  data_ptrs[g]
// points at codeblock g's coded bytes (may be 0 when empty).  With
// split != 0 (PPT/PPM packed headers) the headers (+EPH) land in the
// header buffer, bodies in the body buffer, and out_lens holds BODY
// lengths; otherwise everything lands in the body buffer and out_lens
// holds whole-packet lengths (SOP+hdr+EPH+body).  Buffer/length
// pointers stay valid until the next call on this thread.  Returns the
// number of packets emitted.
long grk_t2_encode_seq(
    const uint64_t* prcs, const int32_t* laynos, const int32_t* styles,
    const int32_t* mixeds, const int32_t* bases, int npackets,
    const int32_t* npl_mat, int ncb_total,
    const int32_t* first_layer, const int32_t* zero_bitplanes,
    const int32_t* numbps, const int32_t* is_ht,
    const int32_t* pass_rates, int rates_stride,
    const uint64_t* data_ptrs,
    int sop, int eph, int split,
    const uint8_t** out_hdr, long* out_hdr_len,
    const uint8_t** out_body, long* out_body_len,
    const int64_t** out_lens) {
  thread_local std::vector<uint8_t> hdrs, body;
  thread_local std::vector<int64_t> lens;
  thread_local std::vector<int32_t> ranges;
  hdrs.clear();
  body.clear();
  lens.resize((size_t)npackets);
  for (int n = 0; n < npackets; n++) {
    auto* p = (t2::Prc*)(uintptr_t)prcs[n];
    int ncb = (int)p->cblks.size();
    int32_t base = bases[n];
    if ((int)ranges.size() < 2 * ncb) ranges.resize(2 * ncb);
    long hn = grk_t2_encode_packet(
        (void*)p, laynos[n], styles[n], mixeds[n],
        npl_mat + (size_t)laynos[n] * ncb_total + base, first_layer + base,
        zero_bitplanes + base, numbps + base, is_ht + base,
        pass_rates + (size_t)base * rates_stride, rates_stride,
        ranges.data());
    std::vector<uint8_t>& hout = split ? hdrs : body;
    size_t pkt_start = body.size();
    if (sop && !split) {
      uint8_t s[6] = {0xFF, 0x91, 0x00, 0x04,
                      (uint8_t)((n >> 8) & 0xFF), (uint8_t)(n & 0xFF)};
      body.insert(body.end(), s, s + 6);
    }
    hout.insert(hout.end(), p->hdr.data(), p->hdr.data() + hn);
    if (eph) {
      hout.push_back(0xFF);
      hout.push_back(0x92);
    }
    size_t body_start = body.size();
    for (int i = 0; i < ncb; i++) {
      int32_t s = ranges[2 * i];
      if (s < 0) continue;
      int32_t e = ranges[2 * i + 1];
      const uint8_t* d = (const uint8_t*)(uintptr_t)data_ptrs[base + i];
      if (e > s && d) body.insert(body.end(), d + s, d + e);
    }
    lens[n] = (int64_t)(body.size() - (split ? body_start : pkt_start));
  }
  *out_hdr = hdrs.data();
  *out_hdr_len = (long)hdrs.size();
  *out_body = body.data();
  *out_body_len = (long)body.size();
  *out_lens = lens.data();
  return npackets;
}

}  // extern "C"
