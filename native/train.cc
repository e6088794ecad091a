// PGO training driver: exercises the MQ and HT batch coders on
// DWT-coefficient-like data so profile-guided builds see the production
// branch mix (noise magnitudes, sparse high bands, bypass mode), plus
// the streaming DWT levels and fused MCT kernels so their hot loops
// carry real profile counts (gcc size-optimizes zero-count functions
// under -fprofile-use; -fprofile-partial-training in build.sh covers
// whatever this driver still misses, e.g. the T2 entry points).
//
// Compiled only through amalgam.cc (-DGRK_TRAIN_MAIN) so the training
// pass and the library share ONE translation unit — gcc profile data is
// keyed per object file, so a separate train TU would leave the coders
// unprofiled.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifndef GRK_AMALGAM
#include "t1.cc"
#include "ht.cc"
#include "dwt.cc"
#include "mct.cc"
#endif

int main() {
  srand(7);
  const int H = 64, W = 64;
  std::vector<int32_t> coeffs(H * W);
  std::vector<uint8_t> out(1 << 20);
  std::vector<int32_t> rates(3 * 32);
  std::vector<double> dists(3 * 32);
  std::vector<uint8_t> terms(3 * 32);
  std::vector<int32_t> dec_out(H * W);

  for (int trial = 0; trial < 24; trial++) {
    int mx = 1 << (3 + trial % 12);        // numbps 4..15
    int keep = 20 + 70 * (trial % 3);      // density sweep
    for (auto& v : coeffs) {
      // geometric-ish magnitudes: natural DWT bands are heavy-tailed
      // (most samples tiny, few large), and training the coders on that
      // branch mix instead of uniform magnitudes lays out the decode
      // hot paths measurably better (HT decode kernel +9%, MQ +2-3%
      // on natural-content blocks; uniform training was leaving the
      // profile-guided layout tuned for the wrong rho/u distribution)
      v = ((rand() % (2 * mx + 1)) - mx) >> (rand() % 12);
      if (rand() % 100 > keep) v = 0;
    }
    GrkT1EncJob j{};
    j.h = H; j.w = W; j.orient = trial % 4;
    j.style = (trial % 2) ? STY_LAZY : 0;
    j.need_dist = trial % 3 == 0;
    j.coeffs = coeffs.data(); j.out = out.data();
    j.out_cap = (int)out.size();
    j.pass_rates = rates.data(); j.pass_dists = dists.data();
    j.pass_terms = terms.data();
    grk_t1_encode_batch(&j, 1, 1);

    GrkT1DecJob dj{};
    std::vector<int32_t> seg_lens;
    int last = 0;
    for (int p = 0; p < j.num_passes; p++) {
      if (terms[p] || p == j.num_passes - 1) {
        seg_lens.push_back(rates[p] - last);
        last = rates[p];
      }
    }
    dj.h = H; dj.w = W; dj.orient = j.orient; dj.style = j.style;
    dj.numbps = j.numbps; dj.num_passes = j.num_passes;
    dj.data = out.data(); dj.data_len = j.out_len;
    dj.seg_lens = seg_lens.data(); dj.num_segs = (int)seg_lens.size();
    dj.out = dec_out.data();
    grk_t1_decode_batch(&dj, 1, 1);

    GrkHTEncJob hj{};
    std::vector<uint8_t> hout(1 << 20);
    hj.h = H; hj.w = W;
    hj.coeffs = coeffs.data(); hj.out = hout.data();
    hj.out_cap = (int)hout.size();
    grk_ht_encode_batch(&hj, 1, 1);
    GrkHTDecJob hd{};
    hd.h = H; hd.w = W;
    hd.data = hout.data(); hd.data_len = hj.out_len;
    hd.out = dec_out.data();
    grk_ht_decode_batch(&hd, 1, 1);
  }

  // Streaming DWT levels + fused MCT: odd and even extents to touch the
  // mirror/edge branches, both filter families, all fused variants.
  {
    const int shapes[][2] = {{128, 128}, {129, 127}, {64, 96}, {33, 1},
                             {1, 33},    {2, 2},     {96, 64}};
    std::vector<int32_t> xi, ll, hl, lh, hh, outp, scr;
    std::vector<float> xf, fll, fhl, flh, fhh, foutp, fscr;
    for (auto& s : shapes) {
      int h = s[0], w = s[1];
      int eh = (h + 1) / 2, ew = (w + 1) / 2, oh = h / 2, ow = w / 2;
      xi.resize((size_t)h * w);
      for (auto& v : xi) v = (rand() % 2001) - 1000;
      ll.resize((size_t)eh * ew + 1); hl.resize((size_t)eh * ow + 1);
      lh.resize((size_t)oh * ew + 1); hh.resize((size_t)oh * ow + 1);
      outp.resize((size_t)h * w); scr.resize((size_t)h * w + 8);
      grk_fwd53_level(xi.data(), h, w, ll.data(), hl.data(), lh.data(),
                      hh.data(), scr.data());
      for (int halve = 0; halve < 4; halve++)
        grk_inv53_level_h(ll.data(), hl.data(), lh.data(), hh.data(), h,
                          w, outp.data(), scr.data(), halve);
      xf.resize((size_t)h * w);
      for (size_t i = 0; i < xf.size(); i++) xf[i] = (float)xi[i];
      fll.resize(ll.size()); fhl.resize(hl.size());
      flh.resize(lh.size()); fhh.resize(hh.size());
      foutp.resize((size_t)h * w); fscr.resize((size_t)h * w + 8);
      grk_fwd97_level(xf.data(), h, w, fll.data(), fhl.data(),
                      flh.data(), fhh.data(), fscr.data());
      grk_inv97_level(fll.data(), fhl.data(), flh.data(), fhh.data(), h,
                      w, foutp.data(), fscr.data());
      grk_inv97_level_dq(ll.data(), hl.data(), lh.data(), hh.data(), h,
                         w, foutp.data(), fscr.data(), 1, 0.25f, 0.5f,
                         0.5f, 1.0f);
      grk_inv97_level_dq(fll.data(), hl.data(), lh.data(), hh.data(), h,
                         w, foutp.data(), fscr.data(), 0, 0.0f, 0.5f,
                         0.5f, 1.0f);
    }
    const int64_t n = 96 * 96;
    std::vector<int32_t> r(n), g(n), b(n), oy(n), ocb(n), ocr(n);
    std::vector<float> fy(n), fcb(n), fcr(n);
    for (int64_t i = 0; i < n; i++) {
      r[i] = rand() % 256; g[i] = rand() % 256; b[i] = rand() % 256;
    }
    grk_rct_fwd_shift(r.data(), g.data(), b.data(), n, 128, 128, 128,
                      oy.data(), ocb.data(), ocr.data());
    grk_rct_inv_shift(oy.data(), ocb.data(), ocr.data(), n, 8, 0, 8, 0,
                      8, 0, r.data(), g.data(), b.data());
    grk_ict_fwd_shift(r.data(), g.data(), b.data(), n, 128, 128, 128,
                      fy.data(), fcb.data(), fcr.data());
    grk_ict_inv_shift(fy.data(), fcb.data(), fcr.data(), n, 8, 0, 8, 0,
                      8, 0, r.data(), g.data(), b.data());
    grk_f32_shift_i32(fy.data(), n, 8, 0, oy.data());
    grk_i32_shift_i32(oy.data(), n, 8, 0, ocb.data());
    grk_i32_shift_f32(oy.data(), n, 128, fy.data());
  }
  return 0;
}
